package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Materialize, WebKg}

class PipelineMainSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def docsDf = {
    import spark.implicits._
    Seq(
      (0L, "alpha beta gamma", "en", "src0", 16L),
      (1L, "delta epsilon zeta", "fr", "src1", 18L),
      (2L, "eta theta iota", "de", "src0", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("PipelineMain runs the full job end-to-end and is resumable") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pm").toString
    WebKg.synthesizeWebPages(docsDf, withDuplicates = true)
      .write.mode("overwrite").parquet(s"$dir/pages")
    // getOrCreate inside main reuses this suite's local session
    PipelineMain.main(Array("--pages", s"$dir/pages", "--out", s"$dir/store",
      "--buckets", "4", "--batch-id", "t1"))
    val data = spark.read.parquet(s"$dir/store/data")
    assert(data.count() > 0)
    // every url contributed exactly one rdf:type triple (snapshot dedup
    // collapsed the re-crawl duplicates)
    assert(data.filter(col("p") === WebKg.pType).count() == 3)
    val lineage = spark.read.parquet(s"$dir/store/lineage")
    assert(lineage.select("bucket").distinct().count() > 0)
    // resume: a second run with the same lineage writes ZERO new buckets
    PipelineMain.main(Array("--pages", s"$dir/pages", "--out", s"$dir/store",
      "--buckets", "4", "--batch-id", "t2"))
    assert(spark.read.parquet(s"$dir/store/data").count() == data.count())
    // run-level metrics: one append-only record per batch, valid JSON the
    // driver's own println also emitted
    val runs = new java.io.File(s"$dir/store/metrics").listFiles()
      .map(_.getName).sorted
    assert(runs.count(_.startsWith("run-t1-")) == 1)
    assert(runs.count(_.startsWith("run-t2-")) == 1)
    val rec = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(s"$dir/store/metrics").listFiles()
        .filter(_.getName.startsWith("run-t1-")).head.toPath))
    assert(rec.contains("\"batch_id\":\"t1\"") && rec.contains("\"stages\":{"))
  }

  test("stage flags: --canonicalize and --link compose into the store") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pm_stages").toString
    WebKg.synthesizeWebPages(docsDf).write.mode("overwrite").parquet(s"$dir/pages")
    // dictionary with an exact surface and a fuzzy variant target
    Seq(("alpha", "http://graft.dev/entity/alpha"),
        ("epsilon", "http://graft.dev/entity/epsilon"),
        ("missingno", "http://graft.dev/entity/none"))
      .toDF("surface", "entity").write.mode("overwrite").parquet(s"$dir/dict")
    PipelineMain.main(Array("--pages", s"$dir/pages", "--out", s"$dir/store",
      "--buckets", "4", "--batch-id", "s1",
      "--canonicalize", "--link", s"$dir/dict"))
    val data = spark.read.parquet(s"$dir/store/data")
    // extraction triples still present
    assert(data.filter(col("p") === WebKg.pType).count() == 3)
    // mention triples landed, keyed by the page URL (subjectOf = identity)
    val mentions = data.filter(col("p") === WebKg.pMentions)
      .select("s", "o").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(mentions.contains(
      ("https://src0.example.org/doc/0", "http://graft.dev/entity/alpha")))
    assert(mentions.contains(
      ("https://src1.example.org/doc/1", "http://graft.dev/entity/epsilon")))
    assert(!mentions.exists(_._2 == "http://graft.dev/entity/none"))
    // mention subjects join back to extraction subjects (one store, one KG)
    val urls = data.filter(col("p") === WebKg.pType).select("s").distinct()
    assert(data.filter(col("p") === WebKg.pMentions)
      .join(urls, "s").count() == mentions.size)
  }

  test("--link-mode exact links exact surfaces only; flags require --link") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pm_exact").toString
    WebKg.synthesizeWebPages(docsDf).write.mode("overwrite").parquet(s"$dir/pages")
    Seq(("alpha", "http://graft.dev/entity/alpha"),
        ("alpha", "http://graft.dev/entity/aaa"), // duplicate surface: min wins
        ("epsilom", "http://graft.dev/entity/epsilom")) // fuzzy-only variant
      .toDF("surface", "entity").write.mode("overwrite").parquet(s"$dir/dict")
    PipelineMain.main(Array("--pages", s"$dir/pages", "--out", s"$dir/store",
      "--buckets", "4", "--batch-id", "x1",
      "--link", s"$dir/dict", "--link-mode", "exact"))
    val mentions = spark.read.parquet(s"$dir/store/data")
      .filter(col("p") === WebKg.pMentions)
      .select("s", "o").collect().map(r => (r.getString(0), r.getString(1))).toSet
    // exact surface linked, duplicate surface resolved to min(entity)
    assert(mentions ==
      Set(("https://src0.example.org/doc/0", "http://graft.dev/entity/aaa")))
    // 'epsilom' (a fuzzy near-miss of the text's 'epsilon') must NOT link
    // in exact mode — the fuzzy machinery is off
    assert(!mentions.exists(_._2.endsWith("epsilom")))
    // link flags without --link abort
    val e = intercept[RuntimeException](PipelineMain.main(Array(
      "--pages", s"$dir/pages", "--out", s"$dir/s2", "--link-mode", "exact")))
    assert(e.getMessage.contains("require --link"))
    // an unknown mode aborts
    val e2 = intercept[RuntimeException](PipelineMain.main(Array(
      "--pages", s"$dir/pages", "--out", s"$dir/s3",
      "--link", s"$dir/dict", "--link-mode", "typo")))
    assert(e2.getMessage.contains("fuzzy|exact"))
  }

  test("--canonicalize percent-normalizes IRIs in the store") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pm_canon").toString
    // a page whose url carries a non-canonical pct-triplet (%7e = '~') and
    // an uppercase-hex-needed one (%3f stays encoded but uppercases)
    Seq(("https://src0.example.org/doc/a%7eb%3fc",
         java.sql.Timestamp.valueOf("2025-01-01 00:00:00"),
         "<html><head><title>T</title></head><body><p>x</p><a href=\"/doc/1\">n</a></body></html>"
           .getBytes("UTF-8"),
         "x", "en"))
      .toDF("url", "warc_ts", "html", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/pages")
    PipelineMain.main(Array("--pages", s"$dir/pages", "--out", s"$dir/store",
      "--buckets", "2", "--canonicalize"))
    val subjects = spark.read.parquet(s"$dir/store/data")
      .select("s").distinct().as[String].collect().toSet
    assert(subjects == Set("https://src0.example.org/doc/a~b%3Fc"))
  }

  test("--near-dedup drops cross-url near-duplicate pages before extraction") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pm_nd").toString
    // two urls carry the SAME content (a mirror — the snapshot stage only
    // collapses re-crawls of one url, never cross-url copies), one unique
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon", "en", "src0", 30L),
      (1L, "alpha beta gamma delta epsilon", "en", "src1", 30L),
      (2L, "unrelated totally different words entirely", "de", "src0", 42L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    WebKg.synthesizeWebPages(docs).write.mode("overwrite").parquet(s"$dir/pages")
    PipelineMain.main(Array("--pages", s"$dir/pages", "--out", s"$dir/store",
      "--buckets", "4", "--batch-id", "nd1", "--near-dedup"))
    val data = spark.read.parquet(s"$dir/store/data")
    val typed = data.filter(col("p") === WebKg.pType)
      .select("s").as[String].collect().toSet
    val mirror = Seq("https://src0.example.org/doc/0",
      "https://src1.example.org/doc/1")
    // exactly one page of the mirror pair survives — the min-xxhash64(url)
    // representative, predicted here with the same expression
    val keeper = mirror.toDF("u").select(col("u"), xxhash64(col("u")).as("h"))
      .collect().minBy(_.getLong(1)).getString(0)
    assert(typed == Set(keeper, "https://src0.example.org/doc/2"), typed)
    // run record carries the flag and the stage timings
    val rec = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(s"$dir/store/metrics").listFiles()
        .filter(_.getName.startsWith("run-nd1-")).head.toPath))
    assert(rec.contains("\"near_dedup\":true"))
    assert(rec.contains("\"near_dedup\":") && rec.contains("\"snapshot\":"))
    // without the flag both mirror pages land in the store
    PipelineMain.main(Array("--pages", s"$dir/pages", "--out", s"$dir/store2",
      "--buckets", "4", "--batch-id", "nd2"))
    val all = spark.read.parquet(s"$dir/store2/data")
      .filter(col("p") === WebKg.pType).count()
    assert(all == 3)
  }

  test("--lm-filter drops high-NLL pages before extraction") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pm_lm").toString
    // reference LM corpus: 4 copies of the good vocabulary -> every
    // in-vocab token costs ln(15/5)=1.10 nats, OOV costs ln(15)=2.71
    Seq.fill(4)("alpha beta gamma").toDF("text")
      .write.mode("overwrite").parquet(s"$dir/ref")
    val docs = Seq(
      (0L, "alpha beta gamma alpha beta", "en", "src0", 27L),
      (1L, "gamma alpha beta gamma", "en", "src1", 22L),
      (2L, "qqq zzz xxx vvv www", "de", "src0", 19L)) // all-OOV gibberish
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    WebKg.synthesizeWebPages(docs).write.mode("overwrite").parquet(s"$dir/pages")
    PipelineMain.main(Array("--pages", s"$dir/pages", "--out", s"$dir/store",
      "--buckets", "4", "--batch-id", "lm1",
      "--lm-filter", s"$dir/ref", "--lm-max-nll", "2.0"))
    val typed = spark.read.parquet(s"$dir/store/data")
      .filter(col("p") === WebKg.pType).select("s").as[String].collect().toSet
    // the gibberish page (NLL 2.71 > 2.0) never reached extraction
    assert(typed == Set("https://src0.example.org/doc/0",
      "https://src1.example.org/doc/1"), typed)
    // run record carries the flag and the stage timing
    val rec = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(s"$dir/store/metrics").listFiles()
        .filter(_.getName.startsWith("run-lm1-")).head.toPath))
    assert(rec.contains("\"lm_filter\":true"))
    assert(rec.matches("(?s).*\"stages\":\\{[^}]*\"lm_filter\":.*"), rec)
    // a run without --decontaminate records the flag as false
    assert(rec.contains("\"decontaminate\":false"), rec)
    // composes with --link: mentions only from surviving pages
    Seq(("alpha", "http://graft.dev/entity/alpha"),
        ("qqq", "http://graft.dev/entity/qqq"))
      .toDF("surface", "entity").write.mode("overwrite").parquet(s"$dir/dict")
    PipelineMain.main(Array("--pages", s"$dir/pages", "--out", s"$dir/store2",
      "--buckets", "4", "--batch-id", "lm2",
      "--lm-filter", s"$dir/ref", "--lm-max-nll", "2.0",
      "--link", s"$dir/dict", "--link-mode", "exact"))
    val mentions = spark.read.parquet(s"$dir/store2/data")
      .filter(col("p") === WebKg.pMentions)
      .select("o").as[String].collect().toSet
    // the dropped page's surface never links; the surviving pages' does
    assert(mentions == Set("http://graft.dev/entity/alpha"), mentions)
  }

  test("--normalize-urls collapses url variants into one snapshot key") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pm_nu").toString
    // one resource crawled twice: canonical url, then a re-crawl through a
    // tracking link with NEWER timestamp and updated content; plus an
    // unrelated page
    val mk = (url: String, ts: String, text: String) =>
      (url, java.sql.Timestamp.valueOf(ts),
        s"<html><head><title>T</title></head><body><p>$text</p></body></html>"
          .getBytes("UTF-8"), "en")
    Seq(
      mk("https://a.example.org/doc/1", "2025-01-01 00:00:00", "old version"),
      mk("https://a.example.org/doc/1?utm_source=feed", "2025-02-01 00:00:00", "new version"),
      mk("https://b.example.org/doc/2", "2025-01-01 00:00:00", "other page"))
      .toDF("url", "warc_ts", "html", "lang")
      .write.mode("overwrite").parquet(s"$dir/pages")
    PipelineMain.main(Array("--pages", s"$dir/pages", "--out", s"$dir/store",
      "--buckets", "4", "--batch-id", "nu1", "--normalize-urls"))
    val store = spark.read.parquet(s"$dir/store/data")
    val subjects = store.select("s").distinct().as[String].collect().toSet
    // the variant collapsed into the canonical key — 2 pages, not 3
    assert(subjects == Set("https://a.example.org/doc/1",
      "https://b.example.org/doc/2"), subjects)
    // and the NEWER crawl (through the tracking link) won the snapshot
    val th = store
      .filter(col("s") === "https://a.example.org/doc/1" &&
        col("p") === WebKg.pTextHash)
      .select("o").as[String].head()
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest("new version".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(th == want, th)
    // without the flag the variant survives as its own page
    PipelineMain.main(Array("--pages", s"$dir/pages", "--out", s"$dir/store2",
      "--buckets", "4", "--batch-id", "nu2"))
    assert(spark.read.parquet(s"$dir/store2/data")
      .select("s").distinct().count() == 3)
    val rec = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(s"$dir/store/metrics").listFiles()
        .filter(_.getName.startsWith("run-nu1-")).head.toPath))
    assert(rec.contains("\"normalize_urls\":true"), rec)
  }

  test("--decontaminate drops benchmark-overlapping pages before extraction") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pm_dc2").toString
    // eval suite: one 5-token benchmark passage
    Seq("alpha beta gamma delta epsilon").toDF("text")
      .write.mode("overwrite").parquet(s"$dir/bench")
    val docs = Seq(
      // shares the full benchmark 5-gram -> contaminated at --ngram 5
      (0L, "intro alpha beta gamma delta epsilon outro", "en", "src0", 43L),
      // shares only a 3-gram -> clean at --ngram 5
      (1L, "alpha beta gamma unrelated tail words here", "en", "src1", 42L),
      (2L, "completely different page content entirely", "en", "src0", 43L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    WebKg.synthesizeWebPages(docs).write.mode("overwrite").parquet(s"$dir/pages")
    PipelineMain.main(Array("--pages", s"$dir/pages", "--out", s"$dir/store",
      "--buckets", "4", "--batch-id", "dc1",
      "--decontaminate", s"$dir/bench", "--decontaminate-ngram", "5"))
    val typed = spark.read.parquet(s"$dir/store/data")
      .filter(col("p") === WebKg.pType).select("s").as[String].collect().toSet
    // only the page containing the benchmark 5-gram was dropped
    assert(typed == Set("https://src1.example.org/doc/1",
      "https://src0.example.org/doc/2"), typed)
    val rec = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(s"$dir/store/metrics").listFiles()
        .filter(_.getName.startsWith("run-dc1-")).head.toPath))
    assert(rec.contains("\"decontaminate\":true"))
    // the stage carries its own wall-time entry in the stages map
    assert(rec.matches("(?s).*\"stages\":\\{[^}]*\"decontaminate\":.*"), rec)
  }

  test("--lm-filter + --decontaminate + --link compose: mentions only from survivors") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pm_gates").toString
    Seq.fill(4)("alpha beta gamma").toDF("text")
      .write.mode("overwrite").parquet(s"$dir/ref")
    Seq("secret bench passage here").toDF("text")
      .write.mode("overwrite").parquet(s"$dir/bench")
    val docs = Seq(
      // survives both gates -> its surface links
      (0L, "alpha beta gamma alpha", "en", "src0", 22L),
      // in-LM but contains the benchmark 3-gram -> dropped by decontaminate
      (1L, "alpha secret bench passage beta", "en", "src1", 31L),
      // all-OOV -> dropped by the LM gate; its surface must never link
      (2L, "qqq zzz www linkme vvv", "de", "src0", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    WebKg.synthesizeWebPages(docs).write.mode("overwrite").parquet(s"$dir/pages")
    Seq(("alpha", "http://graft.dev/entity/alpha"),
        ("secret", "http://graft.dev/entity/secret"),
        ("linkme", "http://graft.dev/entity/linkme"))
      .toDF("surface", "entity").write.mode("overwrite").parquet(s"$dir/dict")
    PipelineMain.main(Array("--pages", s"$dir/pages", "--out", s"$dir/store",
      "--buckets", "4", "--batch-id", "g1",
      "--lm-filter", s"$dir/ref", "--lm-max-nll", "2.0",
      "--decontaminate", s"$dir/bench", "--decontaminate-ngram", "3",
      "--link", s"$dir/dict", "--link-mode", "exact"))
    val store = spark.read.parquet(s"$dir/store/data")
    val typed = store.filter(col("p") === WebKg.pType)
      .select("s").as[String].collect().toSet
    assert(typed == Set("https://src0.example.org/doc/0"), typed)
    // only the surviving page's surface produced a mention triple
    val mentions = store.filter(col("p") === WebKg.pMentions)
      .select("o").as[String].collect().toSet
    assert(mentions == Set("http://graft.dev/entity/alpha"), mentions)
  }

  test("--domain-curation drops whole junk domains before extraction") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pm_dc").toString
    // src0: three urls, all the SAME content -> domain dup_rate 2/3 > 0.25
    // (a mirror FARM — per-page near-dedup would keep one page; domain
    // curation drops the whole host). src1: two good unique pages.
    val docs = Seq(
      (0L, "same junk text on every page", "en", "src0", 28L),
      (2L, "same junk text on every page", "en", "src0", 28L),
      (4L, "same junk text on every page", "en", "src0", 28L),
      (1L, "good unique page content words alpha", "en", "src1", 36L),
      (3L, "another good unique page content beta", "en", "src1", 37L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // plus one page with NO http(s) host: it parses to the ''
    // pseudo-domain — unattributable pages must pass through domain
    // curation untouched, never ride a fake shared host's keep/drop
    val unattr = Seq(("urn:doc:77", "2025-01-01 00:00:00",
      "<html><head><title>U</title></head><body><p>urn page unique content gamma</p></body></html>",
      "urn page unique content gamma", "en"))
      .toDF("url", "warc_ts", "html", "text", "lang")
      .select(col("url"), col("warc_ts").cast("timestamp"),
        col("html").cast("binary"), col("text"), col("lang"))
    WebKg.synthesizeWebPages(docs).unionByName(unattr)
      .write.mode("overwrite").parquet(s"$dir/pages")
    PipelineMain.main(Array("--pages", s"$dir/pages", "--out", s"$dir/store",
      "--buckets", "4", "--batch-id", "dc1", "--domain-curation"))
    val typed = spark.read.parquet(s"$dir/store/data")
      .filter(col("p") === WebKg.pType).select("s").as[String].collect().toSet
    assert(typed == Set("https://src1.example.org/doc/1",
      "https://src1.example.org/doc/3", "urn:doc:77"), typed)
    val rec = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(s"$dir/store/metrics").listFiles()
        .filter(_.getName.startsWith("run-dc1-")).head.toPath))
    assert(rec.contains("\"domain_curation\":true"))
    assert(rec.contains("\"domain_curation\":") && rec.contains("\"snapshot\":"))
    // without the flag all six pages land in the store
    PipelineMain.main(Array("--pages", s"$dir/pages", "--out", s"$dir/store2",
      "--buckets", "4", "--batch-id", "dc2"))
    assert(spark.read.parquet(s"$dir/store2/data")
      .filter(col("p") === WebKg.pType).count() == 6)
  }

  test("--dict-encode materializes the term-dictionary-encoded store layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pm_dict").toString
    WebKg.synthesizeWebPages(docsDf).write.mode("overwrite").parquet(s"$dir/pages")
    PipelineMain.main(Array("--pages", s"$dir/pages", "--out", s"$dir/enc",
      "--buckets", "4", "--batch-id", "d1", "--dict-encode"))
    PipelineMain.main(Array("--pages", s"$dir/pages", "--out", s"$dir/plain",
      "--buckets", "4", "--batch-id", "d1"))
    // data at rest is fixed-width ids only; the strings live in /dict
    val enc = spark.read.parquet(s"$dir/enc/data")
    assert(enc.schema.fields.map(f => (f.name, f.dataType.typeName)).toSet ===
      Set(("s_id", "binary"), ("p_id", "binary"), ("o_id", "binary"),
        ("bucket", "integer")))
    assert(enc.count() === spark.read.parquet(s"$dir/plain/data").count())
    // a point lookup decodes to exactly the plain store's description
    val subject = spark.read.parquet(s"$dir/plain/data")
      .select("s").head().getString(0)
    val encRows = graft.pipeline.Dict
      .lookupSubjectEncoded(spark, s"$dir/enc", subject, 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val plainRows = Materialize.lookupSubject(spark, s"$dir/plain", subject, 4)
      .select("s", "p", "o")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(encRows.sorted.toSeq === plainRows.sorted.toSeq)
    assert(encRows.nonEmpty)
    // metrics record the layout flag
    val rec = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(s"$dir/enc/metrics").listFiles()
        .filter(_.getName.startsWith("run-d1-")).head.toPath))
    assert(rec.contains("\"dict_encode\":true"))
    // --dict-encode is a construct-mode flag
    val e = intercept[RuntimeException](PipelineMain.main(Array(
      "--compact-src", s"$dir/enc", "--out", s"$dir/x", "--dict-encode")))
    assert(e.getMessage.contains("--compact-src is a mode of its own"))
  }

  test("--compact-src rolls an increment store into a deduped snapshot store") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pm_compact").toString
    val t1 = Seq(("http://e/a", "http://e/p", "1"), ("http://e/b", "http://e/p", "2"))
      .toDF("s", "p", "o")
    val t2 = Seq(("http://e/a", "http://e/p", "1"), ("http://e/c", "http://e/p", "3"))
      .toDF("s", "p", "o") // cross-batch duplicate of (a,p,1)
    Materialize.materializeIncrement(t1, s"$dir/inc", 2, "b1")
    Materialize.materializeIncrement(t2, s"$dir/inc", 2, "b2")
    PipelineMain.main(Array("--compact-src", s"$dir/inc", "--out", s"$dir/snap",
      "--buckets", "2", "--batch-id", "c1"))
    val data = spark.read.parquet(s"$dir/snap/data")
    assert(data.count() == 3) // global cross-batch dedup
    // the compacted store serves point lookups (bucket-pruned)
    val hit = Materialize.lookupSubject(spark, s"$dir/snap", "http://e/a", 2)
    assert(hit.select("o").as[String].collect().toSeq == Seq("1"))
    // compact mode rejects construct-mode stages
    val e = intercept[RuntimeException](PipelineMain.main(Array(
      "--compact-src", s"$dir/inc", "--out", s"$dir/snap2", "--canonicalize")))
    assert(e.getMessage.contains("mode of its own"))
  }

  test("--stream-pages ingests incrementally (exactly-once per file); " +
    "--compact-src rolls the increments into a snapshot store") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pm_stream").toString
    WebKg.synthesizeWebPages(docsDf)
      .write.mode("overwrite").parquet(s"$dir/pages")
    PipelineMain.main(Array("--stream-pages", s"$dir/pages", "--out", s"$dir/inc",
      "--buckets", "2", "--batch-id", "st1", "--stream-once"))
    val inc = spark.read.parquet(s"$dir/inc/data")
    assert(inc.filter(col("p") === WebKg.pType).count() == 3)
    // wave 2: one NEW page file appended to the watched directory; the
    // checkpoint must skip the already-processed files (exactly-once),
    // so exactly one page's triples are added
    WebKg.synthesizeWebPages(
        Seq((7L, "new wave text", "en", "src0", 13L))
          .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .write.mode("append").parquet(s"$dir/pages")
    PipelineMain.main(Array("--stream-pages", s"$dir/pages", "--out", s"$dir/inc",
      "--buckets", "2", "--batch-id", "st2", "--stream-once"))
    assert(spark.read.parquet(s"$dir/inc/data")
      .filter(col("p") === WebKg.pType).count() == 4)
    // run record carries the stream mode
    val rec = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(s"$dir/inc/metrics").listFiles()
        .filter(_.getName.startsWith("run-st2-")).head.toPath))
    assert(rec.contains("\"mode\":\"stream\""))
    // roll the increment store into a queryable snapshot
    PipelineMain.main(Array("--compact-src", s"$dir/inc", "--out", s"$dir/snap",
      "--buckets", "2", "--batch-id", "c1"))
    assert(spark.read.parquet(s"$dir/snap/data")
      .filter(col("p") === WebKg.pType).count() == 4)
    // mode guards: batch-only stages and mixed modes abort
    val e = intercept[RuntimeException](PipelineMain.main(Array(
      "--stream-pages", s"$dir/pages", "--out", s"$dir/x", "--canonicalize")))
    assert(e.getMessage.contains("do not apply"))
    val e2 = intercept[RuntimeException](PipelineMain.main(Array(
      "--pages", s"$dir/pages", "--stream-pages", s"$dir/pages",
      "--out", s"$dir/y")))
    assert(e2.getMessage.contains("mutually exclusive"))
    val e3 = intercept[RuntimeException](PipelineMain.main(Array(
      "--pages", s"$dir/pages", "--out", s"$dir/z", "--stream-once")))
    assert(e3.getMessage.contains("requires --stream-pages"))
  }

  test("parseArgs is strict: unknown/duplicate/dangling flags and flag-like values abort") {
    assert(PipelineMain.parseArgs(Array("--pages", "p", "--canonicalize",
      "--out", "o"))("--canonicalize") == "true")
    val unknown = intercept[RuntimeException](
      PipelineMain.parseArgs(Array("--pagez", "p")))
    assert(unknown.getMessage.contains("unknown flag"))
    val dup = intercept[RuntimeException](
      PipelineMain.parseArgs(Array("--pages", "a", "--pages", "b")))
    assert(dup.getMessage.contains("duplicate flag"))
    val dangling = intercept[RuntimeException](
      PipelineMain.parseArgs(Array("--pages")))
    assert(dangling.getMessage.contains("dangling flag"))
    // a missing value must NOT silently consume the next flag as its value
    val flagVal = intercept[RuntimeException](
      PipelineMain.parseArgs(Array("--pages", "--out", "o")))
    assert(flagVal.getMessage.contains("flag-like token"))
  }

  test("pre-flight validation aborts before any stage runs") {
    // malformed / out-of-range link values must abort in main's pre-flight
    // block — BEFORE the snapshot stage — not deep inside the link stage
    // after the expensive prefix has run. main() validates before building
    // the session, so these raise without touching Spark.
    def run(args: String*): RuntimeException =
      intercept[RuntimeException](PipelineMain.main(args.toArray))
    assert(run("--pages", "p", "--out", "o", "--link", "d",
      "--link-threshold", "0,5").getMessage.contains("must be a number"))
    assert(run("--pages", "p", "--out", "o", "--link", "d",
      "--link-threshold", "2.0").getMessage.contains("(0, 1]"))
    assert(run("--pages", "p", "--out", "o", "--link", "d",
      "--link-broadcast-max", "200k").getMessage.contains("must be an integer"))
    assert(run("--pages", "p", "--out", "o", "--link", "d",
      "--link-mode", "fuzy").getMessage.contains("fuzzy|exact"))
    // LM-filter flags: both or neither, numeric positive threshold
    assert(run("--pages", "p", "--out", "o", "--lm-max-nll", "2.0")
      .getMessage.contains("requires --lm-filter"))
    assert(run("--pages", "p", "--out", "o", "--lm-filter", "ref")
      .getMessage.contains("requires --lm-max-nll"))
    assert(run("--pages", "p", "--out", "o", "--lm-filter", "ref",
      "--lm-max-nll", "2,0").getMessage.contains("must be a number"))
    assert(run("--pages", "p", "--out", "o", "--lm-filter", "ref",
      "--lm-max-nll", "-1").getMessage.contains("must be positive"))
    // decontamination flags: the ngram width needs the stage; integer >= 1
    assert(run("--pages", "p", "--out", "o", "--decontaminate-ngram", "5")
      .getMessage.contains("requires --decontaminate"))
    assert(run("--pages", "p", "--out", "o", "--decontaminate", "b",
      "--decontaminate-ngram", "5.5").getMessage.contains("must be an integer"))
    assert(run("--pages", "p", "--out", "o", "--decontaminate", "b",
      "--decontaminate-ngram", "0").getMessage.contains("must be in [1, 256]"))
    assert(run("--pages", "p", "--out", "o", "--decontaminate", "b",
      "--decontaminate-ngram", "257").getMessage.contains("must be in [1, 256]"))
    // --stream-once over an empty directory has nothing to drain: abort
    // with the reason instead of a bare schema-inference crash
    val emptyDir = java.nio.file.Files.createTempDirectory("graft_empty_watch")
    try {
      val e = run("--stream-pages", emptyDir.toString, "--out", "o",
        "--stream-once")
      assert(e.getMessage.contains("no parquet files"))
    } finally java.nio.file.Files.delete(emptyDir)
  }
}

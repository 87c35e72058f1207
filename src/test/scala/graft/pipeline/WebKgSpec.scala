package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WebKgSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "the customer joins a part order", "en", "src0", 31L),
      (1L, "spark vector merge customer", "fr", "src0", 27L),
      (9L, "no title page text", "de", "src1", 18L),
      (10L, "dup page text spark", "en", "src1", 19L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("normalizeUrl: case/port/fragment/tracking normalization, conservative elsewhere") {
    import spark.implicits._
    val cases = Seq(
      // scheme+host case-folded, path case preserved
      "HTTPS://Host.Example.ORG/Doc/7" -> "https://host.example.org/Doc/7",
      // default ports dropped, non-default kept
      "http://h.org:80/p" -> "http://h.org/p",
      "https://h.org:443/p?q=1" -> "https://h.org/p?q=1",
      "http://h.org:8080/p" -> "http://h.org:8080/p",
      "https://h.org:443" -> "https://h.org",
      // fragment dropped
      "https://h.org/p#sec-2" -> "https://h.org/p",
      // tracking params stripped, kept params and their order preserved
      "https://h.org/p?utm_campaign=x&gclid=g1" -> "https://h.org/p",
      "https://h.org/p?id=7&utm_source=f&keep=1" -> "https://h.org/p?id=7&keep=1",
      "https://h.org/p?keep=1&utm_a=1&utm_b=2" -> "https://h.org/p?keep=1",
      // 'xgclid' is NOT a tracking param (prefix must follow ? or &)
      "https://h.org/p?xgclid=1" -> "https://h.org/p?xgclid=1",
      // literal '&' in the PATH is a valid path char — never touched
      // (the tracking strip and separator cleanup are query-scoped)
      "https://h.org/a&utm_source=x/p" -> "https://h.org/a&utm_source=x/p",
      "https://h.org/x&&y" -> "https://h.org/x&&y",
      // userinfo is case-SENSITIVE (RFC 3986 §3.2.1): preserved while the
      // host still folds, and the default port still strips behind it
      "https://TokenA@H.org/p" -> "https://TokenA@h.org/p",
      "https://U:Pw@h.org:443/p" -> "https://U:Pw@h.org/p",
      // non-URL strings pass through fully untouched (even # and ?)
      "not a url" -> "not a url",
      "no scheme?utm_a=1&&x#f" -> "no scheme?utm_a=1&&x#f")
    val got = cases.map(_._1).toDF("url")
      .select(WebKg.normalizeUrl(col("url"))).as[String].collect()
    for (((in, want), g) <- cases.zip(got)) assert(g == want, s"in=$in")
    // the fast-path guard is a pure performance branch: urls matching the
    // canonical shape must be FIXED POINTS of the full chain, so the
    // guarded and unguarded paths agree everywhere
    val full = cases.map(_._1).toDF("url")
      .select(WebKg.normalizeUrlFull(col("url"))).as[String].collect()
    for (((in, _), (g, f)) <- cases.zip(got.zip(full)))
      assert(g == f, s"guard/full divergence for in=$in")
  }

  test("extracted text is byte-identical per url (BASELINE invariant)") {
    val pages = WebKg.synthesizeWebPages(docs)
    val n = pages.select(
      sum(when(WebKg.extractedText === col("text"), 1).otherwise(0)).as("id"),
      count(lit(1)).as("all")).collect().head
    assert(n.getLong(0) == n.getLong(1))
  }

  test("title extraction: 10% of pages are title-less and emit no title triple") {
    val flat = WebKg.extractFlat(WebKg.synthesizeWebPages(docs))
    val titles = flat.filter(col("p") === WebKg.pTitle).collect()
    assert(titles.length == 3) // doc 9 has no title
    assert(!titles.map(_.getString(0)).exists(_.contains("/doc/9")))
  }

  test("re-crawl duplicates vanish after set-semantic dedup") {
    val withDups = WebKg.extractFlat(WebKg.synthesizeWebPages(docs, withDuplicates = true))
    val noDups = WebKg.extractFlat(WebKg.synthesizeWebPages(docs))
    assert(withDups.count() > noDups.count())
    assert(WebKg.dedupTriples(withDups).count() == noDups.count())
  }

  test("link objects are resolved absolute IRIs") {
    val flat = WebKg.extractFlat(WebKg.synthesizeWebPages(docs))
    val links = flat.filter(col("p") === WebKg.pLink).collect().map(_.getString(2))
    assert(links.nonEmpty)
    assert(links.forall(_.startsWith("https://src")))
    assert(links.forall(_.contains(".example.org/doc/")))
  }

  test("href-less pages emit NO links triple; typed/flat extraction parity") {
    import spark.implicits._
    // a page whose html has an EMPTY href: RFC 3986 resolves '' to the
    // base itself, which must not fabricate a self-link
    val pages = Seq(
      ("https://a.org/x", java.sql.Timestamp.valueOf("2025-01-01 00:00:00"),
        "<html><head><title>T</title></head><body><p>tx</p><a href=\"\">n</a></body></html>"
          .getBytes("UTF-8"), "tx", "en"))
      .toDF("url", "warc_ts", "html", "text", "lang")
    val flat = WebKg.extractFlat(pages)
    assert(flat.filter(col("p") === WebKg.pLink).count() == 0)
    // typed extraction emits the SAME statements as the flat projection
    // (incl. textSha), just typed — count parity on the synthetic corpus
    val p2 = WebKg.synthesizeWebPages(docs)
    assert(WebKg.extractTriples(p2).count() == WebKg.extractFlat(p2).count())
    // a null lang drops only its own statement, never a malformed term
    val nullLang = Seq(
      ("https://a.org/y", java.sql.Timestamp.valueOf("2025-01-01 00:00:00"),
        "<html><head><title>T</title></head><body><p>tx</p><a href=\"/z\">n</a></body></html>"
          .getBytes("UTF-8"), "tx", null))
      .toDF("url", "warc_ts", "html", "text", "lang")
    val typed = WebKg.extractTriples(nullLang)
    assert(typed.filter(col("o")("value").isNull).count() == 0)
    assert(typed.count() == WebKg.extractFlat(nullLang).count())
  }

  test("pageRank of an empty edge table is empty, not a crash") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(WebKg.pageRank(empty).count() == 0)
  }

  test("created literal is canonical xsd:dateTime UTC") {
    val flat = WebKg.extractFlat(WebKg.synthesizeWebPages(docs))
    val created = flat.filter(col("p") === WebKg.pCreated).collect().map(_.getString(2))
    assert(created.forall(_.matches("\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}Z")))
    assert(created.forall(c => graft.core.Xsd.canonicalDateTime(c).contains(c)))
  }

  test("entity linking finds dictionary mentions with counts") {
    val links = WebKg.entityLink(docs, WebKg.defaultDictionary).collect()
    val byKey = links.map(r => (r.getString(0), r.getString(2)) -> r.getLong(3)).toMap
    assert(byKey((WebKg.docNs + "0", WebKg.entityNs + "customer")) == 1L)
    assert(byKey((WebKg.docNs + "1", WebKg.entityNs + "spark")) == 1L)
    assert(!byKey.keySet.exists(_._2.endsWith("/supplier")))
  }

  test("two-stage fuzzy entity linking: exact surfaces always link at jac=1") {
    import spark.implicits._
    val fuzzyDocs = Seq(
      (0L, "the customer ordered a part", "en", "src0", 27L),
      (1L, "spark vector pipeline", "en", "src0", 21L),
      (2L, "nothing relevant here", "en", "src1", 21L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = WebKg.entityLinkFuzzy(fuzzyDocs, WebKg.defaultDictionary)
    val rows = out.collect().map(r =>
      (r.getString(0), r.getString(2), r.getLong(3), r.getDouble(4)))
    // identical shingle sets always survive blocking and score 1.0
    val exact = rows.filter(_._4 == 1.0).map(r => (r._1, r._2)).toSet
    assert(exact.contains((WebKg.docNs + "0", WebKg.entityNs + "customer")))
    assert(exact.contains((WebKg.docNs + "0", WebKg.entityNs + "part")))
    assert(exact.contains((WebKg.docNs + "1", WebKg.entityNs + "spark")))
    assert(exact.contains((WebKg.docNs + "1", WebKg.entityNs + "vector")))
    // every link clears the threshold; doc 2 links nothing
    assert(rows.forall(_._4 >= 0.5))
    assert(!rows.exists(_._1 == WebKg.docNs + "2"))
  }

  test("reachability BFS returns minimum depths") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L)).toDF("src", "dst")
    val r = WebKg.reachable(edges, 1L, 3).collect()
      .map(row => row.getLong(0) -> row.getInt(1)).toMap
    assert(r == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
  }

  test("fixed-point pagerank: hand-computed exact integer values") {
    import spark.implicits._
    // 0 -> {1, 2}, 1 -> 0, node 2 dangling (leaks mass in the simplified
    // formulation). n=3, scale=1e12: r0 = 333333333333 each,
    // base = 15e12 div 300 = 50000000000.
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 0L)).toDF("src", "dst")
    val r1 = WebKg.pageRank(edges, iterations = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // r1(0) = base + 85*333333333333 div 100 = 50e9 + 283333333333
    // r1(1) = r1(2) = base + 85*(333333333333 div 2) div 100
    assert(r1 == Map(
      0L -> 333333333333L, 1L -> 191666666666L, 2L -> 191666666666L))
    // two runs produce identical longs (order-independent integer sums)
    val r1b = WebKg.pageRank(edges, iterations = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == r1b)
    // more iterations keep total mass bounded by the scale (leak only)
    val r3 = WebKg.pageRank(edges, iterations = 3).collect().map(_.getLong(1))
    assert(r3.sum <= 1000000000000L && r3.forall(_ > 0))
  }

  test("reachability at depth 10+: deep chain converges, lineage stays flat") {
    import spark.implicits._
    // a 12-node chain plus two disconnected components; depth 10 must reach
    // node 10 and stop growing after the chain is exhausted (early exit)
    val chain = (0L until 12L).map(i => (i, i + 1))
    val other = Seq((100L, 101L), (200L, 201L))
    val edges = (chain ++ other).toDF("src", "dst")
    val r = WebKg.reachable(edges, 0L, 10).collect()
      .map(row => row.getLong(0) -> row.getInt(1)).toMap
    assert(r == (0L to 10L).map(i => i -> i.toInt).toMap)
    assert(!r.contains(100L) && !r.contains(200L))
  }
  test("big-dictionary fuzzy linking: shuffled plan, identical results") {
    import spark.implicits._
    val dictDf = WebKg.defaultDictionary.toDF("surface", "entity")
    // results identical across the two physical distributions
    val viaBroadcast = WebKg.entityLinkFuzzyDF(docs, dictDf, broadcastDict = true)
      .collect().map(_.toSeq).toSet
    val viaShuffle = WebKg.entityLinkFuzzyDF(docs, dictDf, broadcastDict = false)
      .collect().map(_.toSeq).toSet
    assert(viaBroadcast == viaShuffle && viaBroadcast.nonEmpty)
    // plan shape with auto-broadcast off (the 100 TB condition — a real
    // big dictionary exceeds any threshold): the broadcast path still
    // broadcasts EXPLICITLY, the big-dict path has ZERO BroadcastExchange
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def planOf(bcast: Boolean): String =
        WebKg.fuzzyScored(docs, dictDf, 0.5, broadcastDict = bcast,
          materialize = false).queryExecution.executedPlan.toString
      assert(planOf(true).contains("BroadcastExchange"))
      assert(!planOf(false).contains("BroadcastExchange"))
      assert(planOf(false).contains("SortMergeJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("fuzzy link bucket cap drops degenerate LSH buckets, keeps healthy ones") {
    import spark.implicits._
    // 70 DISTINCT tokens with the IDENTICAL shingle set {abc,bca,cab}:
    // every prefix of (abc)* with length >= 5. Identical shingle sets =>
    // identical minhash => one (band, sig) bucket per band holding all 70
    // vocabulary rows — the degenerate-vocabulary shape that made a
    // composed deployment run quadratic. Length 7 is EXCLUDED so no token
    // string-equals the dictionary surface "abcabca" (which would resolve
    // through the exact tier and never reach the fuzzy machinery).
    val abc = "abc" * 30
    val degenerate = (5 to 75).filter(_ != 7).map(abc.take)
    assert(degenerate.size == 70 && degenerate.distinct.size == 70)
    // doc 100 carries "xyzxyz": same shingle set as surface "xyzxyzx"
    // ({xyz,yzx,zxy}) => guaranteed same bands, Jaccard exactly 1 — a
    // healthy 1-token bucket that must keep linking under the cap
    val corpus = (degenerate.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      :+ (100L, "xyzxyz")).toDF("doc_id", "text")
    val dict = Seq(("abcabca", "http://graft.dev/entity/degen"),
      ("xyzxyzx", "http://graft.dev/entity/ok")).toDF("surface", "entity")
    val linked = WebKg.entityLinkFuzzyDF(corpus, dict).collect()
      .map(r => (r.getString(0), r.getString(2))).toSet
    // the 70-row bucket exceeds the 64 cap on BOTH bands and is dropped:
    // none of the degenerate tokens links (they carry no similarity
    // signal); the healthy token still resolves through its tiny bucket
    assert(linked == Set((WebKg.docNs + "100", "http://graft.dev/entity/ok")))
    // raising the cap above the bucket size restores the degenerate links
    // (jac = 1 on identical shingle sets) — the cap is what dropped them
    val uncapped = WebKg.entityLinkFuzzyDF(corpus, dict, bucketCap = 128)
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(uncapped.size == 71 &&
      uncapped.count(_._2.endsWith("/degen")) == 70)
  }

  test("domainStats aggregates reputation signals per host, hand-checked") {
    val pages = WebKg.synthesizeWebPages(docs, withDuplicates = true)
    val out = WebKg.domainStats(pages, maxDupRate = 0.4, minAvgTokens = 4.5)
      .collect().map(r => r.getAs[String]("domain") -> r).toMap
    // src0: doc 0 (6 tokens, duplicated) + doc 1 (4 tokens)
    val s0 = out("src0.example.org")
    assert(s0.getAs[Long]("n_pages") == 3 && s0.getAs[Long]("n_unique") == 2)
    assert(s0.getAs[Double]("dup_rate") == 0.333333)
    assert(s0.getAs[Double]("avg_tokens") == 5.333333)
    assert(s0.getAs[Double]("notitle_rate") == 0.0)
    assert(s0.getAs[Boolean]("keep")) // 0.333 <= 0.4, 5.33 >= 4.5
    // src1: doc 9 (4 tokens, TITLE-LESS) + doc 10 (4 tokens, duplicated)
    val s1 = out("src1.example.org")
    assert(s1.getAs[Long]("n_pages") == 3 && s1.getAs[Long]("n_unique") == 2)
    assert(s1.getAs[Double]("notitle_rate") == 0.333333)
    assert(!s1.getAs[Boolean]("keep")) // avg_tokens 4.0 < 4.5
    // scale shape: per-page signals reduce to (domain + numerics) BEFORE
    // the exchange — no html/text column crosses the shuffle
    val shuffleRows = WebKg.domainStats(pages).queryExecution.executedPlan
      .toString.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!shuffleRows.contains("html"), shuffleRows)
  }

  test("domainStats attributes path-less homepage URLs to their real host") {
    import spark.implicits._
    // link-canonicalized crawls commonly carry https://host with no
    // trailing slash — those pages must count toward their host, and only
    // scheme-less/non-http URLs fall into the '' unattributable group
    val pages = Seq(
      ("https://a.example.org", "homepage words one two three four five"),
      ("https://a.example.org/deep", "deep page words one two three four"),
      ("http://b.example.org", "b homepage words one two three four"),
      ("ftp://c.example.org/x", "not http so unattributable")
    ).toDF("url", "text")
      .withColumn("html", concat(lit("<html><title>t</title>"), col("text"), lit("</html>")))
    val out = WebKg.domainStats(pages)
      .collect().map(r => r.getAs[String]("domain") -> r.getAs[Long]("n_pages")).toMap
    assert(out == Map("a.example.org" -> 2L, "b.example.org" -> 1L, "" -> 1L), out)
  }

  test("latestSnapshot keeps exactly the newest crawl per url") {
    import spark.implicits._
    val pages = Seq(
      ("https://a.example.org/1", "2025-01-01 00:00:00", "old content"),
      ("https://a.example.org/1", "2025-01-02 00:00:00", "new content"),
      ("https://a.example.org/2", "2025-01-01 00:00:00", "only version"))
      .toDF("url", "ts", "text")
      .select(col("url"), col("ts").cast("timestamp").as("warc_ts"),
        col("text").cast("binary").as("html"), col("text"), lit("en").as("lang"))
    val out = WebKg.latestSnapshot(pages).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(out == Map(
      "https://a.example.org/1" -> "new content",
      "https://a.example.org/2" -> "only version"))
    // identical re-crawl duplicates (same ts, same bytes) collapse to one
    val dup = WebKg.latestSnapshot(WebKg.synthesizeWebPages(docs, withDuplicates = true))
    assert(dup.count() == docs.count())
    assert(dup.groupBy("url").count().filter(col("count") > 1).isEmpty)
  }

}

package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DictSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def flat = {
    import spark.implicits._
    Seq(
      ("https://a.example.org/doc/1", "http://graft.dev/vocab#lang", "en"),
      ("https://a.example.org/doc/1", "http://graft.dev/vocab#title", "Doc 1"),
      ("https://a.example.org/doc/2", "http://graft.dev/vocab#lang", "en"),
      ("https://b.example.org/doc/3", "http://graft.dev/vocab#lang", "fr"),
      // an object that is also a subject: the dictionary stores it ONCE
      ("https://b.example.org/doc/3", "http://graft.dev/vocab#links",
        "https://a.example.org/doc/1")
    ).toDF("s", "p", "o")
  }

  test("ids: column twin equals Scala twin; 16 bytes; dict is distinct-per-term") {
    val withId = flat.select(col("s"), Dict.termIdCol(col("s")).as("id")).collect()
    for (r <- withId) {
      val id = r.getAs[Array[Byte]]("id")
      assert(id.length === 16)
      assert(id.toSeq === Dict.termIdBytes(r.getString(0)).toSeq)
    }
    val dict = Dict.termDictionary(flat)
    val terms = dict.collect().map(_.getAs[String]("term"))
    // 3 subjects + 3 predicates + 4 distinct objects, the shared
    // subject/object url counted once
    assert(terms.length === terms.distinct.length)
    assert(terms.toSet.size === 9)
  }

  test("encodeFlat is a pure projection: no Exchange, no Join in the plan") {
    val plan = Dict.encodeFlat(flat).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("decode(encode) round-trips byte-identically") {
    val back = Dict.decodeFlat(Dict.encodeFlat(flat), Dict.termDictionary(flat))
      .select("s", "p", "o").collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val src = flat.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(back.sorted.toSeq === src.sorted.toSeq)
  }

  test("encoded store: schema is id-only, lookup decodes identically to the plain store") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dict").toString
    val buckets = 4
    val lineage = Dict.materializeEncoded(flat, s"$dir/enc", buckets, "b1")
    assert(lineage.agg(sum("n_triples")).collect()(0).getLong(0) === 5L)
    Materialize.materialize(flat, s"$dir/plain", buckets, "b1")

    // the encoded data files carry ONLY fixed-width ids (plus the bucket
    // partition column) — no term strings at rest outside the dictionary
    val encData = spark.read.parquet(s"$dir/enc/data")
    assert(encData.schema.fields.map(f => (f.name, f.dataType.typeName)).toSet ===
      Set(("s_id", "binary"), ("p_id", "binary"), ("o_id", "binary"),
        ("bucket", "integer")))

    for (subject <- Seq("https://a.example.org/doc/1", "https://b.example.org/doc/3")) {
      val enc = Dict.lookupSubjectEncoded(spark, s"$dir/enc", subject, buckets)
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      val plain = Materialize.lookupSubject(spark, s"$dir/plain", subject, buckets)
        .select("s", "p", "o")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      assert(enc.sorted.toSeq === plain.sorted.toSeq)
      assert(enc.nonEmpty)
    }
  }

  test("resume: lineage-recorded buckets are skipped; the dictionary is append-only " +
    "and never orphans earlier batches' ids") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dict_res").toString
    val buckets = 4
    Dict.materializeEncoded(flat, s"$dir/enc", buckets, "b1")
    val firstBuckets = Materialize.readLineage(spark, s"$dir/enc").get.count()
    // a second call over the same corpus writes NO new data buckets and
    // leaves the dictionary complete (the delta is empty)
    val second = Dict.materializeEncoded(flat, s"$dir/enc", buckets, "b2")
    assert(second.count() === 0L)
    assert(Materialize.readLineage(spark, s"$dir/enc").get.count() === firstBuckets)
    assert(spark.read.parquet(s"$dir/enc/dict").count() === 9L)
    // REGRESSION (review finding): a later run over a refreshed corpus with
    // NEW terms must EXTEND the dictionary, not rebuild it from the new
    // corpus alone — an overwrite would delete the rows for terms only the
    // kept data buckets still reference, silently dropping their triples
    // from every subsequent decode
    val refreshed = Seq(
      ("https://c.example.org/doc/9", "http://graft.dev/vocab#lang", "es"))
      .toDF("s", "p", "o")
    Dict.materializeEncoded(refreshed, s"$dir/enc", buckets, "b3")
    val terms = spark.read.parquet(s"$dir/enc/dict")
      .collect().map(_.getAs[String]("term")).toSet
    assert(terms.contains("https://a.example.org/doc/1")) // batch-1 term kept
    assert(terms.contains("es")) // new term appended
    assert(terms.size === 11) // 9 + the 2 genuinely-new (url, "es")
    // a batch-1 subject still decodes completely
    val lookup = Dict.lookupSubjectEncoded(spark, s"$dir/enc",
      "https://a.example.org/doc/1", buckets).collect()
    assert(lookup.length === 2)
  }

  test("bgpEncoded: id-space join chain + late decode match the direct answer") {
    import Dict.{FConst, FPattern, FVar}
    val dict = Dict.termDictionary(flat)
    val enc = Dict.encodeFlat(flat)
    // { ?d :lang "en" . ?d :title ?t } — doc/1 is the only en doc with a title
    val r = Dict.bgpEncoded(enc, dict, Seq(
      FPattern(FVar("d"), FConst("http://graft.dev/vocab#lang"), FConst("en")),
      FPattern(FVar("d"), FConst("http://graft.dev/vocab#title"), FVar("t"))),
      project = Seq("d", "t"))
    assert(r.columns.toSeq === Seq("d", "t"))
    assert(r.collect().map(x => (x.getString(0), x.getString(1))).toSet ===
      Set(("https://a.example.org/doc/1", "Doc 1")))

    // join var ?d NOT projected: solution decodes only ?t — exactly one
    // dictionary-side scan in the plan (late materialization)
    val tOnly = Dict.bgpEncoded(enc, dict, Seq(
      FPattern(FVar("d"), FConst("http://graft.dev/vocab#lang"), FConst("en")),
      FPattern(FVar("d"), FConst("http://graft.dev/vocab#title"), FVar("t"))),
      project = Seq("t"))
    assert(tOnly.collect().map(_.getString(0)).toSeq === Seq("Doc 1"))

    // repeated variable inside one pattern: self-equality in id space
    val self = Dict.bgpEncoded(enc, dict, Seq(
      FPattern(FVar("x"), FConst("http://graft.dev/vocab#links"), FVar("x"))),
      project = Seq("x"))
    assert(self.collect().isEmpty)

    // cross-product shape: a fully-bound existence pattern gates the other
    val gated = Dict.bgpEncoded(enc, dict, Seq(
      FPattern(FConst("https://b.example.org/doc/3"),
        FConst("http://graft.dev/vocab#lang"), FConst("fr")),
      FPattern(FVar("d"), FConst("http://graft.dev/vocab#title"), FVar("t"))),
      project = Seq("d"))
    assert(gated.collect().map(_.getString(0)).toSeq ===
      Seq("https://a.example.org/doc/1"))

    // a projected var the patterns never bind is rejected
    val err = intercept[IllegalArgumentException] {
      Dict.bgpEncoded(enc, dict,
        Seq(FPattern(FVar("d"), FConst("p"), FConst("o"))), Seq("nope"))
    }
    assert(err.getMessage.contains("nope"))
  }

  test("bgpEncoded over a store: bound subject prunes to one bucket partition") {
    import Dict.{FConst, FPattern, FVar}
    val dir = java.nio.file.Files.createTempDirectory("graft_dict_bgp").toString
    val buckets = 4
    Dict.materializeEncoded(flat, s"$dir/enc", buckets, "b1")
    val subject = "https://a.example.org/doc/1"
    val q = Dict.queryStoreEncoded(spark, s"$dir/enc",
      Seq(FPattern(FConst(subject), FVar("p"), FVar("o"))),
      project = Seq("p", "o"), numBuckets = buckets)
    assert(q.collect().map(r => (r.getString(0), r.getString(1))).toSet === Set(
      ("http://graft.dev/vocab#lang", "en"),
      ("http://graft.dev/vocab#title", "Doc 1")))
    // the DATA scan (binary id schema) must carry the bucket partition
    // filter of the bound subject — one partition read, not all four.
    // The production path checkpoints the solution (its executed plan
    // starts at an ExistingRDD stub), so assert on the single-phase shape,
    // whose join chain is identical up to the decode edge.
    val b = Materialize.bucketOf(subject, buckets)
    val lazyQ = Dict.bgpEncoded(spark.read.parquet(s"$dir/enc/data"),
      spark.read.parquet(s"$dir/enc/dict"),
      Seq(FPattern(FConst(subject), FVar("p"), FVar("o"))),
      project = Seq("p", "o"), numBuckets = Some(buckets),
      materialize = false)
    val plan = lazyQ.queryExecution.executedPlan.toString
    val pruned = raw"PartitionFilters: \[[^\]]*\(bucket#\d+ = $b\)".r
    assert(pruned.findFirstIn(plan).isDefined, plan)
  }

  test("dict-table bucket parity: every stored dictionary row sits in bucketOfId(id)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dict_bk").toString
    Dict.materializeEncoded(flat, s"$dir/enc", 4, "b1")
    val rows = spark.read.parquet(s"$dir/enc/dict")
      .select("bucket", "id").collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getInt(0) === Dict.bucketOfId(r.getAs[Array[Byte]]("id"), 4))
  }
}

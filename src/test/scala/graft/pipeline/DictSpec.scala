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

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.WebKg

class PipelineMainSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("PipelineMain runs the full job end-to-end and is resumable") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pm").toString
    val docs = Seq(
      (0L, "alpha beta gamma", "en", "src0", 16L),
      (1L, "delta epsilon zeta", "fr", "src1", 18L),
      (2L, "eta theta iota", "de", "src0", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    WebKg.synthesizeWebPages(docs, withDuplicates = true)
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
  }
}

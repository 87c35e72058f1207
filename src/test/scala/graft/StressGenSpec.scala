package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The stress-table generators must produce exactly the structures the
  * BENCH.md deployment numbers are described against — cluster geometry,
  * dictionary size/determinism — or the recorded runs stop being
  * reproducible. */
class StressGenSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]").appName("stressgen-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("ndDense: 8 pages per cluster, 12/14 within-cluster Jaccard, drop=7/8") {
    val pages = StressGen.ndDense(spark, 6)
    assert(pages.count() == 48)
    // unique urls; text = 13 tokens
    assert(pages.select("url").distinct().count() == 48)
    assert(pages.select(size(split(col("text"), " ")).as("n"))
      .filter(col("n") =!= 13).isEmpty)
    // the near-dedup stage keeps exactly one representative per cluster
    val pd = pages.select(xxhash64(col("url")).as("doc_id"),
      lit("web").as("source"), col("text"))
    val dropped = graft.ops.Dedup.nearDupDropIds(pd).count()
    assert(dropped == 42, s"expected 42 = 6 clusters x 7 dropped, got $dropped")
  }

  test("dictionary: exact size, deterministic, pads never match tokens") {
    val pages = StressGen.ndDense(spark, 4)
    // vocabulary: 4*12 shared + 32 member tokens = 80 distinct (len>=3
    // filter keeps all: shortest is 'm0'... actually 'm0' is len 2 — the
    // member tokens for doc_id < 10 fall below the length filter, which is
    // fine: the filter is part of the contract)
    val d = StressGen.dictionary(pages, 100)
    assert(d.count() == 100)
    assert(d.select("surface").distinct().count() == 100)
    // deterministic across invocations
    val again = StressGen.dictionary(pages, 100)
    assert(d.exceptAll(again).isEmpty && again.exceptAll(d).isEmpty)
    // pad surfaces contain a space -> can never equal a whitespace token
    val realToks = pages.select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) >= 3).distinct()
    val pads = d.filter(col("surface").startsWith("pad "))
    assert(pads.join(realToks, col("surface") === col("w")).isEmpty)
    // a size below the vocabulary uses only real tokens
    val small = StressGen.dictionary(pages, 10)
    assert(small.filter(col("surface").startsWith("pad ")).isEmpty)
    assert(small.count() == 10)
  }
}

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

  test("mirror: over-cap identical clusters dedup to one keeper via star pairs") {
    // 3 clusters x 70 byte-identical pages: 70 > the LSH bucket cap (64),
    // so every band bucket overflows and the dedup must flow through
    // minhashLshPairs' star branch — the pre-fix wholesale bucket drop
    // would have kept all 210 copies
    val pages = StressGen.mirror(spark, 3, 70)
    assert(pages.count() == 210)
    assert(pages.select("url").distinct().count() == 210)
    // within a cluster the TEXT is byte-identical, urls differ
    assert(pages.select(md5(col("text")).as("h")).distinct().count() == 3)
    val pd = pages.select(xxhash64(col("url")).as("doc_id"),
      lit("web").as("source"), col("text"))
    val dropped = graft.ops.Dedup.nearDupDropIds(pd).count()
    assert(dropped == 207, s"expected 207 = 3 clusters x 69 dropped, got $dropped")
    // under the cap the same geometry still drops copies-1 per cluster
    val small = StressGen.mirror(spark, 2, 8)
    val pdS = small.select(xxhash64(col("url")).as("doc_id"),
      lit("web").as("source"), col("text"))
    assert(graft.ops.Dedup.nearDupDropIds(pdS).count() == 14)
  }

  test("sfReplicate: k-fold facts, intra-replica joins, near-dup texts") {
    val out = java.nio.file.Files.createTempDirectory("sfrep").toString
    StressGen.sfReplicate(spark, "/root/testdata/sf0.001", out, 3)
    def t(n: String) = spark.read.parquet(s"$out/$n.parquet")
    def src(n: String) = spark.read.parquet(s"/root/testdata/sf0.001/$n.parquet")
    // facts k-fold, dimensions unchanged
    assert(t("lineitem").count() == 3 * src("lineitem").count())
    assert(t("documents").count() == 3 * src("documents").count())
    assert(t("nation").count() == src("nation").count())
    // intra-replica join structure preserved: every lineitem still finds
    // its order, and the join cardinality is exactly k x the source's
    val joined = t("lineitem").join(t("orders"),
      col("l_orderkey") === col("o_orderkey")).count()
    val srcJoined = src("lineitem").join(src("orders"),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(joined == 3 * srcJoined)
    // replica 0 byte-identical; replicas 1..k-1 get distinct suffix tokens
    val d = t("documents")
    assert(d.filter(col("doc_id") < 100000000L).exceptAll(src("documents")).isEmpty)
    assert(d.filter(col("doc_id") >= 100000000L)
      .filter(!col("text").rlike(" rep[12]$")).isEmpty)
    // n_chars recomputed for suffixed replicas
    assert(d.filter(length(col("text")) =!= col("n_chars")).isEmpty)
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

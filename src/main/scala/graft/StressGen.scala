package graft

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.WebKg

/** Deterministic generators for the deployment-scale stress tables the
  * BENCH.md PipelineMain runs use — checked in so every recorded number is
  * reproducible from the repo (the tables themselves are multi-GB and live
  * in /tmp). All three are pure Column pipelines seeded from the driver's
  * sf parquet (or from `spark.range` alone), byte-deterministic across
  * runs and engines; no external data.
  *
  *   runMain graft.StressGen pages   <sfDir> <out> [k=512]
  *   runMain graft.StressGen nddense <out> [clusters=320000]
  *   runMain graft.StressGen dict    <pagesDir> <out> [n=300000]
  *
  * - `pages`: the 2.56M-page re-crawl table (sf0.1 documents x k via
  *   [[WebKg.replicateDocs]] -> [[WebKg.synthesizeWebPages]] with ~10%
  *   duplicate re-crawls) behind the "End-to-end deployment job" numbers.
  * - `nddense`: the near-dup-DENSE table behind the `--near-dedup` numbers:
  *   `clusters` clusters of 8 pages; each page carries the cluster's 12
  *   shared tokens plus 1 member-unique token, so within-cluster n-gram
  *   Jaccard is 12/14 = 0.857 (above the 0.8 default threshold) and
  *   cross-cluster overlap is zero — the stage must drop exactly 7/8.
  * - `dict`: an entity dictionary drawn from a page table's OWN token
  *   space: the n distinct text tokens (len >= 3) with the smallest md5,
  *   padded with never-matching synthetic surfaces if the corpus
  *   vocabulary is smaller than n — so a chosen n above the broadcast cap
  *   exercises the big-dict shuffled linking plan against surfaces that
  *   really occur.
  */
object StressGen {
  def main(args: Array[String]): Unit = {
    val spark = BenchSession.local(32, "stressgen", shufflePartitions = 32)
    args.toList match {
      case "pages" :: sfDir :: out :: rest =>
        val k = rest.headOption.map(_.toInt).getOrElse(512)
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        write(WebKg.synthesizeWebPages(
          WebKg.replicateDocs(docs, k), withDuplicates = true), out)
      case "nddense" :: out :: rest =>
        val clusters = rest.headOption.map(_.toLong).getOrElse(320000L)
        write(ndDense(spark, clusters), out)
      case "mirror" :: out :: rest =>
        val clusters = rest.headOption.map(_.toLong).getOrElse(20000L)
        val copies = rest.drop(1).headOption.map(_.toInt).getOrElse(100)
        write(mirror(spark, clusters, copies), out)
      case "dict" :: pagesDir :: out :: rest =>
        val n = rest.headOption.map(_.toInt).getOrElse(300000)
        write(dictionary(spark.read.parquet(pagesDir), n), out)
      case "sf1" :: sfDir :: out :: rest =>
        val k = rest.headOption.map(_.toInt).getOrElse(10)
        sfReplicate(spark, sfDir, out, k)
      case other =>
        sys.error(s"usage: StressGen pages <sfDir> <out> [k] | " +
          s"nddense <out> [clusters] | mirror <out> [clusters] [copies] | " +
          s"dict <pagesDir> <out> [n] | " +
          s"sf1 <sfDir> <out> [k] — got: " +
          other.mkString(" "))
    }
    spark.stop()
  }

  private def write(df: DataFrame, out: String): Unit = {
    df.write.mode(SaveMode.Overwrite).parquet(out)
    println(s"STRESSGEN wrote $out")
  }

  /** `clusters` x 8 near-dup pages: 12 cluster-shared tokens + 1
    * member-unique token each, synthesized into the standard page shape
    * (html/title/href) by [[WebKg.synthesizeWebPages]]. */
  private[graft] def ndDense(spark: SparkSession, clusters: Long): DataFrame = {
    val parts = math.max(spark.sparkContext.defaultParallelism * 3, 4)
    val docs = spark.range(0, clusters * 8, 1, parts)
      .select(col("id").as("doc_id"), (col("id") / 8).cast("long").as("cluster"))
      .select(col("doc_id"),
        concat_ws(" ",
          ((0 until 12).map(j => concat(lit("t"), col("cluster"), lit(s"x$j")))
            :+ concat(lit("m"), col("doc_id"))): _*).as("text"),
        lit("en").as("lang"),
        concat(lit("d"), pmod(col("cluster"), lit(1000))).as("source"))
      .withColumn("n_chars", length(col("text")))
    WebKg.synthesizeWebPages(docs)
  }

  /** `clusters` x `copies` BYTE-IDENTICAL pages across distinct urls —
    * the mirror-farm shape (hot footers, license boilerplate, outright
    * site mirrors). Every copy of a cluster produces the same minhash
    * signature, so with `copies` above the LSH bucket cap (64) each band
    * bucket overflows and [[graft.ops.Dedup.minhashLshPairs]] takes its
    * STAR branch (linear pairs around the bucket-min id) instead of the
    * quadratic within-bucket join — the densest-cluster path that a
    * wholesale bucket drop would have exempted from dedup entirely.
    * Cross-cluster token overlap is zero, so the expected drop is exactly
    * `copies - 1` per cluster. */
  private[graft] def mirror(spark: SparkSession, clusters: Long,
                            copies: Int): DataFrame = {
    val parts = math.max(spark.sparkContext.defaultParallelism * 3, 4)
    val docs = spark.range(0, clusters * copies, 1, parts)
      .select(col("id").as("doc_id"),
        (col("id") / copies).cast("long").as("cluster"))
      .select(col("doc_id"),
        concat_ws(" ",
          (0 until 12).map(j => concat(lit("t"), col("cluster"), lit(s"x$j"))): _*)
          .as("text"),
        lit("en").as("lang"),
        concat(lit("d"), pmod(col("cluster"), lit(1000))).as("source"))
      .withColumn("n_chars", length(col("text")))
    WebKg.synthesizeWebPages(docs)
  }

  /** The sfN stress star schema behind BENCH.md's "sf1 stress sweep":
    * fact tables replicated k× from the source sf dir, dimensions copied
    * unchanged. Replica keys shift by a fixed 1e8 stride (every source id
    * is far below it), and join keys that must stay INTRA-replica
    * (l_orderkey <-> o_orderkey) shift together, so per-replica join
    * structure is preserved while dimension fan-in and group densities
    * grow k×. Replica texts (documents) get a distinct ` repI` suffix
    * token — the corpus becomes near-dup-DENSE (each doc gains k-1
    * deliberate near-duplicates), not degenerate exact-dup; replica 0
    * stays byte-identical to the source. Embedding vectors replicate
    * as-is (exact-dup-dense by design for the embed family). All pure
    * Column pipelines — byte-deterministic across runs. */
  private[graft] def sfReplicate(spark: SparkSession, sfDir: String,
                                 out: String, k: Int): Unit = {
    val stride = 100000000L
    def replicate(name: String)(shift: DataFrame => DataFrame): Unit = {
      val src = spark.read.parquet(s"$sfDir/$name.parquet")
      val reps = src.crossJoin(broadcast(
        spark.range(0, k, 1, 1).select(col("id").as("__rep"))))
      write(shift(reps).drop("__rep"), s"$out/$name.parquet")
    }
    def bump(c: String): Column = col(c) + col("__rep") * stride
    replicate("lineitem")(_.withColumn("l_orderkey", bump("l_orderkey")))
    replicate("orders")(_.withColumn("o_orderkey", bump("o_orderkey")))
    replicate("events")(_.withColumn("event_id", bump("event_id")))
    replicate("documents")(_
      .withColumn("doc_id", bump("doc_id"))
      .withColumn("text", when(col("__rep") === 0, col("text"))
        .otherwise(concat(col("text"), lit(" rep"), col("__rep"))))
      .withColumn("n_chars", length(col("text")).cast("long")))
    replicate("embeddings")(_.withColumn("vec_id", bump("vec_id")))
    Seq("region", "nation", "customer", "supplier", "part").foreach { d =>
      write(spark.read.parquet(s"$sfDir/$d.parquet"), s"$out/$d.parquet")
    }
  }

  /** n-surface (surface, entity) dictionary from the page table's token
    * space, deterministic by md5 order; synthetic pad surfaces carry a
    * space so they can never equal a whitespace-split corpus token. */
  private[graft] def dictionary(pages: DataFrame, n: Int): DataFrame = {
    val spark = pages.sparkSession
    val real = pages.select(explode(split(col("text"), "\\s+")).as("surface"))
      .filter(length(col("surface")) >= 3)
      .distinct()
      .orderBy(md5(col("surface")))
      .limit(n)
    val pad = spark.range(0, n.toLong, 1,
        math.max(spark.sparkContext.defaultParallelism, 2))
      .select(concat(lit("pad surface "), col("id")).as("surface"))
    // union keeps the first n by md5 order: real tokens sort before pads
    // deterministically via the rank column, not engine union order
    real.withColumn("rank", lit(0))
      .unionByName(pad.withColumn("rank", lit(1)))
      .orderBy(col("rank"), md5(col("surface")))
      .limit(n)
      .select(col("surface"),
        concat(lit("http://graft.dev/entity/"),
          substring(md5(col("surface")), 1, 16)).as("entity"))
  }
}

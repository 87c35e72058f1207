package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.pipeline.Materialize

/** Diagnostic (round 5, VERDICT #9): does a skewed-subject table produce
  * writer stragglers in the materialize shape, and does AQE
  * rebalance-with-skew-split fix it?
  *
  * `Materialize.materialize` repartitions on `bucket` alone, so one hot
  * bucket = ONE writer task. Subject-hash bucketing spreads distinct
  * subjects uniformly — a hot bucket therefore only arises when a SINGLE
  * subject carries a disproportionate share of all triples (a hub page
  * with millions of statements). This probe builds exactly that table
  * (hotFrac of all triples on one subject) and times two write shapes:
  *
  *   repartition  — repartition(bucket) + sortWithinPartitions (the
  *                  pre-r5 shape)
  *   rebalance    — REBALANCE(bucket) hint + sortWithinPartitions: AQE
  *                  splits oversized shuffle partitions into several
  *                  writer tasks (multiple sorted files in the hot
  *                  bucket's directory) and coalesces small ones. This
  *                  measurement made it the SHIPPED materialize shape
  *                  (Materialize.scala; under the library's persist the
  *                  split additionally needs
  *                  canChangeCachedPlanOutputPartitioning=true, which
  *                  materialize sets and restores — GraphsSpec asserts
  *                  the split fires through the real path)
  *
  *   runMain graft.SkewProbe [rows] [hotFrac] [buckets]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val hotFrac = args.lift(1).map(_.toDouble).getOrElse(0.25)
    val buckets = args.lift(2).map(_.toInt).getOrElse(64)
    val spark = BenchSession.local(32, "skewprobe", shufflePartitions = 64)
    spark.sparkContext.setLogLevel("ERROR")

    // hotFrac of all triples share ONE subject; the rest spread over
    // rows/10 distinct subjects. Deterministic, no data files needed.
    val triples = spark.range(rows).select(
      when(col("id") % 1000 < (hotFrac * 1000).toInt, lit("https://hub.example.org/page"))
        .otherwise(concat(lit("https://cold.example.org/p/"), col("id") % (rows / 10)))
        .as("s"),
      concat(lit("http://graft.dev/vocab#p"), col("id") % 7).as("p"),
      concat(lit("\"v"), col("id"), lit("\"")).as("o"))

    def timeWrite(label: String, shape: DataFrame => DataFrame): Unit = {
      val dir = java.nio.file.Files.createTempDirectory("graft_skew").toString
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      val bucketed = triples.withColumn("bucket", Materialize.bucketCol(buckets))
      val t0 = System.nanoTime()
      shape(bucketed).write.mode(SaveMode.Overwrite)
        .partitionBy("bucket").parquet(s"$dir/data")
      val sec = (System.nanoTime() - t0) / 1e9
      val files = new java.io.File(s"$dir/data").listFiles().filter(_.isDirectory)
        .map(d => d.listFiles().count(_.getName.endsWith(".parquet")))
      println(f"SKEW $label%-12s $sec%7.2f s  files/bucket min=${files.min}%d max=${files.max}%d")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }

    // warm-up (codegen+JIT) then two timed rounds each, interleaved
    timeWrite("warmup", df => df.repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("s")))
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
    for (_ <- 1 to 2) {
      timeWrite("repartition", df => df.repartition(col("bucket"))
        .sortWithinPartitions(col("bucket"), col("s")))
      timeWrite("rebalance", df => df.hint("rebalance", col("bucket"))
        .sortWithinPartitions(col("bucket"), col("s")))
      timeWrite("rebal-nosort", df => df.hint("rebalance", col("bucket")))
    }
    spark.stop()
  }
}

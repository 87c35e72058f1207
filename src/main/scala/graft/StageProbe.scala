package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.WebKg

/** Diagnostic: decompose the KG scaling job to find which stage stops
  * scaling — map-only extraction vs the dedup shuffle vs the count.
  *   runMain graft.StageProbe [cores...]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val coreList = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(2, 8)
    val k = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPLICATION", "512").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (cores <- coreList) {
      val spark = BenchSession.local(cores, s"stageprobe-$cores",
        shufflePartitions = cores * 2, minPartitionNum = Some(cores))
      val docs = WebKg.replicateDocs(
        spark.read.parquet(s"$sfDir/documents.parquet"), k)
      def time(label: String)(body: => Long): Unit = {
        for (i <- 1 to 3) {
          val t0 = System.nanoTime()
          val n = body
          println(f"STAGE cores=$cores $label%-12s run=$i n=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
        }
      }
      val pages = WebKg.synthesizeWebPages(docs, withDuplicates = true)
      time("synth") { pages.select(count(length(col("html")))).head.getLong(0) }
      time("extract") { WebKg.extractFlat(pages).select(count(lit(1))).head.getLong(0) }
      time("full") { WebKg.dedupTriples(WebKg.extractFlat(pages)).count() }
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }
}

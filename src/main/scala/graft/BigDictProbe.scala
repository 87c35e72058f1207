package graft

import org.apache.spark.sql.functions._
import graft.pipeline.WebKg

/** Diagnostic (round 6): the EXACT bigdict_link block of Bench — 100k
  * synthetic surfaces through the shuffled (non-broadcast) fuzzy link —
  * repeated N times on one session so the steady-state cost of the
  * big-dictionary plan is measurable apart from the full bench run.
  *   sbt "runMain graft.BigDictProbe [repeats=3] [sfDir]"
  */
object BigDictProbe {
  def main(args: Array[String]): Unit = {
    val repeats = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = BenchSession.local(32, "bigdictprobe",
      shufflePartitions = 64, minPartitionNum = Some(32))
    val dict = spark.range(100000L).select(
      substring(md5(concat(lit("dict:"), col("id"))), 1, 8).as("surface"),
      concat(lit(WebKg.entityNs), col("id")).as("entity"))
    for (i <- 1 to repeats) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val s0 = HostPhase.snap()
      val t0 = System.nanoTime()
      val n = WebKg.entityLinkFuzzyDF(
        spark.read.parquet(s"$sfDir/documents.parquet"), dict,
        broadcastDict = false).count()
      val steal = HostPhase.stealShare(s0, HostPhase.snap())
      println(f"BIGDICT run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"rows=$n steal ${steal * 100}%.0f%%")
    }
    spark.stop()
  }
}

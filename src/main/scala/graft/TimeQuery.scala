package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time one registry query N times on one session.
  *   sbt "runMain graft.TimeQuery <name> [repeats=3] [sfDir] [cores=32]"
  * Prints per-run seconds (run 1 includes codegen/JIT warm-up) and the
  * final ADAPTIVE plan (what actually executed, incl. ReusedExchange /
  * cached stages — the static Explain dump can't show those).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("dedup_minhash_lsh")
    val repeats = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = args.lift(2).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cores = args.lift(3).map(_.toInt).getOrElse(32)
    val spark = BenchSession.local(cores, s"timequery-$cores",
      shufflePartitions = cores)
    val fn = SparkEntry.queries(name)
    // per-run GC time + persisted-RDD census: when repeats swing without
    // host load, these attribute the swing (collector pressure vs cache
    // accumulation vs genuinely slower execution)
    import scala.jdk.CollectionConverters._
    def gcMillis: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    var last: org.apache.spark.sql.DataFrame = null
    for (i <- 1 to repeats) {
      // drop blocks retained by the PREVIOUS run (cached plans and
      // localCheckpoint-backed results alike), so each repeat is
      // independent and the census printed below shows exactly what THIS
      // run left behind — within-run accumulation still shows as a
      // census > the operator's designed block count
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val (t0, g0, s0) = (System.nanoTime(), gcMillis, HostPhase.snap())
      last = fn(spark, sfDir)
      val n = last.count()
      val steal = HostPhase.stealShare(s0, HostPhase.snap())
      val cached = spark.sparkContext.getPersistentRDDs.size
      println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s " +
        f"($n rows, gc ${(gcMillis - g0) / 1e3}%.1f s, " +
        f"steal ${steal * 100}%.0f%%, $cached cached RDDs)")
    }
    // collect() executes THIS DataFrame's QueryExecution (count() builds a
    // fresh one), so the dumped adaptive plan is the final executed one —
    // ReusedQueryStage nodes and all
    last.collect()
    val planTxt = last.queryExecution.executedPlan.toString
    val out = s"/tmp/plan_$name.txt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), planTxt)
    val scans = planTxt.linesIterator.count(_.contains("FileScan parquet"))
    val reused = planTxt.linesIterator.count(l =>
      l.contains("ReusedExchange") || l.contains("ReusedQueryStage"))
    println(s"executed plan: $scans FileScan, $reused reused-exchange nodes -> $out")
    spark.stop()
  }
}

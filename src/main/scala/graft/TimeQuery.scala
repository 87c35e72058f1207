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
    var last: org.apache.spark.sql.DataFrame = null
    for (i <- 1 to repeats) {
      val t0 = System.nanoTime()
      last = fn(spark, sfDir)
      val n = last.count()
      println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
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

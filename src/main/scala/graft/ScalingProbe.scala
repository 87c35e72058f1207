package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.WebKg

/** Diagnostic: run the KG scaling job repeatedly at several parallelism
  * levels, printing every run — exposes variance (GC, page cache, spill).
  *   sbt "runMain graft.ScalingProbe 8 32" [k]
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val coreList = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(8, 32)
    val k = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPLICATION", "512").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (cores <- coreList) {
      val spark = BenchSession.local(cores, s"probe-$cores",
        shufflePartitions = cores * 2, minPartitionNum = Some(cores))
      val docs = WebKg.replicateDocs(
        spark.read.parquet(s"$sfDir/documents.parquet"), k)
      for (i <- 1 to 5) {
        val rt = Runtime.getRuntime
        val memBefore = (rt.totalMemory - rt.freeMemory) / (1 << 20)
        val t0 = System.nanoTime()
        val n = WebKg.dedupTriples(
          WebKg.extractFlat(WebKg.synthesizeWebPages(docs, withDuplicates = true))).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"PROBE cores=$cores run=$i triples=$n sec=$dt%.2f tps=${(n / dt).toLong} heapMB=$memBefore")
      }
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      System.gc()
    }
  }
}

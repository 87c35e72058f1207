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
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"probe-$cores")
        .config("spark.sql.shuffle.partitions", cores * 2)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", cores)
      // Tungsten off-heap: hash-agg/shuffle pages out of the GC heap — a
      // 32-thread dedup otherwise drowns in multi-second young collections
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "24g")
      // shuffle on tmpfs: isolates core-count scaling from the microVM's
      // virtio-disk writeback jitter (a real cluster has per-node NVMe)
      .config("spark.local.dir", "/dev/shm/graft-spark")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
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

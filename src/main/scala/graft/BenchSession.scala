package graft

import org.apache.spark.sql.SparkSession

/** THE bench/probe session shape, in one place (Bench, ScalingProbe,
  * StageProbe, TimeQuery, PipeProbe previously each carried their own
  * copy — a missed tuning edit would silently benchmark under different
  * memory settings): Tungsten off-heap so hash-agg/shuffle pages stay out
  * of the GC heap, shuffle on tmpfs to isolate core-count scaling from
  * virtio-disk writeback jitter, AQE with a floor that keeps coalescing
  * from dropping below the core count, UTC, UI off. See BENCH.md. */
object BenchSession {
  def local(cores: Int, appName: String,
            shufflePartitions: Int,
            minPartitionNum: Option[Int] = None): SparkSession = {
    var b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "24g")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    minPartitionNum.foreach { n =>
      b = b.config("spark.sql.adaptive.coalescePartitions.minPartitionNum", n)
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

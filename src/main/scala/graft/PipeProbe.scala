package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.WebKg

/** Stage decomposition of the PipelineMain path over a REAL page table
  * (where StageProbe decomposes the in-memory synthetic job): times the
  * cumulative prefixes scan -> snapshot -> extract -> dedup so the cost of
  * each stage is the delta between lines.
  *   sbt "runMain graft.PipeProbe <pages-parquet-dir> [cores=32]"
  */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val pages = args.headOption.getOrElse("/tmp/stress_pages.parquet")
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = BenchSession.local(cores, s"pipeprobe-$cores",
      shufflePartitions = cores)
    def time(name: String)(mk: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = mk
      println(f"PIPEPROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n%d")
    }
    val p = spark.read.parquet(pages)
    time("scan(count-only)") { p.count() }
    time("scan+decode(html bytes)") {
      p.agg(coalesce(sum(length(col("html"))), lit(0L))).head().getLong(0)
    }
    time("scan+snapshot") { WebKg.latestSnapshot(p).count() }
    time("scan+extract(no snapshot)") { WebKg.extractFlat(p).count() }
    time("scan+snapshot+extract") {
      WebKg.extractFlat(WebKg.latestSnapshot(p)).count()
    }
    time("scan+snap(pruned)+extract") {
      WebKg.extractFlat(WebKg.latestSnapshot(
        p.select("url", "warc_ts", "html", "lang"))).count()
    }
    time("scan+snap+extract+dedup") {
      WebKg.dedupTriples(WebKg.extractFlat(WebKg.latestSnapshot(p))).count()
    }
    spark.stop()
  }
}

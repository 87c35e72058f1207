package graft

import org.apache.spark.sql.functions._
import graft.pipeline.WebKg

/** Diagnostic (round 5): decompose the deployment link stage over the
  * 2.56M-page stress table — where do the ~330s go? Cumulative prefixes:
  * tokenize+distinct, exact join, exact resolve agg, full link.
  *   runMain graft.LinkProbe [pages] [dict]
  */
object LinkProbe {
  def main(args: Array[String]): Unit = {
    val pages = args.headOption.getOrElse("/tmp/stress_pages.parquet")
    val dictPath = args.lift(1).getOrElse("/tmp/stress_dict.parquet")
    val spark = BenchSession.local(32, "linkprobe", shufflePartitions = 64)
    val docs = WebKg.latestSnapshot(
        spark.read.parquet(pages).select("url", "warc_ts", "html", "lang"))
      .select(col("url").as("doc_id"), WebKg.extractedText.as("text"))
      .persist()
    val dict = spark.read.parquet(dictPath).select("surface", "entity")
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"LINK $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n%d")
    }
    time("snapshot+text(persist)") { docs.count() }
    val tok = docs.select(col("doc_id"), explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) >= 3).distinct()
    time("tok distinct") { tok.count() }
    val exact = tok.join(dict.hint("shuffle_merge"), col("w") === col("surface"))
    time("exact join") { exact.count() }
    time("exact resolve agg") {
      exact.groupBy("doc_id", "w").agg(min("entity")).count()
    }
    time("residual anti") {
      tok.join(dict.select("surface").distinct().hint("shuffle_merge"),
        col("w") === col("surface"), "left_anti").count()
    }
    time("full link") {
      WebKg.entityLinkFuzzyDF(docs, dict, broadcastDict = false,
        subjectOf = identity).count()
    }
    spark.stop()
  }
}

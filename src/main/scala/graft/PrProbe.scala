package graft

import graft.pipeline.WebKg

/** Diagnostic (round 5): time graph_pagerank's warm steady-state phases at
  * sf0.1. The round-4 shape (contribution join + transpose agg + dangling
  * outer join) cost ~0.43s/round at sf0.1 in stage latency alone; the
  * fused shape (zeros unioned into the agg, constant round 1) is what
  * pageRank now implements — keep this probe calling the REAL operator so
  * it can't drift from the implementation.
  *   runMain graft.PrProbe [repeats=4] [sfDir]
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val repeats = args.headOption.map(_.toInt).getOrElse(4)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = BenchSession.local(32, "prprobe", shufflePartitions = 32)
    for (i <- 1 to repeats) {
      def time[A](label: String)(body: => A): A = {
        val t0 = System.nanoTime()
        val r = body
        println(f"PR run=$i $label%-10s sec=${(System.nanoTime() - t0) / 1e9}%.3f")
        r
      }
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val edges = time("docEdges") { WebKg.docEdges(docs) } // includes docs.count
      val ranks = time("pageRank") { WebKg.pageRank(edges, iterations = 3) }
      time("count") { ranks.count() }
    }
    spark.stop()
  }
}

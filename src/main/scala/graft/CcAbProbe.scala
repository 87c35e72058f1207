package graft
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, GraphAlgos}

/** Diagnostic (round 6): intra-JVM A/B of connectedComponents round-1
  * structure — the library operator vs an inline variant (init frame
  * eagerly checkpointed vs recomputed through round-2 exchange reuse) —
  * over the verified near-dup pair graph of either a pages table or a
  * documents table. The measurement that decided the init-checkpoint
  * shape kept in GraphAlgos (see OPTIMIZATION_r06.md §1b).
  *   runMain graft.CcAbProbe [pagesOrDocumentsParquet]
  */
object CcAbProbe {
  def main(args: Array[String]): Unit = {
    val pages = args.headOption.getOrElse("/tmp/nd_pages80k.parquet")
    val spark = BenchSession.local(32, "ccab", shufflePartitions = 64,
      minPartitionNum = Some(32))
    val pd = if (pages.endsWith("documents.parquet"))
      spark.read.parquet(pages).select(col("doc_id"), col("source"), col("text"))
    else {
      val snap = graft.pipeline.WebKg.latestSnapshot(
        spark.read.parquet(pages).select("url", "warc_ts", "html", "lang"))
      snap.select(xxhash64(col("url")).as("doc_id"),
        lit("web").as("source"), graft.pipeline.WebKg.extractedText.as("text"))
    }
    val pairs = Dedup.ngramJaccardPairs(pd).persist()
    println("pairs=" + pairs.count())
    val edges = pairs.select(col("d1").as("a"), col("d2").as("b"))
    // B = the REJECTED variant: init frame NOT checkpointed, round 2
    // re-derives it through exchange reuse (the library keeps the
    // checkpointed shape — this inline copy preserves the A/B)
    def ccInitNoCkpt(): Long = {
      val sym = edges.select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      val und = sym.unionAll(sym.select(col("b").as("a"), col("a").as("b")))
        .filter(col("a").isNotNull && col("b").isNotNull)
        .repartition(col("b")).persist()
      var live: DataFrame = null
      var comp = und.groupBy(col("a").as("id")).agg(min(col("b")).as("nb"))
        .select(col("id"), least(col("id"), col("nb")).as("component"))
      var i = 1; var converged = false
      while (i < 20 && !converged) {
        val neighborMin = und
          .join(comp.select(col("id").as("b_id"), col("component").as("b_c")), col("b") === col("b_id"))
          .groupBy(col("a").as("id")).agg(min(col("b_c")).as("nc"))
        val hop = comp.join(neighborMin, Seq("id"), "left")
          .select(col("id"), col("component"),
            when(col("nc").isNotNull, least(col("component"), col("nc")))
              .otherwise(col("component")).as("newComp"))
          .localCheckpoint()
        converged = hop.filter(col("newComp") =!= col("component")).isEmpty
        if (converged) { if (live ne null) GraphAlgos.releaseLocalCheckpoint(live); live = hop; comp = hop.select(col("id"), col("component")) }
        else {
          var cur = hop.select(col("id"), col("newComp").as("component"))
          var prev: DataFrame = hop
          for (_ <- 1 to 2) {
            val reps = cur.select(col("id").as("r_id"), col("component").as("r_c"))
            val nxt = cur.join(reps, cur("component") === reps("r_id"), "left")
              .select(cur("id").as("id"),
                when(col("r_c").isNotNull, least(cur("component"), col("r_c")))
                  .otherwise(cur("component")).as("component"))
              .localCheckpoint()
            GraphAlgos.releaseLocalCheckpoint(prev); prev = nxt; cur = nxt
          }
          if (live ne null) GraphAlgos.releaseLocalCheckpoint(live); live = cur; comp = cur
        }
        i += 1
      }
      und.unpersist()
      val n = comp.count()
      GraphAlgos.releaseLocalCheckpoint(live)
      n
    }
    for (i <- 1 to 3) {
      var t0 = System.nanoTime()
      val nA = GraphAlgos.connectedComponents(edges, dedupEdges = false).count()
      println(f"CCAB current  run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$nA")
      spark.sparkContext.getPersistentRDDs.values.foreach(r => if (r.id > pairs.rdd.id) r.unpersist(true))
      t0 = System.nanoTime()
      val nB = ccInitNoCkpt()
      println(f"CCAB noinitck run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$nB")
      spark.sparkContext.getPersistentRDDs.values.foreach(r => if (r.id > pairs.rdd.id) r.unpersist(true))
    }
    spark.stop()
  }
}

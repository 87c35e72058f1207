package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic distributed graph algorithms over long-id edge frames.
  *
  * The engine already runs min-label propagation over STRING-labeled bnode
  * co-occurrence edges (`engine.Graphs.bnodeComponents`, the RDFC grouping
  * step); this is the same pointer-doubled shape over arbitrary long-id
  * edges — the primitive behind near-dup cluster resolution
  * ([[Dedup.nearDupClusters]]) and link-graph componentization.
  */
object GraphAlgos {

  /** Shared plan-build-time guard: the named columns must already be an
    * integral type. A string id would `cast("long")` to null and be
    * silently filtered/mis-grouped downstream — an empty-looking result,
    * not an error — so every long-id entry point ([[connectedComponents]],
    * [[Dedup.nearDupClusters]]/`nearDupDropIds`) rejects here with the
    * same accepted-type list instead of each hand-rolling its own. */
  private[ops] def requireIntegral(df: DataFrame, cols: Seq[String],
                                   context: String): Unit = {
    import org.apache.spark.sql.types._
    for (c <- cols) {
      val dt = df.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"$context: column '$c' must be an integral type (got $dt) — " +
          "map string ids to longs first (e.g. xxhash64)")
    }
  }

  /** Release the executor storage behind a `localCheckpoint()`ed frame.
    * localCheckpoint persists the frame's RDD (that IS the mechanism) but
    * Dataset exposes no release API, so an iterative algorithm that
    * checkpoints per round leaks every superseded round's blocks into the
    * session — harmless for one call, but a long-lived session (or a
    * benchmark loop) accumulates them until the storage region squeezes
    * execution memory (measured: dedup_clusters repeats degrading
    * 95s -> 216s at sf1 before this release existed). The checkpointed
    * plan is a single LogicalRDD leaf holding the persisted RDD —
    * unpersist it directly. Safe ONLY once every frame derived from the
    * checkpoint has itself been materialized.
    *
    * PUBLIC because the same applies to the RESULT of an iterative
    * operator: `connectedComponents`' returned frame is backed by its
    * final round's checkpoint (one vertex-scale block per call, by
    * design — it IS the result's storage). A long-lived session making
    * many clustering calls should release each result after consuming
    * it; otherwise the blocks accumulate one per call. */
  def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Connected components via iterative min-label propagation with POINTER
    * DOUBLING over an undirected edge frame.
    *
    * Input: `edges` with two long columns `a`, `b` (one row per edge, either
    * direction; both directions or duplicates are fine — the symmetrized
    * edge set is deduped once). Output: `(id, component)` for every vertex
    * appearing in an edge, where `component` is the MINIMUM vertex id of the
    * component — a deterministic, engine-independent representative.
    * Isolated vertices never appear in an edge frame; callers that need
    * singleton clusters coalesce them back (see [[Dedup.nearDupClusters]]).
    *
    * Scale shape (the [[graft.engine.Graphs.bnodeComponents]] recipe): the
    * symmetrized edge set is cached once; each round is one shuffled
    * equi-join + one min-aggregation (neighbor minimum) followed by the
    * pointer-doubling shortcut join (adopt the component of my component),
    * so labels chase 2^i-hop representatives and a chain of diameter D
    * converges in O(log D) rounds — `maxIter`=20 covers diameters to ~2^20.
    * Every round's label frame is `localCheckpoint`ed: round i is one join
    * over materialized labels, not a replay of rounds 1..i-1, and the
    * convergence probe reads the materialized frame. Non-convergence
    * THROWS — a silently split component would merge/drop the wrong
    * downstream rows (e.g. keep two representatives of one dup cluster). */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // vertex ids must already be integral: a string id would cast("long")
    // to null and be FILTERED — every edge silently dropped, an empty
    // (not wrong-looking) component frame. Reject at plan-build time.
    requireIntegral(edges, Seq("a", "b"), "connectedComponents")
    val sym = edges.select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
    val und = sym.unionAll(sym.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .distinct().persist()
    // `live` tracks the checkpoint backing the CURRENT comp frame; each
    // round's eager checkpoints supersede the previous round's, whose
    // blocks are released immediately (see releaseLocalCheckpoint) — at
    // any moment the algorithm holds at most two rounds' worth of
    // vertex-scale storage, independent of round count.
    var live = und.select(col("a").as("id")).distinct()
      .withColumn("component", col("id")).localCheckpoint()
    var comp = live
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      val neighborMin = und
        .join(comp.select(col("id").as("b_id"), col("component").as("b_c")),
          col("b") === col("b_id"))
        .groupBy(col("a").as("id")).agg(min(col("b_c")).as("nc"))
      val hop = comp.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("component"),
          when(col("nc").isNotNull, least(col("component"), col("nc")))
            .otherwise(col("component")).as("newComp"))
        .localCheckpoint()
      val reps = hop.select(col("id").as("r_id"), col("newComp").as("r_c"))
      val next = hop.join(reps, hop("newComp") === reps("r_id"), "left")
        .select(hop("id").as("id"), hop("component").as("component"),
          when(col("r_c").isNotNull, least(hop("newComp"), col("r_c")))
            .otherwise(hop("newComp")).as("newComp"))
        .localCheckpoint()
      // next is materialized (localCheckpoint is eager): the previous
      // round's checkpoint and this round's intermediate hop are dead
      releaseLocalCheckpoint(live); releaseLocalCheckpoint(hop)
      live = next
      converged = next.filter(col("newComp") =!= col("component")).isEmpty
      comp = next.select(col("id"), col("newComp").as("component"))
      i += 1
    }
    und.unpersist()
    if (!converged) {
      // no frame is returned on this path, so the caller can never free
      // the final round's checkpoint — release it before throwing
      releaseLocalCheckpoint(live)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIter rounds — " +
          "with pointer doubling that is a component diameter beyond " +
          "~2^maxIter, i.e. a pathological input; raise maxIter if truly needed")
    }
    comp
  }
}

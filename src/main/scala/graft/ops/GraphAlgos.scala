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
    * symmetrized edge set is cached once (deduped only when `dedupEdges` —
    * min propagation is idempotent under duplicates, so callers with
    * unique-by-construction edges skip that shuffle); round 1 is a single
    * min-aggregation over the edges (labels start at vertex ids, so the
    * neighbor minimum needs no join yet); each later round is one shuffled
    * equi-join + one min-aggregation (neighbor minimum) followed — only
    * when labels still changed — by two pointer-doubling shortcut joins
    * (adopt the component of my component, twice), so labels chase
    * multi-hop representatives and a chain of diameter D converges in
    * O(log D) rounds — `maxIter`=20 covers any realistic diameter.
    * Every round's label frame is `localCheckpoint`ed: round i is one join
    * over materialized labels, not a replay of rounds 1..i-1, and the
    * convergence probe reads the materialized frame. Non-convergence
    * THROWS — a silently split component would merge/drop the wrong
    * downstream rows (e.g. keep two representatives of one dup cluster). */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20,
                          dedupEdges: Boolean = true): DataFrame = {
    // vertex ids must already be integral: a string id would cast("long")
    // to null and be FILTERED — every edge silently dropped, an empty
    // (not wrong-looking) component frame. Reject at plan-build time.
    requireIntegral(edges, Seq("a", "b"), "connectedComponents")
    val sym = edges.select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
    // `dedupEdges = false` skips the symmetrized-set distinct (a full edge
    // shuffle): min-label propagation is IDEMPOTENT under duplicate edges
    // (min over a multiset equals min over its set), so callers whose edge
    // frame is unique by construction (the verified near-dup pairs are
    // strictly d1 < d2 distinct) pay only join fan-out, and zero when
    // there are in fact no duplicates.
    val und0 = sym.unionAll(sym.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a").isNotNull && col("b").isNotNull)
    // cache the symmetrized edges HASH-PARTITIONED BY b: every round's
    // neighbor-min join probes them on b, and without the explicit
    // repartition the cached partitioning is the upstream scan's/union's —
    // each round would re-shuffle the whole edge set (the dominant
    // per-round cost at scale); with it only the vertex-scale label frame
    // moves per round (guide §2.4). The round-1 aggregation still pays its
    // own exchange on a — one edge shuffle total either way, paid once.
    val und = (if (dedupEdges) und0.distinct() else und0)
      .repartition(col("b")).persist()
    // ROUND 1 IS A PLAIN AGGREGATION, not a join: with component0(v) = v,
    // the neighbor minimum is just min(b) per a, so the first label frame
    // is least(id, min-neighbor) in ONE shuffle — this replaces both the
    // vertex-set distinct (same exchange key) and round 1's edge⋈label
    // join of the generic loop. For the star/clique-shaped components the
    // LSH->verify pipeline produces this single aggregation already IS the
    // fixed point, and the loop below only runs the confirming round.
    //
    // `live` tracks the checkpoint backing the CURRENT comp frame; each
    // round's eager checkpoints supersede the previous round's, whose
    // blocks are released immediately (see releaseLocalCheckpoint) — at
    // any moment the algorithm holds at most two rounds' worth of
    // vertex-scale storage, independent of round count.
    //
    // The init frame IS eagerly checkpointed: round 2 references it twice
    // (join probe + left base), and an intra-JVM A/B on both the sparse
    // chain graph (sf0.1 near-dups) and a dense 640k-vertex cluster graph
    // measured the checkpoint equal-or-faster than relying on exchange
    // reuse inside round 2's plan (2.10 vs 2.26 s sparse, 4.39 vs 4.97 s
    // dense, warm) — the reused exchange still pays a second aggregation
    // read where the checkpoint pays one narrow cached scan.
    var live = und.groupBy(col("a").as("id")).agg(min(col("b")).as("nb"))
      .select(col("id"), least(col("id"), col("nb")).as("component"))
      .localCheckpoint()
    var comp = live
    var i = 1 // round 1 = the init aggregation above
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
      // convergence is decided on the PROPAGATION step alone (hop), before
      // paying the pointer-doubling join: a stable hop (no label changed
      // under min-over-neighbors) is the fixed point by definition, and
      // the doubling shortcut can never change a fixed point — so the
      // final confirming round costs one join, not three.
      converged = hop.filter(col("newComp") =!= col("component")).isEmpty
      if (converged) {
        releaseLocalCheckpoint(live)
        live = hop
        comp = hop.select(col("id"), col("component"))
      } else {
        // pointer doubling, TWICE per round: each shortcut join replaces a
        // label by its label's label, so two applications chase 4-hop
        // representatives per propagation round instead of 2 — measured
        // one fewer full (edge-join) round on the near-dup chain graphs at
        // sf0.1 for the cost of one extra vertex-scale self-join, and a
        // deep-chain worst case converges in ~log4 instead of ~log2
        // rounds. Labels only ever move down within the component, so any
        // number of doubling steps preserves the invariant.
        var cur = hop.select(col("id"), col("newComp").as("component"))
        var prev: DataFrame = hop
        for (_ <- 1 to 2) {
          val reps = cur.select(col("id").as("r_id"), col("component").as("r_c"))
          val next = cur.join(reps, cur("component") === reps("r_id"), "left")
            .select(cur("id").as("id"),
              when(col("r_c").isNotNull, least(cur("component"), col("r_c")))
                .otherwise(cur("component")).as("component"))
            .localCheckpoint()
          // next is materialized (localCheckpoint is eager): the frame it
          // was derived from is dead
          releaseLocalCheckpoint(prev)
          prev = next
          cur = next
        }
        releaseLocalCheckpoint(live)
        live = cur
        comp = cur
      }
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

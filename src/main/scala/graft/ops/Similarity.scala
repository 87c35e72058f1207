package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * - `bruteForceTopK`: exact cosine top-k — broadcast the (small) query set
  *   against the full corpus; one narrow pass + a per-query top-k window.
  *   The dot product is `zip_with` + `aggregate` (codegen'd, no UDF).
  * - `lshBucketedTopK`: the scale path — sign-bit LSH against deterministic
  *   pseudo-hyperplanes buckets the corpus so each query only scans its
  *   bucket; turns the all-pairs scan into an equi-join on bucket keys.
  */
object Similarity {

  /** Sequential-fold dot product in double precision (deterministic order,
    * cross-engine reproducible). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine from PRECOMPUTED norms: dot and norm are CodegenFallback HOF
    * folds, so the inline [[cosine]] re-folds both norms per candidate
    * pair — three full-vector passes where one suffices. Each op below
    * computes one norm column per SIDE (corpus-scale, once) and scores
    * pairs with a single dot. Same doubles, same fold order, so the
    * rounded scores are bit-identical to the inline form. */
  private def cosinePre(d: Column, n1: Column, n2: Column): Column =
    d / (n1 * n2)

  /** The multi-probe LSH bucket set: the exact bucket plus every
    * Hamming-1 neighbor when `probeHamming = 1` — ONE definition shared
    * by the near-dup and top-k paths (two drifting copies would give the
    * two paths different recall semantics). Only radius 0/1 is
    * implemented; a larger radius silently degrading to 1 would overstate
    * recall. */
  private def probeBuckets(b0: Column, nPlanes: Int,
                           probeHamming: Int): Seq[Column] = {
    require(probeHamming >= 0 && probeHamming <= 1,
      s"probeHamming must be 0 or 1 (got $probeHamming)")
    b0 +: (if (probeHamming >= 1)
      (0 until nPlanes).map(i => b0.bitwiseXOR(lit(1 << i)))
    else Nil)
  }

  /** Exact top-k by cosine for each query vector. Queries are expected to be
    * a small set (gets broadcast). Output: (qid, vec_id, cos) with cos
    * rounded for stable ranking. */
  def bruteForceTopK(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"),
      norm(col("embedding")).as("__nq"))
    val c = embeddings.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("__nc"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        round(cosinePre(dot(col("qe"), col("embedding")),
          col("__nq"), col("__nc")), 4).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  /** Deterministic pseudo-hyperplane weight for (plane k, dimension i):
    * integer in [-6, 6] from a fixed linear congruence — reproducible with
    * no stored model. Modulus 13 (PRIME > the default 8 planes), not 7:
    * under mod 7 the coefficients collapse (31 ≡ 17 ≡ 3), making plane k
    * IDENTICAL to plane k+7 — with 8 planes, bucket bit 7 always equalled
    * bit 0, so two of the Hamming-1 probes addressed buckets no vector
    * can occupy and sign-flips across plane 0 were never probe-reachable. */
  private def planeWeight(k: Int, i: Column): Column =
    pmod(i * 31 + lit(k * 17 + 7), lit(13)) - 6

  /** Sign-bit bucket id over `nPlanes` pseudo-hyperplanes. */
  def lshBucket(e: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { k =>
      val proj = aggregate(
        zip_with(e, sequence(lit(0), size(e) - 1),
          (x, i) => x.cast("double") * planeWeight(k, i).cast("double")),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1 << k)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Embedding-cosine NEAR-DUP pairs, exact: all (v1 < v2) pairs with
    * cosine >= `threshold`. This is the correctness BASELINE for the
    * embedding-dedup family (quadratic in corpus size — verification scale
    * only); [[lshNearDupPairs]] is the blocked scale path, and the two are
    * compared in SimilaritySpec. Output: (d1, d2, cos). */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val a = embeddings.select(col("vec_id").as("d1"), col("embedding").as("e1"),
      norm(col("embedding")).as("__n1"))
    val b = embeddings.select(col("vec_id").as("d2"), col("embedding").as("e2"),
      norm(col("embedding")).as("__n2"))
    a.crossJoin(b).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        round(cosinePre(dot(col("e1"), col("e2")),
          col("__n1"), col("__n2")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Embedding-cosine near-dup pairs, BLOCKED (the 100 TB path): pairs are
    * generated only within an LSH sign-bit bucket (plus Hamming-1 probe
    * buckets when `probeHamming=1`), then exact-cosine verified — the
    * standard block→verify plan, an equi-join on bucket keys instead of an
    * all-pairs product. Near-dups whose bucket signatures differ in more
    * than `probeHamming` bits are missed (the recall/cost trade; recall
    * vs [[cosineNearDupPairs]] is asserted in SimilaritySpec). */
  def lshNearDupPairs(embeddings: DataFrame, threshold: Double,
                      nPlanes: Int = 8, probeHamming: Int = 1,
                      materialize: Boolean = true): DataFrame = {
    // `c` (scan + nPlanes-projection) feeds BOTH self-join sides, and the
    // left side's probe explode makes its exchange non-identical, so
    // ReuseExchange cannot dedup it the way it does in minhashLshPairs.
    // Same cache lifecycle as Dedup.ngramJaccardNearDups: persist the
    // corpus-scale bucketed frame only while the verify join materializes
    // (eager localCheckpoint of the RESULT-scale pair frame), then release
    // — one corpus pass, and the returned frame references only the small
    // checkpoint, never the cache. `materialize = false` skips both and
    // returns the full lazy plan (the plan-inspection hook).
    val c0 = embeddings.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("__n"),
      lshBucket(col("embedding"), nPlanes).as("b0"))
    val c = if (materialize) c0.persist() else c0
    // probe expansion on ONE side only: pairing (x in bucket b) with
    // (y in b XOR bit) covers the Hamming-1 case once per pair
    val left = c.select(col("vec_id").as("d1"), col("embedding").as("e1"),
      col("__n").as("__n1"),
      explode(array(probeBuckets(col("b0"), nPlanes, probeHamming): _*))
        .as("bucket"))
    val right = c.select(col("vec_id").as("d2"), col("embedding").as("e2"),
      col("__n").as("__n2"), col("b0").as("bucket"))
    val pairs0 = left.join(right, Seq("bucket"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        round(cosinePre(dot(col("e1"), col("e2")),
          col("__n1"), col("__n2")), 4).as("cos"))
      .filter(col("cos") >= threshold)
      .dropDuplicates("d1", "d2")
    if (!materialize) pairs0
    else {
      val pairs = pairs0.localCheckpoint() // eager: runs the verify ONCE
      c.unpersist()
      pairs
    }
  }

  /** IVF (inverted-file) approximate top-k — the second classic ANN
    * layout next to LSH: the corpus is partitioned into `nLists` cells by
    * nearest centroid, and each query scans only its `nProbe` nearest
    * cells. Centroids are picked deterministically from the corpus (the
    * `nLists` smallest vec_ids — a reproducible stand-in for a k-means
    * codebook; swap in trained centroids without touching the plan).
    * Plan shape at corpus scale: centroids are tiny and broadcast both
    * times; cell assignment is one narrow pass (and would be precomputed
    * and STORED as a partition column in a real deployment, turning the
    * probe into partition pruning); the probe is an equi-join on cell ids.
    * Output: (qid, vec_id, cos), approximate — recall asserted in
    * SimilaritySpec. */
  def ivfTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
              nLists: Int = 8, nProbe: Int = 2): DataFrame = {
    val cents = embeddings.orderBy("vec_id").limit(nLists)
      .select(col("vec_id").as("cent_seed"), col("embedding").as("ce"),
        norm(col("embedding")).as("__cn"))
      // global window is intentional and BOUNDED: it numbers the nLists
      // centroid rows (codebook scale, never the corpus) — the one place
      // the "no partition defined" warning is correct to ignore
      .withColumn("cell", row_number().over(Window.orderBy("cent_seed")) - 1)
      .drop("cent_seed")
    def nearestCells(df: DataFrame, idCol: String, eCol: String,
                     nCol: String, n: Int): DataFrame = {
      // round the cell-ranking cosine to 6 dp: engine-level FP summation-
      // order differences (~1e-12) near a cell-assignment tie must not be
      // able to flip the rank-1 cell between this plan and a recomputing
      // oracle — ties at 6 dp break deterministically on cell id
      val scored = df.crossJoin(broadcast(cents))
        .select(col(idCol), col(eCol), col(nCol), col("cell"),
          round(cosinePre(dot(col(eCol), col("ce")),
            col(nCol), col("__cn")), 6).as("__cs"))
      val w = Window.partitionBy(idCol).orderBy(col("__cs").desc, col("cell"))
      scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= n)
        .drop("__rn", "__cs")
    }
    val assigned = nearestCells(
      embeddings.select(col("vec_id"), col("embedding"),
        norm(col("embedding")).as("__n")), "vec_id", "embedding", "__n", 1)
    val probed = nearestCells(
      queries.select(col("vec_id").as("qid"), col("embedding").as("qe"),
        norm(col("embedding")).as("__nq")), "qid", "qe", "__nq", nProbe)
    val scored = assigned.join(broadcast(probed), "cell")
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        round(cosinePre(dot(col("qe"), col("embedding")),
          col("__nq"), col("__n")), 4).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket.
    * Same output shape as bruteForceTopK (may miss true neighbors — that is
    * the recall/cost trade). `probeHamming=1` turns on multi-probe: each
    * query additionally scans every bucket whose id differs in one sign
    * bit — the standard fix for single-probe recall collapse at higher
    * dimensions. Cost model at corpus scale: the corpus stays bucketed
    * once; only the (small, broadcast) query side fans out ×(nPlanes+1),
    * so the join stays an equi-join on bucket keys. */
  def lshBucketedTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
                      nPlanes: Int = 8, probeHamming: Int = 0): DataFrame = {
    val c = embeddings.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("__nc"),
      lshBucket(col("embedding"), nPlanes).as("bucket"))
    val q0 = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"),
      norm(col("embedding")).as("__nq"),
      lshBucket(col("embedding"), nPlanes).as("b0"))
    val q = q0.select(col("qid"), col("qe"), col("__nq"),
      explode(array(probeBuckets(col("b0"), nPlanes, probeHamming): _*))
        .as("bucket"))
    val scored = c.join(broadcast(q), "bucket")
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        round(cosinePre(dot(col("qe"), col("embedding")),
          col("__nq"), col("__nc")), 4).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }
}

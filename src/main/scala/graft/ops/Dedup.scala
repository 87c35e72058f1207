package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for web-scale corpora: exact, MinHash+LSH, SimHash,
  * and n-gram Jaccard. All are shuffle-on-key plans: the only wide
  * operations are hash aggregations on (doc/band/token) keys and an
  * equi-join on LSH bucket keys, so they scale linearly with executors —
  * there is never an all-pairs comparison without a blocking key.
  *
  * Hash primitive is md5-hex (cross-engine reproducible); minima over hex
  * strings use lexicographic order, which every engine agrees on for ASCII.
  */
object Dedup {

  /** Exact dedup: group identical texts, keep the minimum doc_id.
    * Output: (h, n, keeper). The classic hash-groupBy with map-side partial
    * aggregation; at 100 TB this is one shuffle on a 128-bit key. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))

  /** (doc_id, source, w) exploded distinct-token relation. */
  private def tokenRelation(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      explode(TextOps.distinctTokens(col("text"))).as("w"))

  /** One keyed 60-bit hash as a LONG: the top 15 hex digits of
    * md5("<i>:<token>") — numerically identical in DuckDB as
    * CAST('0x'||substr(md5(..),1,15) AS BIGINT), so the whole LSH layout
    * stays oracle-reproducible. */
  private def keyedHash(i: Int, c: Column): Column =
    conv(substring(md5(concat(lit(s"$i:"), c)), 1, 15), 16, 10).cast("long")

  /** MinHash signatures: `numHashes` min-of-keyed-hash values per doc.
    * One aggregation over the exploded token relation. Signatures are
    * LONGS, not md5 hex strings: mins over fixed-width longs run in a
    * mutable-buffer HashAggregate (map-side combine, codegen) instead of a
    * SortAggregate over strings, and the shuffle carries 8 bytes per hash
    * instead of 32. */
  def minhashSignatures(docs: DataFrame, numHashes: Int): DataFrame = {
    val tok = tokenRelation(docs)
    val aggs = (0 until numHashes).map(i => min(keyedHash(i, col("w"))).as(s"s$i"))
    tok.groupBy(col("doc_id"), col("source")).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-row minhash signature as an ARRAY column — the same values
    * `minhashSignatures` computes by aggregating the exploded token
    * relation, produced row-locally instead. This is the form the
    * STREAMING path needs: a pre-shuffle aggregation would be a second
    * stateful operator, while this is a pure projection. (Batch keeps the
    * explode+groupBy form: for long documents the per-row transform
    * materializes numHashes × |tokens| values per row at once, where the
    * aggregate streams them.) */
  def rowMinhashSignature(text: Column, numHashes: Int): Column = {
    // bind the distinct-token array ONCE per row (single-element transform
    // wrapper): higher-order functions are CodegenFallback, so each of the
    // numHashes lanes would otherwise re-evaluate the tokenize+distinct
    // expression interpreted — numHashes regex splits per row (and
    // numHashes^2 when a caller also inlines this expression per band;
    // see the wordNgrams fix, BENCH.md, for the measured cost of this
    // pathology class)
    val lanes = transform(array(TextOps.distinctTokens(text)), toks =>
      array((0 until numHashes).map(i =>
        array_min(transform(toks, w => keyedHash(i, w)))): _*))
    element_at(lanes, 1)
  }

  /** "|"-delimited concat that PROPAGATES null (concat_ws would skip null
    * elements, turning a null signature into md5("") and pooling every
    * null-text doc into one shared bucket): any null minhash nulls the
    * band signature, and the explode drops it. The delimiter prevents
    * digit-boundary collisions of undelimited decimal concat ((1,23) vs
    * (12,3)). */
  private def delimitedSig(parts: Seq[Column]): Column =
    md5(concat(parts.head +: parts.tail.flatMap(p => Seq(lit("|"), p)): _*))

  /** LSH band structs `(band, sig)` for a row-signature array, identical
    * band signatures to `minhashLshPairs`. */
  def bandStructs(sig: Column, numHashes: Int, rowsPerBand: Int): Column = {
    require(numHashes % rowsPerBand == 0)
    val nBands = numHashes / rowsPerBand
    array((0 until nBands).map { b =>
      val s = delimitedSig((0 until rowsPerBand).map(r =>
        element_at(sig, b * rowsPerBand + r + 1).cast("string")))
      struct(lit(b).as("band"), s.as("sig"))
    }: _*)
  }

  /** LSH candidate PAIRS: `numHashes` minhashes grouped into bands of
    * `rowsPerBand`; docs sharing a (blocking key, band, band-signature)
    * bucket become candidate pairs (d1 < d2, distinct).
    *
    * `source` doubles as the blocking key so bucket joins stay bounded per
    * block — at web scale the block is the domain/shard, exactly the salted
    * bucketing of the north star. `bucketCap` bounds the self-join: one
    * hot bucket is quadratic within the bucket, so buckets larger than
    * the cap skip the all-pairs join. They are NOT discarded — the
    * densest buckets are exactly the mirror farms / boilerplate floods a
    * web dedup exists for, and dropping them wholesale would exempt the
    * LARGEST duplicate clusters from dedup. An over-cap bucket instead
    * emits STAR pairs (min doc_id ↔ every other member): linear in bucket
    * size, and under the downstream verify→connected-components flow
    * (`nearDupClusters`) a star is as good as a clique — every true
    * duplicate still joins the representative's component, while a
    * degenerate bucket's false members are individually rejected by the
    * exact-Jaccard verify. */
  def minhashLshPairs(docs: DataFrame, numHashes: Int = 8, rowsPerBand: Int = 2,
                      bucketCap: Int = 64): DataFrame = {
    require(numHashes % rowsPerBand == 0)
    val mh = minhashSignatures(docs, numHashes)
    val nBands = numHashes / rowsPerBand
    val bandCols = (0 until nBands).map { b =>
      val sig = delimitedSig((0 until rowsPerBand)
        .map(r => col(s"s${b * rowsPerBand + r}").cast("string")))
      struct(lit(b).as("band"), sig.as("sig"))
    }
    // The band frame feeds the bucket-size cap AND both sides of the
    // self-join. The cap is a WINDOW count over (band, sig, source) — not
    // a groupBy+join back — so the two self-join sides are byte-identical
    // subplans over one exchange, and Catalyst's ReuseExchange computes
    // the heavy scan+explode+8-way-min subtree ONCE (the r2 plan re-ran it
    // per reference: 8 source scans here, 50 in ngramJaccardNearDups).
    // Reused exchange beats persist() for a once-consumed query: no cache
    // materialization cost, same single source scan.
    import org.apache.spark.sql.expressions.Window
    val bands = mh.select(col("doc_id"), col("source"),
        explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("source"), col("bs.band").as("band"), col("bs.sig").as("sig"))
      // null keys can never equi-join (and a null signature means "no
      // signature"); filtering them in the SHARED frame — not per branch —
      // keeps the subplan below the window exchange byte-identical across
      // all three consumers (both self-join sides, which would otherwise
      // get these as pushed-down join-inferred IsNotNulls, and the star
      // branch, which would not), so AQE's ReuseExchange runs the
      // scan+explode+minhash subtree ONCE for the whole query
      .filter(col("doc_id").isNotNull && col("source").isNotNull &&
        col("sig").isNotNull)
    val capWindow = Window.partitionBy("band", "sig", "source")
    // count + min share the window's partitioning (one sort per consumer
    // over the SAME reused exchange; column pruning drops the unused min
    // from the join-side windows). Everything below the window exchange
    // is byte-identical across the three consumers — see the bands
    // comment — so the scan runs once at runtime (verified: TimeQuery
    // executed plan shows stage 5 + two ReusedExchange nodes)
    val stats = bands
      .withColumn("__bn", count(lit(1)).over(capWindow))
      .withColumn("__bmin", min(col("doc_id")).over(capWindow))
    val capped = stats.filter(col("__bn") <= bucketCap).drop("__bn", "__bmin")
    val a = capped.as("a"); val b = capped.as("b")
    val within = a.join(b,
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
    val star = stats.filter(col("__bn") > bucketCap && col("doc_id") =!= col("__bmin"))
      .select(col("__bmin").as("d1"), col("doc_id").as("d2"))
    within.unionAll(star).distinct()
  }

  /** LSH candidate counts per doc (doc_id = smaller id of each pair).
    * Output: (doc_id, n_cand). */
  def minhashLshCandidates(docs: DataFrame, numHashes: Int = 8,
                           rowsPerBand: Int = 2, bucketCap: Int = 64): DataFrame =
    minhashLshPairs(docs, numHashes, rowsPerBand, bucketCap)
      .groupBy(col("d1").as("doc_id")).agg(count(lit(1)).as("n_cand"))

  /** n-gram (token) Jaccard near-dup, TWO-STAGE: LSH blocking generates
    * candidate pairs, then exact Jaccard verifies ONLY those pairs — the
    * standard block→verify plan. (A raw token-token equi-join is quadratic
    * per common token: every doc pair sharing "the" becomes a join row.)
    * The verify stage joins each candidate pair to its two per-doc distinct
    * token SETS (collect_set arrays, bounded by doc length) and computes
    * |A∩B| / |A∪B| per pair with array_intersect — no token-level shuffle.
    * Output: (doc_id, n_near) — near-dup partner count per doc over both
    * pair directions. */
  def ngramJaccardNearDups(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val jac = ngramJaccardPairs(docs, threshold)
    // count partners in both directions so the metric is per-doc symmetric
    jac.select(col("d1").as("doc_id")).unionAll(jac.select(col("d2").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_near"))
  }

  /** The VERIFIED near-dup pair set (d1 < d2): LSH candidate blocking ->
    * exact token-Jaccard >= `threshold` over only the candidate pairs.
    * RESULT-scale and eagerly checkpointed — the shared primitive behind
    * [[ngramJaccardNearDups]] and [[nearDupClusters]]. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.8): DataFrame =
    ngramJaccardPairsLazy(docs, threshold)
      .localCheckpoint() // eager: runs the verify join ONCE, truncates plan

  /** The UNcheckpointed [[ngramJaccardPairs]] plan — the inspection hook
    * for dumping the block->verify join shape (the production path's
    * eager checkpoint truncates it to an ExistingRDD stub). */
  private[graft] def ngramJaccardPairsLazy(docs: DataFrame,
                                           threshold: Double = 0.8): DataFrame = {
    val pairs = minhashLshPairs(docs)
    // tokSets joins against BOTH pair sides; jac feeds BOTH direction
    // unions (eager localCheckpoint of the RESULT-scale jac frame).
    //
    // The token set is computed ROW-LOCALLY: `distinctTokens` already IS
    // the per-document distinct token set, so re-deriving it by exploding
    // the token relation and collect_set-ing it back (the r2-r5 shape)
    // paid a corpus-wide token-level shuffle through an
    // ObjectHashAggregate for a value each row can compute in place — the
    // verify stage now shuffles only at its two result-scale pair joins
    // (guide §2.4: remove shuffles outright). Like every operator keyed
    // on doc_id (exact dedup's min, the cluster output), this assumes
    // doc_id identifies one document; the exploded re-aggregation would
    // have unioned the token sets of a doc_id ingested twice, every other
    // stage of the family would still have treated the two rows
    // independently.
    //
    // A fused variant (minhash mins + collect_set in ONE aggregation, so
    // the token relation shuffles once instead of twice) was measured in
    // r4 and REVERTED: collect_set forces the whole combined agg into
    // ObjectHashAggregate (the separate min-only agg is codegen
    // HashAggregate) and the cached per-doc array frame materializes
    // eagerly — 2.2s -> 3.1s steady-state at sf0.1 on the same host
    // phase. Two cheap codegen passes beat one heavyweight object agg.
    // The row-local form above removes that shuffle entirely instead of
    // fusing it, at the price of tokenizing the two joined sides'
    // documents again (a scan + regex split, no exchange).
    val tokSets = docs.select(col("doc_id"),
      TextOps.distinctTokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
    val jac = pairs
      .join(tokSets.select(col("doc_id").as("d1"), col("toks").as("t1"), col("n").as("n1")), "d1")
      .join(tokSets.select(col("doc_id").as("d2"), col("toks").as("t2"), col("n").as("n2")), "d2")
      .withColumn("inter", size(array_intersect(col("t1"), col("t2"))))
      .withColumn("jac", col("inter") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jac") >= threshold)
      .select("d1", "d2")
    jac
  }

  /** Near-dup CLUSTER RESOLUTION — the production shape of near-dedup.
    * Candidate PAIRS are not actionable on their own: near-duplication is
    * transitive in practice (A~B, B~C with A,C never sharing a bucket), so
    * dropping "the second doc of each pair" either over-drops (both
    * directions hit) or under-drops (chains). The actionable output is one
    * CLUSTER id per document plus a deterministic keep/drop decision:
    * LSH blocking -> exact-Jaccard VERIFY ([[ngramJaccardPairs]] — raw
    * candidates would transitively merge unrelated clusters through
    * false-positive bucket collisions, and CC amplifies every false edge
    * into a whole-cluster merge) -> connected components over the verified
    * pair graph ([[GraphAlgos.connectedComponents]], pointer-doubled
    * min-label propagation, O(log diameter) rounds) -> representative =
    * the cluster's minimum doc_id. Docs in no pair are their own singleton
    * cluster via the left join + coalesce (no shuffle of the corpus beyond
    * the one join on doc_id).
    *
    * Output: (doc_id, cluster, keep) — `keep` (1/0; int, the cross-engine
    * hash-stable encoding) marks exactly one doc per cluster;
    * `filter(col("keep") === 1)` IS the deduped corpus. Deterministic
    * end-to-end (hash-derived signatures, min-id representatives), so a
    * re-run, a retry, or another engine drops the same rows. */
  def nearDupClusters(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    requireLongDocIds(docs)
    val pairs = ngramJaccardPairs(docs, threshold)
    // dedupEdges=false: the verified pair set is strictly d1 < d2 and
    // distinct (minhashLshPairs ends in a distinct), so the symmetrized
    // edge set cannot contain duplicates — skip that shuffle
    val comp = GraphAlgos.connectedComponents(
      pairs.select(col("d1").as("a"), col("d2").as("b")), dedupEdges = false)
    // the pair checkpoint fed the (eager) component rounds and nothing
    // else — release it so repeated clustering in a long-lived session
    // doesn't accumulate pair-scale storage
    GraphAlgos.releaseLocalCheckpoint(pairs)
    docs.select(col("doc_id").cast("long").as("doc_id"))
      .join(comp, col("doc_id") === col("id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster"))
      .withColumn("keep", (col("cluster") === col("doc_id")).cast("int"))
  }

  /** Cluster resolution needs integral doc ids (min-id representatives,
    * long-id connected components): a string-keyed corpus (e.g. urls)
    * would null-cast and silently cluster NOTHING — reject at plan-build
    * time via the guard shared with [[GraphAlgos.connectedComponents]]. */
  private def requireLongDocIds(docs: DataFrame): Unit =
    GraphAlgos.requireIntegral(docs, Seq("doc_id"),
      "nearDupClusters/nearDupDropIds")

  /** The DROP side of [[nearDupClusters]], for pipelines that only need to
    * FILTER a corpus: doc ids of every non-representative cluster member
    * (`component != id`). RESULT-scale — one row per dropped duplicate,
    * never per corpus row — so the caller anti-joins it against the corpus
    * and AQE broadcasts it whenever the duplicate fraction is small (the
    * common case), where the full cluster frame would force a corpus-wide
    * join. EAGER (localCheckpoint'ed): the clustering rounds have already
    * run by the time this returns, and the vertex-scale component storage
    * is released — only the drop set's own blocks outlive the call.
    * Output: (doc_id). */
  def nearDupDropIds(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    requireLongDocIds(docs)
    val pairs = ngramJaccardPairs(docs, threshold)
    val comp = GraphAlgos.connectedComponents(
      pairs.select(col("d1").as("a"), col("d2").as("b")), dedupEdges = false)
    GraphAlgos.releaseLocalCheckpoint(pairs) // see nearDupClusters
    // eager result-scale checkpoint, then release the VERTEX-scale
    // component checkpoint behind it: unlike nearDupClusters (whose
    // corpus-scale result keeps the component frame as its storage), the
    // drop set is strictly smaller than the component frame, so holding
    // the components through the rest of a deployment job (extract +
    // materialize run AFTER the near-dedup stage) would retain dead
    // vertex-scale blocks for the job's whole lifetime
    val drop = comp.filter(col("id") =!= col("component"))
      .select(col("id").as("doc_id"))
      .localCheckpoint()
    GraphAlgos.releaseLocalCheckpoint(comp)
    drop
  }

  private val hexHigh = Seq("8", "9", "a", "b", "c", "d", "e", "f")

  /** 16-bit SimHash from the per-token md5 hex digits: bit j is the sign of
    * the sum over tokens of ±1 by the j-th hex digit's top bit. Output:
    * (doc_id, simhash) as a 16-char bitstring. One explode + one hash agg. */
  def simhash16(docs: DataFrame): DataFrame = {
    val tok = tokenRelation(docs).withColumn("h", md5(col("w")))
    val sums = (0 until 16).map { j =>
      sum(when(substring(col("h"), j + 1, 1).isin(hexHigh: _*), 1).otherwise(-1)).as(s"b$j")
    }
    tok.groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        concat((0 until 16).map(j => when(col(s"b$j") > 0, "1").otherwise("0")): _*).as("simhash"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dataset splitting and shard packing — the last two stages a corpus
  * passes before training.
  *
  * Both are DETERMINISTIC by construction (no RNG): a re-run, a retried
  * task, or a different engine assigns every document to the same split
  * and the same shard, which is what makes eval splits trustworthy and
  * jobs resumable at 100 TB.
  */
object Sampling {

  /** Uniform [0,1) value from md5("salt:key") — top 60 bits over 2^60,
    * the same cross-engine-reproducible construction as the minhash
    * family. */
  def hashUniform(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(s"$salt:"), key.cast("string"))), 1, 15),
      16, 10).cast("double") / lit((1L << 60).toDouble)

  /** Deterministic train/val/test split: label thresholds over the hash
    * uniform. `weights` are (label, fraction) pairs summing to <= 1 (any
    * remainder falls to the last label). Stable under re-runs, retries,
    * corpus growth (a doc's label never changes when other docs appear),
    * and engine changes. */
  def hashSplit(docs: DataFrame, weights: Seq[(String, Double)],
                salt: String = "graft-split-v1"): DataFrame = {
    require(weights.nonEmpty)
    val u = hashUniform(col("doc_id"), salt)
    val cuts = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    // a NULL doc_id is unattributable: its split stays NULL (it belongs to
    // no set) rather than falling through every `u < cut` comparison into
    // the last — typically smallest, most trusted — label
    val labeled = weights.zip(cuts).dropRight(1)
      .foldLeft(when(lit(false), lit(""))) { case (c, ((label, _), cut)) =>
        c.when(u < cut, label)
      }.when(u.isNotNull, weights.last._1)
    docs.select(col("doc_id"), labeled.as("split"))
  }

  /** Token-budget SHARD PACKING: documents in deterministic doc_id order
    * are packed greedily into shards of at most ~`budgetTokens` tokens —
    * shard = exclusive-prefix-token-count div budget. The prefix sum is
    * computed the scale-correct way (a single global window would move
    * the corpus through ONE task): bucket by doc_id RANGE, window cumsum
    * WITHIN each bucket (parallel), then add per-bucket offsets — the
    * offsets are one tiny per-bucket aggregate collected to the driver
    * (numBuckets rows, metadata-scale) and broadcast back.
    *
    * The bucket id is derived DETERMINISTICALLY from the doc_id VALUE
    * (equal-width slices of [min, max]) — never from
    * `spark_partition_id()` over a sampled range exchange, whose boundary
    * sampling is seeded per-action: the offsets computed by the totals job
    * would then be applied to a DIFFERENT partitioning in the final job,
    * silently corrupting the cumulative sums. Value-derived buckets make
    * both actions agree with no persist/checkpoint of the corpus-scale
    * frame.
    *
    * CONTRACT: balance relies on doc_ids spreading roughly evenly over
    * their [min, max] range — true for dense ingest-assigned ids (the
    * norm, and the synthesis contract) and for uniformly hash-derived
    * ids, NOT for clustered ids with extreme outliers (one id near 2^62
    * next to a dense block collapses most rows into one bucket). The
    * per-bucket totals are already on the driver, so imbalance is
    * DETECTED there and logged loudly rather than silently stalling the
    * per-bucket cumsum on one straggler task; correctness is unaffected
    * either way. Output: (doc_id, n_tokens, shard). */
  def packShards(docs: DataFrame, budgetTokens: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    GraphAlgos.requireIntegral(docs, Seq("doc_id"), "packShards")
    // a NULL text is an empty document (0 tokens) — size(split(NULL)) is
    // NULL, which would otherwise null the shard id (the doc silently
    // vanishes from every shard) or, under legacy sizeOfNull, shift every
    // later doc's cumulative sum by -1
    val withTok = docs.select(col("doc_id").cast("long").as("doc_id"),
      coalesce(size(TextOps.tokens(col("text"))).cast("long"), lit(0L))
        .as("n_tokens"))
    val bounds = withTok.agg(min("doc_id"), max("doc_id")).head()
    if (bounds.isNullAt(0))
      return withTok.withColumn("shard", lit(0L)).limit(0)
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val nBuckets = math.max(1, spark.sessionState.conf.numShufflePartitions)
    // BigInt + decimal(38,0) arithmetic: `hi - lo + 1` overflows Long when
    // ids are hash-derived (e.g. lo near MinValue, hi near MaxValue),
    // which would make the slice width zero/negative and the bucket
    // mapping null or non-monotone. pid = (doc_id - lo) * nBuckets div
    // span is exact, monotone in doc_id, and lands in [0, nBuckets).
    val span = BigInt(hi) - BigInt(lo) + 1
    val bucketed = withTok
      .withColumn("__pid", expr(
        s"cast(((cast(doc_id as decimal(38,0)) - $lo) * $nBuckets) div $span as int)"))
    // per-bucket totals -> exclusive offsets, in bucket (= id range) order;
    // deterministic because __pid is a pure function of doc_id
    val totalsRows = bucketed.groupBy("__pid")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("c"))
      .orderBy("__pid").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val counts = totalsRows.map(_._3)
    if (counts.nonEmpty) {
      val maxC = counts.max; val avgC = counts.sum / counts.length
      if (avgC > 0 && maxC > 8 * avgC)
        System.err.println(
          s"[packShards] WARN: clustered doc_ids — hottest bucket holds " +
            s"$maxC rows vs $avgC average; the per-bucket cumsum will " +
            s"straggle. Remap ids densely before packing.")
    }
    val partTotals = totalsRows.map { case (pid, t, _) => (pid, t) }
    val offsets = partTotals.scanLeft((0, 0L)) {
      case ((_, acc), (pid, t)) => (pid, acc + t)
    }.tail.zip(partTotals).map { case ((pid, cumIncl), (_, t)) =>
      (pid, cumIncl - t)
    }
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy("__pid").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offDf), "__pid")
      .withColumn("__cum", col("__off") + sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"(__cum - n_tokens) div $budgetTokens").as("shard"))
  }

  /** TEMPERATURE-based domain resampling — the multilingual/data-mixing
    * stage (XLM-R/Gopher style): flatten a skewed domain distribution by
    * sampling domain d with expected count ∝ n_d^α (α = 1/τ < 1), keeping
    * ALL of the rarest domain and downsampling dominant ones toward a
    * flatter mix. The acceptance rate solves rate_d ∝ n_d^(α-1) capped at
    * 1: rate_d = (n_min / n_d)^(1-α).
    *
    * This implementation fixes α = 0.5 (τ = 2, the standard choice) so
    * the rate is sqrt(n_min / n_d) — and sqrt, unlike pow/ln, is
    * CORRECTLY ROUNDED under IEEE 754, so the rate is bit-identical on
    * every engine and the keep decision (hash-uniform < rate) is exactly
    * reproducible with no quantization tricks.
    *
    * Scale shape at 100 TB: one map-side-combined count aggregation over
    * the corpus (domain cardinality is tiny by definition), a
    * single-partition window over that DOMAIN-COUNT table only (never the
    * corpus) to attach n_min without a second corpus scan, then a
    * broadcast join + filter — two corpus passes total, no corpus
    * shuffle. Deterministic: no RNG, the keep decision is a pure function
    * of (doc_id, salt, domain counts), so re-runs, retries, and other
    * engines select the same rows. Output: kept rows only, as
    * (doc_id, domain, keep_rate). NULL-domain rows are excluded from the
    * output (a null key never equi-joins a rate — identical semantics in
    * SQL engines); assign a pseudo-domain upstream if unattributed rows
    * must ride through the resample. */
  def temperatureResample(docs: DataFrame, domainCol: String,
                          salt: String = "graft-temp-v1"): DataFrame = {
    val counts = docs.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n"))
    // n_min over the tiny domain-count frame: an empty-partition window is
    // one task over |domains| rows — never the corpus
    val rates = counts
      .withColumn("nmin", min(col("n")).over(Window.partitionBy()))
      .select(col("domain"),
        sqrt(col("nmin").cast("double") / col("n").cast("double")).as("rate"))
    docs.select(col("doc_id"), col(domainCol).as("domain"))
      .join(broadcast(rates), "domain")
      .filter(hashUniform(col("doc_id"), salt) < col("rate"))
      .select(col("doc_id"), col("domain"), round(col("rate"), 6).as("keep_rate"))
  }

  /** Deterministic STRATIFIED sample: exactly `min(n, |stratum|)` rows per
    * stratum (e.g. per language), chosen by the hash-uniform order — the
    * "balanced eval set" / "cap the dominant language" stage of a corpus
    * pipeline. No RNG: the per-stratum order is md5("salt:doc_id") with
    * doc_id as the tiebreaker, so re-runs, retries, and other engines pick
    * the same rows, and a stratum's picks only change where corpus growth
    * actually inserts ahead of the cutoff.
    *
    * Scale shape: the rank filter compiles to Spark's WindowGroupLimit —
    * each input partition keeps at most `n` rows per stratum BEFORE the
    * exchange (asserted in SamplingSpec), so the shuffle moves
    * O(partitions * strata * n) rows, not the corpus, and a
    * billion-row dominant stratum never sorts in one task. Output: the
    * stratum column + (doc_id, pick_rank), pick_rank in [1, n]. */
  def stratifiedSample(docs: DataFrame, stratumCol: String, n: Int,
                       salt: String = "graft-strat-v1"): DataFrame = {
    require(n > 0, "stratifiedSample: n must be positive")
    val w = Window.partitionBy(stratumCol)
      .orderBy(md5(concat(lit(s"$salt:"), col("doc_id").cast("string"))),
        col("doc_id"))
    docs.select(col(stratumCol), col("doc_id"))
      .withColumn("pick_rank", row_number().over(w))
      .filter(col("pick_rank") <= n)
  }
}

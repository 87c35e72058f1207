package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Graph materialization: salted, skew-aware bucketed tables with a
  * per-partition lineage table and checkpoint resume.
  *
  * Layout (Iceberg-style semantics on plain parquet — overwrite-by-
  * partition is the Iceberg `MERGE`/dynamic-overwrite pattern):
  *
  *   <root>/data/bucket=<b>/  parquet triples, bucket = pmod(hash(s), B)
  *   <root>/lineage/          one row per completed bucket:
  *                                      (bucket, n_triples, n_subjects,
  *                                       batch_id, num_buckets)
  *
  * Why bucket by hash(s): joins/BGP scans shuffle on subject terms, so
  * subject-hash bucketing co-locates each subject's statements (the
  * reference's S->P->O index, SURVEY §2.3) while spreading hot domains
  * across buckets (the salt is the hash itself — adjacent urls from one
  * domain land in different buckets, which kills domain skew).
  *
  * Resume: `materialize` consults the lineage table and processes ONLY
  * buckets without a lineage row. Each bucket write is idempotent
  * (dynamic partition overwrite), so a crashed run re-does at most the
  * in-flight buckets — per-partition checkpointing without a coordinator.
  */
object Materialize {

  /** Deterministic md5-derived bucket id. md5 (not Spark's Murmur3 hash)
    * so the layout is cross-engine reproducible — DuckDB computes the same
    * id as CAST('0x'||substr(md5(s),1,15) AS BIGINT) % n — which makes the
    * whole materialization oracle-checkable. Still a salt: adjacent urls
    * from one domain spread uniformly across buckets (kills domain skew).
    * The hex-prefix primitive below is the ONE canonical copy of the
    * formula: the dictionary-encoded layout ([[Dict]]) derives its bucket
    * columns through it too, so the layouts can never silently diverge. */
  def bucketCol(n: Int, c: Column = col("s")): Column =
    bucketColFromHex(md5(c), n)

  /** Bucket id from a hex-digest column (md5 / truncated sha prefix):
    * first 15 hex digits mod n. Shared by every layout; Scala twin is
    * [[bucketOfHex]]. */
  def bucketColFromHex(hexCol: Column, n: Int): Column =
    pmod(conv(substring(hexCol, 1, 15), 16, 10).cast("long"), lit(n))
      .cast("int").as("bucket")

  /** Scala twin of [[bucketColFromHex]]. */
  def bucketOfHex(hex: String, numBuckets: Int): Int =
    (java.lang.Long.parseLong(hex.substring(0, 15), 16) % numBuckets).toInt

  /** Write triples bucketed; returns the lineage rows written this call
    * (read back from the lineage table — the on-disk rows are the single
    * source of truth). `triples` needs an `s` column (string or term
    * struct.value for term graphs).
    *
    * Resume: buckets already present in the lineage table are excluded via
    * a broadcast anti-join (not a collected literal list — at 100k buckets
    * an `isin` would inline megabytes into the plan). The remaining
    * bucketed frame is cached so the data write and the per-bucket metrics
    * are ONE extraction pass, not two. */
  def materialize(triples: DataFrame, root: String, numBuckets: Int,
                  batchId: String): DataFrame = {
    val spark = triples.sparkSession
    val bucketed = triples.withColumn("bucket", bucketCol(numBuckets))
    val remaining = readLineage(spark, root) match {
      case Some(lin) =>
        checkBucketCount(lin, numBuckets, root)
        bucketed.join(broadcast(lin.select("bucket").distinct()), Seq("bucket"), "left_anti")
      case None => bucketed
    }

    // ONE sorted file per bucket in the common case, MULTIPLE for a hot
    // bucket: REBALANCE(bucket) — not repartition(bucket) — collapses the
    // (writer tasks × buckets) small-file explosion like a plain hash
    // repartition, but lets AQE split an oversized bucket's shuffle
    // partition across several writer tasks (several sorted files in that
    // bucket's directory) instead of serializing the whole job behind one
    // straggler. Subject-hash bucketing makes a hot bucket possible only
    // when a SINGLE subject carries a disproportionate share of all
    // triples (a hub page with millions of statements); measured with 25%
    // of 20M triples on one subject (SkewProbe, BENCH.md round 5): the
    // repartition shape serializes the write behind the hot task (9.4s),
    // rebalance splits it into 4 sorted files and finishes in 3.9s. The
    // split threshold is `spark.sql.adaptive.advisoryPartitionSizeInBytes`
    // (default 64 MB of compressed shuffle data — deployment-scale hot
    // buckets cross it; the probe had to lower it to observe the split).
    // The within-partition sort still makes every parquet row group carry
    // a tight s-min/max — `lookupSubject` prunes row groups inside the
    // bucket; split files have overlapping s-ranges only in the hot
    // bucket, costing footer reads there, nothing elsewhere. Trade:
    // a split bucket's rows span partitions, so the stats groupBy below
    // adds a partial-aggregate-scale exchange instead of reusing the
    // write's (it stays metadata-cheap: partials collapse per partition
    // before moving).
    //
    // canChangeCachedPlanOutputPartitioning: cached plans otherwise PIN
    // their output partitioning (so cache reuse sees a stable layout),
    // which silently disables exactly the AQE rebalance skew-split this
    // shape exists for. The flag binds when the cache's physical plan is
    // built (first materialization = the write below), so it is restored
    // only AFTER both cache consumers ran; both (the write and the stats
    // agg) are partitioning-agnostic. (The save/set/restore lives in
    // writeBucketedData, shared by every store layout.)
    writeBucketedData(remaining, root, batchId, Seq("bucket"), "s", numBuckets)
    readLineage(spark, root).get.filter(col("batch_id") === batchId)
  }

  /** The store's bucket count as recorded in its lineage, when the store
    * was written by a build that records it (the `num_buckets` column).
    * Distinct conflicting values mean a corrupted / mixed-layout store. */
  def lineageBucketCount(lin: DataFrame): Option[Int] =
    if (!lin.columns.contains("num_buckets")) None
    else lin.select("num_buckets").distinct().collect()
      .map(_.getAs[Number](0).intValue()).toSeq match {
        case Seq(n) => Some(n)
        case Seq() => None
        case many => throw new IllegalStateException(
          s"lineage records conflicting bucket counts ${many.sorted.mkString(",")}" +
            " — the store root mixes layouts")
      }

  /** Resume safety: a resume with a DIFFERENT bucket count than the store
    * was written with silently drops data (the lineage anti-join excludes
    * bucket IDS, which only mean the same thing under the same count).
    * Exact check when the lineage records `num_buckets`; for stores from
    * older builds, at least the too-small case is detectable from the
    * recorded bucket ids. */
  private[pipeline] def checkBucketCount(lin: DataFrame, numBuckets: Int,
                                         root: String): Unit =
    lineageBucketCount(lin) match {
      case Some(n) =>
        require(n == numBuckets,
          s"store at $root was materialized with $n buckets; resuming with " +
            s"numBuckets=$numBuckets would silently drop or misplace data")
      case None =>
        // a lineage directory can exist with ZERO rows (crash before the
        // first stats append): max is then null — treat as "no recorded
        // buckets" (nothing to validate) instead of an NPE
        val maxRow = lin.agg(max("bucket")).collect()(0)
        if (!maxRow.isNullAt(0)) {
          val maxB = maxRow.getAs[Number](0).intValue()
          require(maxB < numBuckets,
            s"store at $root records bucket id $maxB in its lineage — it cannot " +
              s"have been materialized with numBuckets=$numBuckets")
        }
    }

  /** The shared write core of every snapshot/increment store layout:
    * REBALANCE(bucket) + within-partition sort on `subjectCol`, ONE cached
    * pass feeding both the partitioned data write and the per-bucket
    * lineage stats append (see the layout comments in [[materialize]]).
    * Kept in one place so the plain and dictionary-encoded
    * ([[Dict.materializeEncoded]]) layouts can never drift apart on the
    * skew-split / cached-plan-partitioning dance. */
  private[pipeline] def writeBucketedData(remaining: DataFrame, root: String,
      batchId: String, partitionCols: Seq[String], subjectCol: String,
      numBuckets: Int): Unit = {
    val spark = remaining.sparkSession
    val prevCachedPart = spark.conf
      .get("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "false")
    spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    // dynamic overwrite scoped to THIS write and restored: left set
    // session-wide it silently turns every later full-table
    // partitioned overwrite in the same session into a partial one
    val prevOverwrite = spark.conf
      .get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val cached = remaining.hint("rebalance", col("bucket"))
      .sortWithinPartitions(col("bucket"), col(subjectCol)).persist()
    try {
      cached.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*)
        .parquet(s"$root/data")
      // metrics from the cached frame: same pass as the write; the
      // recorded num_buckets makes a mismatched resume detectable
      val stats = cached.groupBy("bucket")
        .agg(count(lit(1)).as("n_triples"),
          countDistinct(col(subjectCol)).as("n_subjects"))
        .withColumn("batch_id", lit(batchId))
        .withColumn("num_buckets", lit(numBuckets))
      stats.write.mode(SaveMode.Append).parquet(s"$root/lineage")
    } finally {
      cached.unpersist()
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevOverwrite)
      spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", prevCachedPart)
    }
  }

  /** Incremental variant for streaming/append workloads: each batch owns
    * its own `batch_id=<id>/bucket=<b>` partitions, so dynamic overwrite
    * on REPLAY of a batch is idempotent while other batches' data is
    * untouched; the per-(batch, bucket) lineage row records completion.
    * A store is either snapshot-managed (`materialize`, bucket layout) or
    * increment-managed (this, batch/bucket layout) — don't mix layouts in
    * one root. Cross-batch duplicates are a compaction concern (set
    * semantics hold within a batch). */
  def materializeIncrement(triples: DataFrame, root: String, numBuckets: Int,
                           batchId: String): DataFrame = {
    val spark = triples.sparkSession
    val bucketed = triples.withColumn("bucket", bucketCol(numBuckets))
      .withColumn("batch_id", lit(batchId))
    val remaining = readLineage(spark, root) match {
      case Some(lin) =>
        checkBucketCount(lin, numBuckets, root)
        bucketed.join(
          broadcast(lin.filter(col("batch_id") === batchId)
            .select("bucket").distinct()), Seq("bucket"), "left_anti")
      case None => bucketed
    }
    // same sorted skew-splitting layout as `materialize` (see the
    // REBALANCE + canChangeCachedPlanOutputPartitioning comments there)
    writeBucketedData(remaining, root, batchId, Seq("batch_id", "bucket"), "s",
      numBuckets)
    readLineage(spark, root).get.filter(col("batch_id") === batchId)
  }

  /** None ONLY when the lineage table does not exist yet (first run).
    * Everything else — corrupt files, schema-inference failures, transient
    * FS errors — rethrows: swallowing those would make a resume silently
    * degrade into a full rebuild (idempotent but, at 100k buckets, the
    * whole job re-run). */
  def readLineage(spark: SparkSession, root: String): Option[DataFrame] =
    try Some(spark.read.parquet(s"$root/lineage"))
    catch {
      case e: org.apache.spark.sql.AnalysisException
        // "first run" also covers a crash that created the directory but
        // no parquet footer (only _temporary etc.): that surfaces as
        // UNABLE_TO_INFER_SCHEMA, and treating it as wedged would block
        // every subsequent resume on a store that holds no lineage at all
        if Option(e.getCondition).exists(c =>
            c == "PATH_NOT_FOUND" || c == "UNABLE_TO_INFER_SCHEMA") ||
          e.getMessage.contains("Path does not exist") ||
          e.getMessage.contains("Unable to infer schema") => None
    }

  def readGraph(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/data")

  /** Scala twin of bucketCol for a known subject string. */
  def bucketOf(subject: String, numBuckets: Int): Int =
    bucketOfHex(graft.core.Skolem.hash128Hex(subject), numBuckets)

  /** Point lookup of one subject's description against the bucketed store:
    * the bucket id is computed driver-side, so the filter is a PARTITION
    * predicate — Spark prunes to the one bucket directory and scans
    * ~1/numBuckets of the data (the reference's S->P->O index lookup,
    * translated to storage-layout pruning). */
  def lookupSubject(spark: SparkSession, root: String, subject: String,
                    numBuckets: Int): DataFrame =
    readGraph(spark, root)
      .filter(col("bucket") === bucketOf(subject, numBuckets))
      .filter(col("s") === subject)

  /** Compact an increment-managed store (batch_id/bucket layout) into a
    * snapshot-managed one (bucket layout) with GLOBAL set-semantic dedup —
    * the cross-batch duplicate cleanup that per-batch dedup can't do.
    * Writes to `destRoot` (fresh store), one shuffle on the triple key. */
  def compact(spark: SparkSession, srcRoot: String, destRoot: String,
              numBuckets: Int, batchId: String): DataFrame = {
    val data = readGraph(spark, srcRoot)
    val cols = data.columns.filterNot(c => c == "bucket" || c == "batch_id")
    materialize(data.select(cols.map(col): _*).dropDuplicates(),
      destRoot, numBuckets, batchId)
  }

  /** Incremental-materialization primitive: the Diff semantics of the
    * reference (`lib/rdf/model/diff.ex`) — additions/deletions between two
    * triple sets, as two anti-joins. Tuple face of [[graft.engine.Diff]]
    * (which carries the full union/invert/apply algebra). */
  def diff(before: DataFrame, after: DataFrame): (DataFrame, DataFrame) = {
    val d = graft.engine.Diff.compute(before, after)
    (d.additions, d.deletions)
  }

  /** Compact an increment-managed store (like `compact`) while APPLYING a
    * [[graft.engine.Diff]] in the same pass — the incremental-maintenance
    * step: roll the accumulated batches plus a correction diff into a fresh
    * snapshot without a second full rewrite. */
  def compactWithDiff(spark: SparkSession, srcRoot: String, destRoot: String,
                      numBuckets: Int, batchId: String,
                      diff: graft.engine.Diff): DataFrame = {
    val data = readGraph(spark, srcRoot)
    val cols = data.columns.filterNot(c => c == "bucket" || c == "batch_id")
    val deduped = data.select(cols.map(col): _*).dropDuplicates()
    materialize(diff.applyTo(deduped), destRoot, numBuckets, batchId)
  }
}

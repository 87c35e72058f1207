package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Term-dictionary encoding: the classic RDF-store scale layout (RDF-3X /
  * Jena-TDB style) re-expressed for Spark — triples are stored and shuffled
  * as fixed-width 16-byte term ids while each term STRING is stored exactly
  * once in a dictionary table.
  *
  * Why it matters at 10^12 triples: the interior of a KG-construction job
  * (dedup, joins, bucketing, sort) moves term strings through every
  * exchange. Parquet dictionary-compresses strings at rest, but SHUFFLES do
  * not — a web-scale subject url (~60 B) plus object literal (~40-200 B)
  * pays its full width on every hop. Id-space rows are 3 x 16 B, fixed
  * width, comparison is a 16-byte memcmp, and sort keys never touch a
  * string.
  *
  * Why CONTENT-HASH ids (md5 of the term) instead of dense sequential ids:
  * dense ids need a coordinated global dictionary build — a join on every
  * encode and a serial id-assignment bottleneck (the RDF-3X B+-tree build).
  * Content hashes make `encodeFlat` a PURE PROJECTION: embarrassingly
  * parallel, no shuffle, no dictionary lookup, and deterministic across
  * engines, executors, batches, and re-runs — an id never changes when the
  * corpus grows, so incremental batches and checkpoint resume compose
  * without re-encoding history. It is the same salted-128-bit-hash identity
  * trick the skolemizer uses ([[graft.core.Skolem]]); collision odds at
  * 2^64 distinct terms are ~1e-20 (birthday bound on 128 bits).
  * Trade: 16 B instead of 4-8 B per id, and no dense-range locality.
  *
  * The encoded store written by [[materializeEncoded]] uses the SAME
  * subject bucket function as the plain store ([[Materialize.bucketCol]] on
  * the subject STRING, computed before encoding), so
  * [[Materialize.bucketOf]] prunes both layouts identically and the two
  * stores stay drop-in interchangeable for lookups.
  *
  * Decoding (string round-trip) is an edge concern — serialization and
  * human-facing output. The pipeline interior stays in id space; only
  * [[decodeFlat]] / [[lookupSubjectEncoded]] pay dictionary joins.
  */
object Dict {

  /** 16-byte content-derived term id as a pure codegen Column. */
  def termIdCol(term: Column): Column = unhex(md5(term))

  /** Scala twin of [[termIdCol]] for driver-side point operations. */
  def termIdBytes(term: String): Array[Byte] =
    hexToBytes(graft.core.Skolem.hash128Hex(term))

  private def hexToBytes(hex: String): Array[Byte] = {
    val out = new Array[Byte](hex.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  /** Dictionary bucket of a term id: the first 15 hex digits of the id
    * (which IS md5(term)) mod n — so a term's dictionary bucket equals
    * [[Materialize.bucketOf]] of the term string, and both are computable
    * from the id alone (decode never needs the string to find it). */
  def bucketOfId(id: Array[Byte], numBuckets: Int): Int = {
    val sb = new StringBuilder(15)
    var i = 0
    while (sb.length < 15) { sb.append(f"${id(i) & 0xff}%02x"); i += 1 }
    (java.lang.Long.parseLong(sb.substring(0, 15), 16) % numBuckets).toInt
  }

  private def bucketColOf(c: Column, n: Int): Column =
    pmod(conv(substring(md5(c), 1, 15), 16, 10).cast("long"), lit(n))
      .cast("int").as("bucket")

  /** The (id, term) dictionary over every distinct term of a flat
    * (s, p, o) string-triple frame. This is the ONE pass that shuffles
    * strings: distinct is a hash aggregate with map-side partial combine,
    * so a predicate that appears a billion times collapses to one row per
    * task before the exchange. */
  def termDictionary(flat: DataFrame): DataFrame =
    flat.select(explode(array(col("s"), col("p"), col("o"))).as("term"))
      .distinct()
      .select(termIdCol(col("term")).as("id"), col("term"))

  /** Encode a flat (s, p, o) string frame into (s_id, p_id, o_id) — a pure
    * projection: no join, no shuffle, no dictionary lookup (DictSpec
    * asserts the plan is Exchange-free). */
  def encodeFlat(flat: DataFrame): DataFrame =
    flat.select(termIdCol(col("s")).as("s_id"), termIdCol(col("p")).as("p_id"),
      termIdCol(col("o")).as("o_id"))

  /** Decode (s_id, p_id, o_id) back to strings via three dictionary joins.
    * Edge-of-pipeline operator (serialization/output): the three joins
    * shuffle on the ids unless AQE broadcasts the dictionary side. Interior
    * stages should stay in id space instead of round-tripping. */
  def decodeFlat(encoded: DataFrame, dict: DataFrame): DataFrame = {
    val d = dict.select(col("id"), col("term"))
    encoded
      .join(d.as("__ds"), col("s_id") === col("__ds.id"))
      .join(d.as("__dp"), col("p_id") === col("__dp.id"))
      .join(d.as("__do"), col("o_id") === col("__do.id"))
      .select(col("__ds.term").as("s"), col("__dp.term").as("p"),
        col("__do.term").as("o"))
  }

  /** Materialize a flat string-triple frame as an ENCODED store:
    *
    *   <root>/data/bucket=<b>/  (s_id, p_id, o_id) — bucket =
    *                            [[Materialize.bucketCol]] of the subject
    *                            STRING (same pruning as the plain store),
    *                            sorted by s_id per file for row-group
    *                            pruning inside the bucket
    *   <root>/dict/bucket=<b>/  (id, term) — bucket = first 15 hex digits
    *                            of the id, sorted by id per file
    *   <root>/lineage/          same per-bucket resume contract as
    *                            [[Materialize.materialize]]
    *
    * Same rebalance-with-skew-split write shape, cached-frame single-pass
    * stats, and lineage anti-join resume as the plain materializer (see the
    * comments there). The dictionary is rebuilt idempotently on every call
    * (overwrite) — on resume the data buckets skip but the dict pass
    * re-runs; it is the cheap side (distinct terms, not triples). */
  def materializeEncoded(flat0: DataFrame, root: String, numBuckets: Int,
                         batchId: String): DataFrame = {
    val spark = flat0.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    // TWO consumers read the flat triples (the id-encoded data pass and the
    // dictionary distinct) — persist so a lazy upstream (extraction over
    // the page table) is computed once, spilling to disk at scale rather
    // than re-running the whole extract for the dictionary pass (measured:
    // the uncached shape pays the corpus shuffle twice, DictProbe/BENCH.md)
    val flat = flat0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {

    val bucketed = flat.select(Materialize.bucketCol(numBuckets),
      termIdCol(col("s")).as("s_id"), termIdCol(col("p")).as("p_id"),
      termIdCol(col("o")).as("o_id"))
    val remaining = Materialize.readLineage(spark, root) match {
      case Some(lin) =>
        bucketed.join(broadcast(lin.select("bucket").distinct()),
          Seq("bucket"), "left_anti")
      case None => bucketed
    }

    val prevCachedPart = spark.conf
      .get("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "false")
    spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    val cached = remaining.hint("rebalance", col("bucket"))
      .sortWithinPartitions(col("bucket"), col("s_id")).persist()
    try {
      cached.write.mode(SaveMode.Overwrite).partitionBy("bucket")
        .parquet(s"$root/data")
      val stats = cached.groupBy("bucket")
        .agg(count(lit(1)).as("n_triples"),
          countDistinct(col("s_id")).as("n_subjects"))
        .withColumn("batch_id", lit(batchId))
      stats.write.mode(SaveMode.Append).parquet(s"$root/lineage")
    } finally {
      cached.unpersist()
      spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", prevCachedPart)
    }

    termDictionary(flat)
      .withColumn("bucket", bucketColOf(col("term"), numBuckets))
      .hint("rebalance", col("bucket"))
      .sortWithinPartitions(col("bucket"), col("id"))
      .write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(s"$root/dict")

    Materialize.readLineage(spark, root).get
      .filter(col("batch_id") === batchId)
    } finally flat.unpersist()
  }

  /** Point lookup of one subject's description against the ENCODED store,
    * decoded back to strings — output-identical to
    * [[Materialize.lookupSubject]] on a plain store over the same triples
    * (DictSpec asserts it). Bucket id and subject id are computed
    * driver-side, so the data read is partition-pruned to one bucket and
    * row-group-pruned by the s_id sort; the result is metadata-scale by
    * contract (one subject), so its object ids are collected and the
    * dictionary read is pruned to exactly their buckets. */
  def lookupSubjectEncoded(spark: SparkSession, root: String, subject: String,
                           numBuckets: Int): DataFrame = {
    val b = Materialize.bucketOf(subject, numBuckets)
    val sid = termIdBytes(subject)
    val rows = spark.read.parquet(s"$root/data")
      .filter(col("bucket") === b && col("s_id") === lit(sid))
    val objIds = rows.select(col("p_id"), col("o_id")).collect()
      .flatMap(r => Seq(r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1)))
    val ids: Array[Array[Byte]] =
      (objIds :+ sid).map(_.toSeq).distinct.map(_.toArray).toArray
    val dictBuckets = ids.map(bucketOfId(_, numBuckets)).distinct
    val dict = broadcast(
      spark.read.parquet(s"$root/dict")
        .filter(col("bucket").isin(dictBuckets.map(Integer.valueOf): _*))
        .filter(col("id").isin(ids.map(lit): _*))
        .select(col("id"), col("term")))
    rows
      .join(dict.as("__ds"), col("s_id") === col("__ds.id"))
      .join(dict.as("__dp"), col("p_id") === col("__dp.id"))
      .join(dict.as("__do"), col("o_id") === col("__do.id"))
      .select(col("__ds.term").as("s"), col("__dp.term").as("p"),
        col("__do.term").as("o"))
  }
}

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
  * exchange. Id-space rows are 3 x 16 B, fixed width, comparison is a
  * 16-byte memcmp, and sort keys never touch a string. (Measured caveats —
  * lz4 shuffle files and parquet pages compress redundant corpus STRINGS
  * below incompressible hash ids — are in BENCH.md; the layout is opt-in
  * on that evidence.)
  *
  * Why CONTENT-HASH ids instead of dense sequential ids: dense ids need a
  * coordinated global dictionary build — a join on every encode and a
  * serial id-assignment bottleneck (the RDF-3X B+-tree build). Content
  * hashes make `encodeFlat` a PURE PROJECTION: embarrassingly parallel, no
  * shuffle, no dictionary lookup, and deterministic across engines,
  * executors, batches, and re-runs — an id never changes when the corpus
  * grows, so incremental batches and checkpoint resume compose without
  * re-encoding history. Trade: 16 B instead of 4-8 B per id, and no
  * dense-range locality.
  *
  * Hash choice — truncated SHA-256, not md5: the corpus is UNTRUSTED web
  * content, and md5 chosen-prefix collisions are practically constructible
  * (two adversarial pages could share one term id, conflating distinct
  * triples in id-space dedup and fanning out decode joins). Truncating
  * SHA-256 to 128 bits keeps fixed 16-byte ids; honest bounds: accidental
  * collision at 10^12 distinct terms is ~n²/2^129 ≈ 2^-49, and the best
  * ADVERSARIAL attack on the truncated output is the generic birthday
  * search (~2^64 hash evaluations — expensive, not impossible for
  * ASIC-scale attackers). A store that must rule even that out widens
  * `termIdCol` to the full 32-byte digest; everything here is
  * width-agnostic except the documented 16-byte schema.
  *
  * The encoded store written by [[materializeEncoded]] uses the SAME
  * subject bucket function as the plain store ([[Materialize.bucketCol]]
  * on the subject STRING, computed before encoding), so
  * [[Materialize.bucketOf]] prunes both layouts identically and the two
  * stores stay drop-in interchangeable for lookups. The dictionary table
  * buckets on the id's own hex prefix ([[Materialize.bucketColFromHex]] —
  * the one canonical copy of the bucket formula), so decode never needs a
  * term string to find its dictionary partition.
  *
  * Decoding (string round-trip) is an edge concern — serialization and
  * human-facing output. The pipeline interior stays in id space; only
  * [[decodeFlat]] / [[lookupSubjectEncoded]] pay dictionary joins.
  */
object Dict {

  /** 16-byte content-derived term id (truncated SHA-256) as a pure codegen
    * Column. Cross-engine: DuckDB computes the same id as
    * `unhex(substr(sha256(term), 1, 32))`. */
  def termIdCol(term: Column): Column =
    unhex(substring(sha2(term.cast("binary"), 256), 1, 32))

  /** Scala twin of [[termIdCol]] for driver-side point operations. */
  def termIdBytes(term: String): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(term.getBytes(java.nio.charset.StandardCharsets.UTF_8)).take(16)
  }

  private def hexOf(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Dictionary bucket of a term id: the id's own hex prefix through the
    * canonical [[Materialize.bucketOfHex]] — computable from the id alone,
    * so decode never needs the string to find its dictionary partition. */
  def bucketOfId(id: Array[Byte], numBuckets: Int): Int =
    Materialize.bucketOfHex(hexOf(id), numBuckets)

  /** Column twin of [[bucketOfId]] over an id (binary) column. */
  private def dictBucketCol(idCol: Column, n: Int): Column =
    Materialize.bucketColFromHex(lower(hex(idCol)), n)

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

  /** The stored dictionary, or None before the first write. */
  private def readDict(spark: SparkSession, root: String): Option[DataFrame] =
    try Some(spark.read.parquet(s"$root/dict"))
    catch {
      case e: org.apache.spark.sql.AnalysisException
        if Option(e.getCondition).exists(c =>
            c == "PATH_NOT_FOUND" || c == "UNABLE_TO_INFER_SCHEMA") ||
          e.getMessage.contains("Path does not exist") ||
          e.getMessage.contains("Unable to infer schema") => None
    }

  /** Materialize a flat string-triple frame as an ENCODED store:
    *
    *   <root>/data/bucket=<b>/  (s_id, p_id, o_id) — bucket =
    *                            [[Materialize.bucketCol]] of the subject
    *                            STRING (same pruning as the plain store),
    *                            sorted by s_id per file for row-group
    *                            pruning inside the bucket
    *   <root>/dict/bucket=<b>/  (id, term) — bucket = the id's hex prefix,
    *                            sorted by id per file
    *   <root>/lineage/          same per-bucket resume contract as
    *                            [[Materialize.materialize]]
    *
    * Data write: the shared rebalance-with-skew-split core
    * ([[Materialize.writeBucketedData]]) plus the same lineage anti-join
    * resume as the plain materializer. Dictionary write: APPEND-ONLY —
    * only terms not already stored are written (anti-join against the
    * existing dictionary), so a re-run or a later batch over a grown
    * corpus EXTENDS the dictionary and never orphans ids still referenced
    * by data buckets kept from earlier batches (an overwrite from the
    * current batch's corpus alone would silently drop their decode rows).
    * A crash between the data and dict writes self-heals: the next run
    * skips the recorded data buckets and the dict anti-join re-derives
    * exactly the missing terms. */
  def materializeEncoded(flat0: DataFrame, root: String, numBuckets: Int,
                         batchId: String): DataFrame = {
    val spark = flat0.sparkSession
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
          Materialize.checkBucketCount(lin, numBuckets, root)
          bucketed.join(broadcast(lin.select("bucket").distinct()),
            Seq("bucket"), "left_anti")
        case None => bucketed
      }
      Materialize.writeBucketedData(remaining, root, batchId,
        Seq("bucket"), "s_id", numBuckets)

      val terms = termDictionary(flat)
      readDict(spark, root) match {
        case None =>
          terms.withColumn("bucket", dictBucketCol(col("id"), numBuckets))
            .hint("rebalance", col("bucket"))
            .sortWithinPartitions(col("bucket"), col("id"))
            .write.mode(SaveMode.Overwrite).partitionBy("bucket")
            .parquet(s"$root/dict")
        case Some(existing) =>
          // delta only — and eagerly materialized (localCheckpoint) BEFORE
          // the write so the append job never lists the directory it is
          // appending to; the delta is small by construction (new terms of
          // this batch), the full-corpus case is the None branch above
          val delta = terms
            .join(existing.select("id"), Seq("id"), "left_anti")
            .withColumn("bucket", dictBucketCol(col("id"), numBuckets))
            .localCheckpoint()
          try {
            if (delta.head(1).nonEmpty)
              delta.sortWithinPartitions(col("bucket"), col("id"))
                .write.mode(SaveMode.Append).partitionBy("bucket")
                .parquet(s"$root/dict")
          } finally graft.ops.GraphAlgos.releaseLocalCheckpoint(delta)
      }

      Materialize.readLineage(spark, root).get
        .filter(col("batch_id") === batchId)
    } finally flat.unpersist()
  }

  // ----------------------------------------------------------- id-space BGP
  /** Flat-string BGP node: a constant term string or a variable. */
  sealed trait FNode
  final case class FConst(value: String) extends FNode
  final case class FVar(name: String) extends FNode
  final case class FPattern(s: FNode, p: FNode, o: FNode) {
    def vars: Seq[String] = Seq(s, p, o).collect { case FVar(n) => n }
  }

  /** BGP join chain executed ENTIRELY in id space — the payoff of the
    * dictionary layout, and the piece that makes "interior stages stay in
    * id space" true for queries, not just for dedup:
    *
    *   - bound pattern positions become 16-byte binary equality filters
    *     (ids computed driver-side, zero dictionary lookups to START a
    *     query — content-hash ids need no id-resolution join, unlike
    *     dense-id stores);
    *   - the whole join chain (greedy-planned with the engine's BGP
    *     heuristic: fewest unsolved vars, bound subject ≫ predicate ≫
    *     object) shuffles and compares fixed-width 16-byte ids, never a
    *     term string — at 10^12 triples the exchanges carry 48 B/row
    *     regardless of how long IRIs are;
    *   - ONLY the projected variables pay a dictionary decode join, at the
    *     very edge of the plan (RDF-3X's late materialization); join
    *     variables that are not projected are never decoded at all.
    *
    * When the encoded frame carries the store's `bucket` column and
    * `numBuckets` is given, a bound SUBJECT additionally prunes to its one
    * bucket partition (the bucket function is over the subject string, so
    * the constant's bucket is known driver-side), and the per-file s_id
    * sort prunes row groups inside it.
    *
    * The decode edge is TWO-PHASE (`materialize = true`): the solution
    * frame materializes once (eager localCheckpoint — fixed-width ids
    * only), then the DISTINCT projected ids are counted. A result-scale id
    * set (≤ `broadcastIdsMax`) explicitly BROADCASTS into the dictionary
    * join so the dictionary streams — it is never shuffled (AQE alone is
    * not enough: its broadcast conversion happens after both map stages
    * are scheduled, so the dictionary's shuffle WRITE still runs —
    * measured as ~500 MB of dead shuffle on a point query, DictProbe) —
    * and when the dictionary carries the store's `bucket` column, a tiny
    * id set (≤ `pruneCollectMax`) additionally prunes the dictionary read
    * to just the ids' own bucket partitions (the point-lookup regime:
    * 1-2 of 64 partitions read). Above `broadcastIdsMax` the decode is a
    * plain shuffle join — the honest corpus-scale-result cost. The
    * resolved (id, term) map, checkpointed once, joins back per projected
    * variable. A naive single-phase decode (`materialize = false`, kept
    * for plan inspection) shuffles the ENTIRE dictionary through every
    * decode join. The returned frame is backed by its checkpoints; callers
    * in long-lived sessions use [[bgpEncodedReleasable]] and release after
    * consuming.
    *
    * Returns one STRING column per projected variable (flat term strings,
    * the store's own value convention). */
  def bgpEncoded(encoded: DataFrame, dict: DataFrame, patterns: Seq[FPattern],
                 project: Seq[String],
                 numBuckets: Option[Int] = None,
                 materialize: Boolean = true,
                 distinct: Boolean = false,
                 broadcastIdsMax: Long = 1000000L,
                 pruneCollectMax: Long = 8192L): DataFrame =
    bgpEncodedReleasable(encoded, dict, patterns, project, numBuckets,
      materialize, distinct, broadcastIdsMax, pruneCollectMax)._1

  /** [[bgpEncoded]] plus a release handle that frees the two checkpoint
    * blocks (solution ids + decode map) backing the returned frame — call
    * it after the result is consumed (the [[graft.engine.Bgp]]
    * executeIncremental convention). A no-op for `materialize = false`. */
  def bgpEncodedReleasable(encoded: DataFrame, dict: DataFrame,
                           patterns: Seq[FPattern], project: Seq[String],
                           numBuckets: Option[Int] = None,
                           materialize: Boolean = true,
                           distinct: Boolean = false,
                           broadcastIdsMax: Long = 1000000L,
                           pruneCollectMax: Long = 8192L)
      : (DataFrame, () => Unit) = {
    val sol0 = bgpEncodedIds(encoded, patterns, project, numBuckets)
    val sol = if (distinct) sol0.distinct() else sol0

    // late materialization: decode projected vars only, at the plan edge.
    // Alias names carry '#', which SPARQL variable names cannot, so a
    // projected var can never collide with the decode-join columns.
    import graft.ops.GraphAlgos.releaseLocalCheckpoint
    val (solFrame, mapping, release) =
      if (!materialize)
        (sol, dict.select(col("id"), col("term")), () => ())
      else {
        val s = sol.localCheckpoint()
        // NOT checkpointed: the distinct id set is a cheap projection over
        // the solution checkpoint, and its two consumers (the count here,
        // the broadcast build inside the decode-map job) each re-derive it
        // from cached blocks — a third eager materialization job per query
        // bought nothing
        val ids = project.map(vn => s.select(col(vn).as("id")))
          .reduce(_ unionAll _).distinct()
        val n = ids.count()
        val dictSide =
          if (n <= pruneCollectMax && dict.columns.contains("bucket") &&
              numBuckets.isDefined) {
            // point-lookup regime: the ids' own bucket set prunes the
            // dictionary read to a handful of partitions
            val buckets = ids.collect()
              .map(r => bucketOfId(r.getAs[Array[Byte]](0), numBuckets.get))
              .distinct
            dict.filter(col("bucket").isin(buckets.map(Integer.valueOf).toSeq: _*))
          } else dict
        val joined =
          if (n <= broadcastIdsMax)
            // ids broadcast explicitly: relying on AQE alone still pays
            // the dictionary's shuffle WRITE before the conversion lands
            dictSide.join(broadcast(ids), Seq("id"))
          else dictSide.join(ids, Seq("id")) // corpus-scale result: honest shuffle
        val m = joined.select(col("id"), col("term")).localCheckpoint()
        (s, m, () => { releaseLocalCheckpoint(s); releaseLocalCheckpoint(m) })
      }
    var out = solFrame
    val termCols = project.zipWithIndex.map { case (v, ix) =>
      val d = mapping.select(col("id").as(s"__did#$ix"), col("term").as(s"__dt#$ix"))
      out = out.join(d, out(v) === col(s"__did#$ix"))
      col(s"__dt#$ix").as(v)
    }
    (out.select(termCols: _*), release)
  }

  /** The id-space BGP INTERIOR: the greedy-planned join chain over
    * (s_id, p_id, o_id) with NO decode — one 16-byte binary column per
    * projected variable. The composable form for callers that keep
    * processing in id space (further joins, dedup, set ops) and decode
    * later, and the probe point for measuring the join chain apart from
    * the decode edge. */
  def bgpEncodedIds(encoded: DataFrame, patterns: Seq[FPattern],
                    project: Seq[String],
                    numBuckets: Option[Int] = None): DataFrame = {
    require(patterns.nonEmpty, "empty BGP")
    require(project.nonEmpty, "need at least one projected variable")
    val solvable = patterns.flatMap(_.vars).toSet
    val missing = project.filterNot(solvable)
    require(missing.isEmpty, s"projected vars never bound: $missing")
    val hasBucket = numBuckets.isDefined && encoded.columns.contains("bucket")

    // greedy plan — the Bgp.plan heuristic over flat nodes
    var remaining = patterns.toList
    var solved = Set.empty[String]
    val ordered = Seq.newBuilder[FPattern]
    while (remaining.nonEmpty) {
      def status(n: FNode): Int = n match {
        case FConst(_) => 0
        case FVar(nm) => if (solved(nm)) 1 else 2
      }
      def key(p: FPattern): (Int, Int, Int, Int) =
        (p.vars.distinct.count(!solved(_)), status(p.s), status(p.p), status(p.o))
      val best = remaining.minBy(key)
      ordered += best
      solved ++= best.vars
      remaining = remaining.filterNot(_ eq best)
    }

    def scan(p: FPattern): DataFrame = {
      var df = encoded
      val bindings = scala.collection.mutable.ArrayBuffer.empty[(String, Column)]
      def walk(n: FNode, c: Column, subject: Boolean): Unit = n match {
        case FConst(v) =>
          df = df.filter(c === lit(termIdBytes(v)))
          if (subject && hasBucket)
            df = df.filter(col("bucket") ===
              lit(Materialize.bucketOf(v, numBuckets.get)))
        case FVar(nm) => bindings += nm -> c
      }
      walk(p.s, col("s_id"), subject = true)
      walk(p.p, col("p_id"), subject = false)
      walk(p.o, col("o_id"), subject = false)
      val grouped = bindings.groupBy(_._1)
      for ((_, cs) <- grouped if cs.size > 1; other <- cs.tail)
        df = df.filter(cs.head._2 === other._2)
      val proj = grouped.map { case (nm, cs) => cs.head._2.as(nm) }.toSeq
      if (proj.isEmpty) df.select(lit(1).as("__exists")).limit(1)
      else df.select(proj: _*)
    }

    var sol: DataFrame = null
    var joined = Set.empty[String]
    for (p <- ordered.result()) {
      val sc = scan(p)
      if (sol == null) sol = sc
      else {
        val shared = p.vars.distinct.filter(joined)
        sol =
          if (shared.nonEmpty) sol.join(sc, shared, "inner")
          else sol.crossJoin(sc).drop("__exists")
      }
      joined ++= p.vars
    }
    sol.select(project.map(col): _*)
  }

  /** [[bgpEncoded]] over a store written by [[materializeEncoded]]:
    * data scan bucket-pruned for bound subjects, dictionary read only for
    * the decode edge. */
  def queryStoreEncoded(spark: SparkSession, root: String,
                        patterns: Seq[FPattern], project: Seq[String],
                        numBuckets: Int): DataFrame =
    bgpEncoded(spark.read.parquet(s"$root/data"),
      spark.read.parquet(s"$root/dict"), patterns, project, Some(numBuckets))

  /** Point lookup of one subject's description against the ENCODED store,
    * decoded back to strings — output-identical to
    * [[Materialize.lookupSubject]] on a plain store over the same triples
    * (DictSpec asserts it). Bucket id and subject id are computed
    * driver-side, so the data read is partition-pruned to one bucket and
    * row-group-pruned by the s_id sort, and it runs ONCE: the result is
    * metadata-scale by contract (one subject's description), so the rows
    * are collected, the dictionary read is pruned to exactly their ids'
    * buckets, and the decode join runs over the collected local rows. */
  def lookupSubjectEncoded(spark: SparkSession, root: String, subject: String,
                           numBuckets: Int): DataFrame = {
    val b = Materialize.bucketOf(subject, numBuckets)
    val sid = termIdBytes(subject)
    val local = spark.read.parquet(s"$root/data")
      .filter(col("bucket") === b && col("s_id") === lit(sid))
      .select("s_id", "p_id", "o_id").collect()
      .map(r => (r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1),
        r.getAs[Array[Byte]](2)))
    import spark.implicits._
    val rows = local.toSeq.toDF("s_id", "p_id", "o_id")
    val ids: Array[Array[Byte]] = (local.flatMap(t => Seq(t._2, t._3)) :+ sid)
      .map(_.toSeq).distinct.map(_.toArray).toArray
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

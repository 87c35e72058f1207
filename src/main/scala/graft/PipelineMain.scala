package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Materialize, WebKg}

/** Cluster entry point for the full KG construction job — the
  * spark-submit deployment shape of the north rule (run it at N and at 4N
  * executors for the scaling criterion; `tools/submit.sh` wraps the
  * invocation, and `graft.Bench`'s interleaved local[N]/local[4N] pairs
  * are the sandbox proxy for the same comparison).
  *
  * Stages (the north rule's composed pipeline): read the Common-Crawl-style
  * page table (url, warc_ts, html, text, lang) ->
  * OPTIONAL `--normalize-urls` (URL canonicalization BEFORE the snapshot:
  * case/default-port/fragment/tracking-param variants of one resource
  * collapse to one snapshot key instead of surviving as distinct pages;
  * narrow codegen pass, fuses into the snapshot scan) ->
  * keep the newest crawl per url (snapshot) -> OPTIONAL `--domain-curation` (drop WHOLE junk
  * domains first — hosts whose pages are mostly mutual copies or
  * title-less stubs; domain-cardinality keep set, semi-join) ->
  * OPTIONAL `--near-dedup` (drop near-duplicate pages
  * ACROSS urls — mirrors/boilerplate — keeping each LSH cluster's
  * representative; result-scale drop set, anti-join) ->
  * OPTIONAL `--lm-filter <ref-parquet> --lm-max-nll <nats>` (CCNet-shaped
  * LM quality gate: drop pages whose per-token unigram NLL under a
  * reference-trained LM exceeds the threshold; both flags required
  * together — the threshold is corpus-dependent and has no safe default)
  * -> OPTIONAL `--decontaminate <bench-parquet>` (benchmark decontamination:
  * drop pages sharing any word n-gram — `--decontaminate-ngram`, default 8 —
  * with the eval suite; Bloom-prefiltered with an exact verify join, so the
  * benchmark set never needs to broadcast exactly)
  * -> extract triples (one codegen pass over the html) ->
  * OPTIONAL `--canonicalize` (RDF 1.1 IRI percent-encoding normalization,
  * narrow pass) -> OPTIONAL `--link <dict-parquet>` (two-stage fuzzy entity
  * linking against a (surface, entity) dictionary, distribution
  * auto-selected: broadcast for vocabulary-scale dictionaries, shuffled
  * big-dict plan above `--link-broadcast-max` surfaces) -> set-semantic
  * dedup -> materialize the bucketed store with per-bucket lineage
  * (OPTIONAL `--dict-encode`: term-dictionary-encoded layout — 3 x 16-byte
  * content-hash ids per triple at rest and through the write shuffle, term
  * strings once in <out>/dict; see [[graft.pipeline.Dict]]).
  * RESUMABLE: a re-run with the same --out after a mid-write failure skips
  * buckets the lineage table already records (Materialize.materialize's
  * anti-join), so the job continues instead of restarting.
  *
  * `--compact-src <root>` switches to COMPACTION mode: roll an
  * increment-managed store (batch_id/bucket layout, written by
  * Materialize.materializeIncrement) into a fresh snapshot-managed store at
  * --out with global cross-batch set-semantic dedup — the operational entry
  * for the streaming/incremental path.
  *
  * `--stream-pages <dir>` switches to STREAMING ingest mode: a Structured
  * Streaming file source watches the directory, each micro-batch runs
  * extract -> dedup -> increment-store write with per-bucket lineage
  * (exactly-once per file via the checkpoint; idempotent per-bucket
  * replay). `--stream-once` = Trigger.AvailableNow (drain then exit — the
  * backfill/cron shape); without it the query runs until stopped, and an
  * empty watched directory is polled until the first file lands. Metrics
  * report THIS run's lineage delta, not the store's all-time totals. The
  * increment store is rolled into a queryable snapshot with --compact-src.
  *
  * No `.master(...)` here: spark-submit supplies the cluster manager,
  * executor count, and memory — the session only carries job-level conf.
  * Prints ONE JSON metrics line on success, with per-stage wall times in
  * `stages` (stages without their own action fuse into the materialize
  * action — Spark is lazy — and are reported fused; eager boundaries exist
  * only where the plan needs them anyway: the snapshot is persisted when
  * linking because two consumers read it, and the link stage checkpoints
  * its result-scale mention triples).
  */
object PipelineMain {
  private val valueFlags = Set("--pages", "--out", "--buckets", "--batch-id",
    "--link", "--link-threshold", "--link-broadcast-max", "--link-mode",
    "--lm-filter", "--lm-max-nll",
    "--decontaminate", "--decontaminate-ngram",
    "--compact-src", "--stream-pages")
  private val boolFlags = Set("--canonicalize", "--near-dedup",
    "--domain-curation", "--normalize-urls", "--stream-once", "--dict-encode")

  /** STRICT parse ([[Args.strictParse]]): an unknown flag, a typo, a
    * duplicated flag, a dangling flag, or a flag-like token in value
    * position must abort the job, never silently run with defaults. */
  private[graft] def parseArgs(args: Array[String]): Map[String, String] =
    Args.strictParse(args, valueFlags, boolFlags)

  private def jsonStr(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  def main(args: Array[String]): Unit = {
    // the metrics JSON is f-interpolated: pin the root locale so a
    // comma-decimal default locale cannot emit malformed JSON
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val opts = parseArgs(args)
    val out = opts.getOrElse("--out", sys.error("required: --out <store root>"))
    val buckets = {
      val v = opts.getOrElse("--buckets", "64")
      val n =
        try v.toInt
        catch { case _: NumberFormatException =>
          sys.error(s"--buckets must be an integer, got '$v'") }
      if (n <= 0) sys.error(s"--buckets must be positive, got $n")
      n
    }
    // default batch id is unique per invocation: a crashed run resumed
    // with the same command must NOT share the first run's id, or the
    // returned lineage (filtered by batch id) would count the crashed
    // run's buckets as this run's and inflate triples_per_sec
    val batchId = opts.getOrElse("--batch-id",
      f"batch-${System.currentTimeMillis}%013d")
    val compactSrc = opts.get("--compact-src")
    val streamSrc = opts.get("--stream-pages")
    val pagesOpt = opts.get("--pages")
    if (Seq(compactSrc, streamSrc, pagesOpt).flatten.isEmpty)
      sys.error("required: --pages <parquet dir of (url, warc_ts, html, text, lang)>, " +
        "--stream-pages <watched parquet dir>, " +
        "or --compact-src <increment store root>")
    if (Seq(compactSrc, streamSrc, pagesOpt).count(_.nonEmpty) > 1)
      sys.error("--pages, --stream-pages, and --compact-src are mutually " +
        "exclusive modes")
    val constructOnly = Seq("--link", "--link-mode", "--link-threshold",
      "--link-broadcast-max", "--canonicalize", "--near-dedup",
      "--domain-curation", "--lm-filter", "--lm-max-nll",
      "--decontaminate", "--decontaminate-ngram", "--normalize-urls",
      "--dict-encode")
    if (compactSrc.nonEmpty && constructOnly.exists(opts.contains))
      sys.error("--compact-src is a mode of its own: " +
        constructOnly.mkString("/") + " do not apply")
    if (streamSrc.nonEmpty && constructOnly.exists(opts.contains))
      sys.error("--stream-pages runs extract+dedup in-stream: " +
        constructOnly.mkString("/") + " do not apply (run --compact-src " +
        "then a batch pass for those stages)")
    if (opts.contains("--stream-once") && streamSrc.isEmpty)
      sys.error("--stream-once requires --stream-pages")
    // pre-flight value validation: a typo'd --link-mode, a malformed
    // --link-threshold/--link-broadcast-max, or an out-of-range threshold
    // must abort BEFORE the snapshot stage (the most expensive prefix of
    // the job at deployment scale), not inside the link stage after it
    val linkMode = opts.getOrElse("--link-mode", "fuzzy")
    if (linkMode != "fuzzy" && linkMode != "exact")
      sys.error(s"--link-mode must be fuzzy|exact, got '$linkMode'")
    val linkThreshold = opts.get("--link-threshold").map { v =>
      val t = try v.toDouble catch {
        case _: NumberFormatException =>
          sys.error(s"--link-threshold must be a number, got '$v'")
      }
      if (t <= 0.0 || t > 1.0)
        sys.error(s"--link-threshold must be in (0, 1], got '$v' " +
          "(a shingle-Jaccard score; above 1 links nothing, 0 links noise)")
      t
    }.getOrElse(0.5)
    val linkBcastMax = opts.get("--link-broadcast-max").map { v =>
      try v.toLong catch {
        case _: NumberFormatException =>
          sys.error(s"--link-broadcast-max must be an integer, got '$v'")
      }
    }.getOrElse(200000L)
    // LM quality filter: both flags or neither. There is NO default NLL
    // threshold — per-token NLL under a unigram LM is corpus-dependent
    // (vocabulary size and token distribution shift it by whole nats), so
    // a silently-permissive or silently-aggressive default would be worse
    // than requiring the operator to read the score distribution once
    // (TextOps.lmScore over a sample) and choose.
    if (opts.contains("--lm-max-nll") && !opts.contains("--lm-filter"))
      sys.error("--lm-max-nll requires --lm-filter <reference-parquet>")
    val lmMaxNll = opts.get("--lm-filter").map { _ =>
      val v = opts.getOrElse("--lm-max-nll", sys.error(
        "--lm-filter requires --lm-max-nll <nats> (corpus-dependent: run " +
          "TextOps.lmScore over a sample and pick from the score " +
          "distribution; there is no safe universal default)"))
      val t = try v.toDouble catch {
        case _: NumberFormatException =>
          sys.error(s"--lm-max-nll must be a number, got '$v'")
      }
      if (t <= 0.0) sys.error(s"--lm-max-nll must be positive, got '$v'")
      t
    }
    // decontamination n-gram width: 8 by default (between the 13-gram and
    // shorter-window conventions of published decontamination setups — wide
    // enough that natural-language coincidences are rare, narrow enough to
    // catch partial quotes). Only meaningful with --decontaminate.
    if (opts.contains("--decontaminate-ngram") && !opts.contains("--decontaminate"))
      sys.error("--decontaminate-ngram requires --decontaminate <bench-parquet>")
    val decontamN = opts.get("--decontaminate-ngram").map { v =>
      val n = try v.toInt catch {
        case _: NumberFormatException =>
          sys.error(s"--decontaminate-ngram must be an integer, got '$v'")
      }
      // hard upper bound, validated PRE-FLIGHT like every other value:
      // wordNgrams builds an O(n)-node expression per position, so an
      // absurd width would pass the gates' whole expensive prefix and
      // only then kill the driver at plan-construction time. No real
      // decontamination window exceeds a few dozen tokens.
      if (n < 1 || n > 256)
        sys.error(s"--decontaminate-ngram must be in [1, 256], got '$v'")
      n
    }.getOrElse(8)
    // stop only a session WE created — getOrCreate may attach to a host
    // process's session (tests, notebooks), which is not ours to kill
    val preExisting =
      SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val builder = SparkSession.builder()
      .appName("graft-kg-construct")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit owns the master in deployment; SPARK_MASTER is the
    // documented fallback for master-less local runs (sandbox, dev box).
    // For a local[N] fallback, also size shuffle partitions to N: the
    // 200-partition default costs ~2x wall time in the iterative stages
    // (near-dedup clustering rounds schedule 200 tiny tasks per join —
    // measured 95s -> 45s on the 2.56M-page near-dedup run). A
    // spark-submit deployment never takes this branch and keeps its own
    // partitioning conf.
    val spark = sys.env.get("SPARK_MASTER").fold(builder) { m =>
      val b = builder.master(m)
      // local[*] (the common "all cores" form) must get the same sizing
      // as local[N], or the branch's whole point is silently skipped for
      // the most common local master string
      "^local\\[(\\d+|\\*)\\]$".r.findFirstMatchIn(m) match {
        case Some(g) =>
          val cores =
            if (g.group(1) == "*") Runtime.getRuntime.availableProcessors
            else g.group(1).toInt
          b.config("spark.sql.shuffle.partitions",
            math.max(4, cores).toString)
        case None => b
      }
    }.getOrCreate()

    val stages = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed[T](name: String)(f: => T): T = {
      val t = System.nanoTime(); val r = f
      stages(name) = (System.nanoTime() - t) / 1e9; r
    }

    val t0 = System.nanoTime()
    val stats = (compactSrc, streamSrc) match {
      case (Some(src), _) =>
        timed("compact") {
          Materialize.compact(spark, src, out, buckets, batchId)
        }
      case (None, Some(watched)) =>
        // STREAMING ingest mode: watch a directory of page parquet files,
        // run the extract -> dedup -> increment-store pipeline per
        // micro-batch (Structured Streaming checkpoint = exactly-once per
        // file; per-bucket lineage = idempotent replay). `--stream-once`
        // uses Trigger.AvailableNow: drain what is currently in the
        // directory, then exit with metrics — the backfill/cron shape.
        // Without it the query runs until externally stopped (the
        // long-running deployment shape; metrics print on termination).
        // Roll increments into a queryable snapshot store afterwards with
        // --compact-src.
        timed("stream") {
          // schema comes from a batch read of whatever parquet already
          // sits in the watched directory. The continuous shape's whole
          // purpose is to WAIT for files, so an empty directory polls
          // until the first file lands instead of dying at startup;
          // --stream-once (drain what is there NOW) has nothing to drain
          // and aborts with the reason instead.
          def inferSchema(): Option[org.apache.spark.sql.types.StructType] =
            try Some(spark.read.parquet(watched).schema)
            catch {
              case e: org.apache.spark.sql.AnalysisException
                if Option(e.getCondition).exists(c =>
                    c == "PATH_NOT_FOUND" || c == "UNABLE_TO_INFER_SCHEMA") ||
                  e.getMessage.contains("Path does not exist") ||
                  e.getMessage.contains("Unable to infer schema") => None
            }
          val schema = Iterator.continually(inferSchema())
            .zipWithIndex
            .map { case (s, i) =>
              if (s.isEmpty) {
                if (opts.contains("--stream-once"))
                  sys.error(s"--stream-once: no parquet files in '$watched' " +
                    "to drain (schema inference needs at least one file)")
                if (i == 0) Console.err.println(
                  s"stream: waiting for first parquet file in '$watched' ...")
                Thread.sleep(5000)
              }
              s
            }
            .collectFirst { case Some(s) => s }.get
          // PER-RUN delta accounting: the lineage table accumulates over
          // the store's whole life (a resumed checkpoint continues the
          // same store), so the (batch, bucket) rows that existed BEFORE
          // this run are snapshotted eagerly (localCheckpoint — a lazy
          // frame re-listing the same path after the run would see the
          // new rows too) and anti-joined out. Without this, a catch-up
          // run over a large store publishes all-time triples over this
          // run's wall time — an absurd triples_per_sec in the one
          // artifact the metrics record exists for.
          val before = Materialize.readLineage(spark, out)
            .map(_.filter(col("batch_id").startsWith("stream-"))
              .select("batch_id", "bucket").localCheckpoint())
          val q = graft.engine.Streaming.incrementalMaterialize(
            spark, watched, schema, out, buckets,
            availableNow = opts.contains("--stream-once"))
          q.awaitTermination()
          val after = Materialize.readLineage(spark, out)
            .map(_.filter(col("batch_id").startsWith("stream-")))
            .getOrElse(spark.emptyDataFrame
              .select(lit(0L).as("n_triples")).limit(0))
          before.fold(after)(b =>
            after.join(b, Seq("batch_id", "bucket"), "left_anti"))
        }
      case (None, None) =>
        val pages = pagesOpt.get
        val doLink = opts.contains("--link")
        if (!doLink && (opts.contains("--link-mode") ||
            opts.contains("--link-threshold") || opts.contains("--link-broadcast-max")))
          sys.error("--link-mode/--link-threshold/--link-broadcast-max " +
            "require --link <dict-parquet>")
        // prune BEFORE the snapshot: extraction derives everything from the
        // html, so the redundant pre-extracted text column must not ride
        // through the snapshot aggregation's buffers (nested-field pruning
        // does not reach into the max_by struct; measured 2.6x on the
        // snapshot+extract stage — PipeProbe)
        val pagesRead = spark.read.parquet(pages)
          .select("url", "warc_ts", "html", "lang")
        // OPTIONAL URL canonicalization BEFORE the snapshot key is formed:
        // trivially-variant urls of one resource (case, default port,
        // fragment, tracking params) become ONE re-crawl group, so the
        // newest-crawl selection sees them as versions instead of passing
        // each variant through as its own page. Narrow codegen regexp
        // pass — fuses into the snapshot's scan, no own stage timing.
        val pagesNorm =
          if (opts.contains("--normalize-urls"))
            pagesRead.withColumn("url", WebKg.normalizeUrl(col("url")))
          else pagesRead
        val snap0 = WebKg.latestSnapshot(pagesNorm)
        val nearDedup = opts.contains("--near-dedup")
        val domainCur = opts.contains("--domain-curation")
        val lmFilter = opts.contains("--lm-filter")
        val decontam = opts.contains("--decontaminate")
        // linking, near-dedup, and domain curation each add consumers of
        // the snapshot beyond extraction (linking reads the extracted
        // text; near-dedup runs eager clustering actions over it; domain
        // curation aggregates its reputation stats over it) — persist it
        // so the page table is scanned and snapshot-aggregated once,
        // spilling to disk rather than recomputing at 100 TB; with no
        // flag the snapshot stays fully fused into the materialize action
        val extraConsumers = doLink || nearDedup || domainCur || lmFilter ||
          decontam
        // the extracted text is computed ONCE into the cached snapshot:
        // every optional gate (domain curation, near-dedup, LM filter,
        // decontamination, linking) consumes it, and recomputing the
        // full-html regex per stage would scan the corpus html up to five
        // times; one cached column trades memory for those passes
        val snap = if (extraConsumers)
          snap0.withColumn("__text", WebKg.extractedText)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else snap0
        try {
          if (extraConsumers) timed("snapshot")(snap.count())
          // OPTIONAL domain-level curation FIRST (cheapest wholesale
          // drop): aggregate host-reputation stats over the snapshot and
          // semi-join the pages of kept domains. The keep set is
          // domain-cardinality (metadata scale next to the corpus),
          // localCheckpoint'ed inside the stage timing so the stats
          // aggregation runs exactly once — AQE broadcasts the semi-join
          // in the common small-domain-set case. Pages whose URL has no
          // http(s) host parse to the '' pseudo-domain — thousands of
          // unrelated sources would be kept or dropped WHOLESALE as one
          // fake host, so unattributable pages pass through curation
          // (near-dedup and per-page filters still see them).
          val pagesDom = if (domainCur) timed("domain_curation") {
            val keepDoms = WebKg.domainStats(
              snap.select(col("url"), col("html"),
                col("__text").as("text")))
              .filter(col("keep") || col("domain") === "")
              .select("domain").localCheckpoint()
            snap.join(keepDoms,
              WebKg.urlHost(snap("url")) === keepDoms("domain"), "left_semi")
          } else snap
          // OPTIONAL page-level near-dedup BEFORE extraction: mirror /
          // boilerplate pages across urls (the snapshot only collapses
          // re-crawls of ONE url) waste every downstream stage, so drop
          // all but each near-dup cluster's representative here. The drop
          // set is RESULT-scale (one id per dropped page — Dedup
          // .nearDupDropIds, eager: checkpointed inside with the
          // clustering's vertex-scale storage released), anti-joined
          // against the snapshot — AQE broadcasts it when the dup fraction is
          // small. Page identity is xxhash64(url) (seeded, deterministic
          // across runs/engines); a 64-bit collision merges two unrelated
          // pages into one cluster and drops one — ~n^2/2^65 odds, accepted
          // for a lossy-by-design dedup stage.
          // With --link also on, pagesIn has TWO consumers (extraction +
          // linkDocs): each re-runs only the anti-join over the CACHED
          // snapshot and the checkpointed drop set — a broadcast filter in
          // the common small-drop-fraction case, one shuffled anti-join
          // per consumer in the dup-dense worst case. The clustering
          // itself never re-runs (drop is checkpointed).
          val pagesIn = if (nearDedup) timed("near_dedup") {
            val pd = pagesDom.select(xxhash64(col("url")).as("doc_id"),
              lit("web").as("source"), col("__text").as("text"))
            val drop = graft.ops.Dedup.nearDupDropIds(pd)
            pagesDom.join(drop,
              xxhash64(pagesDom("url")) === drop("doc_id"), "left_anti")
          } else pagesDom
          // OPTIONAL LM QUALITY FILTER (CCNet-shaped) after near-dedup:
          // score every surviving page's extracted text by per-token NLL
          // under a unigram LM trained on the --lm-filter reference
          // parquet (any table with a `text` column — a curated dump,
          // wiki slice, or prior-run keeper set) and drop pages above
          // --lm-max-nll. Runs AFTER near-dedup so mirror copies are
          // scored once, BEFORE extraction so rejected pages never cost
          // triple extraction. The drop set is one id per rejected page
          // (result-scale in the intended keep-most regime),
          // localCheckpoint'ed inside the stage timing so the scoring
          // aggregation runs exactly once; AQE broadcasts the anti-join
          // when the reject fraction is small. The reference LM count
          // table is curated-corpus-sized and broadcasts inside lmScore.
          val pagesLm = lmMaxNll.fold(pagesIn) { maxNll =>
            timed("lm_filter") {
              val ref = spark.read.parquet(opts("--lm-filter")).select("text")
              val drop = graft.ops.TextOps.lmScore(
                  pagesIn.select(xxhash64(col("url")).as("doc_id"),
                    col("__text").as("text")), ref, maxNll)
                .filter(!col("keep")).select("doc_id").localCheckpoint()
              pagesIn.join(drop,
                xxhash64(pagesIn("url")) === drop("doc_id"), "left_anti")
            }
          }
          // OPTIONAL BENCHMARK DECONTAMINATION last among the page gates
          // (cheapest corpus after the other drops): pages sharing any
          // word n-gram with the eval suite are dropped so benchmark text
          // never reaches the training-side store. Bloom-prefiltered
          // (contaminationOverlapsBloom): the benchmark's n-gram set ships
          // as a ~1.2 MB/million-key filter — never an exact broadcast
          // set — and only Bloom-surviving candidate n-grams pay the exact
          // verify join, so the drop set is exact. Result-scale drop ids,
          // localCheckpoint'ed inside the stage timing; AQE broadcasts the
          // anti-join in the expected tiny-contamination regime.
          val pagesDecon = opts.get("--decontaminate").fold(pagesLm) { benchPath =>
            timed("decontaminate") {
              val bench = spark.read.parquet(benchPath).select("text")
              val (overlaps, releaseBench) =
                graft.ops.TextOps.contaminationOverlapsBloomReleasable(
                  pagesLm.select(xxhash64(col("url")).as("doc_id"),
                    col("__text").as("text")), bench, decontamN)
              val drop = overlaps.select("doc_id").localCheckpoint()
              // the drop set is materialized (localCheckpoint is eager) —
              // the benchmark n-gram checkpoint behind it is dead now
              releaseBench()
              pagesLm.join(drop,
                xxhash64(pagesLm("url")) === drop("doc_id"), "left_anti")
            }
          }
          val extracted0 = WebKg.extractFlat(pagesDecon)
          // RDF 1.1 IRI canonicalization is a narrow per-row pass — it
          // fuses into the downstream action, so it carries no own timing
          val extracted =
            if (opts.contains("--canonicalize")) WebKg.canonicalizeFlat(extracted0)
            else extracted0
          val withMentions = opts.get("--link") match {
            case Some(dictPath) =>
              val dict = spark.read.parquet(dictPath).select("surface", "entity")
              // distribution auto-select: a vocabulary-scale dictionary
              // broadcasts (zero shuffle on the dictionary side); one that
              // exceeds the cap streams through shuffled joins (the
              // big-dict plan — hinted shuffle_merge so AQE can't
              // re-broadcast it). The count is a metadata-scale action on
              // the dictionary table only.
              val bcast = dict.count() <= linkBcastMax
              // `exact` = the full-corpus production tier (one equi-join +
              // two hash aggs, no shingle/minhash machinery); `fuzzy`
              // (default) additionally links misspelled/variant mentions
              // whose shingle Jaccard clears --link-threshold. Measured on
              // the 2.56M-page table (BENCH.md): the fuzzy residual is
              // roughly half the link-stage cost. linkMode was validated
              // pre-flight, so this dispatch is total.
              val linkDocs =
                pagesDecon.select(col("url").as("doc_id"), col("__text").as("text"))
              val mentions = timed("link") {
                (if (linkMode == "fuzzy")
                  WebKg.entityLinkFuzzyDF(linkDocs, dict,
                    threshold = linkThreshold, broadcastDict = bcast,
                    subjectOf = identity)
                else
                  WebKg.entityLinkExactDF(linkDocs, dict,
                    broadcastDict = bcast, subjectOf = identity))
                  .select("s", "p", "o")
                  // eager, result-scale (one row per (page, entity)): gives
                  // the link stage a true timing boundary and keeps the
                  // downstream union plan lineage-free
                  .localCheckpoint()
              }
              val canonMentions =
                if (opts.contains("--canonicalize")) WebKg.canonicalizeFlat(mentions)
                else mentions
              extracted.unionByName(canonMentions)
            case None => extracted
          }
          val triples = WebKg.dedupTriples(withMentions)
          // OPTIONAL `--dict-encode`: materialize the TERM-DICTIONARY-
          // ENCODED store layout (pipeline.Dict) — triples at rest and
          // through the write shuffle as 3 x 16-byte content-hash ids, term
          // strings once in <out>/dict. Same subject bucket function and
          // lineage/resume contract as the plain layout; lookups via
          // Dict.lookupSubjectEncoded.
          timed("materialize") {
            if (opts.contains("--dict-encode"))
              graft.pipeline.Dict.materializeEncoded(triples, out, buckets, batchId)
            else
              Materialize.materialize(triples, out, buckets, batchId)
          }
        } finally if (extraConsumers) snap.unpersist()
    }
    val agg = stats.agg(
      coalesce(sum("n_triples"), lit(0L)).as("t"),
      count(lit(1)).as("b")).head()
    val (total, written) = (agg.getLong(0), agg.getLong(1))
    val sec = (System.nanoTime() - t0) / 1e9
    val stagesJson = stages.map { case (k, v) => f""""$k%s":$v%.3f""" }
      .mkString("{", ",", "}")
    val src = compactSrc.orElse(streamSrc).orElse(pagesOpt).get
    val mode =
      if (compactSrc.nonEmpty) "compact"
      else if (streamSrc.nonEmpty) "stream"
      else "construct"
    val metricsJson = f"""{"mode":"$mode%s","input":"${jsonStr(src)}%s","out":"${jsonStr(out)}%s","batch_id":"${jsonStr(batchId)}%s","canonicalize":${opts.contains("--canonicalize")}%b,"linked":${opts.contains("--link")}%b,"near_dedup":${opts.contains("--near-dedup")}%b,"domain_curation":${opts.contains("--domain-curation")}%b,"lm_filter":${opts.contains("--lm-filter")}%b,"decontaminate":${opts.contains("--decontaminate")}%b,"normalize_urls":${opts.contains("--normalize-urls")}%b,"dict_encode":${opts.contains("--dict-encode")}%b,"buckets_written":$written%d,"triples":$total%d,"sec":$sec%.3f,"stages":$stagesJson%s,"triples_per_sec":${if (sec > 0) (total / sec).toLong else 0L}%d}"""
    println(metricsJson)
    // persist the run record next to the store: per-bucket counts live in
    // the lineage table; this is the RUN-level lineage (stage wall times,
    // stage flags, totals) a resumed or audited job reads back. One tiny
    // driver-side file per batch — append-only, never overwritten, so a
    // resume run's record sits beside the crashed run's.
    // Hadoop FileSystem, NOT java.nio: --out is a store URI (hdfs://,
    // s3a://, file:/...) in deployment — Paths.get would silently write
    // the record to a bogus LOCAL 'hdfs:' directory next to the driver.
    // The same resolution the store data/lineage writes use.
    val metricsPath = new org.apache.hadoop.fs.Path(out,
      s"metrics/run-$batchId-${System.currentTimeMillis()}.json")
    val fs = metricsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(metricsPath, /* overwrite = */ false)
    try os.write((metricsJson + "\n").getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
    if (preExisting.isEmpty) spark.stop()
  }
}

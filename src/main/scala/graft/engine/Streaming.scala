package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.pipeline.WebKg

/** Structured Streaming face of the engine.
  *
  * The reference's "streaming" is lazy pull-based pipelines and line-wise
  * serialization streams (SURVEY §2.11 — no watermarks/windows exist there).
  * Here the same extraction pipeline runs incrementally: a file-source
  * stream of web pages -> per-microbatch triple extraction (the identical
  * Column plan as batch — exactly-once per file), plus an event-time
  * windowed aggregation with a watermark for the events table. At scale
  * this is the "crawl keeps arriving" deployment: checkpointed, resumable,
  * no recomputation of seen files.
  */
object Streaming {

  /** Streaming triple extraction: watch a directory of page parquet files,
    * extract triples incrementally. The returned DataFrame is a streaming
    * plan — start it with writeStream (foreachBatch -> Materialize for the
    * lineage path). */
  def streamingExtraction(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    WebKg.extractFlat(spark.readStream.schema(schema).parquet(dir))

  /** Event-time windowed counts with a watermark (late data beyond the
    * watermark is dropped). Batch-equivalent: q8_events_agg. */
  def windowedEventCounts(events: DataFrame,
                          window: String = "1 hour",
                          watermark: String = "2 hours"): DataFrame =
    events
      // watermarks need TIMESTAMP (LTZ); parquet streaming may infer NTZ
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("sv"))
      .select(col("window.start").as("h"), col("event_type"), col("n"), col("sv"))

  /** Streaming exact dedup: watermarked dedup on the md5 text hash — the
    * streaming face of `Dedup.exact`. State is bounded by the watermark:
    * a duplicate arriving within `watermark` of the original's event time
    * is dropped, later re-crawls re-emit (at 100 TB the state store
    * cannot hold every hash forever; the watermark IS the dedup horizon).
    * `dropDuplicatesWithinWatermark`, NOT `dropDuplicates("h")`: with a
    * plain key-subset dedup the watermark only filters late input and the
    * per-hash state lives forever — only the WithinWatermark variant
    * actually evicts state at the horizon. Output: first-seen rows
    * (doc_id, h, ts). */
  def streamingExactDedup(docs: DataFrame,
                          watermark: String = "24 hours"): DataFrame =
    docs
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("h", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("h")
      .select(col("doc_id"), col("h"), col("ts"))

  /** One LSH band occurrence of one document (the stateful-dedup input). */
  final case class LshBandRow(doc_id: Long, source: String, band: Int,
                              sig: String, ts: java.sql.Timestamp)
  /** A near-dup candidate pair (d1 < d2). */
  final case class LshCandPair(d1: Long, d2: Long)

  /** STREAMING near-dup candidate generation: the stateful counterpart of
    * `Dedup.minhashLshPairs` for continuous ingestion. Per-row minhash
    * signature + band keys are pure projections (no pre-shuffle
    * aggregation); the only stateful operator is one
    * `flatMapGroupsWithState` keyed by (source, band, sig) — each LSH
    * bucket remembers the doc ids it has seen (capped at `stateCap`) and
    * emits a candidate pair the moment a new arrival lands in a non-empty
    * bucket. State expires on event-time timeout `stateTtlMs` past the
    * bucket's newest event, so at 100 TB/day the store holds only the
    * dedup horizon, not the corpus; `stateCap` bounds any single
    * degenerate bucket.
    *
    * On a static input processed in one batch, the emitted pair set
    * (after the cross-band `distinct`) equals `minhashLshPairs` whenever
    * no bucket overflows the cap — asserted in StreamingSpec and oracled
    * as `stream_dedup_lsh`. Under cap pressure the two diverge by design:
    * batch switches an oversized bucket to linear star pairs around the
    * bucket's min doc_id, while streaming cannot retract already-emitted
    * pairs and instead stops admitting new state.
    * Duplicate pairs (same pair from several bands, or re-crawled ids)
    * are expected; dedup them downstream — e.g. watermarked
    * `dropDuplicates` in the same query, or `distinct()` on the sink. */
  def streamingLshCandidatePairs(docs: DataFrame, numHashes: Int = 8,
                                 rowsPerBand: Int = 2, stateCap: Int = 64,
                                 watermark: String = "24 hours",
                                 stateTtlMs: Long = 24L * 3600 * 1000)
  : org.apache.spark.sql.Dataset[LshCandPair] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val bands = docs
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      // the signature is projected to a NAMED column before bandStructs
      // consumes it numHashes times via element_at: inlining the signature
      // expression per band lane would re-evaluate the whole
      // numHashes-lane minhash per element_at (numHashes^2 interpreted
      // tokenize+hash passes per row — HOFs are CodegenFallback).
      // CollapseProject keeps the boundary: it refuses to inline a
      // non-cheap expression consumed more than once.
      .select(col("doc_id").cast("long").as("doc_id"), col("source"), col("ts"),
        graft.ops.Dedup.rowMinhashSignature(col("text"), numHashes).as("__sig"))
      .select(col("doc_id"), col("source"), col("ts"),
        explode(graft.ops.Dedup.bandStructs(
          col("__sig"), numHashes, rowsPerBand)).as("bs"))
      .select(col("doc_id"), col("source"), col("bs.band").as("band"),
        col("bs.sig").as("sig"), col("ts"))
      // null ts would leave the bucket's state timeout unset (immortal
      // state); null sig (null text) would pool unrelated docs into one
      // shared (source, band, null) bucket and emit spurious pairs — the
      // batch plan drops such docs at the explode, so drop both here too;
      // a null/uncastable doc_id would kill the whole query deserializing
      // into the case class's primitive Long field
      .filter(col("ts").isNotNull && col("sig").isNotNull &&
        col("doc_id").isNotNull)
      .as[LshBandRow]
    bands
      .groupByKey(r => (r.source, r.band, r.sig))
      .flatMapGroupsWithState[List[Long], LshCandPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var seen = state.getOption.getOrElse(List.empty[Long])
            val out = List.newBuilder[LshCandPair]
            var maxTs = Long.MinValue
            rows.foreach { r =>
              if (r.ts != null) maxTs = math.max(maxTs, r.ts.getTime)
              if (!seen.contains(r.doc_id)) {
                seen.foreach(o =>
                  out += LshCandPair(math.min(o, r.doc_id), math.max(o, r.doc_id)))
                if (seen.size < stateCap) seen = r.doc_id :: seen
              }
            }
            state.update(seen)
            if (maxTs != Long.MinValue) state.setTimeoutTimestamp(maxTs + stateTtlMs)
            out.result().iterator
          }
      }
  }

  /** Incremental KG materialization: streaming extraction feeding the
    * bucketed lineage store through foreachBatch — the "crawl keeps
    * arriving" deployment. Each micro-batch runs extract -> dedup ->
    * `Materialize.materialize` with the batch id in the lineage row, so
    * the store is resumable at BOTH levels: Structured Streaming's
    * checkpoint skips seen files, and the lineage table records which
    * buckets each batch completed (idempotent per-bucket overwrite on
    * replay). Returns the started query; stop it via the handle. */
  def incrementalMaterialize(spark: SparkSession, pagesDir: String,
                             schema: StructType, root: String,
                             numBuckets: Int = 16,
                             checkpoint: Option[String] = None,
                             availableNow: Boolean = false)
  : org.apache.spark.sql.streaming.StreamingQuery = {
    val triples = streamingExtraction(spark, pagesDir, schema)
    val writer = triples.writeStream
      .option("checkpointLocation",
        checkpoint.getOrElse(s"$root/_checkpoint"))
    // AvailableNow: drain everything currently in the directory across
    // normal-sized micro-batches, then STOP — the bounded "catch-up run"
    // trigger (backfills, tests, cron-style ingest); default is the
    // continuous file-watching stream
    val triggered =
      if (availableNow) writer.trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      else writer
    triggered
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val deduped = WebKg.dedupTriples(batch.toDF())
        graft.pipeline.Materialize.materializeIncrement(
          deduped, root, numBuckets, f"stream-$batchId%06d")
        ()
      }
      .start()
  }

  /** Run a streaming query over a static directory to completion (test/
    * verify path): memory sink, process-all-available, return the result. */
  def runToCompletion(streaming: DataFrame, queryName: String,
                      outputMode: String = "append"): DataFrame = {
    val spark = streaming.sparkSession
    val q = streaming.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}

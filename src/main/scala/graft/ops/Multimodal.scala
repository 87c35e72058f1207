package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in partition-sized batches.
  *
  * The Spark-side contract (schema, partitioning, batch shape) is real and
  * tested; the actual media decode is STUBBED with a deterministic fake
  * (this environment has no image/audio codecs). Swap `stubDecode` for a
  * real codec (or a Pandas-UDF stage in PySpark) without touching the plan:
  * the decode runs per-partition over an iterator, so batches stream and
  * nothing accumulates on the driver or in executor heaps.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Column-only metadata pass: byte size + content signature. Fully
    * codegen'd; the common "filter by size/signature before decode" step. */
  def describe(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"),
      length(col("payload")).cast("long").as("n_bytes"),
      sha2(col("payload"), 256).as("sig"))

  final case class Feature(media_id: Long, kind: String, n_bytes: Long,
                           feature: Array[Float])

  /** STUB decode: a deterministic fake "feature extraction" — 8 floats
    * derived from payload bytes. A real implementation would decode the
    * image/audio here (per-partition batch, library handle reused across
    * rows); only this function changes. */
  private def stubDecode(payload: Array[Byte]): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake below keeps the
    // pipeline testable without media libraries.
    val out = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      out(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Feature-extraction stage: mapPartitions so the (expensive, external-
    * library) decode amortizes per-batch, exactly how a Pandas-UDF batch
    * would behave. Input needs columns (media_id, kind, payload). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, payload) =>
          Feature(id, kind, payload.length.toLong, stubDecode(payload))
        }
      }.toDF()
  }

  /** STUB resize: the geometry/size bookkeeping of a decode-resize-reencode
    * stage as pure Columns — the real codec swap point is the payload
    * transform (here: a deterministic size bound), everything else (typed
    * output schema, no shuffle, no driver involvement) is the actual
    * contract a real resizer runs under. Output:
    * (media_id, kind, width, height, out_bytes). */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.select(col("media_id"), col("kind"),
      lit(w).as("width"), lit(h).as("height"),
      least(length(col("payload")).cast("long"),
        lit(w.toLong * h / 8)).as("out_bytes"))

  /** Frame sampling for video payloads: one output row per sampled
    * timestamp in [0, duration_ms] step `everyMs` — the explode IS the real
    * plumbing (a decoder would emit one frame per row exactly like this);
    * the frame signature is the deterministic stand-in for decoded frame
    * bytes. Narrow plan: filter + explode, no shuffle. */
  def frameSample(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs))).as("ts_ms"),
        col("payload"))
      .select(col("media_id"), col("ts_ms"),
        md5(concat(col("payload").cast("string"), lit("@"),
          col("ts_ms").cast("string"))).as("frame_sig"))

  /** Deterministic synthetic media table derived from a text corpus (the
    * payload is the UTF-8 of the text — an opaque blob as far as the
    * pipeline is concerned). */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        (pmod(col("doc_id"), lit(16)) * 64 + 64).cast("int").as("width"),
        (pmod(col("doc_id"), lit(9)) * 64 + 64).cast("int").as("height"),
        (col("n_chars") * 10).cast("long").as("duration_ms")).as("meta"))
}

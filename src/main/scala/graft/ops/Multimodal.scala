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
          val p = if (payload == null) Array.emptyByteArray else payload
          Feature(id, kind, p.length.toLong, stubDecode(p))
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
  def frameSample(media: DataFrame, everyMs: Long): DataFrame = {
    require(everyMs > 0, s"everyMs must be positive, got $everyMs")
    // a null or negative duration has no sampleable frames: such videos
    // emit ZERO rows (documented drop) rather than a null sequence or a
    // sequence() boundary exception killing the job
    val dur = col("meta.duration_ms")
    media.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(when(dur.isNotNull && dur >= 0,
          sequence(lit(0L), dur, lit(everyMs)))
          .otherwise(array().cast("array<bigint>"))).as("ts_ms"),
        col("payload"))
      .select(col("media_id"), col("ts_ms"),
        md5(concat(col("payload").cast("string"), lit("@"),
          col("ts_ms").cast("string"))).as("frame_sig"))
  }

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                            width: Int, height: Int)

  /** Deterministic REAL PNG bytes (JDK ImageIO — no external codec deps):
    * pixel (x,y) of image `seed` is a pure function of (seed,x,y), so the
    * same row always produces the same image. */
  private[ops] def encodePng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (((seed * 31 + x * 7 + y * 13) % 0x1000000) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Header-only image dimension decode via the JDK's ImageIO reader
    * registry (PNG/JPEG/GIF/BMP): reads the header, never the pixel data —
    * the cheap "is this image well-formed and what size is it" pass a
    * crawl pipeline runs before any expensive decode. None for
    * undecodable payloads. */
  def imageDims(payload: Array[Byte]): Option[(Int, Int)] = {
    if (payload == null || payload.isEmpty) return None // failed fetch
    // NonFatal everywhere, not just around the reader calls: JDK readers
    // throw IllegalArgumentException / ArrayIndexOutOfBounds (not only
    // IOException) on payloads whose magic matches but whose header is
    // garbage, and the reader PROBE can throw too — a malformed crawl
    // payload must yield None, never a task failure
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      if (iis == null) return None // stripped SPI registry: no provider
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try { r.setInput(iis); Some((r.getWidth(0), r.getHeight(0))) }
          finally r.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Real-image variant of [[synthesize]]: image-kind rows carry an ACTUAL
    * PNG payload whose true dimensions are derived from the id (width =
    * id%16*8+16, height = id%9*8+16); audio/video rows stay opaque text
    * blobs. mapPartitions (the encoder is a JVM library call, amortized
    * per-batch like any codec stage). */
  def synthesizeImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          // floorMod: the Column-based twin uses pmod on purpose — a
          // negative id under signed % would select the image branch with
          // a non-positive width and crash BufferedImage
          val kind = java.lang.Math.floorMod(id, 3L) match {
            case 0L => "image"; case 1L => "audio"; case _ => "video"
          }
          if (kind == "image") {
            val w = java.lang.Math.floorMod(id, 16L).toInt * 8 + 16
            val h = java.lang.Math.floorMod(id, 9L).toInt * 8 + 16
            MediaRow(id, kind, encodePng(w, h, id), w, h)
          } else {
            val bytes = if (text == null) Array.emptyByteArray
                        else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            MediaRow(id, kind, bytes, -1, -1)
          }
        }
      }.toDF()
  }

  /** REAL decode pass: header-sniff every image payload for its true
    * (width, height); non-image (or undecodable) rows report -1. Same
    * per-partition batch contract as [[extractFeatures]]. Output:
    * (media_id, kind, width, height). */
  def decodeImageMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, payload) =>
          val (w, h) =
            if (kind == "image") imageDims(payload).getOrElse((-1, -1))
            else (-1, -1)
          (id, kind, w, h)
        }
      }.toDF("media_id", "kind", "width", "height")
  }

  /** Deterministic synthetic media table derived from a text corpus (the
    * payload is the UTF-8 of the text — an opaque blob as far as the
    * pipeline is concerned). */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      // a null text is an EMPTY payload — the schema declares payload
      // non-nullable, and a null Array[Byte] NPEs typed consumers
      coalesce(col("text").cast("binary"),
        lit(Array.emptyByteArray)).as("payload"),
      struct(
        (pmod(col("doc_id"), lit(16)) * 64 + 64).cast("int").as("width"),
        (pmod(col("doc_id"), lit(9)) * 64 + 64).cast("int").as("height"),
        (col("n_chars") * 10).cast("long").as("duration_ms")).as("meta"))
}

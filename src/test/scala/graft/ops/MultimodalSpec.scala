package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("encodePng produces a real PNG whose header decode returns the true dims") {
    val png = Multimodal.encodePng(48, 32, seed = 7L)
    // PNG magic
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    assert(Multimodal.imageDims(png).contains((48, 32)))
    // deterministic: same seed, same bytes
    assert(Multimodal.encodePng(48, 32, 7L).sameElements(png))
  }

  test("imageDims is None for undecodable payloads") {
    assert(Multimodal.imageDims("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.imageDims(Array.emptyByteArray).isEmpty)
  }

  test("null text, negative ids, and null durations never crash the stubs") {
    import spark.implicits._
    val docs = Seq((-3L, null.asInstanceOf[String], 0L), (1L, "abc", 3L))
      .toDF("doc_id", "text", "n_chars")
    // null text -> EMPTY payload (non-nullable schema), features stay NPE-free
    val media = Multimodal.synthesize(docs)
    assert(media.filter(col("payload").isNull).count() == 0)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 2)
    // row-based synthesis: floorMod keeps negative ids in valid geometry
    assert(Multimodal.synthesizeImages(docs).count() == 2)
    // a video with null/negative duration yields zero frames, not a crash
    val vids = Seq((1L, "video", Array[Byte](1), null.asInstanceOf[java.lang.Long]),
      (2L, "video", Array[Byte](2), java.lang.Long.valueOf(-5L)),
      (3L, "video", Array[Byte](3), java.lang.Long.valueOf(10L)))
      .toDF("media_id", "kind", "payload", "d")
      .withColumn("meta", struct(lit(1).as("width"), lit(1).as("height"),
        col("d").as("duration_ms"))).drop("d")
    val frames = Multimodal.frameSample(vids, 5L)
    assert(frames.collect().map(_.getLong(0)).toSet == Set(3L))
    intercept[IllegalArgumentException](Multimodal.frameSample(vids, 0L))
  }

  test("synthesizeImages + decodeImageMeta: decoded dims match the synthesis formula") {
    import spark.implicits._
    val docs = (0L until 30L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val out = Multimodal.decodeImageMeta(Multimodal.synthesizeImages(docs))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out.size == 30)
    for (i <- 0L until 30L) {
      val (kind, w, h) = out(i)
      if (i % 3 == 0) {
        assert(kind == "image")
        assert(w == (i % 16).toInt * 8 + 16 && h == (i % 9).toInt * 8 + 16)
      } else {
        assert(kind != "image" && w == -1 && h == -1)
      }
    }
  }
}

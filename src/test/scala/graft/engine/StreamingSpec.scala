package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.WebKg

class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("streaming extraction over a file source equals the batch extraction") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val docs = Seq(
      (0L, "alpha beta", "en", "src0", 10L),
      (1L, "gamma delta", "fr", "src1", 11L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val pages = WebKg.synthesizeWebPages(docs)
    pages.write.mode("overwrite").parquet(dir)

    val stream = Streaming.streamingExtraction(spark, dir, pages.schema)
    assert(stream.isStreaming)
    val got = Streaming.runToCompletion(stream, "stream_extract")
    val expected = WebKg.extractFlat(spark.read.parquet(dir))
    assert(got.count() == expected.count())
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("incremental materialize: two page waves land as separate idempotent batches") {
    import spark.implicits._
    val pagesDir = java.nio.file.Files.createTempDirectory("graft_incr_pages").toString
    val root = java.nio.file.Files.createTempDirectory("graft_incr_store").toString
    def docs(ids: Seq[Long]) = ids.map(i =>
      (i, s"wave doc $i text", "en", s"src${i % 2}", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val wave1 = WebKg.synthesizeWebPages(docs(Seq(0L, 1L)))
    wave1.write.mode("append").parquet(pagesDir)

    val q = Streaming.incrementalMaterialize(spark, pagesDir, wave1.schema, root,
      numBuckets = 4)
    q.processAllAvailable()
    val afterWave1 = graft.pipeline.Materialize.readGraph(spark, root).count()
    assert(afterWave1 == WebKg.dedupTriples(WebKg.extractFlat(wave1)).count())

    // second wave: only the new files are processed; old batches untouched
    WebKg.synthesizeWebPages(docs(Seq(2L, 3L))).write.mode("append").parquet(pagesDir)
    q.processAllAvailable()
    q.stop()
    val total = graft.pipeline.Materialize.readGraph(spark, root).count()
    assert(total == 2 * afterWave1) // same doc shape per wave
    // lineage carries one batch id per wave
    val batches = graft.pipeline.Materialize.readLineage(spark, root).get
      .select("batch_id").distinct().collect().map(_.getString(0)).sorted
    assert(batches.length == 2 && batches.forall(_.startsWith("stream-")))
  }

  test("streaming LSH near-dup candidates equal the batch plan on a static corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_slsh").toString
    // exact duplicate texts (share all bands) + distinct docs across sources
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon", "src0"),
      (1L, "alpha beta gamma delta epsilon", "src0"),
      (7L, "alpha beta gamma delta epsilon", "src0"),
      (2L, "totally different words here now", "src0"),
      (3L, "alpha beta gamma delta epsilon", "src1"), // other block: no pair
      (4L, "unrelated text in source one", "src1"))
      .toDF("doc_id", "text", "source")
      .withColumn("ts", expr(
        "TIMESTAMP '2025-01-01 00:00:00' + make_interval(0,0,0,0,0,0,doc_id)"))
    docs.write.mode("overwrite").parquet(dir)

    val stream = Streaming.streamingLshCandidatePairs(
      spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir))
    assert(stream.isStreaming)
    val got = Streaming.runToCompletion(stream.toDF(), "slsh_pairs")
      .distinct().as[(Long, Long)].collect().toSet
    val expected = graft.ops.Dedup.minhashLshPairs(spark.read.parquet(dir))
      .as[(Long, Long)].collect().toSet
    assert(expected == Set((0L, 1L), (0L, 7L), (1L, 7L)))
    assert(got == expected)
  }

  test("streaming LSH drops null-ts and null-text rows (no immortal state, no spurious pairs)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_slsh_null").toString
    // two null-text docs (null band sig) and one null-ts doc: the batch
    // plan drops all of them at the explode — streaming must too, instead
    // of pooling null sigs into one shared bucket / keeping unexpirable
    // state
    Seq(
      (0L, "alpha beta gamma delta epsilon", "src0", "2025-01-01 00:00:00"),
      (1L, "alpha beta gamma delta epsilon", "src0", "2025-01-01 00:00:01"),
      (2L, null.asInstanceOf[String], "src0", "2025-01-01 00:00:02"),
      (3L, null.asInstanceOf[String], "src0", "2025-01-01 00:00:03"),
      (4L, "alpha beta gamma delta epsilon", "src0", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "source", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .write.mode("overwrite").parquet(dir)
    val stream = Streaming.streamingLshCandidatePairs(
      spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir))
    val got = Streaming.runToCompletion(stream.toDF(), "slsh_null")
      .distinct().as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L))) // no (2,3) null-sig pair, no doc-4 pairs
  }

  test("streaming LSH state carries across micro-batches (cross-wave pair)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_slsh2").toString
    def wave(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      .withColumn("source", lit("src0"))
      .withColumn("ts", expr(
        "TIMESTAMP '2025-01-01 00:00:00' + make_interval(0,0,0,0,0,0,doc_id)"))
    wave(Seq(0L -> "the same near dup text", 1L -> "something else entirely"))
      .write.mode("append").parquet(dir)

    val stream = Streaming.streamingLshCandidatePairs(
      spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir))
    val q = stream.toDF().writeStream.format("memory").queryName("slsh_waves")
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("slsh_waves").count() == 0) // no dups yet

    // wave 2: a re-crawl duplicate of doc 0 -> pair found against STATE
    wave(Seq(5L -> "the same near dup text")).write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("slsh_waves").distinct()
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 5L)))
  }

  test("incremental BGP: streamed pattern joins static solutions per wave") {
    import spark.implicits._
    import graft.core.Term
    val dir = java.nio.file.Files.createTempDirectory("graft_ibgp").toString
    def t(s: String, p: String, o: Term) =
      (Term.iri(s), Term.iri(p), o)
    val ex = "http://ex.org/"
    // static graph: doc sources
    val static = Seq(
      t(ex + "d1", ex + "source", Term.str("src3")),
      t(ex + "d2", ex + "source", Term.str("src1")),
      t(ex + "d3", ex + "source", Term.str("src3"))).toDF("s", "p", "o")
    // wave 1 of streamed lang annotations
    Seq(t(ex + "d1", ex + "lang", Term.str("en")),
      t(ex + "d2", ex + "lang", Term.str("fr"))).toDF("s", "p", "o")
      .write.mode("append").parquet(dir)

    import Bgp.dsl._
    val q = Bgp.Pattern(Seq(
      pat(v("doc"), iri(ex + "lang"), v("lang")), // streamed
      pat(v("doc"), iri(ex + "source"), lit("src3"))))
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    spark.catalog.clearCache()
    val inc = Bgp.executeIncremental(spark, static, stream, q, streamedIdx = 0)
    assert(inc.isStreaming)
    // the static solution is PERSISTED (registered with the CacheManager
    // at build time): micro-batches probe the cached relation instead of
    // replaying the static BGP join chain per batch
    assert(!spark.sharedState.cacheManager.isEmpty)
    val qh = inc.writeStream.format("memory").queryName("ibgp")
      .outputMode("append").start()
    qh.processAllAvailable()
    def got() = spark.table("ibgp")
      .select(col("doc")("value"), col("lang")("value"))
      .as[(String, String)].collect().toSet
    assert(got() == Set((ex + "d1", "en"))) // d2 is src1: filtered

    // wave 2: d3's annotation arrives -> one new solution, d1 NOT re-emitted
    Seq(t(ex + "d3", ex + "lang", Term.str("de"))).toDF("s", "p", "o")
      .write.mode("append").parquet(dir)
    qh.processAllAvailable()
    qh.stop()
    assert(got() == Set((ex + "d1", "en"), (ex + "d3", "de")))

    // batch equivalence: same BGP over static ++ all streamed triples
    val batch = Bgp.executeValues(spark, static.unionAll(spark.read.parquet(dir)), q)
      .as[(String, String)].collect().toSet
    assert(batch == got())
  }

  test("incremental BGP: hidden (_-prefixed) shared vars still join") {
    import spark.implicits._
    import graft.core.Term
    val dir = java.nio.file.Files.createTempDirectory("graft_ibgp_h").toString
    val ex = "http://ex.org/"
    // static: docs point at annotation nodes via :hasAnn
    val static = Seq(
      (Term.iri(ex + "d1"), Term.iri(ex + "hasAnn"), Term.iri(ex + "a1")),
      (Term.iri(ex + "d2"), Term.iri(ex + "hasAnn"), Term.iri(ex + "a2")))
      .toDF("s", "p", "o")
    // streamed: annotation VALUES arrive, joined through the hidden var
    Seq((Term.iri(ex + "a1"), Term.iri(ex + "value"), Term.str("v1")))
      .toDF("s", "p", "o").write.mode("append").parquet(dir)
    import Bgp.dsl._
    val q = Bgp.Pattern(Seq(
      pat(v("_a"), iri(ex + "value"), v("v")), // streamed; _a is hidden
      pat(v("doc"), iri(ex + "hasAnn"), v("_a"))))
    val inc = Bgp.executeIncremental(spark,
      static, spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir),
      q, streamedIdx = 0)
    val got = Streaming.runToCompletion(inc, "ibgp_hidden")
    // joined through _a: ONLY d1 pairs with v1 (a cross product would
    // also emit d2), and the hidden var is not a result column
    assert(got.columns.toSeq == Seq("doc", "v"))
    val rows = got.select(col("doc")("value"), col("v")("value"))
      .as[(String, String)].collect().toSet
    assert(rows == Set((ex + "d1", "v1")))
  }

  test("watermarked windowed event counts match batch date_trunc aggregation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_events").toString
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2025-01-01 10:05:00"), "click", 1.0),
      (2L, java.sql.Timestamp.valueOf("2025-01-01 10:55:00"), "click", 2.0),
      (3L, java.sql.Timestamp.valueOf("2025-01-01 11:05:00"), "view", 4.0)
    ).toDF("event_id", "ts", "event_type", "value")
    events.write.mode("overwrite").parquet(dir)

    val stream = Streaming.windowedEventCounts(
      spark.readStream.schema(events.schema).parquet(dir))
    // complete mode: a finite source's watermark never passes the last
    // window, so append would hold the final windows back
    val got = Streaming.runToCompletion(stream, "stream_events", outputMode = "complete")
      .orderBy("h", "event_type").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("2025-01-01 10:00:00.0", "click", 2L, 3.0),
      ("2025-01-01 11:00:00.0", "view", 1L, 4.0)))
  }
}

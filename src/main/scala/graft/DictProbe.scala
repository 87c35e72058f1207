package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.pipeline.{Dict, Materialize, WebKg}

/** Diagnostic (round 5): what does term-dictionary encoding buy the
  * materialize path at deployment scale?
  *
  * Parquet already dictionary-compresses strings AT REST, so the on-disk
  * delta is expected to be modest; the claim under test is the SHUFFLE —
  * the write exchange (and every interior exchange of an id-space
  * pipeline) moves 3 x 16-byte fixed-width ids instead of full term
  * strings, and shuffle files are row-oriented (no columnar dictionary
  * compression, only block lz4). The probe synthesizes a deployment-scale
  * page table, extracts triples, and materializes the SAME triple set
  * twice — plain ([[Materialize.materialize]]) and encoded
  * ([[Dict.materializeEncoded]]) — reporting wall time, shuffle-write
  * bytes (stage-metrics listener), and on-disk store bytes (data + dict).
  *
  *   runMain graft.DictProbe [pages] [buckets]
  */
object DictProbe {
  def main(args: Array[String]): Unit = {
    val pagesN = args.headOption.map(_.toLong).getOrElse(2560000L)
    val buckets = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = BenchSession.local(32, "dictprobe", shufflePartitions = 64)

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    // deterministic web-page corpus, same generator family as the
    // deployment runs: per-page distinct text (distinct textSha objects),
    // 1000 source domains, every page titled or not by the synthesizer's
    // own doc_id % 10 rule
    val docs = spark.range(pagesN).select(
      col("id").as("doc_id"),
      concat(lit("alpha beta gamma corpus token "), col("id"),
        lit(" delta epsilon "), col("id") % 5000).as("text"),
      element_at(array(lit("en"), lit("fr"), lit("de")),
        (col("id") % 3 + 1).cast("int")).as("lang"),
      concat(lit("src"), col("id") % 1000).as("source"))
    // persisted so BOTH spaces' interior-op measurements start from the
    // same materialized rows (extraction cost excluded from the compare)
    val flat = WebKg.extractFlat(WebKg.synthesizeWebPages(docs)).persist()

    def dirBytes(path: String): Long = {
      val root = new java.io.File(path)
      if (!root.exists()) 0L
      else {
        def walk(f: java.io.File): Long =
          if (f.isFile) f.length()
          else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        walk(root)
      }
    }

    // the listener bus is ASYNC: stage-completed events can still be queued
    // when an action returns, which would undercount this run and bleed the
    // late events into the next one's counter — drain by polling until the
    // counter is stable (the public-API stand-in for the private
    // listenerBus.waitUntilEmpty)
    def drainedShuffleBytes(): Long = {
      var prev = -1L
      var cur = shuffleBytes.get
      while (cur != prev) { Thread.sleep(300); prev = cur; cur = shuffleBytes.get }
      cur
    }

    def deleteDir(path: String): Unit = {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(path))
    }

    def run(label: String)(write: String => Unit): Unit = {
      val dir = java.nio.file.Files.createTempDirectory("graft_dictprobe").toString
      drainedShuffleBytes(); shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      write(dir)
      val sec = (System.nanoTime() - t0) / 1e9
      val shuffled = drainedShuffleBytes()
      val dataMb = dirBytes(s"$dir/data") / 1e6
      val dictMb = dirBytes(s"$dir/dict") / 1e6
      println(f"DICT $label%-8s $sec%7.2f s  shuffle=${shuffled / 1e6}%8.1f MB" +
        f"  data=$dataMb%8.1f MB  dict=$dictMb%7.1f MB  total=${dataMb + dictMb}%8.1f MB")
      deleteDir(dir)
    }

    def runOp(label: String)(op: => Long): Unit = {
      drainedShuffleBytes(); shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val n = op
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"DICT $label%-10s $sec%7.2f s  shuffle=${drainedShuffleBytes() / 1e6}%8.1f MB  rows=$n%d")
    }

    val n = flat.count()
    println(s"DICT corpus: $pagesN pages -> $n triples, $buckets buckets")
    // the interior-op claim: the set-semantic dedup exchange (the shape of
    // every id-space interior shuffle) moves 3 x 16 B fixed-width ids
    // instead of full term strings
    for (round <- 1 to 2) {
      println(s"DICT round $round")
      runOp("dedup-str")(flat.dropDuplicates().count())
      runOp("dedup-id")(Dict.encodeFlat(flat).dropDuplicates().count())
    }
    // the write path: both store layouts fed from the SAME materialized
    // deduped triples (localCheckpoint), so only the write differs
    val triples = flat.dropDuplicates().localCheckpoint()
    flat.unpersist()
    for (round <- 1 to 2) {
      println(s"DICT write round $round")
      run("plain")(dir => Materialize.materialize(triples, dir, buckets, "p1"))
      run("encoded")(dir => Dict.materializeEncoded(triples, dir, buckets, "p1"))
    }

    // the QUERY claim: BGPs over the SAME stored triples — term-struct
    // joins (term strings ride every exchange) vs id-space joins with the
    // two-phase late decode (Dict.bgpEncoded: only the distinct projected
    // ids ever meet the dictionary). Two regimes: a 4-pattern star join
    // whose result is CORPUS-scale (~30% of pages — the decode edge at its
    // most expensive) and a selective point query (the common case: the
    // ids frame broadcasts and the dictionary streams without a shuffle).
    // The dictionary build is a one-time store cost, timed separately.
    {
      import graft.engine.Bgp
      import Dict.{FConst, FPattern, FVar}
      val terms = WebKg.termsFromFlat(triples).localCheckpoint()
      runOp("dict-build")(Dict.termDictionary(triples).count())
      val dict = Dict.termDictionary(triples).localCheckpoint()
      val enc = Dict.encodeFlat(triples).localCheckpoint()
      import Bgp.dsl._
      val starStr = Bgp.Pattern(Seq(
        pat(v("d"), iri(WebKg.pType), iri(WebKg.cWebPage)),
        pat(v("d"), iri(WebKg.pLang), lit("en")),
        pat(v("d"), iri(WebKg.pTitle), v("t")),
        pat(v("d"), iri(WebKg.pCreated), v("c"))))
      val starId = Seq(
        FPattern(FVar("d"), FConst(WebKg.pType), FConst(WebKg.cWebPage)),
        FPattern(FVar("d"), FConst(WebKg.pLang), FConst("en")),
        FPattern(FVar("d"), FConst(WebKg.pTitle), FVar("t")),
        FPattern(FVar("d"), FConst(WebKg.pCreated), FVar("c")))
      val title = "Doc 999998" // unique titled page (doc_id % 10 != 9)
      val pointStr = Bgp.Pattern(Seq(
        pat(v("d"), iri(WebKg.pTitle), lit(title)),
        pat(v("d"), iri(WebKg.pCreated), v("c"))))
      val pointId = Seq(
        FPattern(FVar("d"), FConst(WebKg.pTitle), FConst(title)),
        FPattern(FVar("d"), FConst(WebKg.pCreated), FVar("c")))
      for (round <- 1 to 2) {
        println(s"DICT bgp round $round")
        // full query (join chain + decode edge) and the interior alone
        runOp("star-str")(
          Bgp.executeValues(spark, terms, starStr).select("d", "t").count())
        runOp("star-id")(
          Dict.bgpEncoded(enc, dict, starId, Seq("d", "t")).count())
        runOp("star-id-raw")(
          Dict.bgpEncodedIds(enc, starId, Seq("d", "t")).count())
        runOp("point-str")(
          Bgp.executeValues(spark, terms, pointStr).select("d", "c").count())
        runOp("point-id")(
          Dict.bgpEncoded(enc, dict, pointId, Seq("d", "c")).count())
        runOp("point-id-raw")(
          Dict.bgpEncodedIds(enc, pointId, Seq("d", "c")).count())
      }
    }
    spark.stop()
  }
}

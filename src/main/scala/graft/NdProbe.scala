package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, GraphAlgos}
import graft.pipeline.WebKg

/** Stage decomposition of the `--near-dedup` pipeline stage over a REAL
  * page table: times each cumulative prefix of
  * tokenize/minhash -> LSH candidate pairs -> Jaccard verify ->
  * connected components -> drop-id anti-join, so the stage's cost center
  * is the delta between lines.
  *   sbt "runMain graft.NdProbe <pages-parquet-dir> [cores=32]"
  */
object NdProbe {
  def main(args: Array[String]): Unit = {
    val pages = args.headOption.getOrElse("/tmp/nd_pages.parquet")
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = BenchSession.local(cores, s"ndprobe-$cores",
      shufflePartitions = cores)
    def time(name: String)(mk: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = mk
      println(f"NDPROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n%d")
    }
    val snap = WebKg.latestSnapshot(
        spark.read.parquet(pages).select("url", "warc_ts", "html", "lang"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("snapshot(persist)") { snap.count() }
    val pd = snap.select(xxhash64(col("url")).as("doc_id"),
      lit("web").as("source"), WebKg.extractedText.as("text"))
    time("minhash-signatures") { Dedup.minhashSignatures(pd, 8).count() }
    time("+lsh-candidate-pairs") { Dedup.minhashLshPairs(pd).count() }
    time("+jaccard-verify") { Dedup.ngramJaccardPairs(pd).count() }
    time("+connected-components") {
      GraphAlgos.connectedComponents(Dedup.ngramJaccardPairs(pd)
        .select(col("d1").as("a"), col("d2").as("b"))).count()
    }
    time("full-stage(drop+antijoin)") {
      val drop = Dedup.nearDupDropIds(pd) // eager (checkpointed inside)
      snap.join(drop, xxhash64(snap("url")) === drop("doc_id"), "left_anti")
        .count()
    }
    snap.unpersist()
    spark.stop()
  }
}

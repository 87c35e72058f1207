package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, GraphAlgos}

/** Stage decomposition of `dedup_clusters` over a documents table: times
  * pair generation, connected components, and the final cluster join
  * separately, so a slowdown attributes to ONE stage.
  *   sbt "runMain graft.CcProbe <sfDir> [cores=32]"
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = BenchSession.local(cores, s"ccprobe-$cores",
      shufflePartitions = cores)
    def time[T](name: String)(mk: => T): T = {
      val t0 = System.nanoTime()
      val r = mk
      println(f"CCPROBE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = time("ngramJaccardPairs") {
      val p = Dedup.ngramJaccardPairs(docs)
      println(s"CCPROBE   pairs=${p.count()}")
      p
    }
    val comp = time("connectedComponents") {
      val c = GraphAlgos.connectedComponents(
        pairs.select(col("d1").as("a"), col("d2").as("b")))
      println(s"CCPROBE   comp rows=${c.count()}")
      c
    }
    time("cluster-join") {
      val out = docs.select(col("doc_id").cast("long").as("doc_id"))
        .join(comp, col("doc_id") === col("id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("cluster"))
        .withColumn("keep", (col("cluster") === col("doc_id")).cast("int"))
      println(s"CCPROBE   out rows=${out.count()}")
    }
    spark.stop()
  }
}

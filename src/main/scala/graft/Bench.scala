package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.WebKg

/** Benchmark harness. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  "kg_pipeline":{...scaling proxy local[8] vs local[32]...}}
  *
  * The kg_pipeline block is the BASELINE.json scaling criterion evidenced
  * in-sandbox: the same extract->dedup->materialize job at two parallelism
  * levels (8 and 32 cores) on the same input; efficiency =
  * (tp32/tp8)/4, target >= 0.8.
  */
object Bench {

  private val headline = Seq(
    "q1_agg", "q2_join_agg", "q4_window", "dedup_exact", "dedup_minhash_lsh",
    "dedup_simhash", "text_tokens", "text_fingerprint", "embed_cosine_topk",
    "rdf_bgp", "kg_extract", "kg_dedup")

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** The KG construction job measured for scaling: synthesize (×dups) ->
    * extract -> set-semantic dedup -> count. Returns (triples, seconds). */
  private def kgJob(spark: SparkSession, sfDir: String): (Long, Double) = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t0 = System.nanoTime()
    val n = WebKg.dedupTriples(
      WebKg.extractFlat(WebKg.synthesizeWebPages(docs, withDuplicates = true))).count()
    (n, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // --- headline queries at the driver-chosen parallelism
    var spark = session(cpus)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // warm up IO + codegen
    val results = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // --- scaling proxy: same KG job at 8 and 32 cores
    spark = session(8)
    val (n8, warm8) = { kgJob(spark, sfDir); kgJob(spark, sfDir) } // 2nd run = warm
    spark.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    spark = session(32)
    val (n32, warm32) = { kgJob(spark, sfDir); kgJob(spark, sfDir) }
    spark.stop()

    val tp8 = n8 / warm8
    val tp32 = n32 / warm32
    val eff = (tp32 / tp8) / 4.0

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val kg = f"""{"triples":$n32,"sec_8core":$warm8%.3f,"sec_32core":$warm32%.3f,""" +
      f""""triples_per_sec_8core":${tp8.toLong}%d,"triples_per_sec_32core":${tp32.toLong}%d,""" +
      f""""scaling_efficiency":$eff%.3f}"""
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"sf":"$sfDir%s","kg_pipeline":$kg%s}""")
    ()
  }
}

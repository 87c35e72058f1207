package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of named registry queries to one file per
  * query — the per-round plan-evidence artifact (plans/rNN/<q>_before|after).
  *   sbt "runMain graft.PlanDump <outDir> <suffix> <query> [query ...]"
  * Queries whose production path eagerly checkpoints use the same
  * non-materializing plan hooks as [[Explain]], so the dumped plan shows
  * the real join/blocking shape instead of a checkpoint stub.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val planOverrides: Map[String, () => org.apache.spark.sql.DataFrame] = {
      import graft.pipeline.WebKg
      import graft.ops.Similarity
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      import spark.implicits._
      Map(
        "dedup_embed_lsh" -> (() =>
          Similarity.lshNearDupPairs(Queries.embDupCorpus(emb), 0.95,
            materialize = false)),
        "kg_entity_link_big" -> (() =>
          WebKg.fuzzyScored(docs, WebKg.defaultDictionary.toDF("surface", "entity"),
            0.5, broadcastDict = false, materialize = false)),
        "rdf_bgp_idspace" -> (() =>
          Queries.idspaceBgp(spark, sfDir, materialize = false)),
        "dedup_ngram_jaccard" -> (() =>
          graft.ops.Dedup.ngramJaccardPairsLazy(docs)))
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- names) {
      val frame = planOverrides.get(n).map(_.apply())
        .orElse(SparkEntry.queries.get(n).map(_(spark, sfDir)))
      frame match {
        case Some(df) =>
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
          println(s"wrote $outDir/${n}_$suffix.txt")
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline.WebKg

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the KG construction pipeline (synthesize web pages ->
    * extract triples -> set-semantic dedup) on sf0.001; driver smoke-checks
    * rows>0. */
  def entry(spark: SparkSession): DataFrame =
    WebKg.dedupTriples(
      WebKg.extractFlat(WebKg.synthesizeWebPages(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        withDuplicates = true)))
      .groupBy("p").agg(count(lit(1)).as("n"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}

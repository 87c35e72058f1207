package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{NTriples, Quad, Triple}

/** Distributed N-Triples / N-Quads source & sink.
  *
  * Read strategy = the reference's per-line streaming decode
  * (`ntriples/decoder.ex:26-34`) lifted to `spark.read.text` +
  * `mapPartitions`: the format is line-delimited, so splits never cross a
  * statement and the parse is embarrassingly parallel — no shuffle at all.
  * At 100 TB this scales linearly with input splits.
  */
object RdfIO {

  /** Read N-Triples files into a Dataset[Triple]. Strict: malformed lines
    * raise (like the reference's `read_file!`); use `permissive=true` to
    * drop them. */
  def readNTriples(spark: SparkSession, path: String,
                   permissive: Boolean = false): Dataset[Triple] = {
    import spark.implicits._
    spark.read.textFile(path).mapPartitions { lines =>
      lines.flatMap { l =>
        if (permissive)
          try NTriples.parseTripleLine(l) catch { case _: Exception => None }
        else NTriples.parseTripleLine(l)
      }
    }
  }

  def readNQuads(spark: SparkSession, path: String,
                 permissive: Boolean = false): Dataset[Quad] = {
    import spark.implicits._
    spark.read.textFile(path).mapPartitions { lines =>
      lines.flatMap { l =>
        if (permissive)
          try NTriples.parseLine(l) catch { case _: Exception => None }
        else NTriples.parseLine(l)
      }
    }
  }

  /** Parse an in-memory Dataset of N-Triples lines (for decode stages inside
    * a bigger plan). */
  def parseLines(lines: Dataset[String]): Dataset[Triple] = {
    import lines.sparkSession.implicits._
    lines.mapPartitions(_.flatMap(NTriples.parseTripleLine))
  }

  /** Encode triples to N-Triples lines as a Column-only projection (stays in
    * codegen; no lambda). `sorted` gives the reference's `:sort` mode
    * (Unicode code-point order, ntriples/encoder.ex:24-30) — a global sort,
    * only for deterministic/golden output paths. */
  def toNtLines(triples: DataFrame, sorted: Boolean = false): DataFrame = {
    val lines = triples.select(
      Terms.tripleLine(col("s"), col("p"), col("o")).as("value"))
    if (sorted) lines.orderBy("value") else lines
  }

  def writeNTriples(triples: DataFrame, path: String,
                    sorted: Boolean = false, mode: SaveMode = SaveMode.Overwrite): Unit =
    toNtLines(triples, sorted).write.mode(mode).text(path)
}

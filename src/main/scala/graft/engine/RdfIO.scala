package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{NTriples, Quad, TrigEncoder, Triple, Turtle}

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

  // --------------------------------------------------- format detection API

  /** A serialization format descriptor (the reference's Format behaviour,
    * serialization/format.ex:37-76). */
  final case class Format(name: String, mediaType: String, extensions: Seq[String])

  /** The built-in formats, like the reference's @formats list. */
  val formats: Seq[Format] = Seq(
    Format("turtle", "text/turtle", Seq("ttl")),
    Format("ntriples", "application/n-triples", Seq("nt", "ntriples")),
    Format("nquads", "application/n-quads", Seq("nq", "nquads")),
    Format("trig", "application/trig", Seq("trig")))

  /** Detection by name / media type / extension
    * (serialization.ex:73-119). */
  def formatByName(name: String): Option[Format] = formats.find(_.name == name)
  def formatByMediaType(mt: String): Option[Format] = formats.find(_.mediaType == mt)
  def formatByExtension(ext: String): Option[Format] = {
    val e0 = if (ext.startsWith(".")) ext.substring(1) else ext
    val e = e0.toLowerCase // DATA.TTL is as readable as data.ttl
    formats.find(_.extensions.contains(e))
  }
  def detectFormat(path: String): Option[Format] = {
    val dot = path.lastIndexOf('.')
    if (dot < 0) None else formatByExtension(path.substring(dot + 1))
  }

  /** Generic read (the reference's `RDF.Serialization.read_file`): format
    * given by name or detected from the file extension. Returns a quad
    * DataFrame (s/p/o term structs + g, null for the default graph).
    * Line-based formats parse split-parallel; Turtle/TriG parse one
    * document per FILE (documents are small relative to a corpus — the
    * distributed axis is many files), with the file URI as base IRI. */
  def readGraph(spark: SparkSession, path: String,
                formatName: Option[String] = None): DataFrame = {
    import spark.implicits._
    // an EXPLICIT name must resolve or error — silently falling back to
    // extension detection would parse the file as a format the caller
    // never asked for on a typo'd name
    val fmt = formatName match {
      case Some(n) => formatByName(n).getOrElse(
        throw new IllegalArgumentException(
          s"unknown RDF serialization format '$n' " +
            s"(known: ${formats.map(_.name).mkString(", ")})"))
      case None => detectFormat(path).getOrElse(
        throw new IllegalArgumentException(
          s"cannot detect RDF serialization format of '$path'"))
    }
    fmt.name match {
      case "ntriples" =>
        readNTriples(spark, path).map(t => Quad(t.s, t.p, t.o, null)).toDF()
      case "nquads" => readNQuads(spark, path).toDF()
      case tt @ ("turtle" | "trig") =>
        spark.read.option("wholetext", "true").text(path)
          .select(input_file_name().as("f"), col("value"))
          .as[(String, String)]
          .flatMap { case (f, text) =>
            if (tt == "turtle")
              Turtle.parse(text, f).triples.map(t => Quad(t.s, t.p, t.o, null))
            else Turtle.parseTriG(text, f).quads
          }.toDF()
    }
  }

  /** Generic write: line formats distribute; Turtle is a whole-document
    * format, so it writes ONE deterministic document (single reducer by
    * design — use `Graphs.toTurtlePerGroup` for per-document distributed
    * Turtle). */
  def writeGraph(quads: DataFrame, path: String, formatName: String,
                 prefixes: Map[String, String] = Map.empty): Unit = formatName match {
    case "ntriples" => writeNTriples(quads.select("s", "p", "o"), path)
    case "nquads" =>
      val lines = quads.select(concat(
        Terms.ntString(col("s")), lit(" "), Terms.ntString(col("p")), lit(" "),
        Terms.ntString(col("o")),
        when(col("g").isNotNull, concat(lit(" "), Terms.ntString(col("g"))))
          .otherwise(lit("")), lit(" .")).as("value"))
      lines.write.mode(SaveMode.Overwrite).text(path)
    case "turtle" =>
      val spark = quads.sparkSession
      import spark.implicits._
      quads.select(lit("doc").as("k"), col("s"), col("p"), col("o"))
        .transform(df => graft.engine.Graphs.toTurtlePerGroup(df, "k", prefixes))
        .select(col("turtle").as("value")).coalesce(1)
        .write.mode(SaveMode.Overwrite).text(path)
    case "trig" =>
      // whole-document format like Turtle: one deterministic document
      val spark = quads.sparkSession
      import spark.implicits._
      quads.select("s", "p", "o", "g").as[Quad].coalesce(1)
        .mapPartitions(it => Iterator(TrigEncoder.encode(it.toSeq, prefixes)))
        .toDF("value").write.mode(SaveMode.Overwrite).text(path)
    case other => throw new IllegalArgumentException(s"no writer for format '$other'")
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.engine.{Bgp, RdfIO}
import graft.pipeline.{Dict, Materialize, WebKg}
import graft.sparql.{Sparql, SparqlParser, Ast}

/** Cluster entry point for QUERYING — the spark-submit shape that closes
  * the loop on construction: [[PipelineMain]] writes the bucketed store,
  * QueryMain runs a SPARQL query over it (or over any RDF serialization /
  * parquet triple frame) and writes the solutions. Together they are the
  * reference's full user surface as two cluster jobs: build the graph,
  * then query it (`RDF.Graph.query/3`, graph.ex:1283-1285 — here the
  * full SPARQL frontend instead of the BGP map DSL).
  *
  * Input (exactly one):
  *   --store <root>    a store written by PipelineMain / Materialize —
  *                     plain (flat s/p/o strings, lifted to typed terms
  *                     via [[WebKg.termsFromFlat]]) or dict-encoded
  *                     (detected by `<root>/dict`, decoded through the
  *                     dictionary join before the lift)
  *   --data <path>     an RDF serialization file (.nt/.nq/.ttl/.trig,
  *                     format by extension or `--data-format`) or a
  *                     parquet directory (term-struct s/p/o[/g] used
  *                     as-is; flat string s/p/o lifted like a store)
  * Query (exactly one): --query <file> | --query-text <sparql>
  * Output: --out <dir>, required except for ASK. `--format`:
  *   parquet    term-struct solution/triple frame (SELECT default)
  *   values     SELECT only — lexical-value columns (the Bgp.values
  *              projection), parquet
  *   ntriples   CONSTRUCT/DESCRIBE only — deterministic sorted
  *              N-Triples text (CONSTRUCT/DESCRIBE default)
  *
  * Prints ONE JSON metrics line: form, rows, wall_sec, out (plus `ask`
  * for ASK). The row count is read back from the WRITTEN output (parquet
  * footer stats / one text scan of the result), never by running the
  * query a second time.
  *
  * No `.master(...)`: spark-submit owns the cluster shape; SPARK_MASTER
  * is the documented master-less fallback, same contract as
  * [[PipelineMain]]. */
object QueryMain {
  private val valueFlags = Set("--store", "--data", "--data-format",
    "--query", "--query-text", "--out", "--format", "--base")
  private val boolFlags = Set.empty[String]

  private def jsonStr(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** The query dataset as a term frame (s/p/o or s/p/o/g structs). */
  private[graft] def loadData(spark: SparkSession,
                              opts: Map[String, String]): DataFrame =
    (opts.get("--store"), opts.get("--data")) match {
      case (Some(_), Some(_)) | (None, None) =>
        sys.error("exactly one of --store <root> / --data <path> is required")
      case (Some(root), None) =>
        if (opts.contains("--data-format"))
          sys.error("--data-format applies to --data, not --store")
        val dictPath = new org.apache.hadoop.fs.Path(s"$root/dict")
        val fs = dictPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val flat =
          if (fs.exists(dictPath))
            Dict.decodeFlat(
              spark.read.parquet(s"$root/data").select("s_id", "p_id", "o_id"),
              spark.read.parquet(s"$root/dict"))
          else Materialize.readGraph(spark, root)
        WebKg.termsFromFlat(flat.select("s", "p", "o"))
      case (None, Some(path)) =>
        val fmt = opts.get("--data-format")
        val isParquet = fmt.contains("parquet") ||
          (fmt.isEmpty && path.stripSuffix("/").endsWith(".parquet"))
        if (isParquet) {
          val df = spark.read.parquet(path)
          val isTermFrame = df.schema.fields.exists(f =>
            f.name == "s" && f.dataType.isInstanceOf[StructType])
          if (isTermFrame) df
          else WebKg.termsFromFlat(df.select("s", "p", "o"))
        } else RdfIO.readGraph(spark, path, fmt)
    }

  /** Parse + execute + write; returns the metrics JSON line. Factored out
    * of main so tests drive it against their own session. */
  private[graft] def run(spark: SparkSession,
                         opts: Map[String, String]): String = {
    val text = (opts.get("--query"), opts.get("--query-text")) match {
      case (Some(_), Some(_)) | (None, None) =>
        sys.error("exactly one of --query <file> / --query-text <sparql> is required")
      case (Some(f), None) =>
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)),
          java.nio.charset.StandardCharsets.UTF_8)
      case (None, Some(t)) => t
    }
    val base = opts.get("--base").orNull
    // parse once up-front for the FORM (output dispatch + format
    // validation errors fire before any data is read); Sparql.query
    // re-parses internally — parsing is driver-side and trivial
    def form(q: Ast.Query): String = q match {
      case _: Ast.Select => "select"
      case _: Ast.Ask => "ask"
      case _: Ast.Construct => "construct"
      case _: Ast.Describe => "describe"
      case Ast.Scoped(inner, _, _) => form(inner)
    }
    val f = form(SparqlParser.parse(text, base))
    val fmt = opts.getOrElse("--format",
      if (f == "select") "parquet" else "ntriples")
    val outOpt = opts.get("--out")
    if (f != "ask" && outOpt.isEmpty)
      sys.error(s"--out <dir> is required for $f queries")
    f match {
      case "select" if fmt != "parquet" && fmt != "values" =>
        sys.error(s"--format for SELECT is parquet|values, got '$fmt'")
      case "construct" | "describe"
          if fmt != "parquet" && fmt != "ntriples" =>
        sys.error(s"--format for $f is parquet|ntriples, got '$fmt'")
      case _ => ()
    }

    val t0 = System.nanoTime()
    val data = loadData(spark, opts)
    val (rows, askPart) = f match {
      case "ask" =>
        val a = Sparql.askQuery(spark, data, text, base)
        (1L, s""","ask":$a""")
      case "select" =>
        val out = outOpt.get
        val sol = Sparql.select(spark, data, text, base)
        val frame = if (fmt == "values") Bgp.values(sol) else sol
        frame.write.mode("overwrite").parquet(out)
        (spark.read.parquet(out).count(), "")
      case _ => // construct | describe: a triple frame
        val out = outOpt.get
        val triples = Sparql.query(spark, data, text, base)
        if (fmt == "ntriples") {
          RdfIO.writeNTriples(triples, out, sorted = true)
          (spark.read.text(out).count(), "")
        } else {
          triples.write.mode("overwrite").parquet(out)
          (spark.read.parquet(out).count(), "")
        }
    }
    val wall = (System.nanoTime() - t0) / 1e9
    val outPart = outOpt.fold("")(o => s""","out":"${jsonStr(o)}"""")
    f"""{"form":"$f","rows":$rows,"wall_sec":$wall%.3f$outPart$askPart}"""
  }

  def main(args: Array[String]): Unit = {
    val opts = Args.strictParse(args, valueFlags, boolFlags)
    // stop only a session WE created — getOrCreate may attach to a host
    // process's session (tests, notebooks), which is not ours to kill
    val preExisting =
      SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val builder = SparkSession.builder()
      .appName("graft-kg-query")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = sys.env.get("SPARK_MASTER").fold(builder)(m =>
      builder.master(m)).getOrCreate()
    try println(run(spark, opts))
    finally if (preExisting.isEmpty) spark.stop()
  }
}

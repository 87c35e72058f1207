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
  * Query (exactly one): --query <file> | --query-text <sparql> |
  *   --update <file> (SPARQL 1.1 Update, applied FUNCTIONALLY: the input
  *   store/frame is read-only and the whole updated graph writes to
  *   --out — term-struct parquet by default, `--format ntriples|nquads`
  *   for serializations; `rows` in the metrics line counts the result)
  *
  * Encoded-store fast path: when the store is dict-encoded, the output
  * format is `values`, and the query is a SELECT whose WHERE is one plain
  * BGP (see [[idSpaceShape]]), the query runs ENTIRELY in id space
  * ([[Dict.bgpEncoded]]): joins shuffle 16-byte ids, only projected
  * variables pay a dictionary decode join at the edge, and
  * `--buckets <n>` (the store's materialize-time bucket count — MUST
  * match it; a too-small value is caught against the lineage, any other
  * wrong value silently mis-prunes) additionally prunes bound-subject
  * scans to one bucket partition. The metrics line carries
  * `"idspace":true` when this path ran. Constants are admitted onto this
  * path only when value equality provably coincides with the typed
  * engine's term equality under the store lift (see [[idSpaceShape]]), so
  * both paths return identical answers.
  *
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
    "--query", "--query-text", "--update", "--out", "--format", "--base",
    "--buckets")
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
        val flat =
          if (hasDict(spark, root))
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

  private def hasDict(spark: SparkSession, root: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$root/dict")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The query shape that can run ENTIRELY in id space over an encoded
    * store ([[Dict.bgpEncoded]]): a SELECT whose WHERE is ONE plain BGP
    * (no paths / filters / algebra / quoted patterns), no aggregation or
    * ordering, and a plain-variable (or `*`) projection. Returns the flat
    * patterns and the projected variable order.
    *
    * The id path matches by flat value string, while the typed engine
    * matches full terms as lifted by [[WebKg.termsFromFlat]] — so every
    * CONSTANT is admitted only when value equality coincides with typed
    * equality under that lift: subjects and predicates must be IRIs (the
    * only thing the store puts there), and an object constant is admitted
    * only under a BOUND predicate whose lift type it matches (IRI under
    * the IRI-valued predicates, xsd:dateTime under `wkg:created`, plain
    * xsd:string elsewhere). Any other constant — including an object under
    * a VARIABLE predicate, where the lift type is unknowable — falls back
    * to the typed path, which makes the two paths answer-identical by
    * construction. DISTINCT runs over the id solution BEFORE the decode
    * (ids are in bijection with stored terms); LIMIT / OFFSET apply at the
    * end. */
  private[graft] def idSpaceShape(q: Ast.Query)
      : Option[(Seq[Dict.FPattern], Seq[String])] = q match {
    case s: Ast.Select
        if s.groupBy.isEmpty && s.having.isEmpty && s.orderBy.isEmpty =>
      s.where.elems match {
        case Seq(Ast.EBgp(tps)) if tps.nonEmpty =>
          val iriValued = Set(WebKg.pType, WebKg.pLink, WebKg.pMentions)
          def rnode(n: Bgp.Node): Option[Dict.FNode] = n match {
            case Bgp.Bound(t) if t.isIri => Some(Dict.FConst(t.value))
            case Bgp.V(name) => Some(Dict.FVar(name))
            case _ => None // literal/bnode/quoted in a resource position
          }
          def onode(p0: Bgp.Node, n: Bgp.Node): Option[Dict.FNode] = n match {
            case Bgp.V(name) => Some(Dict.FVar(name))
            case Bgp.Bound(t) => p0 match {
              case Bgp.Bound(p) if p.isIri =>
                val ok =
                  if (iriValued(p.value)) t.isIri
                  else if (p.value == WebKg.pCreated)
                    t.isLiteral && t.lang == null &&
                      t.datatype == graft.core.Vocab.xsdDateTime
                  else t.isLiteral && t.lang == null &&
                    t.datatype == graft.core.Vocab.xsdString
                if (ok) Some(Dict.FConst(t.value)) else None
              case _ => None // lift type unknowable under a var predicate
            }
            case _ => None // quoted-triple patterns
          }
          val pats = tps.foldLeft(Option(Vector.empty[Dict.FPattern])) {
            case (acc, Ast.TP(s0, Left(p0), o0)) =>
              for (a <- acc; fs <- rnode(s0); fp <- rnode(p0);
                   fo <- onode(p0, o0))
                yield a :+ Dict.FPattern(fs, fp, fo)
            case _ => None // property-path predicate
          }
          pats.filter(_.nonEmpty).flatMap { ps =>
            val bound = ps.flatMap(_.vars).distinct
            val proj: Option[Seq[String]] =
              if (s.projection.isEmpty)
                // `*`: the engine's one mention-order rule
                Some(Sparql.starProjection(
                  bound.filterNot(_.startsWith("_")).toSet, s.mentionOrder))
              else {
                val names = s.projection.map {
                  case (Ast.EVar(n), None) => Some(n)
                  case _ => None // expressions/aliases: typed path
                }
                if (names.forall(_.isDefined)) Some(names.flatten) else None
              }
            // a projected var the BGP never binds (all-NULL column) and
            // empty projections fall back to the typed path
            proj.filter(p => p.nonEmpty && p.forall(bound.contains))
              .map(p => (ps.toSeq, p))
          }
        case _ => None
      }
    case _ => None
  }

  /** Parse + execute + write; returns the metrics JSON line. Factored out
    * of main so tests drive it against their own session. */
  private[graft] def run(spark: SparkSession,
                         opts: Map[String, String]): String = {
    def readFile(f: String): String =
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)),
        java.nio.charset.StandardCharsets.UTF_8)
    val (text, isUpdate) =
      (opts.get("--query"), opts.get("--query-text"), opts.get("--update")) match {
        case (Some(f), None, None) => (readFile(f), false)
        case (None, Some(t), None) => (t, false)
        case (None, None, Some(f)) => (readFile(f), true)
        case _ => sys.error("exactly one of --query <file> / " +
          "--query-text <sparql> / --update <file> is required")
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
    val f = if (isUpdate) "update" else form(SparqlParser.parse(text, base))
    val fmt = opts.getOrElse("--format",
      if (f == "select" || f == "update") "parquet" else "ntriples")
    val outOpt = opts.get("--out")
    if (f != "ask" && outOpt.isEmpty)
      sys.error(s"--out <dir> is required for $f queries")
    f match {
      case "select" if fmt != "parquet" && fmt != "values" =>
        sys.error(s"--format for SELECT is parquet|values, got '$fmt'")
      case "construct" | "describe"
          if fmt != "parquet" && fmt != "ntriples" =>
        sys.error(s"--format for $f is parquet|ntriples, got '$fmt'")
      case "update" if fmt != "parquet" && fmt != "ntriples" && fmt != "nquads" =>
        sys.error(s"--format for update is parquet|ntriples|nquads, got '$fmt'")
      case _ => ()
    }

    val buckets = opts.get("--buckets").map { v =>
      if (opts.get("--store").isEmpty)
        sys.error("--buckets is the encoded store's bucket count; it needs --store")
      val n =
        try v.toInt
        catch { case _: NumberFormatException =>
          sys.error(s"--buckets must be an integer, got '$v'") }
      if (n <= 0) sys.error(s"--buckets must be positive, got $n")
      n
    }

    val t0 = System.nanoTime()
    // id-space fast path: an ENCODED store + a values-projection SELECT
    // whose WHERE is one plain BGP never decodes the store — the join
    // chain runs on 16-byte ids and only the projected vars pay the
    // dictionary decode edge (Dict.bgpEncoded; see idSpaceShape for the
    // exact shape and its value-identity matching contract). --buckets
    // additionally prunes bound-subject scans to their one bucket.
    val idFast: Option[Long] =
      if (f != "select" || fmt != "values" || opts.contains("--data")) None
      else for {
        root <- opts.get("--store") if hasDict(spark, root)
        q = SparqlParser.parse(text, base)
        (pats, proj) <- idSpaceShape(q)
      } yield {
        // stores record num_buckets in their lineage — validate exactly;
        // for older stores at least the too-small case is detectable from
        // the recorded bucket ids
        for (n <- buckets; lin <- Materialize.readLineage(spark, root)) {
          Materialize.lineageBucketCount(lin) match {
            case Some(stored) =>
              if (stored != n)
                sys.error(s"--buckets $n does not match the store's " +
                  s"recorded bucket count $stored")
            case None =>
              // empty lineage (crash before the first stats append): max
              // is null — nothing recorded to validate against
              val maxRow = lin.agg(org.apache.spark.sql.functions.max("bucket"))
                .collect()(0)
              if (!maxRow.isNullAt(0)) {
                val maxB = maxRow.getAs[Number](0).intValue()
                if (maxB >= n)
                  sys.error(s"--buckets $n cannot be the store's bucket count: " +
                    s"its lineage records bucket id $maxB")
              }
          }
        }
        val sel = q.asInstanceOf[Ast.Select]
        val (decoded, release) = Dict.bgpEncodedReleasable(
          spark.read.parquet(s"$root/data"),
          spark.read.parquet(s"$root/dict"), pats, proj, buckets,
          distinct = sel.distinct || sel.reduced)
        try {
          var sol = decoded
          for (off <- sel.offset) sol = sol.offset(off.toInt)
          for (lim <- sel.limit) sol = sol.limit(lim.toInt)
          sol.write.mode("overwrite").parquet(outOpt.get)
          spark.read.parquet(outOpt.get).count()
        } finally release()
      }
    idFast match {
      case Some(rows) =>
        val wall = (System.nanoTime() - t0) / 1e9
        val wallS = "%.3f".formatLocal(java.util.Locale.ROOT, wall)
        return s"""{"form":"select","rows":$rows,"wall_sec":$wallS""" +
          s""","out":"${jsonStr(outOpt.get)}","idspace":true}"""
      case None => ()
    }

    val data = loadData(spark, opts)
    val (rows, askPart) = f match {
      case "ask" =>
        val a = Sparql.askQuery(spark, data, text, base)
        (1L, s""","ask":$a""")
      case "update" =>
        // SPARQL 1.1 Update, FUNCTIONALLY: the input store/frame is never
        // touched — the updated graph is WRITTEN to --out (term-struct
        // parquet, or N-Triples / N-Quads serializations)
        val out = outOpt.get
        val updated = Sparql.update(spark, data, text, base)
        val hasG = updated.columns.contains("g")
        fmt match {
          case "parquet" =>
            updated.write.mode("overwrite").parquet(out)
            (spark.read.parquet(out).count(), "")
          case "ntriples" =>
            if (hasG) sys.error(
              "the update result holds named graphs — write nquads or parquet")
            RdfIO.writeNTriples(updated, out, sorted = true)
            (spark.read.text(out).count(), "")
          case _ => // nquads
            import org.apache.spark.sql.functions.{col, lit}
            val q =
              if (hasG) updated
              else updated.select(col("s"), col("p"), col("o"),
                lit(null).cast(graft.engine.Terms.termSchema).as("g"))
            RdfIO.writeGraph(q, out, "nquads")
            (spark.read.text(out).count(), "")
        }
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
    val wallS = "%.3f".formatLocal(java.util.Locale.ROOT, wall)
    val outPart = outOpt.fold("")(o => s""","out":"${jsonStr(o)}"""")
    s"""{"form":"$f","rows":$rows,"wall_sec":$wallS$outPart$askPart}"""
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

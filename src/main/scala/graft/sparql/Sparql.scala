package graft.sparql

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}
import graft.core.{Term, TermKind, Vocab, XsdOps}
import graft.engine.{Bgp, Terms}
import graft.engine.Bgp.{Bound, Node, V}
import Ast._

/** SPARQL query engine: query text -> the solution algebra
  * ([[graft.engine.Bgp]]) + Column-compiled expressions ([[SparqlExpr]]),
  * executed as ONE declarative DataFrame plan per query (Catalyst/AQE pick
  * the physical joins; nothing here collects to the driver except ASK's
  * final existence probe).
  *
  * Dataset contract: `data` is a TRIPLE frame (term-struct columns s/p/o —
  * the default graph) or a QUAD frame (s/p/o/g, g NULL = default graph;
  * GRAPH patterns need the quad shape). Pass any frame produced by
  * [[graft.engine.RdfIO]] / [[graft.pipeline.WebKg]].
  *
  * Algebra shapes (each maps to one scalable join): BGP -> pre-planned
  * equi-join chain; OPTIONAL -> left join; MINUS -> left-anti on shared
  * vars; UNION -> unionByName; FILTER (NOT) EXISTS -> a flag column from a
  * distinct-build left join (usable anywhere in an expression, not just at
  * the filter top level); property paths -> composed pair frames with
  * path-doubled closure for `+`/`*`; GROUP BY -> hash aggregation with
  * exact integer SUM and order-insensitive deterministic GROUP_CONCAT.
  *
  * Documented divergences (each the same scalable-equi-join tradeoff the
  * algebra layer documents at `Bgp.scala:249-257`): unbound shared
  * variables never match in joins (well-designed patterns unaffected); a
  * FILTER inside OPTIONAL referencing only outer variables evaluates
  * before the left join, not inside it; GROUP_CONCAT output is sorted
  * (the spec leaves order undefined — sorted is the only deterministic
  * distributed choice). Paths under `GRAPH ?var` run as per-graph pair
  * frames (closures double within one graph, keyed by the graph term);
  * nested GRAPH blocks re-scope against the root dataset and join in.
  */
object Sparql {

  final case class SparqlEngineError(msg: String)
      extends RuntimeException(msg)

  // ------------------------------------------------------------- public API
  /** Parse + execute any query form. SELECT -> one term-struct column per
    * projected variable; ASK -> single boolean column `ask`; CONSTRUCT /
    * DESCRIBE -> a triple frame (s/p/o). */
  def query(spark: SparkSession, data: DataFrame, text: String,
            base: String = null): DataFrame = {
    val (q, scoped) = applyDataset(data, SparqlParser.parse(text, base))
    q match {
      case q: Select => runSelect(spark, scoped, q)
      case q: Ast.Ask =>
        spark.range(1).select(lit(ask(spark, scoped, q)).as("ask"))
      case q: Construct => runConstruct(spark, scoped, q)
      case q: Describe => runDescribe(spark, scoped, q)
      case q: Scoped =>
        throw SparqlEngineError(s"nested dataset scope: $q") // unreachable
    }
  }

  /** SELECT: solutions as term-struct columns. */
  def select(spark: SparkSession, data: DataFrame, text: String,
             base: String = null): DataFrame =
    applyDataset(data, SparqlParser.parse(text, base)) match {
      case (q: Select, scoped) => runSelect(spark, scoped, q)
      case _ => throw SparqlEngineError("not a SELECT query")
    }

  /** SELECT flattened to lexical values (the `Bgp.values` convention). */
  def selectValues(spark: SparkSession, data: DataFrame, text: String,
                   base: String = null): DataFrame =
    Bgp.values(select(spark, data, text, base))

  /** ASK as a driver-side boolean. */
  def askQuery(spark: SparkSession, data: DataFrame, text: String,
               base: String = null): Boolean =
    applyDataset(data, SparqlParser.parse(text, base)) match {
      case (q: Ast.Ask, scoped) => ask(spark, scoped, q)
      case _ => throw SparqlEngineError("not an ASK query")
    }

  /** FROM / FROM NAMED (§13.2): assemble the query dataset from the quad
    * frame's named graphs. The default graph becomes the set-union (RDF
    * merge; bnode labels are kept as-is, the engine's graph-union
    * convention) of the FROM graphs; FROM NAMED restricts the visible
    * named graphs. When either clause appears the dataset is EXACTLY as
    * specified — FROM alone leaves no named graphs, FROM NAMED alone
    * leaves an empty default graph. */
  private def applyDataset(data: DataFrame, q: Query): (Query, DataFrame) =
    q match {
      case Scoped(inner, dflt, named) =>
        if (!data.columns.contains("g"))
          throw SparqlEngineError(
            "FROM dataset clauses need a quad frame (columns s/p/o/g) to select graphs from")
        def inSet(ts: Seq[Term]): Column =
          ts.map(t => col("g") === Terms.constTerm(t))
            .reduceOption(_ || _).getOrElse(lit(false))
        val defGraph = data.filter(inSet(dflt))
          .select(col("s"), col("p"), col("o"),
            lit(null).cast(Terms.termSchema).as("g"))
          .distinct()
        val namedQ = data.filter(inSet(named)).select("s", "p", "o", "g")
        (inner, defGraph.unionByName(namedQ))
      case other => (other, data)
    }

  // ------------------------------------------------------------ the dataset
  /** `data` is the ACTIVE graph (pinned to one named graph inside a bound
    * `GRAPH <iri>` block); `root` stays the whole dataset so nested GRAPH
    * blocks re-scope against the full set of named graphs (§13.3). */
  private final case class Ctx(spark: SparkSession, data: DataFrame,
                               root: DataFrame) {
    val isQuads: Boolean = data.columns.contains("g")
    /** Default graph for pattern matching. */
    lazy val triples: DataFrame =
      if (isQuads) data.filter(col("g").isNull).select("s", "p", "o")
      else data.select("s", "p", "o")
    def quads: DataFrame =
      if (root.columns.contains("g")) root
      else throw SparqlEngineError(
        "GRAPH patterns need a quad frame (columns s/p/o/g)")
    def unit: DataFrame = spark.range(1).drop("id")
  }
  private object Ctx {
    def apply(spark: SparkSession, data: DataFrame): Ctx =
      Ctx(spark, data, data)
  }

  private def env(sol: DataFrame): Map[String, Column] =
    sol.columns.iterator.map(c => c -> sol(c)).toMap

  // ---------------------------------------------------------------- groups
  /** Evaluate a group pattern. `gctx` is the enclosing GRAPH node (None =
    * default graph). Hidden (underscore) variables are dropped at group
    * exit — they scope to the group like the query bnodes they encode. */
  private def evalGroup(ctx: Ctx, g: Group, gctx: Option[Node]): DataFrame = {
    var sol: DataFrame = null
    def cur: DataFrame = if (sol == null) ctx.unit else sol
    val filters = Seq.newBuilder[Expr]
    for (elem <- g.elems) elem match {
      case EBgp(tps) => sol = joinInto(sol, evalBgp(ctx, tps, gctx))
      case EGroup(sub) => sol = joinInto(sol, evalGroup(ctx, sub, gctx))
      case ESubSelect(q) => sol = joinInto(sol, runSelect(ctx.spark, ctx.data, q))
      case EOptional(sub) => sol = Bgp.optional(cur, evalGroup(ctx, sub, gctx))
      case EMinusG(sub) => sol = Bgp.minus(cur, evalGroup(ctx, sub, gctx))
      case EUnion(alts) =>
        sol = joinInto(sol, alts.map(evalGroup(ctx, _, gctx)).reduce(Bgp.union))
      case EGraphG(name, sub) =>
        // nested GRAPH re-scopes the active graph against the ROOT
        // dataset's named graphs (§13.3) and joins into the enclosing
        // solution on shared variables — the outer gctx does not apply
        // inside the nested block.
        sol = joinInto(sol, evalGraphBlock(ctx, name, sub))
      case EFilter(e) => filters += e
      case EBind(e, v) =>
        val base = cur
        if (base.columns.contains(v))
          throw SparqlEngineError(s"BIND would rebind already-bound ?$v")
        sol = base.withColumn(v, SparqlExpr.compile(e, env(base)))
      case EValues(vars, rows) =>
        sol = joinInto(sol, valuesFrame(ctx.spark, vars, rows))
    }
    // FILTERs scope to the whole group (§18.2.2.2): apply after assembly
    var out = cur
    for (f <- filters.result()) {
      val (rewritten, sol2) = rewriteExists(ctx, f, out, gctx)
      out = sol2.filter(SparqlExpr.compileBool(rewritten, env(sol2)))
      out = dropByPrefix(out, "__ex")
    }
    dropByPrefix(out, "_")
  }

  private def joinInto(sol: DataFrame, next: DataFrame): DataFrame =
    if (sol == null) next else Bgp.joinSolutions(sol, next)

  private def dropByPrefix(df: DataFrame, prefix: String): DataFrame = {
    val doomed = df.columns.filter(_.startsWith(prefix))
    if (doomed.isEmpty) df else df.drop(doomed.toIndexedSeq: _*)
  }

  /** GRAPH name { sub }: bound name pins one named graph (the sub-group
    * evaluates over its triples, full feature set); a variable ranges over
    * named graphs — each BGP matches within one graph and the variable
    * joins across patterns (Bgp.executeGraph). */
  private def evalGraphBlock(ctx: Ctx, name: Node, sub: Group): DataFrame =
    name match {
      case Bound(t) =>
        val pinned = ctx.quads.filter(col("g") === Terms.constTerm(t))
          .select("s", "p", "o")
        val sol = evalGroup(Ctx(ctx.spark, pinned, ctx.root), sub, gctx = None)
        // §18.6: an IRI naming NO graph in the dataset is the EMPTY
        // multiset — even for sub-patterns that match vacuously (empty
        // group, pure FILTER/BIND). One-row existence gate, cross-joined:
        // identity when the graph exists, empties the block otherwise.
        val gate = ctx.quads.filter(col("g") === Terms.constTerm(t))
          .select(lit(1).as("__gx")).limit(1)
        sol.crossJoin(gate).drop("__gx")
      case v @ V(_) => evalGroup(ctx, sub, gctx = Some(v))
      case other =>
        throw SparqlEngineError(s"GRAPH needs a variable or IRI, got $other")
    }

  // ------------------------------------------------------------------ BGPs
  /** One BGP element: plain patterns run through the engine's greedy
    * planner as a single join chain; each path pattern becomes its own
    * pair frame; everything equi-joins on shared (incl. hidden) vars. */
  private def evalBgp(ctx: Ctx, tps: Seq[TP], gctx: Option[Node]): DataFrame = {
    val plain = tps.collect { case TP(s, Left(p), o) => Bgp.TriplePattern(s, p, o) }
    val paths = tps.collect { case TP(s, Right(p), o) => (s, p, o) }
    gctx match {
      case Some(gv) =>
        // plain patterns match within ONE named graph (executeGraph);
        // each path pattern becomes a per-graph pair frame carrying the
        // graph term, bound to the same graph variable so everything
        // equi-joins on it (within-one-graph semantics, §13.3).
        var sol: DataFrame = null
        if (plain.nonEmpty || paths.isEmpty)
          // the All form keeps hidden (bnode) vars: the per-graph path
          // frames join on them; group exit drops them (evalGroup)
          sol = Bgp.executeGraphAll(ctx.spark, ctx.quads, gv,
            Bgp.Pattern(plain))._1
        for ((s, p, o) <- paths)
          sol = joinInto(sol, evalPathG(ctx, s, p, o, gv))
        sol
      case None =>
        var sol: DataFrame = null
        if (plain.nonEmpty) {
          val (frame, _) = Bgp.executeAll(ctx.triples, Bgp.Pattern(plain))
          sol = frame
        }
        for ((s, p, o) <- paths)
          sol = joinInto(sol, evalPath(ctx, s, p, o))
        if (sol == null) ctx.unit else sol
    }
  }

  // ------------------------------------------------------------------ paths
  /** Pair frame (columns a, b) of endpoints connected by `p`. */
  private def pathPairs(ctx: Ctx, p: Path): DataFrame = p match {
    case PLink(t) =>
      ctx.triples.filter(col("p") === Terms.constTerm(t))
        .select(col("s").as("a"), col("o").as("b"))
    case PInv(q) =>
      pathPairs(ctx, q).select(col("b").as("a"), col("a").as("b"))
    case PSeq(q, r) =>
      val l = pathPairs(ctx, q).select(col("a"), col("b").as("__m"))
      val rr = pathPairs(ctx, r).select(col("a").as("__m"), col("b"))
      l.join(rr, "__m").select(col("a"), col("b"))
    case PAlt(q, r) => pathPairs(ctx, q).unionAll(pathPairs(ctx, r))
    case PNeg(iris) =>
      val hits = iris.map(t => col("p") === Terms.constTerm(t))
        .reduce(_ || _)
      ctx.triples.filter(!hits).select(col("s").as("a"), col("o").as("b"))
    case PMod(q, '+') =>
      Bgp.closurePairs(pathPairs(ctx, q), reflexiveOver = None)
    case PMod(q, '*') =>
      Bgp.closurePairs(pathPairs(ctx, q), reflexiveOver = Some(graphNodes(ctx)))
    case PMod(q, '?') =>
      pathPairs(ctx, q)
        .unionAll(graphNodes(ctx).select(col("a"), col("a").as("b")))
        .distinct()
    case PMod(_, m) => throw SparqlEngineError(s"unknown path modifier $m")
  }

  /** Zero-length-path universe: every subject and object in the graph
    * (SPARQL §9.3). One distinct over two pruned columns. */
  private def graphNodes(ctx: Ctx): DataFrame =
    ctx.triples.select(col("s").as("a"))
      .unionAll(ctx.triples.select(col("o").as("a"))).distinct()

  /** Bind a pair frame's endpoints to the pattern's subject/object. */
  private def evalPath(ctx: Ctx, s: Node, p: Path, o: Node): DataFrame = {
    var pairs = pathPairs(ctx, p)
    def bindEnd(n: Node, c: String): Option[String] = n match {
      case Bound(t) => pairs = pairs.filter(col(c) === Terms.constTerm(t)); None
      case V(name) => Some(name)
      case other =>
        throw SparqlEngineError(s"quoted-triple patterns cannot anchor a property path ($other)")
    }
    (bindEnd(s, "a"), bindEnd(o, "b")) match {
      case (Some(sv), Some(ov)) if sv == ov =>
        pairs.filter(col("a") === col("b")).select(col("a").as(sv))
      case (Some(sv), Some(ov)) =>
        pairs.select(col("a").as(sv), col("b").as(ov))
      case (Some(sv), None) => pairs.select(col("a").as(sv))
      case (None, Some(ov)) => pairs.select(col("b").as(ov))
      case (None, None) =>
        // both ends bound: an existence test — at most one solution
        pairs.select(lit(1).as("__exists")).limit(1).drop("__exists")
    }
  }

  // ------------------------------------------- paths under GRAPH ?var
  /** Per-named-graph pair frame (columns a, b, g): endpoints connected by
    * `p` WITHIN one named graph — sequences compose and closures double
    * only where the graph term matches, so `GRAPH ?g { :x :p+ ?y }` never
    * crosses graph boundaries. */
  private def pathPairsG(ctx: Ctx, p: Path): DataFrame = {
    val named = ctx.quads.filter(col("g").isNotNull)
    p match {
      case PLink(t) =>
        named.filter(col("p") === Terms.constTerm(t))
          .select(col("s").as("a"), col("o").as("b"), col("g"))
      case PInv(q) =>
        pathPairsG(ctx, q).select(col("b").as("a"), col("a").as("b"), col("g"))
      case PSeq(q, r) =>
        val l = pathPairsG(ctx, q)
          .select(col("a"), col("b").as("__m"), col("g"))
        val rr = pathPairsG(ctx, r)
          .select(col("a").as("__m"), col("b"), col("g").as("__gr"))
        l.join(rr, l("__m") === rr("__m") && l("g") === rr("__gr"))
          .select(l("a"), rr("b"), l("g"))
      case PAlt(q, r) => pathPairsG(ctx, q).unionAll(pathPairsG(ctx, r))
      case PNeg(iris) =>
        val hits = iris.map(t => col("p") === Terms.constTerm(t))
          .reduce(_ || _)
        named.filter(!hits)
          .select(col("s").as("a"), col("o").as("b"), col("g"))
      case PMod(q, '+') =>
        Bgp.closurePairs(pathPairsG(ctx, q), reflexiveOver = None,
          key = Seq("g"))
      case PMod(q, '*') =>
        Bgp.closurePairs(pathPairsG(ctx, q),
          reflexiveOver = Some(graphNodesG(ctx)), key = Seq("g"))
      case PMod(q, '?') =>
        pathPairsG(ctx, q)
          .unionAll(graphNodesG(ctx)
            .select(col("a"), col("a").as("b"), col("g")))
          .distinct()
      case PMod(_, m) => throw SparqlEngineError(s"unknown path modifier $m")
    }
  }

  /** Zero-length-path universe per named graph: every subject and object
    * OF that graph (columns a, g). */
  private def graphNodesG(ctx: Ctx): DataFrame = {
    val named = ctx.quads.filter(col("g").isNotNull)
    named.select(col("s").as("a"), col("g"))
      .unionAll(named.select(col("o").as("a"), col("g"))).distinct()
  }

  /** Bind a per-graph pair frame's endpoints and graph term to the
    * pattern's subject/object and the GRAPH variable. An endpoint that
    * REUSES the graph variable name becomes an equality filter against
    * the graph term (so `GRAPH ?g { ?g :p ?y }` never projects `g`
    * twice). */
  private def evalPathG(ctx: Ctx, s: Node, p: Path, o: Node,
                        gv: Node): DataFrame = {
    var pairs = pathPairsG(ctx, p)
    val gName: Option[String] = gv match {
      case V(name) => Some(name)
      case Bound(t) =>
        pairs = pairs.filter(col("g") === Terms.constTerm(t)); None
      case other =>
        throw SparqlEngineError(s"GRAPH needs a variable or IRI, got $other")
    }
    def bindEnd(n: Node, c: String): Option[String] = n match {
      case Bound(t) => pairs = pairs.filter(col(c) === Terms.constTerm(t)); None
      case V(name) if gName.contains(name) =>
        pairs = pairs.filter(col(c) === col("g")); None
      case V(name) => Some(name)
      case other =>
        throw SparqlEngineError(s"quoted-triple patterns cannot anchor a property path ($other)")
    }
    val sEnd = bindEnd(s, "a")
    val oEnd = bindEnd(o, "b")
    val ends: Seq[Column] = (sEnd, oEnd) match {
      case (Some(sv), Some(ov)) if sv == ov =>
        pairs = pairs.filter(col("a") === col("b"))
        Seq(col("a").as(sv))
      case (Some(sv), Some(ov)) => Seq(col("a").as(sv), col("b").as(ov))
      case (Some(sv), None) => Seq(col("a").as(sv))
      case (None, Some(ov)) => Seq(col("b").as(ov))
      case (None, None) => Nil
    }
    val proj = ends ++ gName.map(n => col("g").as(n))
    if (proj.isEmpty)
      // both ends and the graph bound: an existence test
      pairs.select(lit(1).as("__exists")).limit(1).drop("__exists")
    else pairs.select(proj: _*)
  }

  // ------------------------------------------------------------- EXISTS
  /** Replace every (NOT) EXISTS in `e` with a boolean-term flag column
    * computed by ONE distinct-build left join per EXISTS — the flag is an
    * ordinary column, so EXISTS composes anywhere in an expression (the
    * top-level-only shortcut via left-semi would not). */
  private def rewriteExists(ctx: Ctx, e: Expr, solIn: DataFrame,
                            gctx: Option[Node]): (Expr, DataFrame) = {
    var sol = solIn
    var n = 0
    def walk(x: Expr): Expr = x match {
      case EExists(g, negated) =>
        val sub = evalGroup(ctx, g, gctx)
        val shared = sol.columns.toSet.intersect(sub.columns.toSet).toSeq.sorted
        val flag = s"__ex$n"; n += 1
        val marker = Terms.constTerm(Term.bool(true))
        sol =
          if (shared.nonEmpty) {
            val build = sub.select(shared.map(col): _*).distinct()
              .withColumn(flag, marker)
            sol.join(build, shared, "left")
          } else {
            val build = sub.limit(1).select(marker.as(flag))
            sol.join(build, lit(true), "left")
          }
        val present = ECall("COALESCE",
          Seq(EVar(flag), EConst(Term.bool(false))))
        if (negated) ENot(present) else present
      case EBin(op, l, r) => EBin(op, walk(l), walk(r))
      case ENot(y) => ENot(walk(y))
      case ENeg(y) => ENeg(walk(y))
      case EIn(y, list, neg) => EIn(walk(y), list.map(walk), neg)
      case ECall(fn, args) => ECall(fn, args.map(walk))
      case other => other
    }
    val rewritten = walk(e)
    (rewritten, sol)
  }

  // ------------------------------------------------------------- VALUES
  private def valuesFrame(spark: SparkSession, vars: Seq[String],
                          rows: Seq[Seq[Option[Term]]]): DataFrame = {
    val schema = StructType(vars.map(v =>
      StructField(v, Terms.termSchema, nullable = true)))
    val data = rows.map { cells =>
      Row(cells.map(_.map(t => Row(t.kind, t.value, t.datatype, t.lang)).orNull): _*)
    }
    spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava), schema)
  }

  // ------------------------------------------------------------- SELECT
  /** The engine's term order (`XsdOps.sortKey` semantics) as PURE Column
    * keys — no UDF, so ORDER BY / MIN / MAX stay inside whole-stage
    * codegen: (class, numeric value, NT-string tiebreak). Unbound sorts
    * first (empty class), then terms by kind, numerics by value ("N" <
    * "S"), everything else by its N-Triples form. Numeric order rides a
    * double — two distinct numerics beyond 2^53 that collapse to one
    * double fall back to lexical tiebreak (the Scala `XsdOps.sortKey` is
    * exact there; SPARQL leaves equal-value order undefined anyway). */
  private def sortKeyCols(t: Column): Seq[Column] = {
    val num = SparqlExpr.numD(t)
    val cls = when(t.isNull, lit(""))
      .when(num.isNotNull, concat(t("kind").cast("string"), lit("|N")))
      .otherwise(concat(t("kind").cast("string"), lit("|S")))
    Seq(cls, num, Terms.ntString(t))
  }

  private def sortKeyOf(t: Column): Column = struct(sortKeyCols(t): _*)

  private def runSelect(spark: SparkSession, data: DataFrame, q: Select): DataFrame = {
    val ctx = Ctx(spark, data)
    var sol = evalGroup(ctx, q.where, gctx = None)
    val hasAgg = q.groupBy.nonEmpty ||
      (q.projection.map(_._1) ++ q.having ++ q.orderBy.map(_._1))
        .exists(containsAgg)

    if (hasAgg) sol = aggregate(ctx, sol, q)
    else {
      // non-aggregate projection expressions materialize as columns
      for ((e, Some(alias)) <- q.projection) {
        if (sol.columns.contains(alias))
          throw SparqlEngineError(s"SELECT expression would rebind ?$alias")
        sol = sol.withColumn(alias, SparqlExpr.compile(e, env(sol)))
      }
    }

    // HAVING without aggregate context is handled inside aggregate()
    if (!hasAgg && q.having.nonEmpty)
      throw SparqlEngineError("HAVING requires aggregation")

    val wantDistinct = q.distinct || q.reduced
    // plain queries order BEFORE projection (order exprs may use
    // non-projected vars); DISTINCT queries order AFTER the distinct (the
    // spec restricts their order exprs to projected vars — §15.1), so the
    // shuffle cannot scramble the requested order
    if (q.orderBy.nonEmpty && !hasAgg && !wantDistinct)
      sol = applyOrder(sol, q.orderBy, Map.empty)

    // projection
    val names: Seq[String] =
      if (q.projection.isEmpty)
        starProjection(sol.columns.filterNot(_.startsWith("_")).toSet,
          q.mentionOrder)
      else q.projection.map {
        case (EVar(n), None) => n
        case (_, Some(a)) => a
        case (e, None) =>
          throw SparqlEngineError(s"SELECT expression needs AS: $e")
      }
    // a projected var the WHERE never binds is legal SPARQL: all-NULL column
    var out = names.foldLeft(sol)((d, n) =>
      if (d.columns.contains(n)) d else d.withColumn(n, SparqlExpr.nullTerm))
    out = out.select(names.map(col): _*)

    if (wantDistinct) {
      out = out.distinct()
      if (q.orderBy.nonEmpty && !hasAgg) out = applyOrder(out, q.orderBy, Map.empty)
    }
    for (off <- q.offset) out = out.offset(off.toInt)
    for (lim <- q.limit) out = out.limit(lim.toInt)
    out
  }

  /** The `SELECT *` column rule (one definition for every execution path):
    * textual first-mention order of the visible variables, then any
    * remaining visible variables in sorted order. */
  private[graft] def starProjection(visible: Set[String],
                                    mentionOrder: Seq[String]): Seq[String] = {
    val ordered = mentionOrder.filter(visible)
    ordered ++ visible.diff(ordered.toSet).toSeq.sorted
  }

  private def containsAgg(e: Expr): Boolean = e match {
    case _: EAgg => true
    case EBin(_, l, r) => containsAgg(l) || containsAgg(r)
    case ENot(x) => containsAgg(x)
    case ENeg(x) => containsAgg(x)
    case EIn(x, list, _) => containsAgg(x) || list.exists(containsAgg)
    case ECall(_, args) => args.exists(containsAgg)
    case _ => false
  }

  private def collectAggs(e: Expr): Seq[EAgg] = e match {
    case a: EAgg => Seq(a)
    case EBin(_, l, r) => collectAggs(l) ++ collectAggs(r)
    case ENot(x) => collectAggs(x)
    case ENeg(x) => collectAggs(x)
    case EIn(x, list, _) => collectAggs(x) ++ list.flatMap(collectAggs)
    case ECall(_, args) => args.flatMap(collectAggs)
    case _ => Nil
  }

  private def substAggs(e: Expr, table: Map[EAgg, String]): Expr = e match {
    case a: EAgg => EVar(table(a))
    case EBin(op, l, r) => EBin(op, substAggs(l, table), substAggs(r, table))
    case ENot(x) => ENot(substAggs(x, table))
    case ENeg(x) => ENeg(substAggs(x, table))
    case EIn(x, list, neg) => EIn(substAggs(x, table), list.map(substAggs(_, table)), neg)
    case ECall(fn, args) => ECall(fn, args.map(substAggs(_, table)))
    case other => other
  }

  /** GROUP BY + aggregates. Output: one column per group key (by its var
    * name) and per aggregate (by `__aggN`), then projection / HAVING /
    * ORDER BY compile against those. */
  private def aggregate(ctx: Ctx, solIn: DataFrame, q: Select): DataFrame = {
    var sol = solIn
    // group keys: ?var, or (expr AS ?v) materialized first
    val keys: Seq[String] = q.groupBy.map {
      case (EVar(n), None) => n
      case (e, Some(alias)) =>
        sol = sol.withColumn(alias, SparqlExpr.compile(e, env(sol)))
        alias
      case (e, None) =>
        throw SparqlEngineError(s"GROUP BY expression needs AS ?var: $e")
    }

    val allExprs = q.projection.map(_._1) ++ q.having ++ q.orderBy.map(_._1)
    val aggs = allExprs.flatMap(collectAggs).distinct
    val table: Map[EAgg, String] =
      aggs.zipWithIndex.map { case (a, i) => a -> s"__agg$i" }.toMap

    val aggCols: Seq[Column] = aggs.map { a =>
      compileAgg(a, sol).as(table(a))
    }
    // GROUP BY with no aggregate anywhere is legal SPARQL (one solution per
    // distinct key); Spark's agg() needs at least one aggregate, so a dummy
    // count rides along and dropByPrefix("__agg") removes it below.
    val aggCols1 =
      if (aggCols.nonEmpty) aggCols else Seq(count(lit(1)).as("__agg_k"))
    var out = sol.groupBy(keys.map(col): _*).agg(aggCols1.head, aggCols1.tail: _*)

    // projection expressions (group keys project by name)
    val projTable = table
    for ((e, aliasOpt) <- q.projection) e match {
      case EVar(n) =>
        if (!keys.contains(n))
          throw SparqlEngineError(s"?$n is projected but not a GROUP BY key")
        for (a <- aliasOpt) out = out.withColumn(a, col(n))
      case other =>
        val alias = aliasOpt.getOrElse(
          throw SparqlEngineError(s"aggregate projection needs AS: $other"))
        out = out.withColumn(alias,
          SparqlExpr.compile(substAggs(other, projTable), env(out)))
    }
    for (h <- q.having)
      out = out.filter(SparqlExpr.compileBool(substAggs(h, projTable), env(out)))
    if (q.orderBy.nonEmpty) out = applyOrder(out, q.orderBy, projTable)
    dropByPrefix(out, "__agg")
  }

  /** One aggregate over the pre-aggregation solution frame. */
  private def compileAgg(a: EAgg, sol: DataFrame): Column = {
    val argCol = a.arg.map(e => SparqlExpr.compile(e, env(sol)))
    def arg = argCol.getOrElse(
      throw SparqlEngineError(s"${a.fn} needs an argument"))
    a.fn match {
      case "COUNT" =>
        val c = argCol match {
          case None =>
            // COUNT(*) counts solutions; COUNT(DISTINCT *) distinct ones
            // (one struct over every visible column — never null itself,
            // so count_distinct drops nothing)
            if (a.distinct) count_distinct(struct(sol.columns.map(sol(_)): _*))
            else count(lit(1))
          case Some(t) => if (a.distinct) count_distinct(t) else count(t)
        }
        Terms.typedLit(c.cast("string"), Vocab.xsdInteger)
      case "SUM" | "AVG" =>
        val t = arg
        val dbl = SparqlExpr.numD(t)
        val lng = when(t("datatype").isin(
          graft.core.Xsd.integerFamily.toSeq.sorted: _*), t("value").try_cast("long"))
        val bound = count(t)
        val numeric = count(dbl)
        val ints = count(lng)
        val sumD = if (a.distinct) sum_distinct(dbl) else sum(dbl)
        val sumL = if (a.distinct) sum_distinct(lng) else sum(lng)
        if (a.fn == "SUM")
          when(bound =!= numeric, SparqlExpr.nullTerm) // non-numeric in group = error
            .when(bound === ints,
              Terms.typedLit(coalesce(sumL, lit(0L)).cast("string"), Vocab.xsdInteger))
            .otherwise(Terms.typedLit(sumD.cast("string"), Vocab.xsdDouble))
        else {
          val avgD =
            if (a.distinct) sum_distinct(dbl) / count_distinct(dbl)
            else avg(dbl)
          when(bound =!= numeric, SparqlExpr.nullTerm)
            .when(bound === 0, Terms.typedLit(lit("0"), Vocab.xsdInteger))
            .otherwise(Terms.typedLit(avgD.cast("string"), Vocab.xsdDouble))
        }
      case "MIN" => min_by(arg, sortKeyOf(arg))
      case "MAX" => max_by(arg, sortKeyOf(arg))
      case "SAMPLE" => min_by(arg, sortKeyOf(arg)) // deterministic pick
      case "GROUP_CONCAT" =>
        val sep = a.separator.getOrElse(" ")
        val vals = arg("value")
        val gathered =
          if (a.distinct) collect_set(vals) else collect_list(vals)
        // sorted for determinism: the spec leaves concatenation order open
        Terms.strLit(array_join(sort_array(gathered), sep))
      case other => throw SparqlEngineError(s"unknown aggregate $other")
    }
  }

  private def applyOrder(sol: DataFrame, orderBy: Seq[(Expr, Boolean)],
                         aggTable: Map[EAgg, String]): DataFrame = {
    val keys = orderBy.flatMap { case (e, asc) =>
      val t = SparqlExpr.compile(substAggs(e, aggTable), env(sol))
      sortKeyCols(t).map(k => if (asc) k.asc_nulls_first else k.desc_nulls_last)
    }
    sol.orderBy(keys: _*)
  }

  // ---------------------------------------------------------- ASK/CONSTRUCT
  private def ask(spark: SparkSession, data: DataFrame, q: Ast.Ask): Boolean =
    !evalGroup(Ctx(spark, data), q.where, gctx = None).isEmpty

  private def runConstruct(spark: SparkSession, data: DataFrame,
                           q: Construct): DataFrame = {
    val ctx = Ctx(spark, data)
    var sol = evalGroup(ctx, q.where, gctx = None)
    for (off <- q.offset) sol = sol.offset(off.toInt)
    for (lim <- q.limit) sol = sol.limit(lim.toInt)
    // template bnodes (hidden _bn* vars unbound by WHERE) become fresh
    // per-solution labels: label = bnodeVar + per-row id (unique within
    // this query's execution — the standard's fresh-bnode-per-solution)
    val rowId = monotonically_increasing_id().cast("string")
    val withId = sol.withColumn("__row", rowId)
    def nodeCol(n: Node): Column = n match {
      case Bound(t) => Terms.constTerm(t)
      case V(name) if withId.columns.contains(name) => col(name)
      case V(name) if name.startsWith("_bn") =>
        Terms.bnode(concat(lit(name.stripPrefix("_") + "r"), col("__row")))
      case V(name) =>
        throw SparqlEngineError(s"CONSTRUCT template var ?$name is never bound")
      case other =>
        throw SparqlEngineError(s"unsupported CONSTRUCT template node $other")
    }
    val parts = q.template.map { case (s, p, o) =>
      withId.select(nodeCol(s).as("s"), nodeCol(p).as("p"), nodeCol(o).as("o"))
    }
    parts.reduce(_ unionAll _)
      .filter(col("s").isNotNull && col("p").isNotNull && col("o").isNotNull)
      .filter(col("s")("kind") =!= TermKind.LITERAL &&
        col("p")("kind") === TermKind.IRI)
      .distinct()
  }

  // ------------------------------------------------------------------ UPDATE
  /** SPARQL 1.1 Update, FUNCTIONALLY: applies the request's operations left
    * to right and returns the NEW frame (the engine's immutable-frame
    * convention — `Graphs.put/delete` style — not an in-place store
    * mutation). Input may be a triple frame (s/p/o) or quad frame
    * (s/p/o/g); the result has the same shape, except that an update
    * inserting into a named graph promotes a triple frame to quads.
    *
    * Each operation is set-semantic (the reference's dedup-on-add store):
    * INSERT = unionAll + distinct, DELETE = one null-safe left-anti hash
    * join on (s,p,o,g). INSERT DATA bnode labels mint fresh labels once
    * per operation; template bnodes in Modify INSERT mint per solution
    * (the CONSTRUCT rule). WITH pins the WHERE and un-GRAPHed template
    * quads to one named graph. CLEAR/DROP/ADD/MOVE/COPY are partition
    * filters / unions on the graph column. */
  def update(spark: SparkSession, data: DataFrame, text: String,
             base: String = null): DataFrame = {
    val script = SparqlParser.parseUpdate(text, base)
    val hadG = data.columns.contains("g")
    var frame =
      if (hadG) data.select("s", "p", "o", "g")
      else data.select(col("s"), col("p"), col("o"),
        lit(null).cast(Terms.termSchema).as("g"))
    for (op <- script.ops) frame = applyUpdate(spark, frame, op)
    if (hadG) frame
    else {
      // demote back to a triple frame when nothing lives in a named graph
      // (cheap: one isNotNull existence probe)
      if (frame.filter(col("g").isNotNull).isEmpty) frame.select("s", "p", "o")
      else frame
    }
  }

  private def applyUpdate(spark: SparkSession, quads: DataFrame,
                          op: UpdateOp): DataFrame = op match {
    case InsertData(qs) =>
      insertQuads(quads, instantiateGround(spark, qs, freshBnodes = true))
    case DeleteData(qs) =>
      deleteQuads(quads, instantiateGround(spark, qs, freshBnodes = false))
    case DeleteWhere(qs) =>
      // the pattern is both match and template: evaluate it as a group
      val where = quadPatternGroup(qs)
      val sol = evalQuadGroup(spark, quads, where, None)
      deleteQuads(quads, instantiateTemplate(qs, sol, freshBnodes = false))
    case Modify(del, ins, where, withGraph) =>
      val sol = evalQuadGroup(spark, quads, where, withGraph)
      val pinned: Option[Node] = withGraph.map(Bound(_))
      val delPinned = del.map(q => q.copy(g = q.g.orElse(pinned)))
      val insPinned = ins.map(q => q.copy(g = q.g.orElse(pinned)))
      val afterDel =
        if (delPinned.isEmpty) quads
        else deleteQuads(quads,
          instantiateTemplate(delPinned, sol, freshBnodes = false))
      if (insPinned.isEmpty) afterDel
      else insertQuads(afterDel,
        instantiateTemplate(insPinned, sol, freshBnodes = true))
    case ClearOp("NOOP", _) => quads
    case ClearOp("DEFAULT", _) => quads.filter(col("g").isNotNull)
    case ClearOp("NAMED", _) => quads.filter(col("g").isNull)
    case ClearOp("ALL", _) => quads.limit(0)
    case ClearOp("GRAPH", Some(g)) =>
      quads.filter(!(col("g") <=> Terms.constTerm(g)))
    case ClearOp(t, _) => throw SparqlEngineError(s"unknown CLEAR target $t")
    case GraphCopy(op2, from, to) =>
      if (from == to) quads
      else {
        def gCol(t: Option[Term]): Column =
          t.map(Terms.constTerm).getOrElse(lit(null).cast(Terms.termSchema))
        val src = quads.filter(col("g") <=> gCol(from))
          .select(col("s"), col("p"), col("o"), gCol(to).as("g"))
        val base = op2 match {
          case "ADD" => quads
          case "COPY" => quads.filter(!(col("g") <=> gCol(to)))
          case "MOVE" => quads.filter(!(col("g") <=> gCol(to)) &&
            !(col("g") <=> gCol(from)))
          case other => throw SparqlEngineError(s"unknown graph op $other")
        }
        base.unionAll(src).distinct()
      }
  }

  /** WHERE evaluation for updates: quad-aware — un-GRAPHed patterns match
    * the default graph (or the WITH graph, which rebinds the active
    * default graph only: GRAPH blocks inside the WHERE still range over
    * the dataset's named graphs, per SPARQL Update §3.1.3). */
  private def evalQuadGroup(spark: SparkSession, quads: DataFrame,
                            where: Group, withGraph: Option[Term]): DataFrame = {
    val scoped = withGraph match {
      case Some(g) => quads.filter(col("g") <=> Terms.constTerm(g))
        .select(col("s"), col("p"), col("o"),
          lit(null).cast(Terms.termSchema).as("g"))
      case None => quads
    }
    evalGroup(Ctx(spark, scoped, quads), where, gctx = None)
  }

  /** A DELETE WHERE pattern as a group: un-GRAPHed quads form one BGP;
    * GRAPH'd quads become GRAPH blocks. */
  private def quadPatternGroup(qs: Seq[QuadPat]): Group = {
    val (plain, graphed) = qs.partition(_.g.isEmpty)
    val elems = Seq.newBuilder[Element]
    if (plain.nonEmpty)
      elems += EBgp(plain.map(q => TP(q.s, Left(q.p), q.o)))
    for ((gn, group) <- graphed.groupBy(_.g.get))
      elems += EGraphG(gn, Group(Seq(EBgp(group.map(q => TP(q.s, Left(q.p), q.o))))))
    Group(elems.result())
  }

  /** Ground quads (INSERT/DELETE DATA) as a one-row-per-quad frame; bnode
    * labels mint fresh uuid-based labels once per operation. */
  private def instantiateGround(spark: SparkSession, qs: Seq[QuadPat],
                                freshBnodes: Boolean): DataFrame = {
    val mint = java.util.UUID.randomUUID().toString.replace("-", "")
    def term(n: Node): Term = n match {
      case Bound(t) => t
      case V(name) if name.startsWith("_bn") && freshBnodes =>
        Term.bnode(name.stripPrefix("_") + mint)
      case other => throw SparqlEngineError(s"non-ground node in DATA block: $other")
    }
    val rows = qs.map { q =>
      Seq(Option(term(q.s)), Option(term(q.p)), Option(term(q.o)),
        q.g.map(term))
    }
    valuesFrame(spark, Seq("s", "p", "o", "g"), rows)
  }

  /** Template instantiation over solutions (the CONSTRUCT rule, quad-level). */
  private def instantiateTemplate(qs: Seq[QuadPat], sol: DataFrame,
                                  freshBnodes: Boolean): DataFrame = {
    val withId = sol.withColumn("__row",
      monotonically_increasing_id().cast("string"))
    def nodeCol(n: Node): Column = n match {
      case Bound(t) => Terms.constTerm(t)
      case V(name) if withId.columns.contains(name) => col(name)
      case V(name) if name.startsWith("_bn") && freshBnodes =>
        Terms.bnode(concat(lit(name.stripPrefix("_") + "r"), col("__row")))
      case V(name) =>
        throw SparqlEngineError(s"update template var ?$name is never bound")
      case other =>
        throw SparqlEngineError(s"unsupported update template node $other")
    }
    val parts = qs.map { q =>
      withId.select(nodeCol(q.s).as("s"), nodeCol(q.p).as("p"),
        nodeCol(q.o).as("o"),
        q.g.map(nodeCol).getOrElse(lit(null).cast(Terms.termSchema)).as("g"))
    }
    parts.reduce(_ unionAll _)
      .filter(col("s").isNotNull && col("p").isNotNull && col("o").isNotNull)
      .filter(col("s")("kind") =!= TermKind.LITERAL &&
        col("p")("kind") === TermKind.IRI)
      .distinct()
  }

  private def insertQuads(quads: DataFrame, add: DataFrame): DataFrame =
    quads.unionAll(add.select("s", "p", "o", "g")).distinct()

  /** One null-safe left-anti hash join on (s,p,o,g). */
  private def deleteQuads(quads: DataFrame, del: DataFrame): DataFrame = {
    val d = del.select(col("s").as("__ds"), col("p").as("__dp"),
      col("o").as("__do"), col("g").as("__dg"))
    quads.join(d,
      quads("s") === d("__ds") && quads("p") === d("__dp") &&
        quads("o") === d("__do") && (quads("g") <=> d("__dg")),
      "left_anti")
  }

  private def runDescribe(spark: SparkSession, data: DataFrame,
                          q: Describe): DataFrame = {
    val ctx = Ctx(spark, data)
    val iriNodes = valuesFrame(spark, Seq("__n"),
      q.iris.map(t => Seq(Option(t))))
    val varNodes = q.where match {
      case Some(g) =>
        val sol = evalGroup(ctx, g, gctx = None)
        q.vars.filter(sol.columns.contains).map(v => sol.select(col(v).as("__n")))
      case None =>
        if (q.vars.nonEmpty)
          throw SparqlEngineError("DESCRIBE ?var needs a WHERE clause")
        Nil
    }
    val nodes = (iriNodes +: varNodes).reduce(_ unionAll _)
      .filter(col("__n").isNotNull).distinct()
    // subject-based description (the reference's Graph.description shape)
    ctx.triples.join(nodes, ctx.triples("s") === nodes("__n"), "left_semi")
  }
}

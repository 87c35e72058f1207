package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Term

/** Basic Graph Pattern engine: a pattern DSL compiled to a pre-ordered
  * DataFrame join chain.
  *
  * Semantics follow the reference's BGP engine (`lib/rdf/query/bgp/` modules):
  * each triple pattern is a filtered projection of the triple table; patterns
  * sharing variables join on them (equi hash join on term structs); disjoint
  * patterns cross-product; the empty BGP yields exactly one empty solution
  * (SPARQL §5.2.2, `bgp/simple.ex:17`); a variable repeated inside one
  * pattern becomes a self-equality constraint (`query_planner.ex:38-65`).
  *
  * The join ORDER ports the reference's greedy planner
  * (`query_planner.ex:10-23`): repeatedly pick the pattern with the fewest
  * unsolved variables, tie-broken by position preference (bound subject ≫
  * bound predicate ≫ bound object, with already-solved variables ranking
  * between bound and free). We emit the joins already ordered, so Catalyst
  * needs no RDF-aware statistics; physical strategy (broadcast vs shuffled
  * hash vs sort-merge) stays Catalyst/AQE's choice.
  *
  * Variables whose name starts with '_' are non-projected (the reference's
  * `:_`-prefixed variables and query bnodes, `blank_node_handler.ex:12-52`):
  * they join like normal variables and are dropped from the result.
  */
object Bgp {

  sealed trait Node
  final case class Bound(t: Term) extends Node
  final case class V(name: String) extends Node
  /** RDF-star quoted-triple pattern with possibly-nested variables
    * (reference: quoted_triple_with_variables?, bgp/helper.ex:99-142). A
    * fully-bound quoted pattern should be a plain `Bound(Term.quoted(...))`
    * — `dsl.qt` collapses that case automatically. */
  final case class QPat(s: Node, p: Node, o: Node) extends Node

  def varsOf(n: Node): Seq[String] = n match {
    case V(name) => Seq(name)
    case QPat(a, b, c) => Seq(a, b, c).flatMap(varsOf)
    case _ => Nil
  }

  final case class TriplePattern(s: Node, p: Node, o: Node) {
    def nodes: Seq[(String, Node)] = Seq("s" -> s, "p" -> p, "o" -> o)
    def vars: Seq[String] = nodes.flatMap { case (_, n) => varsOf(n) }
  }

  final case class Pattern(patterns: Seq[TriplePattern])

  object dsl {
    def iri(s: String): Node = Bound(Term.iri(s))
    def lit(s: String): Node = Bound(Term.str(s))
    def term(t: Term): Node = Bound(t)
    def v(name: String): Node = V(name)
    def pat(s: Node, p: Node, o: Node): TriplePattern = TriplePattern(s, p, o)
    /** Quoted-triple pattern; collapses to a constant term when var-free. */
    def qt(s: Node, p: Node, o: Node): Node = (s, p, o) match {
      case (Bound(a), Bound(b), Bound(c)) => Bound(Term.quoted(graft.core.Triple(a, b, c)))
      case _ => QPat(s, p, o)
    }
  }

  /** `path/2` sugar (reference query.ex:212-231): a chain
    * [s, p1, p2, ..., pn, o] becomes n patterns linked through hidden
    * (non-projected) intermediate variables — `path(Seq(s, p, label, v))`
    * == `Pattern(Seq(pat(s, p, _path1), pat(_path1, label, v)))`. */
  private val pathCtr = new java.util.concurrent.atomic.AtomicLong

  def path(elements: Seq[Node]): Pattern = {
    require(elements.length >= 3, "path needs subject, >=1 predicate, object")
    val s = elements.head
    val preds = elements.slice(1, elements.length - 1)
    val o = elements.last
    // per-call unique hidden prefix: two path() results composed into ONE
    // Pattern must never capture each other's intermediates (fixed names
    // would equi-join unrelated chains through one shared node)
    val id = pathCtr.incrementAndGet()
    val mids = (1 until preds.length).map(i => V(s"_path${id}_$i"))
    val subjects = s +: mids
    val objects = mids :+ o
    Pattern(preds.indices.map(i => TriplePattern(subjects(i), preds(i), objects(i))))
  }

  /** Greedy planner: returns patterns in execution order. */
  def plan(patterns: Seq[TriplePattern]): Seq[TriplePattern] = {
    val ordered = Seq.newBuilder[TriplePattern]
    var remaining = patterns.toList
    var solved = Set.empty[String]
    while (remaining.nonEmpty) {
      // status code per position: bound=0, solved var=1, free var=2
      def status(n: Node): Int = n match {
        case Bound(_) => 0
        case V(name) => if (solved(name)) 1 else 2
        case q: QPat =>
          val vs = varsOf(q)
          if (vs.isEmpty) 0 else if (vs.forall(solved)) 1 else 2
      }
      def key(p: TriplePattern): (Int, Int, Int, Int) = {
        val unsolved = p.vars.distinct.count(!solved(_))
        (unsolved, status(p.s), status(p.p), status(p.o))
      }
      val best = remaining.minBy(key)
      ordered += best
      solved ++= best.vars
      // remove ONE occurrence by position: filterNot(_ eq best) would
      // delete every reference-equal duplicate of a repeated pattern
      val at = remaining.indexWhere(_ eq best)
      remaining = remaining.patch(at, Nil, 1)
    }
    ordered.result()
  }

  /** One pattern = filter + project of the triple table. Returns a DataFrame
    * with one term-struct column per (deduped) variable. Quoted-triple
    * patterns destructure kind=TRIPLE values level by level: each QPat adds
    * one parsed struct column, then its sub-nodes filter/bind against the
    * parsed fields (the reference's nested match_triple unification,
    * bgp/helper.ex:113-127). */
  private def scan(triples: DataFrame, p: TriplePattern,
                   graph: Option[Node] = None): DataFrame = {
    var df = triples
    val bindings = scala.collection.mutable.ArrayBuffer.empty[(String, Column)]
    var qtCount = 0
    def walk(node: Node, expr: Column): Unit = node match {
      case Bound(t) => df = df.filter(expr === Terms.constTerm(t))
      case V(n) => bindings += n -> expr
      case QPat(qs, qp, qo) =>
        df = df.filter(expr("kind") === graft.core.TermKind.TRIPLE)
        val name = s"__qt$qtCount"; qtCount += 1
        df = df.withColumn(name, Terms.parseQuoted(expr("value")))
        walk(qs, col(name)("s")); walk(qp, col(name)("p")); walk(qo, col(name)("o"))
    }
    for (gn <- graph) walk(gn, col("g"))
    for ((pos, node) <- p.nodes) walk(node, col(pos))
    // repeated variables -> self-equality constraints
    val grouped = bindings.groupBy(_._1)
    for ((_, cols) <- grouped if cols.size > 1; other <- cols.tail)
      df = df.filter(cols.head._2 === other._2)
    val proj = grouped.map { case (name, cols) => cols.head._2.as(name) }.toSeq
    if (proj.isEmpty) df.select(lit(1).as("__exists")).limit(1)
    else df.select(proj: _*)
  }

  /** The join chain WITHOUT the final projection: returns the solution
    * frame still carrying underscore-prefixed (hidden) variables plus the
    * solved-variable set — callers that join further (executeIncremental,
    * the SPARQL frontend's path composition) need the hidden vars as join
    * keys before projecting them away. */
  private[graft] def executeAll(triples: DataFrame, bgp: Pattern): (DataFrame, Set[String]) = {
    val ordered = plan(bgp.patterns)
    var solution: DataFrame = null
    var solved = Set.empty[String]
    for (p <- ordered) {
      val sc = scan(triples, p)
      if (solution == null) solution = sc
      else {
        val shared = p.vars.distinct.filter(solved)
        solution =
          if (shared.nonEmpty) solution.join(sc, shared, "inner")
          else solution.crossJoin(sc).drop("__exists")
      }
      solved ++= p.vars
    }
    (solution, solved)
  }

  /** The quad-level join chain: like [[executeAll]] but over a NAMED-graph
    * quad frame with every pattern additionally matching `graph` against
    * the `g` column, so the graph variable joins across patterns (two
    * patterns only combine within one graph). */
  private def executeAllQuads(named: DataFrame, graph: Node,
                              bgp: Pattern): (DataFrame, Set[String]) = {
    val gVars = varsOf(graph)
    val ordered = plan(bgp.patterns)
    var solution: DataFrame = null
    var solved = Set.empty[String]
    for (p <- ordered) {
      val sc = scan(named, p, Some(graph))
      val vars = (p.vars ++ gVars).distinct
      if (solution == null) solution = sc
      else {
        val shared = vars.filter(solved)
        solution =
          if (shared.nonEmpty) solution.join(sc, shared, "inner")
          else solution.crossJoin(sc).drop("__exists")
      }
      solved ++= vars
    }
    (solution, solved)
  }

  /** GRAPH pattern over a QUAD frame (columns g/s/p/o as term structs,
    * g NULL = the default graph): SPARQL's `GRAPH graph { bgp }`. Every
    * triple pattern matches inside the SAME graph denoted by `graph` — a
    * bound term pins the block to one named graph; a variable ranges over
    * the dataset's NAMED graphs only (`g IS NOT NULL`, SPARQL §13.3: the
    * default graph is not visible to GRAPH) and binds into the solution
    * like any other variable, joining across patterns. The empty BGP
    * enumerates the named graphs when `graph` is a variable (one solution
    * per graph) and yields one empty solution when bound.
    *
    * Compose multiple GRAPH blocks (or a GRAPH block with a default-graph
    * BGP) with [[joinSolutions]]/[[optional]]/[[minus]]; query the default
    * graph itself with [[execute]] over `quads.filter(col("g").isNull)`.
    * Same plan shape as [[execute]]: pre-ordered equi-join chain, the
    * graph variable is just one more join key — per-document named graphs
    * make it the partition-aligned key at corpus scale. */
  def executeGraph(spark: SparkSession, quads: DataFrame, graph: Node,
                   bgp: Pattern): DataFrame = {
    val (solution, solved) = executeGraphAll(spark, quads, graph, bgp)
    val projected = solved.toSeq.sorted.filterNot(_.startsWith("_"))
    if (projected.isEmpty) solution.select(lit(1).as("__exists")).limit(1)
      .drop("__exists")
    else solution.select(projected.map(col): _*)
  }

  /** [[executeGraph]] WITHOUT the hidden-variable projection: hidden vars
    * stay in the frame as join keys — the SPARQL frontend composes GRAPH
    * BGPs with per-graph path frames on shared (incl. hidden/bnode)
    * variables and drops them only at group exit; an early drop here
    * would degrade those joins to per-graph cross products. */
  private[graft] def executeGraphAll(spark: SparkSession, quads: DataFrame,
                                     graph: Node, bgp: Pattern)
      : (DataFrame, Set[String]) = {
    val named = quads.filter(col("g").isNotNull)
    (graph, bgp.patterns.isEmpty) match {
      case (V(gv), true) =>
        (named.select(col("g").as(gv)).distinct(), Set(gv))
      case (Bound(t), true) =>
        // SPARQL §18.6: an IRI naming NO graph in the dataset evaluates to
        // the empty multiset — one empty solution only if the graph exists
        (named.filter(col("g") === Terms.constTerm(t))
          .select(lit(1).as("__exists")).limit(1).drop("__exists"),
          Set.empty[String])
      case (_, true) =>
        (spark.range(1).drop("id"), Set.empty[String])
      case _ => executeAllQuads(named, graph, bgp)
    }
  }

  /** Execute a BGP against a triple table (columns s/p/o as term structs).
    * Result: one term-struct column per projected variable. */
  def execute(spark: SparkSession, triples: DataFrame, bgp: Pattern): DataFrame = {
    // empty BGP -> one empty solution (SPARQL empty group pattern)
    if (bgp.patterns.isEmpty) return spark.range(1).drop("id")
    val (solution, solved) = executeAll(triples, bgp)
    val projected = solved.toSeq.sorted.filterNot(_.startsWith("_"))
    if (projected.isEmpty) solution.select(lit(1).as("__exists")).limit(1)
      .drop("__exists")
    else solution.select(projected.map(col): _*)
  }

  /** Convenience: execute and flatten each variable to its term `value`
    * string (IRI string / bnode label / literal lexical). */
  def executeValues(spark: SparkSession, triples: DataFrame, bgp: Pattern): DataFrame =
    values(execute(spark, triples, bgp))

  /** Flatten every term-struct column of a solution frame to its `value`
    * string; a NULL column (an unbound variable from [[optional]]/[[union]])
    * stays NULL. */
  def values(solutions: DataFrame): DataFrame =
    solutions.select(solutions.columns.map(c => col(c)("value").as(c)).toSeq: _*)

  // ------------------------------------------------------ solution algebra

  /** SPARQL-algebra group-pattern operators over SOLUTION frames (the output
    * shape of [[execute]]: one term-struct column per variable). The
    * reference stops at BGPs in core (`lib/rdf/query.ex` delegates anything
    * beyond a BGP to its separate SPARQL engine); these are provided here
    * because OPTIONAL / UNION / MINUS / EXISTS over BGP results are the
    * first composition a KG user reaches for, and each maps to exactly one
    * scalable DataFrame join shape.
    *
    * Compatibility contract: shared variables join with EQUI-joins
    * (hash-partitioned — the only shape that scales). SPARQL's full
    * compatibility relation additionally treats an UNBOUND shared variable
    * as a wildcard; that needs a non-equi join (a broadcast nested loop at
    * scale), so these operators instead treat NULL like SQL does (never
    * equal). The difference is observable only when a shared variable can
    * be unbound — i.e. when an [[optional]]/[[union]] output is re-joined
    * on its optional variable — the same well-formedness restriction
    * scalable SPARQL engines impose on their hash-join paths. */
  private def sharedVars(a: DataFrame, b: DataFrame): Seq[String] = {
    val bc = b.columns.toSet
    a.columns.toSeq.filter(bc)
  }

  /** Algebra Join: inner equi-join on the shared variables; disjoint
    * domains cross-product (SPARQL §18.5 Join). Lets a BGP result compose
    * with a non-BGP solution frame (e.g. [[closure]]). */
  def joinSolutions(a: DataFrame, b: DataFrame): DataFrame = {
    val shared = sharedVars(a, b)
    if (shared.nonEmpty) a.join(b, shared, "inner") else a.crossJoin(b)
  }

  /** OPTIONAL (algebra LeftJoin): every `base` solution survives; compatible
    * `opt` solutions extend it, otherwise its `opt`-only variables are NULL
    * (unbound). Disjoint domains: every pair is compatible (left-padded
    * cross product), matching SPARQL LeftJoin with expression `true`. */
  def optional(base: DataFrame, opt: DataFrame): DataFrame = {
    val shared = sharedVars(base, opt)
    if (shared.nonEmpty) base.join(opt, shared, "left")
    else base.join(opt, lit(true), "left")
  }

  /** UNION (bag union, SPARQL §18.5): columns align by variable NAME and a
    * variable missing on one side is NULL (unbound) there — one narrow
    * union node, no shuffle. */
  def union(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)

  /** MINUS (SPARQL §8.3.3): drop each `a` solution that is compatible with
    * some `b` solution ON A SHARED variable; with disjoint domains MINUS
    * removes NOTHING (the spec's famous gotcha — `{?s ?p ?o} MINUS {?x ?y
    * ?z}` keeps everything), so the no-shared-vars case returns `a`
    * unchanged rather than an anti cross product. One left-anti hash join
    * on the shared variables. */
  def minus(a: DataFrame, b: DataFrame): DataFrame = {
    val shared = sharedVars(a, b)
    if (shared.isEmpty) a
    else a.join(b.select(shared.map(col): _*), shared, "left_anti")
  }

  /** FILTER EXISTS: keep each `a` solution with at least one compatible `b`
    * solution. Disjoint domains: every pair is compatible, so `a` survives
    * iff `b` is non-empty (probed with a 1-row broadcast, never a scan of
    * `a`×`b`). One left-semi hash join otherwise. */
  def exists(a: DataFrame, b: DataFrame): DataFrame = {
    val shared = sharedVars(a, b)
    if (shared.nonEmpty) a.join(b.select(shared.map(col): _*), shared, "left_semi")
    else a.join(b.select(lit(1).as("__e")).limit(1), lit(true), "left_semi")
  }

  /** FILTER NOT EXISTS: complement of [[exists]] (left-anti). Unlike
    * [[minus]], disjoint domains DO eliminate (`NOT EXISTS {?x ?y ?z}` on a
    * non-empty graph drops every solution) — the spec's MINUS/NOT-EXISTS
    * divergence, preserved here. */
  def notExists(a: DataFrame, b: DataFrame): DataFrame = {
    val shared = sharedVars(a, b)
    if (shared.nonEmpty) a.join(b.select(shared.map(col): _*), shared, "left_anti")
    else a.join(b.select(lit(1).as("__e")).limit(1), lit(true), "left_anti")
  }

  /** Transitive closure of one predicate — the SPARQL property path `p+`
    * (`p*` with `reflexive = true`) — as a solution frame: columns
    * (`sVar`, `oVar`) of term structs, one row per pair connected by a
    * p-edge chain of length >= 1 (>= 0 when reflexive, over the predicate's
    * vertex set). Composes with [[joinSolutions]]/[[optional]]/[[minus]]
    * like any BGP result.
    *
    * Shape: PATH DOUBLING — after round i the pair set holds every pair
    * within 2^(i+1) hops (paths ∪ paths⋈paths, distinct), so a
    * diameter-D graph closes in O(log D) shuffled self-joins instead of D
    * frontier rounds, with each round localCheckpoint'ed and the superseded
    * round's blocks released (the [[graft.ops.GraphAlgos]] lifecycle — at
    * most two rounds' storage live at once). Cycles terminate naturally:
    * each round is a SET (distinct), and a closed walk adds no new pairs.
    * The closure's OUTPUT may be Θ(V²) on dense graphs — that is the
    * operator's contract, not a plan defect; when one endpoint is fixed,
    * use [[graft.engine.Graphs.reachable]] (frontier BFS from a source)
    * instead of materializing all pairs. */
  def closure(triples: DataFrame, predicate: Term,
              sVar: String = "s", oVar: String = "o",
              reflexive: Boolean = false, maxIter: Int = 20): DataFrame = {
    require(sVar != oVar, s"closure: sVar and oVar must differ (got '$sVar')")
    val edges = triples.filter(col("p") === Terms.constTerm(predicate))
      .select(col("s").as("a"), col("o").as("b"))
    val out = closurePairs(edges, reflexiveOver = None, maxIter = maxIter,
      reflexiveVerts = reflexive)
    out.select(col("a").as(sVar), col("b").as(oVar))
  }

  /** [[closure]] generalized to an arbitrary edge frame (columns `a`, `b`
    * of term structs) — the building block the SPARQL frontend's property
    * paths compose over (a path's edge set may itself be a join / union /
    * inverse, not one predicate scan). Same path-doubling shape and
    * checkpoint lifecycle as [[closure]]. Zero-length expansion:
    * `reflexiveOver = Some(nodes)` adds (n, n) for every node in the given
    * frame (SPARQL `p*`'s zero-length path ranges over the GRAPH's terms,
    * §9.3 — pass the graph's subject∪object set); `reflexiveVerts = true`
    * instead uses the edge set's own vertex set (the [[closure]]
    * contract). `key` names optional extra grouping columns (e.g. the
    * graph term for per-named-graph closure): hops compose only within
    * equal key values, every output row keeps its key, and the
    * `reflexiveOver` frame must carry the same key columns. */
  private[graft] def closurePairs(edgesIn: DataFrame,
                                  reflexiveOver: Option[DataFrame],
                                  maxIter: Int = 20,
                                  reflexiveVerts: Boolean = false,
                                  key: Seq[String] = Nil): DataFrame = {
    import graft.ops.GraphAlgos.releaseLocalCheckpoint
    val keyCols = key.map(col)
    val outCols = col("a") +: col("b") +: keyCols
    val edges = edgesIn.select(outCols: _*).distinct()
    var paths = edges.localCheckpoint()
    var n = paths.count()
    var i = 0
    var converged = n == 0
    while (i < maxIter && !converged) {
      val cond = (col("x.b") === col("y.a")) +:
        key.map(k => col(s"x.$k") === col(s"y.$k"))
      val hop = paths.as("x").join(paths.as("y"), cond.reduce(_ && _))
        .select(col("x.a").as("a") +: col("y.b").as("b") +:
          key.map(k => col(s"x.$k").as(k)): _*)
      val next = paths.unionAll(hop).distinct().localCheckpoint()
      val m = next.count()
      converged = m == n
      releaseLocalCheckpoint(paths)
      paths = next; n = m; i += 1
    }
    if (!converged) {
      // nothing is returned on this path: free the final round's
      // checkpoint before throwing or it pins storage for the session
      releaseLocalCheckpoint(paths)
      throw new IllegalStateException(
        s"closure did not converge after $maxIter doubling rounds — a " +
          "diameter beyond ~2^maxIter hops; raise maxIter if truly needed")
    }
    reflexiveOver match {
      case Some(nodes) =>
        paths.unionAll(
          nodes.select(col("a") +: col("a").as("b") +: keyCols: _*)).distinct()
      case None if reflexiveVerts =>
        val verts = paths.select(col("a") +: keyCols: _*)
          .unionAll(paths.select(col("b").as("a") +: keyCols: _*)).distinct()
        paths.unionAll(
          verts.select(col("a") +: col("a").as("b") +: keyCols: _*)).distinct()
      case None => paths
    }
  }

  /** INCREMENTAL BGP over a streaming triple source: pattern `streamedIdx`
    * matches triples as they ARRIVE, every other pattern matches the
    * static graph — the continuous-query face of the engine ("an
    * annotation arrives for an already-materialized KG; emit each new
    * solution once"). The static side is solved once as a batch plan; the
    * streamed pattern scan joins it per micro-batch (stream-static
    * equi-joins are append-mode safe, no watermark/state needed), so each
    * arriving triple costs one broadcast/hash probe, never a rescan of the
    * stream.
    *
    * Exactly ONE pattern is streamed: solutions needing two or more
    * not-yet-seen triples are out of scope for this operator (that is a
    * stream-stream join with watermark state — a different cost model).
    * The streamed pattern must bind at least one variable. Result columns:
    * the solved variables of the whole BGP, like `execute`. */
  def executeIncremental(spark: SparkSession, staticTriples: DataFrame,
                         stream: DataFrame, bgp: Pattern,
                         streamedIdx: Int): DataFrame = {
    val (df, release) =
      executeIncrementalReleasable(spark, staticTriples, stream, bgp, streamedIdx)
    // auto-release: unpersist the static-solution cache once the session's
    // streaming activity quiesces (a termination event with no remaining
    // active query). The listener ARMS only after it has observed a query
    // START — without that, a previously-running query terminating between
    // this plan's construction and its own query's start would release the
    // cache before it was ever probed (the consuming query would then
    // recompute the static join chain every micro-batch for its whole
    // lifetime, silently). Still conservative in multi-query sessions — an
    // unrelated query's start arms it, and an unrelated long-lived query
    // delays release — but never unsafe beyond recompute. Callers needing
    // deterministic release (or who may never start the query: the armed
    // listener is only removed on release) use
    // executeIncrementalReleasable directly.
    // a single-pattern BGP has no static-solution cache (release is a
    // no-op) — registering a listener for it would leak one armed
    // listener per plan into a long-lived session for nothing
    if (bgp.patterns.size > 1) {
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        @volatile private var armed = false
        override def onQueryStarted(e: QueryStartedEvent): Unit = armed = true
        override def onQueryProgress(e: QueryProgressEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
          if (armed && spark.streams.active.isEmpty) {
            release()
            spark.streams.removeListener(this)
          }
      }
      spark.streams.addListener(listener)
    }
    df
  }

  /** [[executeIncremental]] with an explicit cache-release handle: the
    * static solution is persisted (it is re-probed every micro-batch), and
    * the second element unpersists it — call it after stopping the
    * consuming streaming query. Idempotent. */
  def executeIncrementalReleasable(spark: SparkSession, staticTriples: DataFrame,
                                   stream: DataFrame, bgp: Pattern,
                                   streamedIdx: Int): (DataFrame, () => Unit) = {
    require(stream.isStreaming, "stream side must be a streaming DataFrame")
    require(streamedIdx >= 0 && streamedIdx < bgp.patterns.size)
    val pStream = bgp.patterns(streamedIdx)
    require(pStream.vars.nonEmpty, "streamed pattern must bind a variable")
    val rest = bgp.patterns.zipWithIndex.collect {
      case (p, i) if i != streamedIdx => p
    }
    val streamSc = scan(stream, pStream)
    val streamProjected = pStream.vars.distinct.sorted.filterNot(_.startsWith("_"))
    require(streamProjected.nonEmpty,
      "streamed pattern must bind a non-hidden variable")
    if (rest.isEmpty)
      (streamSc.select(streamProjected.map(col): _*), () => ())
    else {
      // join against the UNPROJECTED static solution: hidden (_-prefixed)
      // variables shared with the streamed pattern must participate as
      // join keys — projecting first would silently turn the equi-join
      // into a cross product
      val (staticRaw, solvedStatic) = executeAll(staticTriples, Pattern(rest))
      // persist the static solution: the stream-static join re-evaluates
      // its static side every micro-batch, so an unpersisted plan would
      // replay the full static BGP join chain per batch. persist
      // (MEMORY_AND_DISK), NOT localCheckpoint: checkpoint blocks are
      // executor-local with truncated lineage, so one executor loss hours
      // into the stream would kill the query unrecoverably, while cached
      // partitions recompute. Released via the returned handle (or the
      // quiesce listener in executeIncremental).
      val staticSol = staticRaw.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val shared = pStream.vars.distinct.filter(solvedStatic)
      val joined =
        if (shared.nonEmpty) streamSc.join(staticSol, shared, "inner")
        else streamSc.crossJoin(staticSol.drop("__exists"))
      val projected = (pStream.vars ++ solvedStatic)
        .distinct.sorted.filterNot(_.startsWith("_"))
      (joined.select(projected.map(col): _*), () => { staticSol.unpersist(); () })
    }
  }
}

package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** The rdf-ex Graph/Dataset/Data API surface lifted onto DataFrames of term
  * structs (columns s/p/o, optional g). Every operation is a declarative
  * plan: set ops are hash joins/aggregates, point ops are pushed-down
  * filters; nothing collects to the driver except explicit `values`-style
  * API-edge calls. Citations are to the reference semantics in SURVEY §2.
  */
object Graphs {

  // ---------------------------------------------------------------- algebra

  /** Set-semantic add/union (Data.merge, data.ex:471-523). Skolemized ids
    * make plain union safe (no bnode capture). */
  def add(g: DataFrame, other: DataFrame): DataFrame =
    g.unionByName(other).dropDuplicates()

  /** NULL-SAFE anti-join on all of `l`'s columns. USING-column joins
    * compare with plain equality, where null never equals null — so a
    * quad frame's default graph (g = null) would make every statement
    * "absent" from the other side. `<=>` restores set semantics. */
  private[graft] def antiNullSafe(l: DataFrame, r: DataFrame): DataFrame = {
    val cols = l.columns.toSeq
    val ra = r.select(cols.map(col): _*).alias("__r")
    val la = l.alias("__l")
    val cond = cols.map(c => col(s"__l.$c") <=> col(s"__r.$c")).reduce(_ && _)
    la.join(ra, cond, "left_anti")
  }

  /** Graph.delete (graph.ex:437-511): input-shaped removal. */
  def delete(g: DataFrame, other: DataFrame): DataFrame =
    antiNullSafe(g, other)

  /** Graph.put (graph.ex:309-340): replace whole subjects — the classic
    * upsert; anti-join old on new subject keys, then union. */
  def put(g: DataFrame, replacement: DataFrame): DataFrame = {
    val newSubjects = replacement.select("s").distinct()
    g.join(newSubjects, Seq("s"), "left_anti").unionByName(replacement).dropDuplicates()
  }

  /** Graph.put_properties (graph.ex:371-407): replace (s,p) pairs. */
  def putProperties(g: DataFrame, replacement: DataFrame): DataFrame = {
    val keys = replacement.select("s", "p").distinct()
    g.join(keys, Seq("s", "p"), "left_anti").unionByName(replacement).dropDuplicates()
  }

  /** Graph.intersection (graph.ex:1209-1236). */
  def intersection(g: DataFrame, other: DataFrame): DataFrame = g.intersect(other)

  /** include? (graph.ex:1146-1178): statement containment via anti-join. */
  def includesAll(g: DataFrame, statements: DataFrame): Boolean =
    antiNullSafe(statements, g).isEmpty

  /** Graph.equal? modulo prefixes (graph.ex:1399-1406). SET semantics
    * (`except`, not `exceptAll`): RDF graphs are statement sets, so a
    * frame stating one triple twice equals its deduplicated form. */
  def equalGraphs(a: DataFrame, b: DataFrame): Boolean =
    a.except(b).isEmpty && b.except(a).isEmpty

  /** rename_resource (graph.ex:772-792) — the skolemization primitive as a
    * column transform over all positions. */
  def renameResource(g: DataFrame, from: Term, to: Term): DataFrame = {
    val f = Terms.constTerm(from); val t = Terms.constTerm(to)
    g.select(g.columns.map { c =>
      when(col(c) === f, t).otherwise(col(c)).as(c)
    }.toSeq: _*)
  }

  /** Graph.update/4 (graph.ex:700-730): transform ONE subject's description
    * with a function over its triples (the per-subject "UPDATE"); the
    * function receives the (possibly empty) description DataFrame and
    * returns the replacement statements for that subject. */
  def updateSubject(g: DataFrame, subject: Term,
                    f: DataFrame => DataFrame): DataFrame = {
    val key = Terms.constTerm(subject)
    // the reference re-subjects f's output (Description.new(subject),
    // graph.ex:700-730) — so does [[updateAllDescriptions]]; without this
    // an f returning foreign subjects would silently mutate OTHER
    // descriptions instead of being coerced back
    val updated = f(g.filter(col("s") === key)).withColumn("s", key)
    g.filter(!(col("s") === key)).unionByName(updated).dropDuplicates()
  }

  /** Access behaviour `pop` (graph.ex:975-1001): remove and return one
    * subject's description — (description, rest). Two pushed-down filters
    * over one scan; no shuffle. */
  def pop(g: DataFrame, subject: Term): (DataFrame, DataFrame) = {
    val key = Terms.constTerm(subject)
    (g.filter(col("s") === key), g.filter(!(col("s") === key)))
  }

  /** Access behaviour `get_and_update` (graph.ex:925-955): return the
    * current description AND the graph with `f` applied to it — the
    * Elixir Access contract as a pair. */
  def getAndUpdate(g: DataFrame, subject: Term,
                   f: DataFrame => DataFrame): (DataFrame, DataFrame) = {
    val key = Terms.constTerm(subject)
    val current = g.filter(col("s") === key)
    (current, updateSubject(g, subject, f))
  }

  /** Graph.update_all_descriptions/2 (graph.ex:750-755): apply `f` to EVERY
    * subject's description — one distributed groupByKey on the subject, `f`
    * runs per group inside flatMapGroups (no driver-side iteration over
    * subjects, unlike the reference's Enum.reduce — same semantics, shuffle
    * instead of a loop). An empty result removes the description; returned
    * triples are re-subjected to the group's subject, like the reference
    * ("added using the old subject"). Set semantics on the output. */
  def updateAllDescriptions(g: DataFrame,
                            f: (Term, Seq[Triple]) => Seq[Triple]): DataFrame = {
    val spark = g.sparkSession
    import spark.implicits._
    g.select(col("s"), col("p"), col("o")).as[(Term, Term, Term)]
      .groupByKey(_._1)
      .flatMapGroups { (subj, rows) =>
        val desc = rows.map(r => Triple(r._1, r._2, r._3)).toSeq
        f(subj, desc).map(t => (subj, t.p, t.o)).distinct
      }.toDF("s", "p", "o")
  }

  /** Description.update_all_objects lifted graph-wide (description.ex:
    * 495-545 applied per subject): `f(predicate, object)` maps each object
    * to zero or more replacement objects — a pure per-row flatMap, no
    * shuffle at all. Empty result deletes the statement. */
  def updateAllObjects(g: DataFrame,
                       f: (Term, Term) => Seq[Term]): DataFrame = {
    val spark = g.sparkSession
    import spark.implicits._
    g.select(col("s"), col("p"), col("o")).as[(Term, Term, Term)]
      .flatMap { case (s, p, o) => f(p, o).map(o2 => (s, p, o2)) }
      .toDF("s", "p", "o").dropDuplicates()
  }

  // ------------------------------------------------------- projections/stats

  def describes(g: DataFrame, subject: Term): Boolean =
    !g.filter(col("s") === Terms.constTerm(subject)).isEmpty

  /** Point lookup of one subject's Description (graph.ex:808-863) — a
    * pushed-down filter; with subject bucketing this prunes partitions. */
  def description(g: DataFrame, subject: Term): DataFrame =
    g.filter(col("s") === Terms.constTerm(subject))

  def subjects(g: DataFrame): DataFrame = g.select("s").distinct()
  def predicates(g: DataFrame): DataFrame = g.select("p").distinct()
  def objects(g: DataFrame): DataFrame = g.select("o").distinct()

  /** resources: subjects + non-literal objects (data.ex:1049). */
  def resources(g: DataFrame): DataFrame =
    g.select("s").unionAll(g.filter(Terms.isResource(col("o"))).select("o"))
      .distinct()

  def statementCount(g: DataFrame): Long = g.count()
  def subjectCount(g: DataFrame): Long = subjects(g).count()
  def predicateCount(g: DataFrame): Long = predicates(g).count()

  /** values/2 nested-map projection at the API edge (graph.ex:1328-1391):
    * one row per subject with map(predicate -> objects). */
  def values(g: DataFrame): DataFrame = valuesWithContext(g, Map.empty)

  /** values/2 with a PropertyMap `:context`
    * (graph.ex:1328-1391 + statement.ex default_property_mapping,
    * statement.ex:253-262): predicates present in the map render as their
    * readable term key (Elixir atom -> String here), others fall back to
    * the raw IRI string. The map is a literal expression (the Spark
    * analogue of a broadcast dictionary — PropertyMaps are vocabulary-
    * scale), so the projection stays one codegen'd pass. */
  /** The PropertyMap `:context` predicate key: mapped predicates render
    * as their readable term, others fall back to the raw IRI string — ONE
    * definition for the triple-level and quad-level values projections. */
  private def contextKey(context: Map[String, String]): Column =
    if (context.isEmpty) col("p")("value")
    else {
      val m = map(context.flatMap { case (iri, term) =>
        Seq(lit(iri), lit(term)) }.toSeq: _*)
      coalesce(element_at(m, col("p")("value")), col("p")("value"))
    }

  def valuesWithContext(g: DataFrame, context: Map[String, String]): DataFrame = {
    val keyed = contextKey(context)
    g.groupBy(col("s")("value").as("subject"), keyed.as("k"))
      .agg(collect_list(col("o")("value")).as("v"))
      .groupBy("subject")
      .agg(map_from_entries(collect_list(struct(col("k"), col("v")))).as("predications"))
  }

  /** RDF.Dataset.values/2 (dataset.ex:1008-1014; dataset_test.exs
    * values/1 + values/2 cases) at the quad level: the reference returns
    * a nested map graph_name -> subject -> predicate -> [objects]; the
    * relational shape is one row per (graph_name, subject) carrying the
    * predicate->objects map, graph_name null = the default graph. Same
    * PropertyMap `:context` contract as [[valuesWithContext]]; the same
    * two-level aggregation plan, with graph_name simply joining the
    * grouping key — no extra shuffle over the triple-level projection. */
  def datasetValues(quads: DataFrame,
                    context: Map[String, String] = Map.empty): DataFrame = {
    val keyed = contextKey(context)
    quads.groupBy(col("g")("value").as("graph_name"),
        col("s")("value").as("subject"), keyed.as("k"))
      .agg(collect_list(col("o")("value")).as("v"))
      .groupBy("graph_name", "subject")
      .agg(map_from_entries(collect_list(struct(col("k"), col("v")))).as("predications"))
  }

  /** RDF.Dataset.map/2 (dataset.ex:1055-1060; dataset_test.exs map/2
    * case): the quad-level custom per-position mapping — every position
    * INCLUDING graph_name runs through `f` (via [[mapStatements]], which
    * already applies f at the "graph_name" position) and the mapped quads
    * project to the same per-(graph, subject) nested shape as
    * [[datasetValues]]. The reference's nil-fn-result contract follows
    * mapStatements' documented divergence (row dropped, not nil). */
  def datasetMap(quads: DataFrame, f: (String, Term) => String): DataFrame =
    mapStatements(quads, f)
      .groupBy(col("g").as("graph_name"), col("s").as("subject"),
        col("p").as("k"))
      .agg(collect_list(col("o")).as("v"))
      .groupBy("graph_name", "subject")
      .agg(map_from_entries(collect_list(struct(col("k"), col("v")))).as("predications"))

  /** Statement.map/2 lifted graph-wide (statement.ex:208-244, triple.ex /
    * quad.ex map): a CUSTOM per-position mapping fn `(position, term) ->
    * value` where position is "subject" | "predicate" | "object" (and
    * "graph_name" when a g column is present). The reference turns a nil
    * fn result into a nil statement; the DataFrame analogue drops that
    * row (documented divergence — a relation has no per-row nil). Pure
    * per-partition flatMap, no shuffle. */
  def mapStatements(g: DataFrame, f: (String, Term) => String): DataFrame = {
    val spark = g.sparkSession
    import spark.implicits._
    if (g.columns.contains("g")) {
      g.select(col("s"), col("p"), col("o"), col("g")).as[Quad]
        .flatMap { q =>
          val s = f("subject", q.s); val p = f("predicate", q.p)
          val o = f("object", q.o)
          val gn = if (q.g == null) null else f("graph_name", q.g)
          if (s == null || p == null || o == null || (q.g != null && gn == null)) None
          else Some((s, p, o, gn))
        }.toDF("s", "p", "o", "g")
    } else {
      g.select(col("s"), col("p"), col("o")).as[(Term, Term, Term)]
        .flatMap { case (st, pt, ot) =>
          val s = f("subject", st); val p = f("predicate", pt)
          val o = f("object", ot)
          if (s == null || p == null || o == null) None else Some((s, p, o))
        }.toDF("s", "p", "o")
    }
  }

  // ------------------------------------------------------- dataset (quads)

  /** RDF.Dataset.graph_count (dataset.ex:744): distinct graphs, the default
    * graph (g = null) counted when it holds statements. */
  def graphCount(quads: DataFrame): Long = quads.select("g").distinct().count()

  /** RDF.Dataset.who_describes (dataset.ex:937): the graph names holding
    * statements about a subject. */
  def whoDescribes(quads: DataFrame, subject: Term): DataFrame =
    quads.filter(col("s") === Terms.constTerm(subject)).select("g").distinct()

  /** One named graph of a dataset (null = the default graph). */
  def graph(quads: DataFrame, name: Term): DataFrame = {
    val cond = if (name == null) col("g").isNull
               else col("g") === Terms.constTerm(name)
    quads.filter(cond).select("s", "p", "o")
  }

  /** RDF.Dataset.put_graph (dataset.ex:304-340): REPLACE whole named
    * graphs — every graph name present in `input` (including the default
    * graph when input carries g = null rows) is overwritten wholesale;
    * graphs absent from `input` pass through untouched. `destination`
    * mirrors the `:graph` option: all input statements are re-graphed to
    * that one name first (so only that graph is replaced).
    * Plan: a null-safe anti-join of the store against input's (tiny,
    * broadcast) distinct graph-name set, then union — never a per-graph
    * loop. */
  def putGraph(quads: DataFrame, input: DataFrame,
               destination: Option[Term] = None): DataFrame = destination match {
    case Some(name) =>
      // an explicit destination replaces THAT graph even when the input
      // is empty (put_graph with :graph puts a possibly-empty graph under
      // the name — statement-wise, a deletion), so the name itself drives
      // the removal rather than the input's row-derived name set
      val g = if (name == null) lit(null).cast(quads.schema("g").dataType)
              else Terms.constTerm(name)
      // dedup only the INPUT side: the delete/anti-join guarantees the
      // store side is disjoint from the replaced graphs, so a store-wide
      // dropDuplicates would shuffle the whole dataset per mutation
      deleteGraph(quads, Seq(name))
        .unionByName(input.select(col("s"), col("p"), col("o"), g.as("g"))
          .dropDuplicates())
    case None =>
      val in0 = input.select(col("s"), col("p"), col("o"), col("g"))
      val names = in0.select(col("g").as("__g")).distinct()
      quads.join(broadcast(names), col("g") <=> col("__g"), "left_anti")
        .unionByName(in0.dropDuplicates())
  }

  /** RDF.Dataset.delete_graph (dataset.ex:478-486): drop whole graphs by
    * name (null = the default graph, dataset.ex:492 delete_default_graph).
    * A pushed-down filter — with graph-partitioned storage this is
    * partition pruning. */
  def deleteGraph(quads: DataFrame, names: Seq[Term]): DataFrame =
    if (names.isEmpty) quads
    else {
      val hit = names.map { n =>
        if (n == null) col("g").isNull else col("g") === Terms.constTerm(n)
      }.reduce(_ || _)
      quads.filter(!coalesce(hit, lit(false)))
    }

  /** RDF.Dataset.delete_default_graph (dataset.ex:492-494). */
  def deleteDefaultGraph(quads: DataFrame): DataFrame =
    deleteGraph(quads, Seq(null.asInstanceOf[Term]))

  /** RDF.Dataset.update/4 (dataset.ex:342-383): transform ONE named graph
    * (null = default) with a function over its triple frame. If the graph
    * is absent, `initial` is inserted under `name` (or the dataset is
    * returned unchanged when no initial is given); an empty result from
    * `f` removes the graph. Presence is one pushed-down-filter emptiness
    * probe (metadata-scale with graph-partitioned storage). */
  def updateGraph(quads: DataFrame, name: Term,
                  f: DataFrame => DataFrame,
                  initial: Option[DataFrame] = None): DataFrame = {
    val gCol = if (name == null) lit(null).cast(quads.schema("g").dataType)
               else Terms.constTerm(name)
    def regraph(df: DataFrame): DataFrame =
      df.select(col("s"), col("p"), col("o")).withColumn("g", gCol)
    val current = graph(quads, name)
    // input-side-only dedup, same reasoning as putGraph
    if (current.isEmpty) initial match {
      case Some(init) => quads.unionByName(regraph(init).dropDuplicates())
      case None => quads
    } else
      deleteGraph(quads, Seq(name))
        .unionByName(regraph(f(current)).dropDuplicates())
  }

  /** RDF.Dataset.update_all_graphs (dataset.ex:412-417): apply `f` to
    * EVERY graph of the dataset — the quad-level sibling of
    * `updateAllDescriptions`: one distributed groupByKey on the graph
    * name, `f` runs per graph inside flatMapGroups (the reference reduces
    * over graph_names on one node). `f` receives the (possibly default =
    * null) graph name and the graph's triples; its output is re-graphed
    * under the OLD name ("added using the old graph name", dataset.ex:400)
    * and an empty result removes the graph. Set semantics on output.
    *
    * CONTRACT — whole graph per task: `f`'s Seq-in/Seq-out signature is
    * faithful to the reference's whole-graph function, which means EACH
    * NAMED GRAPH MATERIALIZES IN ONE EXECUTOR TASK. That is the right
    * shape for per-document named graphs (the web-KG layout: millions of
    * small graphs), and the wrong one for a corpus-scale graph — the
    * default graph of a whole web KG funneled through this API would OOM
    * one executor at 100x. `maxGraphRows` (default 10M rows ~ low GBs of
    * term structs) fails fast with a clear message instead; route big
    * graphs through [[updateGraph]], whose `f` is DataFrame=>DataFrame and
    * stays fully distributed. */
  def updateAllGraphs(quads: DataFrame,
                      f: (Term, Seq[Triple]) => Seq[Triple],
                      maxGraphRows: Long = 10000000L): DataFrame = {
    // a cap above Int.MaxValue is unreachable — the whole graph buffers in
    // one in-task ArrayBuffer (Int-indexed), which OOMs/overflows long
    // before the guard could fire; reject the no-op cap here so the
    // "raise maxGraphRows deliberately" escape hatch can't silently turn
    // the fail-fast contract off
    require(maxGraphRows > 0 && maxGraphRows < Int.MaxValue,
      s"updateAllGraphs: maxGraphRows=$maxGraphRows must be in (0, Int.MaxValue) " +
        "— each graph materializes in one task's Int-indexed buffer; graphs " +
        "beyond that belong in Graphs.updateGraph (DataFrame => DataFrame)")
    val spark = quads.sparkSession
    import spark.implicits._
    quads.select(col("s"), col("p"), col("o"), col("g")).as[Quad]
      // key by a null-safe scalar projection of the name: a null Term
      // can't pass through a product key encoder
      .groupByKey(q =>
        if (q.g == null) (true, "", "") else (false, q.g.kind.toString, q.g.value))
      .flatMapGroups { (_, rows) =>
        val group = scala.collection.mutable.ArrayBuffer.empty[Quad]
        var over = false
        while (rows.hasNext && !over) {
          group += rows.next()
          if (group.length > maxGraphRows) over = true
        }
        if (over) {
          val name = Option(group.head.g).map(_.value).getOrElse("<default graph>")
          throw new IllegalArgumentException(
            s"updateAllGraphs: graph '$name' exceeds maxGraphRows=$maxGraphRows " +
              "— a whole named graph materializes in ONE task under this API " +
              "(reference semantics: f sees the full graph). Use " +
              "Graphs.updateGraph(quads, name, f: DataFrame => DataFrame) for " +
              "corpus-scale graphs, or raise maxGraphRows deliberately.")
        }
        val name = group.head.g
        f(name, group.map(_.triple).toSeq).map(t => Quad(t.s, t.p, t.o, name)).distinct
      }.toDF("s", "p", "o", "g")
  }

  // ------------------------------------------------------------ serialization

  /** Canonical sorted N-Triples lines of a term-struct graph — Column-only
    * expressions, global sort only at the output edge. */
  def toCanonicalNtLines(g: DataFrame): Dataset[String] = {
    import g.sparkSession.implicits._
    g.select(Terms.tripleLine(col("s"), col("p"), col("o")).as("value"))
      .orderBy("value").as[String]
  }

  /** Distributed Turtle decode: one document per row (url/id, turtle text)
    * -> term-struct quads tagged with the document id. Parse is per-document
    * inside mapPartitions — embarrassingly parallel. */
  def parseTurtleDocs(docs: Dataset[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.flatMap { case (docId, text) =>
      Turtle.parse(text, docId).triples.map(t => (docId, t.s, t.p, t.o))
    }.toDF("doc", "s", "p", "o")
  }

  /** Distributed Turtle serialization: one deterministic Turtle document
    * per group key (named graph / document), built inside mapGroups with
    * the same encoder the single-graph API uses. Output: (key, turtle). */
  def toTurtlePerGroup(triples: DataFrame, keyCol: String,
                       prefixes: Map[String, String] = Map.empty): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    triples.select(col(keyCol).cast("string"), col("s"), col("p"), col("o"))
      .as[(String, Term, Term, Term)]
      .groupByKey(_._1)
      .mapGroups { (key, rows) =>
        val ts = rows.map(r => Triple(r._2, r._3, r._4)).toSeq
        (key, TurtleEncoder.encode(ts, prefixes))
      }.toDF(keyCol, "turtle")
  }

  // -------------------------------------------------------- canonicalization

  /** Distributed RDFC-1.0, one independent graph per group key (the
    * per-document case of the north star): each group is canonicalized by
    * the sequential spec algorithm inside mapGroups, and its c14n labels are
    * made globally unique by prefixing the group key's hash. Output columns:
    * (key, s, p, o). */
  def canonicalizePerGroup(quads: DataFrame, keyCol: String): DataFrame = {
    val spark = quads.sparkSession
    import spark.implicits._
    quads.select(col(keyCol).cast("string"),
        col("s"), col("p"), col("o"))
      .as[(String, Term, Term, Term)]
      .groupByKey(_._1)
      .flatMapGroups { (key, rows) =>
        val quadSeq = rows.map(r => Quad(r._2, r._3, r._4, null)).toSeq
        val (canon, _) = Rdfc10.canonicalize(quadSeq)
        val prefix = Skolem.hash128Hex(key).take(16)
        canon.map { q =>
          def rel(t: Term): Term =
            if (t != null && t.isBnode) Term(TermKind.BNODE, s"$prefix-${t.value}", null, null)
            else t
          (key, rel(q.s), q.p, rel(q.o))
        }
      }.toDF(keyCol, "s", "p", "o")
  }

  /** Traversal strategy for [[reachable]], mirroring reachability.ex's
    * `:follow` option: `:all`, `:bnodes`, or a custom arity-3 function
    * `(object, predicate, depth) => Boolean` (the start node has depth 0,
    * its neighbors depth 1, ...). */
  sealed trait Follow
  object Follow {
    case object All extends Follow
    case object Bnodes extends Follow
    final case class Custom(f: (Term, Term, Int) => Boolean) extends Follow
  }

  /** Graph.Reachability.reachable over TERM graphs
    * (lib/rdf/model/graph/reachability.ex:12-120): the union of the FULL
    * descriptions of every visited node, where traversal from a visited
    * node follows its non-literal objects per `follow`:
    *
    *  - `Follow.All` — every resource object (depth-limited by `maxDepth`)
    *  - `Follow.Bnodes` — blank nodes only (the Concise Bounded
    *    Description), depth-limited by `bnodeDepth`
    *  - `Follow.Custom(f)` — arbitrary `(object, predicate, depth)`
    *    predicate, applied per frontier expansion (a typed Dataset filter:
    *    exact reference semantics at the cost of leaving codegen for the
    *    frontier-edge frame only)
    *
    * `bnodeDepth` defaults to `maxDepth` (reachability.ex:193); with
    * `Follow.All` blank nodes obey `bnodeDepth` and other resources
    * `maxDepth`, so `maxDepth=1, bnodeDepth=unlimited` reproduces the
    * reference's mixed-depth example. `predicates` gates which edges are
    * TRAVERSED — descriptions of visited nodes are always added whole,
    * like the reference (it does NOT project the output to the whitelist).
    * `into` unions the result into an existing graph (the `:into` option).
    *
    * Scale shape: per depth, one frontier equi-join + one anti-join against
    * the visited set, each localCheckpoint'ed so depth d costs one join,
    * not a replay of depths 1..d-1. Early exit on a closed frontier; the
    * visited anti-join guarantees termination on cyclic graphs even with
    * unlimited depth. */
  def reachable(g: DataFrame, start: Term,
                follow: Follow = Follow.All,
                maxDepth: Int = Int.MaxValue,
                bnodeDepth: Int = -1,
                predicates: Seq[String] = Nil,
                into: Option[DataFrame] = None): DataFrame = {
    val spark = g.sparkSession
    import spark.implicits._
    val gp = g.persist()
    val bDepth = if (bnodeDepth < 0) maxDepth else bnodeDepth
    val predOk: Column =
      if (predicates.isEmpty) lit(true)
      else col("p")("value").isin(predicates: _*)
    // Tuple1 keeps the term as ONE struct column (a bare Dataset[Term]
    // would flatten into kind/value/datatype/lang)
    import graft.ops.GraphAlgos.releaseLocalCheckpoint
    var visited = Seq(Tuple1(start)).toDF("node").localCheckpoint()
    var frontier = visited
    val layers = scala.collection.mutable.Buffer.empty[DataFrame]
    var d = 1 // depth of the nodes the current expansion may reach
    var done = false
    try {
    while (!done) {
      val tris = gp.join(frontier, gp("s") === frontier("node"))
        .select(gp("s").as("s"), gp("p").as("p"), gp("o").as("o"))
        .localCheckpoint()
      layers += tris
      // literals are never traversal candidates (reference skips them
      // before the follow function sees them)
      val cand = tris.filter(!Terms.isLiteral(col("o")))
      val followed = follow match {
        case Follow.All =>
          cand.filter(predOk &&
            when(Terms.isBnode(col("o")), lit(d <= bDepth))
              .otherwise(lit(d <= maxDepth)))
        case Follow.Bnodes =>
          cand.filter(predOk && Terms.isBnode(col("o")) && lit(d <= bDepth))
        case Follow.Custom(f) =>
          // the predicate whitelist gates traversal for EVERY strategy,
          // custom follow functions included
          val depth = d
          cand.filter(predOk).select(col("p"), col("o")).as[(Term, Term)]
            .filter { case (p, o) => f(o, p, depth) }
            .toDF("p", "o")
      }
      val newNodes = followed.select(col("o").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti").localCheckpoint()
      // tris and newNodes are materialized (localCheckpoint is eager): the
      // frontier they consumed is dead — unless it still IS the visited
      // frame (round 1). Only the LAYER checkpoints live on: they back
      // the returned frame (release via releaseLocalCheckpoint(result)).
      if (frontier ne visited) releaseLocalCheckpoint(frontier)
      done = newNodes.isEmpty
      if (!done) {
        frontier = newNodes
        val prevVisited = visited
        visited = visited.unionByName(newNodes).localCheckpoint()
        releaseLocalCheckpoint(prevVisited)
      } else releaseLocalCheckpoint(newNodes)
      d += 1
    }
    releaseLocalCheckpoint(visited) // the result references only the layers
    } finally gp.unpersist() // incl. a throwing custom follow function
    val result =
      if (layers.isEmpty) g.limit(0)
      else layers.reduce(_ unionByName _).dropDuplicates()
    into match {
      case Some(base) => add(base, result)
      case None => result
    }
  }

  /** Back-compat face of [[reachable]]: `followBnodesOnly=true` is the
    * `:bnodes` strategy (CBD). NOTE predicate-whitelist semantics follow
    * the reference: the whitelist gates traversal only — visited nodes'
    * descriptions are returned whole. */
  def descriptionClosure(g: DataFrame, start: Term,
                         followBnodesOnly: Boolean = false,
                         maxDepth: Int = 20,
                         predicates: Seq[String] = Nil): DataFrame =
    reachable(g, start,
      follow = if (followBnodesOnly) Follow.Bnodes else Follow.All,
      maxDepth = maxDepth, predicates = predicates)

  /** The Increment generator algorithm distributed
    * (blank_node_generator/increment.ex): issue `prefix0, prefix1, ...`
    * ids over the rows of `df` in the total order given by `orderCols` —
    * a counter is inherently sequential, so the caller must supply the
    * order that makes ids meaningful; issuing runs as one single-partition
    * window (id issuing is a metadata-scale step, not a corpus-scale one;
    * use [[graft.core.Skolem]] for corpus-scale deterministic identity). */
  def incrementIds(df: DataFrame, orderCols: Seq[Column],
                   prefix: String = "b", idCol: String = "gen_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn(idCol, concat(lit(prefix),
      (row_number().over(Window.orderBy(orderCols: _*)) - 1).cast("string")))
  }

  /** Blank-node connected components via iterative min-label propagation
    * over bnode co-occurrence edges — the grouping step before full-dataset
    * RDFC when graphs are NOT pre-partitioned by document. Returns
    * (label, component) for every bnode label.
    *
    * Scale hygiene: the edge set is cached once, each round's labels are
    * localCheckpoint'ed so round i is one join (not a replay of rounds
    * 1..i-1), and the convergence probe runs on the materialized frame.
    * Rounds use POINTER DOUBLING (adopt the neighbor minimum, then the
    * component-of-my-component), so convergence is O(log diameter).
    * Non-convergence THROWS — a silently split component would make the
    * downstream per-component RDFC canonicalization emit wrong labels. */
  /** Whole-dataset RDFC-1.0 over a term-struct triple frame whose bnodes
    * are NOT pre-partitioned by document — the reference's one-call
    * `canonicalize/2` (lib/rdf/canonicalization/canonicalization.ex:50-52)
    * for the cross-document case: (1) group bnodes into co-occurrence
    * connected components ([[bnodeComponents]], pointer-doubled min-label
    * propagation, O(log diameter) rounds), (2) join component ids back to
    * the statements that mention a bnode (one shuffled equi-join on the
    * bnode label), (3) run the sequential RDFC-1.0 spec algorithm per
    * component inside flatMapGroups ([[canonicalizePerGroup]]). Ground
    * statements (no bnode in any position) bypass all three steps
    * untouched — RDFC labels depend only on statements mentioning a bnode,
    * so at web scale the (dominant) ground fraction of the KG never
    * shuffles.
    *
    * Label-scope divergence from the reference, documented: the reference
    * issues ONE global `c14n0..N` sequence over the whole dataset, an
    * inherently sequential order a distributed engine cannot reproduce
    * without funnelling every component through one process. Labels here
    * are `<md5(component).take(16)>-c14nK` with K the component-local RDFC
    * issue order — deterministic, isomorphism-invariant (the component id
    * is the component's min ORIGINAL label only through [[bnodeComponents]];
    * see note below), and globally unique.
    *
    * NOTE isomorphism caveat: the component id (and so the label prefix)
    * derives from input bnode labels, so byte-identical output under bnode
    * RENAMING holds per component content, not prefix — two datasets that
    * differ only in bnode names canonicalize to isomorphic (same shape,
    * different prefixes) output. Within a fixed ingest (skolemized or
    * parser-assigned labels, the north-star path) output is byte-stable
    * across partitionings, retries, and cluster sizes, which is the
    * property the pipeline needs. For reference-exact single-graph labels
    * use [[graft.core.Rdfc10.canonicalize]] on a collected graph. */
  def canonicalizeDataset(g: DataFrame, maxIter: Int = 20): DataFrame = {
    val bn = TermKind.BNODE
    val comp = bnodeComponents(g, maxIter)
    // a statement's component is its first bnode's (s, else o): a triple
    // carrying bnodes in both positions has them in ONE component by
    // construction (co-occurrence is an edge)
    val bl = when(col("s")("kind") === bn, col("s")("value"))
      .when(col("o")("kind") === bn, col("o")("value"))
    val keyed = g.select(col("s"), col("p"), col("o"), bl.as("__bl"))
    val ground = keyed.filter(col("__bl").isNull).select("s", "p", "o")
    val withComp = keyed.filter(col("__bl").isNotNull)
      .join(comp, col("__bl") === col("label"))
      .select(col("component"), col("s"), col("p"), col("o"))
    ground.unionByName(
      canonicalizePerGroup(withComp, "component").select("s", "p", "o"))
  }

  def bnodeComponents(g: DataFrame, maxIter: Int = 20): DataFrame = {
    val bn = TermKind.BNODE
    // vertex set
    val labels = g.select(col("s").as("t")).unionAll(g.select(col("o").as("t")))
      .filter(col("t")("kind") === bn).select(col("t")("value").as("label")).distinct()
    // edges: bnodes co-occurring in one triple
    val both = g.filter(col("s")("kind") === bn && col("o")("kind") === bn)
      .select(col("s")("value").as("a"), col("o")("value").as("b"))
    val edges = both.unionAll(both.select(col("b").as("a"), col("a").as("b")))
      .distinct().persist()
    var comp = labels.withColumn("component", col("label")).localCheckpoint()
    // the frame whose checkpoint blocks back `comp` — released once the
    // next round's checkpoint supersedes it (the GraphAlgos lifecycle:
    // at most two rounds' worth of vertex-scale storage, not one per
    // round accumulating for the session)
    var live: DataFrame = comp
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      // each bnode adopts the min of its own and its neighbors' components
      val neighborMin = edges
        .join(comp.select(col("label").as("b_l"), col("component").as("b_c")),
          col("b") === col("b_l"))
        .groupBy(col("a").as("label")).agg(min(col("b_c")).as("nc"))
      val hop = comp.join(neighborMin, Seq("label"), "left")
        .select(col("label"), col("component"),
          when(col("nc").isNotNull, least(col("component"), col("nc")))
            .otherwise(col("component")).as("newComp"))
        .localCheckpoint()
      // POINTER DOUBLING (shortcutting): additionally adopt the component
      // of my component — labels chase 2^i-hop representatives, so a chain
      // of diameter D converges in O(log D) rounds instead of O(D); the
      // default maxIter=20 then covers diameters up to ~2^20, and the
      // non-convergence throw below is a true pathology guard, not a limit
      // on ordinary deep chains
      val reps = hop.select(col("label").as("r_l"), col("newComp").as("r_c"))
      val next = hop.join(reps, hop("newComp") === reps("r_l"), "left")
        .select(hop("label").as("label"), hop("component").as("component"),
          when(col("r_c").isNotNull, least(hop("newComp"), col("r_c")))
            .otherwise(hop("newComp")).as("newComp"))
        .localCheckpoint() // truncate lineage; also backs the convergence probe
      // next is materialized (localCheckpoint is eager): the previous
      // round's checkpoint and this round's intermediate hop are dead
      graft.ops.GraphAlgos.releaseLocalCheckpoint(live)
      graft.ops.GraphAlgos.releaseLocalCheckpoint(hop)
      live = next
      converged = next.filter(col("newComp") =!= col("component")).isEmpty
      comp = next.select(col("label"), col("newComp").as("component"))
      i += 1
    }
    edges.unpersist()
    if (!converged) {
      graft.ops.GraphAlgos.releaseLocalCheckpoint(live)
      throw new IllegalStateException(
        s"bnodeComponents did not converge after $maxIter rounds — " +
          "with pointer doubling that is a component diameter beyond " +
          "~2^maxIter, i.e. a pathological input; raise maxIter if truly needed")
    }
    comp
  }
}

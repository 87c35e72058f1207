package graft.core

/** TriG encoder — the named-graph sink half of the reference's shared
  * Turtle/TriG encoder (lib/rdf/serializations/turtle_trig/encoder.ex via
  * trig/encoder.ex; SURVEY §2.1 "Turtle/TriG encoder").
  *
  * Document shape: shared @base/@prefix directives, the default graph's
  * triples bare, then one `GRAPH <name> { ... }` block per named graph
  * (graph names ordered IRIs-then-bnodes by code point — the same
  * deterministic sequencing as subjects inside a graph). Each block's body
  * is the full [[TurtleEncoder]] (compact `[]`/`()` forms, star
  * annotations) with directives suppressed, indented. Output re-parses
  * with `Turtle.parseTriG` to an isomorphic dataset.
  */
object TrigEncoder {

  def encode(quads: Seq[Quad], prefixes: Map[String, String] = Map.empty,
             base: Option[String] = None): String = {
    val sb = new StringBuilder
    base.foreach(b => sb.append("@base <").append(b).append("> .\n"))
    for ((p, ns) <- prefixes.toSeq.sortBy(_._1))
      sb.append("@prefix ").append(p).append(": <").append(ns).append("> .\n")
    if (prefixes.nonEmpty || base.nonEmpty) sb.append('\n')

    // bnodes visible in MORE than one graph (incl. the default graph and
    // graph-name position, and bnodes nested in quoted-triple terms) must
    // render labeled everywhere: each graph body is encoded independently,
    // and an anonymous []/(...)/[ ... ] form in one body would sever the
    // node's identity with its occurrences in the other graphs on re-parse.
    val crossGraph: Set[Term] = {
      def bnodesOf(t: Term): Iterator[Term] = t.kind match {
        case TermKind.BNODE => Iterator.single(t)
        case TermKind.TRIPLE =>
          val i = NTriples.parseQuotedString(t.value)
          Iterator(i.s, i.p, i.o).flatMap(bnodesOf)
        case _ => Iterator.empty
      }
      val graphsOf = scala.collection.mutable.HashMap.empty[Term, Set[Term]]
      for (q <- quads; t <- Iterator(q.s, q.o).flatMap(bnodesOf))
        graphsOf(t) = graphsOf.getOrElse(t, Set.empty) +
          (if (q.g == null) Term.iri("") else q.g)
      val shared = graphsOf.collect { case (t, gs) if gs.size > 1 => t }.toSet
      val graphNames = quads.iterator.map(_.g)
        .filter(g => g != null && g.isBnode).toSet
      shared ++ graphNames
    }

    def body(qs: Seq[Quad]): String =
      TurtleEncoder.encode(qs.map(q => Triple(q.s, q.p, q.o)), prefixes,
        base = None, directives = false, forceLabeled = crossGraph)

    val (default, named) = quads.partition(_.g == null)
    if (default.nonEmpty) {
      sb.append(body(default))
      if (named.nonEmpty) sb.append('\n')
    }
    val groups = named.groupBy(_.g).toSeq
      .sortBy { case (g, _) => (g.kind.toInt, g.value) }
    var first = true
    for ((g, qs) <- groups) {
      if (!first) sb.append('\n')
      first = false
      sb.append("GRAPH ").append(TurtleEncoder.term(g, prefixes)).append(" {\n")
      for (line <- body(qs).linesIterator)
        if (line.nonEmpty) sb.append("    ").append(line).append('\n')
        else sb.append('\n')
      sb.append("}\n")
    }
    sb.toString
  }
}

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

    def body(qs: Seq[Quad]): String =
      TurtleEncoder.encode(qs.map(q => Triple(q.s, q.p, q.o)), prefixes,
        base = None, directives = false)

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

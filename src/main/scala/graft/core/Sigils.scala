package graft.core

/** The reference's term-construction sugar, re-expressed with Scala's
  * native idioms.
  *
  * `RDF.Sigils` (lib/rdf/sigils.ex: `~I`/`~i` IRIs, `~B`/`~b` blank
  * nodes, `~L` literals with `~L"..."l` language and the module's literal
  * forms) maps onto STRING INTERPOLATORS — `iri"http://ex.org/$x"`,
  * `bnode"b1"`, `lit"hello"` — which, like the `~i`-family sigils,
  * interpolate before constructing the term.
  *
  * `RDF.Graph.Builder` (lib/rdf/graph_builder/graph_builder.ex — the
  * `RDF.Graph.build do ... end` macro DSL with base/prefix declarations,
  * `a` for rdf:type, and `exclude`) maps onto [[GraphBuilder]], a fluent
  * immutable builder that resolves prefixed names against a [[PrefixMap]]
  * and relative IRIs (`<...>` forms) against a base, and carries the
  * declarations into the built graph for serialization.
  */
object Sigils {
  implicit final class RdfStringContext(private val sc: StringContext) extends AnyVal {
    /** `iri"http://example.com/$name"` — the ~i sigil. */
    def iri(args: Any*): Term = Term.iri(sc.s(args: _*))
    /** `bnode"b$i"` — the ~b sigil. */
    def bnode(args: Any*): Term = Term.bnode(sc.s(args: _*))
    /** `lit"hello $who"` — plain xsd:string literal (~L). */
    def lit(args: Any*): Term = Term.str(sc.s(args: _*))
    /** `lang"bonjour@fr"` — language-tagged literal (~L"..."fr form);
      * the tag follows the last '@'. */
    def lang(args: Any*): Term = {
      val s = sc.s(args: _*)
      val i = s.lastIndexOf('@')
      require(i > 0, s"no @language in: $s")
      Term.langLit(s.substring(0, i), s.substring(i + 1))
    }
  }
}

/** Fluent, immutable graph builder (graph_builder.ex semantics):
  * - `prefix("ex", ns)` declarations; subsequent "ex:local" terms expand
  * - `base(iri)`; subsequent "<relative>" terms resolve against it
  * - `a` is rdf:type (Helper.a)
  * - plain strings in term position: "p:local" prefixed names, "<iri>"
  *   IRI refs (relative or absolute), anything else is invalid here —
  *   pass a [[Term]] for literals/bnodes (built with [[Sigils]])
  * - `exclude(...)` drops statements from the result (Helper.exclude)
  * - `build` returns the triples; `prefixes` feed the Turtle encoder
  */
final case class GraphBuilder(baseIri: Option[String] = None,
                              prefixes: PrefixMap = PrefixMap.of(),
                              triples: Vector[Triple] = Vector.empty,
                              excluded: Set[Triple] = Set.empty) {

  val a: Term = Term.iri(Vocab.rdfType)

  def base(iri: String): GraphBuilder = copy(baseIri = Some(iri))

  def prefix(p: String, namespace: String): GraphBuilder =
    copy(prefixes = prefixes.put(p, namespace))

  /** Resolve a string term: "p:local" via the prefix map, "<ref>" against
    * the base (absolute refs pass through). */
  def term(s: String): Term = s match {
    case r if r.startsWith("<") && r.endsWith(">") =>
      val ref = r.substring(1, r.length - 1)
      baseIri match {
        case Some(b) if Iri.resolve(ref, b) != null => Term.iri(Iri.resolve(ref, b))
        case _ => Term.iri(ref)
      }
    case p if p.contains(":") =>
      prefixes.expand(p).map(Term.iri)
        .getOrElse(throw new IllegalArgumentException(s"unresolvable prefixed name: $p"))
    case other =>
      throw new IllegalArgumentException(
        s"not an IRI form (use <...>, p:local, or a Term): $other")
  }

  private def t(x: Any): Term = x match {
    case tm: Term => tm
    case s: String => term(s)
    case other => throw new IllegalArgumentException(s"not a term: $other")
  }

  def add(s: Any, p: Any, o: Any): GraphBuilder =
    copy(triples = triples :+ Triple(t(s), t(p), t(o)))

  /** One subject, many (p, o) pairs — the nested-description form. */
  def describe(s: Any)(pos: (Any, Any)*): GraphBuilder =
    pos.foldLeft(this) { case (b, (p, o)) => b.add(s, p, o) }

  def exclude(s: Any, p: Any, o: Any): GraphBuilder =
    copy(excluded = excluded + Triple(t(s), t(p), t(o)))

  def build: Seq[Triple] = triples.filterNot(excluded).distinct
}

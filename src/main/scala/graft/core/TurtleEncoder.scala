package graft.core

/** Deterministic Turtle encoder.
  *
  * Output shape follows the reference encoder
  * (`lib/rdf/serializations/turtle_trig/encoder.ex`): prefix directives,
  * per-subject grouping with `;` predicate lists and `,` object lists, `a`
  * for rdf:type, native shorthand for boolean/integer/decimal/double
  * literals only when the lexical form is canonical (encoder.ex:369-435),
  * prefixed names only when the local part is PN_LOCAL-safe
  * (encoder.ex:474-480). Ordering is the deterministic sequencing of
  * encoder/sequencer.ex reduced to: subjects sorted IRIs-then-bnodes by
  * code point, predicates rdf:type-first then sorted, objects sorted.
  * Blank nodes are emitted by label (no [] inlining in this slice) — output
  * is always re-parseable and isomorphic to the input.
  */
object TurtleEncoder {

  def encode(triples: Seq[Triple], prefixes: Map[String, String] = Map.empty,
             base: Option[String] = None): String = {
    val sb = new StringBuilder
    base.foreach(b => sb.append("@base <").append(b).append("> .\n"))
    for ((p, ns) <- prefixes.toSeq.sortBy(_._1))
      sb.append("@prefix ").append(p).append(": <").append(ns).append("> .\n")
    if (prefixes.nonEmpty || base.nonEmpty) sb.append('\n')

    val bySubject = triples.groupBy(_.s).toSeq.sortBy { case (s, _) => subjectKey(s) }
    for ((subj, ts) <- bySubject) {
      sb.append(term(subj, prefixes))
      val byPred = ts.groupBy(_.p).toSeq.sortBy { case (p, _) => predKey(p) }
      var firstP = true
      for ((p, pts) <- byPred) {
        if (!firstP) sb.append(" ;")
        sb.append("\n    ").append(if (p.value == Vocab.rdfType) "a" else term(p, prefixes))
        val objs = pts.map(_.o).distinct.sortBy(o => NTriples.termString(o))
        sb.append(' ').append(objs.map(term(_, prefixes)).mkString(", "))
        firstP = false
      }
      sb.append(" .\n")
    }
    sb.toString
  }

  private def subjectKey(s: Term): (Int, String) = (s.kind.toInt, s.value)
  private def predKey(p: Term): (Int, String) =
    (if (p.value == Vocab.rdfType) 0 else 1, p.value)

  def term(t: Term, prefixes: Map[String, String]): String = t.kind match {
    case TermKind.IRI => iri(t.value, prefixes)
    case TermKind.BNODE => "_:" + t.value
    case TermKind.LITERAL => literal(t, prefixes)
    case TermKind.TRIPLE =>
      // re-encode the quoted triple with the document's prefixes
      val inner = NTriples.parseQuotedString(t.value)
      "<< " + term(inner.s, prefixes) + " " +
        (if (inner.p.value == Vocab.rdfType) "a" else term(inner.p, prefixes)) +
        " " + term(inner.o, prefixes) + " >>"
    case k => throw new IllegalArgumentException(s"unsupported term kind $k")
  }

  private def iri(v: String, prefixes: Map[String, String]): String = {
    // longest-namespace match, like PrefixMap.prefix_name_pair
    val candidates = prefixes.toSeq
      .filter { case (_, ns) => v.startsWith(ns) && v.length > ns.length }
      .sortBy { case (_, ns) => -ns.length }
    candidates.collectFirst {
      case (p, ns) if pnLocalSafe(v.substring(ns.length)) => s"$p:${v.substring(ns.length)}"
    }.getOrElse("<" + v + ">")
  }

  /** Conservative PN_LOCAL safety (reference uses a fast regex,
    * encoder.ex:474-480): letters/digits/_/-/. with sane boundaries. */
  private def pnLocalSafe(local: String): Boolean =
    local.nonEmpty &&
      local.forall(c => Character.isLetterOrDigit(c) || c == '_' || c == '-' || c == '.') &&
      local.head != '-' && local.head != '.' && local.last != '.'

  private def literal(t: Term, prefixes: Map[String, String]): String = {
    val lex = t.value
    if (t.lang != null) quoted(lex) + "@" + t.lang
    else t.datatype match {
      case null | Vocab.xsdString => quoted(lex)
      case Vocab.xsdBoolean if lex == "true" || lex == "false" => lex
      case Vocab.xsdInteger if Xsd.canonicalInteger(lex).contains(lex) => lex
      case Vocab.xsdDecimal if Xsd.canonicalDecimal(lex).contains(lex) => lex
      // double shorthand requires an exponent to stay in the DOUBLE token
      // class (encoder.ex:429-435)
      case Vocab.xsdDouble
        if Xsd.canonicalDouble(lex).contains(lex) && (lex.contains("E") || lex.contains("e")) => lex
      case dt => quoted(lex) + "^^" + iri(dt, prefixes)
    }
  }

  private def quoted(lex: String): String = "\"" + NTriples.escape(lex) + "\""
}

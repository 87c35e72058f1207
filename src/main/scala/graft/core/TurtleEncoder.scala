package graft.core

import scala.collection.mutable

/** Deterministic Turtle encoder.
  *
  * Output shape follows the reference encoder
  * (`lib/rdf/serializations/turtle_trig/encoder.ex`): prefix directives,
  * per-subject grouping with `;` predicate lists and `,` object lists, `a`
  * for rdf:type, native shorthand for boolean/integer/decimal/double
  * literals only when the lexical form is canonical (encoder.ex:369-435),
  * prefixed names only when the local part is PN_LOCAL-safe
  * (encoder.ex:474-480), and the compact blank-node forms:
  *
  *  - `[ ... ]` inlining with ref-counting (encoder/bnode_info.ex): a bnode
  *    referenced exactly once as object has its description inlined at the
  *    use site; leaf bnodes referenced once render as `[]`; bnode subjects
  *    never referenced as objects render as anonymous `[ ... ] .` blocks;
  *    reference cycles demote back to labeled form
  *  - `( ... )` list reconstruction (encoder.ex:213-301): pure
  *    rdf:first/rdf:rest chains (exactly those two predicates per node,
  *    each node referenced once, nil-terminated, acyclic) render as
  *    collections at their use site
  *
  * Ordering is the deterministic sequencing of encoder/sequencer.ex reduced
  * to: subjects sorted IRIs-then-bnodes by code point, predicates
  * rdf:type-first then sorted, objects sorted. Output is always
  * re-parseable and isomorphic to the input. Terms are ASSUMED valid RDF
  * (the parsers enforce this on input, same contract as the reference's
  * constructors): a programmatically built IRI containing IRIREF-illegal
  * characters ('>', whitespace, ...) is emitted raw and will not
  * re-parse — validate at construction, not at every emission.
  */
object TurtleEncoder {

  /** `forceLabeled`: blank nodes that must render with their label in
    * EVERY position — never `[]`, `[ ... ]`, or `( ... )`. The TriG
    * encoder passes the bnodes shared across graphs (each graph body is
    * encoded independently, so an anonymous form would sever the
    * cross-graph identity on re-parse). */
  def encode(triples: Seq[Triple], prefixes: Map[String, String] = Map.empty,
             base: Option[String] = None,
             directives: Boolean = true,
             forceLabeled: Set[Term] = Set.empty): String = {
    val sb = new StringBuilder
    if (directives) {
      base.foreach(b => sb.append("@base <").append(b).append("> .\n"))
      for ((p, ns) <- prefixes.toSeq.sortBy(_._1))
        sb.append("@prefix ").append(p).append(": <").append(ns).append("> .\n")
      if (prefixes.nonEmpty || base.nonEmpty) sb.append('\n')
    }

    val bySubject: Map[Term, Seq[Triple]] = triples.groupBy(_.s)
    val objRefs: Map[Term, Int] =
      triples.filter(_.o.isBnode).groupBy(_.o).view.mapValues(_.size).toMap

    // bnodes occurring INSIDE quoted-triple (RDF-star) terms, at any depth:
    // they must render labeled everywhere (Turtle-star forbids property
    // lists / collections inside << >>), so they are never inline/[]/()
    // candidates — an inlined description would otherwise be lost or
    // duplicated and the round-trip would not be isomorphic.
    val starRef: Set[Term] = {
      val acc = mutable.HashSet.empty[Term]
      def walk(t: Term): Unit = t.kind match {
        case TermKind.TRIPLE =>
          val i = NTriples.parseQuotedString(t.value)
          walkIn(i.s); walkIn(i.p); walkIn(i.o)
        case _ =>
      }
      def walkIn(t: Term): Unit = t.kind match {
        case TermKind.BNODE => acc += t
        case TermKind.TRIPLE => walk(t)
        case _ =>
      }
      triples.foreach { t => walk(t.s); walk(t.o) }
      acc.toSet ++ forceLabeled
    }

    // ---- list reconstruction: pure first/rest chains
    def chainParts(t: Term): Option[(Term, Term)] = bySubject.get(t) match {
      case Some(ts) if t.isBnode && ts.size == 2 =>
        val f = ts.filter(_.p.value == Vocab.rdfFirst)
        val r = ts.filter(_.p.value == Vocab.rdfRest)
        if (f.size == 1 && r.size == 1) Some((f.head.o, r.head.o)) else None
      case _ => None
    }
    val isNil = (t: Term) => t.isIri && t.value == Vocab.rdfNil
    // heads: chain nodes not referenced by another chain node's rdf:rest
    val restTargets = bySubject.keys.flatMap(chainParts(_).map(_._2)).toSet
    val lists = mutable.HashMap.empty[Term, Vector[Term]]
    val chainNodesByHead = mutable.HashMap.empty[Term, Set[Term]]
    val chainConsumed = mutable.HashSet.empty[Term]
    for (h <- bySubject.keys if chainParts(h).isDefined && !restTargets.contains(h)
         if objRefs.getOrElse(h, 0) == 1 && !starRef.contains(h)) {
      val elems = Vector.newBuilder[Term]
      val nodes = mutable.LinkedHashSet.empty[Term]
      var cur = h
      var ok = true
      while (ok && !isNil(cur)) {
        chainParts(cur) match {
          case Some((f, r)) if objRefs.getOrElse(cur, 0) == 1 && !nodes.contains(cur) &&
            !starRef.contains(cur) && (r.isBnode || isNil(r)) =>
            nodes += cur; elems += f; cur = r
          case _ => ok = false
        }
      }
      if (ok) {
        lists(h) = elems.result()
        chainNodesByHead(h) = nodes.toSet
        chainConsumed ++= nodes
      }
    }

    // ---- [] inlining candidates: described bnodes referenced exactly once
    var propInline: Set[Term] = bySubject.keySet.filter(t =>
      t.isBnode && objRefs.getOrElse(t, 0) == 1 && !chainConsumed.contains(t) &&
        !starRef.contains(t))

    // demote cycle members back to labeled form (A -> B -> A can't inline)
    def inlineTargets(t: Term): Seq[Term] = {
      val objs =
        if (lists.contains(t)) lists(t)
        else bySubject.getOrElse(t, Nil).map(_.o)
      objs.filter(o => propInline.contains(o) || lists.contains(o))
    }
    var demoted = true
    while (demoted) {
      demoted = false
      val state = mutable.HashMap.empty[Term, Int] // 1=in stack, 2=done
      def dfs(t: Term): Unit = {
        state(t) = 1
        for (n <- inlineTargets(t) if !demoted) {
          state.get(n) match {
            case Some(1) => // back edge: cycle — demote target from WHICHEVER
              // structure holds it (a list-only head would otherwise make
              // `propInline -= n` a no-op and this loop spin forever on valid
              // input like `_:l rdf:first _:l ; rdf:rest rdf:nil .`)
              if (propInline.contains(n)) propInline -= n
              else if (lists.contains(n)) {
                lists -= n
                // restore the chain's cons cells so they emit labeled
                chainConsumed --= chainNodesByHead.getOrElse(n, Set.empty)
                chainNodesByHead -= n
              }
              demoted = true
            case Some(_) =>
            case None => dfs(n)
          }
        }
        if (!demoted) state(t) = 2
      }
      val roots = propInline ++ lists.keySet
      for (t <- roots if !demoted && !state.contains(t)) dfs(t)
      if (demoted) state.clear()
    }

    // ---- term rendering (recursive for inline forms)
    def renderTerm(t: Term): String = t.kind match {
      case TermKind.BNODE if lists.contains(t) =>
        "(" + lists(t).map(renderTerm).mkString(" ") + ")"
      case TermKind.BNODE if propInline.contains(t) =>
        "[ " + body(bySubject(t), inline = true) + " ]"
      case TermKind.BNODE if !bySubject.contains(t) && objRefs.getOrElse(t, 0) == 1 &&
        !starRef.contains(t) =>
        "[]" // leaf anonymous node, single use, never echoed inside << >>
      case TermKind.IRI => iri(t.value, prefixes)
      case TermKind.BNODE => "_:" + t.value
      case TermKind.LITERAL => literal(t, prefixes)
      case TermKind.TRIPLE =>
        // re-encode the quoted triple with the document's prefixes; inner
        // terms use the LABELED helper — Turtle-star forbids [ ] / ( )
        // property lists inside << >>, and inlining there would duplicate
        // the description (non-isomorphic on re-parse)
        term(t, prefixes)
      case k => throw new IllegalArgumentException(s"unsupported term kind $k")
    }

    /** predicate-object list of one description; multi-line at top level,
      * single-line inside [ ] (sep flips). */
    def body(ts: Seq[Triple], inline: Boolean): String = {
      val byPred = ts.groupBy(_.p).toSeq.sortBy { case (p, _) => predKey(p) }
      val parts = byPred.map { case (p, pts) =>
        val objs = pts.map(_.o).distinct.sortBy(o => NTriples.termString(o))
        (if (p.value == Vocab.rdfType) "a" else renderTerm(p)) + " " +
          objs.map(renderTerm).mkString(", ")
      }
      parts.mkString(if (inline) " ; " else " ;\n    ")
    }

    // ---- emission
    val topLevel = bySubject.toSeq
      .filter { case (s, _) => !chainConsumed.contains(s) && !propInline.contains(s) }
      .sortBy { case (s, _) => subjectKey(s) }
    for ((subj, ts) <- topLevel) {
      if (subj.isBnode && objRefs.getOrElse(subj, 0) == 0 && !starRef.contains(subj))
        sb.append("[\n    ").append(body(ts, inline = false)).append("\n] .\n")
      else
        // renderTerm already labels a top-level bnode subject ("_:" +
        // value: it is in bySubject and filtered out of lists/propInline)
        sb.append(renderTerm(subj))
          .append("\n    ").append(body(ts, inline = false)).append(" .\n")
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
    * encoder.ex:474-480). Char set mirrors the PARSER's PN_CHARS
    * (Turtle.scala isPnChars): ASCII letters/digits/_/-/· plus >= U+00C0 —
    * NOT Character.isLetterOrDigit, which also admits U+00AA/U+00B5/U+00BA
    * (ª µ º), characters the grammar (and our parser) reject, breaking the
    * re-parseability invariant. Unsafe locals fall back to <full-IRI>. */
  private def pnLocalSafe(local: String): Boolean = {
    def ok(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c.isDigit ||
        c == '_' || c == '-' || c == '.' || c == '\u00B7' ||
        (c >= '\u00C0' && Character.isLetter(c))
    local.nonEmpty && local.forall(ok) &&
      local.head != '-' && local.head != '.' && local.last != '.'
  }

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

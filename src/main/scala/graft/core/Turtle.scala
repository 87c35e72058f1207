package graft.core

import scala.collection.mutable

/** Turtle decoder: hand-written recursive-descent parser over the W3C
  * Turtle grammar (the reference implements the same grammar as an Erlang
  * leex/yecc pair, `src/turtle_trig_lexer.xrl` + `src/turtle_parser.yrl`;
  * semantics of the AST->graph build follow
  * `lib/rdf/serializations/turtle_trig/decoder/ast.ex`: prefix resolution,
  * base resolution, deterministic bnode allocation, collection expansion to
  * rdf:first/rdf:rest).
  *
  * Documents are small relative to a corpus — the distributed story is
  * "parse per document inside mapPartitions", not a distributed parser.
  * RDF-star is supported: quoted triples `<< s p o >>` in subject/object
  * position and annotation blocks `{| ... |}` (turtle_parser.yrl:64-72 —
  * an annotation asserts the base triple AND the annotation triples with
  * the quoted form as subject).
  */
object Turtle {

  final case class Doc(triples: Vector[Triple], prefixes: Map[String, String],
                       base: Option[String])

  final case class DocQ(quads: Vector[Quad], prefixes: Map[String, String],
                        base: Option[String])

  final case class TurtleError(msg: String, line: Int, col: Int)
    extends Exception(s"$msg at $line:$col")

  def parse(text: String, baseIri: String = null): Doc = {
    val d = new Parser(text, Option(baseIri), trig = false).parseDoc()
    Doc(d.quads.map(_.triple), d.prefixes, d.base)
  }

  /** TriG: Turtle + named-graph blocks (reference grammar
    * src/trig_parser.yrl). */
  def parseTriG(text: String, baseIri: String = null): DocQ =
    new Parser(text, Option(baseIri), trig = true).parseDoc()

  // ------------------------------------------------------------------ parser

  private val RdfFirst = Term.iri(Vocab.rdfFirst)
  private val RdfRest = Term.iri(Vocab.rdfRest)
  private val RdfNil = Term.iri(Vocab.rdfNil)
  private val RdfType = Term.iri(Vocab.rdfType)

  private final class Parser(in: String, initialBase: Option[String], trig: Boolean) {
    private var pos = 0
    private val prefixes = mutable.LinkedHashMap.empty[String, String]
    private var base: Option[String] = initialBase
    private var bnodeCounter = 0
    private val quads = Vector.newBuilder[Quad]
    private var currentGraph: Term = null

    private def lineCol: (Int, Int) = {
      var l = 1; var c = 1; var i = 0
      while (i < pos && i < in.length) {
        if (in.charAt(i) == '\n') { l += 1; c = 1 } else c += 1
        i += 1
      }
      (l, c)
    }

    def fail(msg: String): Nothing = {
      val (l, c) = lineCol
      throw TurtleError(msg, l, c)
    }

    // ---- low-level scanning

    private def atEnd: Boolean = pos >= in.length
    private def peek: Char = if (atEnd) '\u0000' else in.charAt(pos)
    private def peekAt(o: Int): Char =
      if (pos + o >= in.length) '\u0000' else in.charAt(pos + o)

    def skipWs(): Unit = {
      var go = true
      while (go) {
        while (!atEnd && (peek == ' ' || peek == '\t' || peek == '\n' || peek == '\r')) pos += 1
        if (!atEnd && peek == '#') { while (!atEnd && peek != '\n') pos += 1 }
        else go = false
      }
    }

    private def expect(c: Char): Unit = {
      if (peek != c) fail(s"expected '$c'")
      pos += 1
    }

    private def matchesKeyword(kw: String): Boolean = {
      // case-insensitive, must be followed by a non-name char
      if (pos + kw.length > in.length) return false
      var i = 0
      while (i < kw.length) {
        if (Character.toLowerCase(in.charAt(pos + i)) != kw.charAt(i)) return false
        i += 1
      }
      val after = peekAt(kw.length)
      !isPnChars(after) && after != ':'
    }

    /** True when position `pos + len` cannot continue a name (so an exact
      * keyword match at `pos` really is the keyword, not a prefix of a
      * prefixed name like `true:x`). */
    private def keywordBoundary(len: Int): Boolean = {
      val after = peekAt(len)
      !isPnChars(after) && after != ':'
    }

    // ---- document

    def parseDoc(): DocQ = {
      skipWs()
      while (!atEnd) {
        if (peek == '@') directive()
        else if (matchesKeyword("prefix")) { pos += 6; sparqlPrefix() }
        else if (matchesKeyword("base")) { pos += 4; sparqlBase() }
        else if (trig) trigBlock()
        else { triplesBlock(); skipWs(); expect('.') }
        skipWs()
      }
      DocQ(quads.result(), prefixes.toMap, base)
    }

    // TriG block: GRAPH label {..} | label {..} | {..} | plain triples '.'
    private def trigBlock(): Unit = {
      if (matchesKeyword("graph")) {
        pos += 5
        skipWs()
        val label = labelOrSubject()
        skipWs()
        wrappedGraph(label)
      } else if (peek == '{') wrappedGraph(null)
      else if (peek == '[' && anonAhead()) {
        val b = freshBnode(); pos = skipAnon(pos); skipWs()
        if (peek == '{') wrappedGraph(b)
        else { predicateObjectList(b); skipWs(); expect('.') }
      } else if (peek == '[') {
        val b = bnodePropertyList(); skipWs()
        if (peek != '.') predicateObjectList(b)
        skipWs(); expect('.')
      } else if (peek == '(') {
        val c = collection(); skipWs(); predicateObjectList(c); skipWs(); expect('.')
      } else if (peek == '<' && peekAt(1) == '<') {
        val s0 = quotedTriple(); skipWs()
        predicateObjectList(s0); skipWs(); expect('.')
      } else {
        val s0 = if (peek == '_') blankNodeLabel() else iriTerm()
        skipWs()
        if (peek == '{') wrappedGraph(s0)
        else { predicateObjectList(s0); skipWs(); expect('.') }
      }
    }

    private def labelOrSubject(): Term =
      if (peek == '_') blankNodeLabel()
      else if (peek == '[' && anonAhead()) { val b = freshBnode(); pos = skipAnon(pos); b }
      else iriTerm()

    private def wrappedGraph(label: Term): Unit = {
      expect('{')
      val prev = currentGraph
      currentGraph = label
      skipWs()
      var expectTriples = true
      while (peek != '}') {
        if (atEnd) fail("unterminated graph block")
        if (!expectTriples) fail("expected '.' between triples in graph block")
        triplesBlock()
        skipWs()
        if (peek == '.') { pos += 1; skipWs() } else expectTriples = false
        if (peek == '}') { /* final '.' optional */ }
      }
      pos += 1
      currentGraph = prev
    }

    private def directive(): Unit = {
      pos += 1 // '@'
      if (in.startsWith("prefix", pos)) {
        pos += 6; sparqlPrefix(); skipWs(); expect('.')
      } else if (in.startsWith("base", pos)) {
        pos += 4; sparqlBase(); skipWs(); expect('.')
      } else fail("unknown directive")
    }

    private def sparqlPrefix(): Unit = {
      skipWs()
      val p = pnameNs()
      skipWs()
      val iri = iriRef()
      prefixes(p) = resolveIri(iri)
    }

    private def sparqlBase(): Unit = {
      skipWs()
      val iri = iriRef()
      base = Some(resolveIri(iri))
    }

    // ---- triples

    private def triplesBlock(): Unit = {
      val subj =
        if (peek == '[' && anonAhead()) { val b = freshBnode(); pos = skipAnon(pos); b }
        else if (peek == '[') {
          val b = bnodePropertyList()
          skipWs()
          // blankNodePropertyList may be a whole statement by itself
          if (peek == '.' || peek == '}') return
          b
        }
        else subject()
      skipWs()
      predicateObjectList(subj)
    }

    private def predicateObjectList(subj: Term): Unit = {
      var go = true
      while (go) {
        skipWs()
        val p = verb()
        objectList(subj, p)
        skipWs()
        if (peek == ';') {
          pos += 1
          skipWs()
          // trailing semicolons allowed; stop before '.' ']' '}' or the
          // '|}' closing an annotation block
          while (peek == ';') { pos += 1; skipWs() }
          if (peek == '.' || peek == ']' || peek == '}' || peek == '|') go = false
        } else go = false
      }
    }

    private def objectList(subj: Term, p: Term): Unit = {
      var go = true
      while (go) {
        skipWs()
        val o = objectTerm()
        emit(subj, p, o)
        skipWs()
        // RDF-star annotation: assert the triple (already emitted) and add
        // the annotation's predications on the QUOTED form as subject
        if (peek == '{' && peekAt(1) == '|') {
          pos += 2
          skipWs()
          predicateObjectList(Term.quoted(Triple(subj, p, o)))
          skipWs()
          if (!(peek == '|' && peekAt(1) == '}')) fail("expected '|}'")
          pos += 2
          skipWs()
        }
        if (peek == ',') pos += 1 else go = false
      }
    }

    private def emit(s: Term, p: Term, o: Term): Unit = {
      val q = Quad(s, p, o, currentGraph)
      if (!q.isValid) fail("invalid statement (position constraints)")
      quads += q
    }

    private def verb(): Term = {
      if (peek == 'a' && !isPnChars(peekAt(1)) && peekAt(1) != ':') { pos += 1; RdfType }
      else iriTerm()
    }

    private def subject(): Term = peek match {
      case '<' if peekAt(1) == '<' => quotedTriple()
      case '<' => iriTermFromRef()
      case '_' => blankNodeLabel()
      case '(' => collection()
      case _ => iriTerm() // prefixed name
    }

    private def objectTerm(): Term = peek match {
      case '<' if peekAt(1) == '<' => quotedTriple()
      case '<' => iriTermFromRef()
      case '_' => blankNodeLabel()
      case '(' => collection()
      case '[' =>
        if (anonAhead()) { val b = freshBnode(); pos = skipAnon(pos); b }
        else bnodePropertyList()
      case '"' | '\'' => rdfLiteral()
      case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') => numericLiteral()
      // BooleanLiteral is case-SENSITIVE in the grammar ('tRue' is a
      // syntax error, not a boolean); the boundary check keeps `true:x`
      // lexing as a prefixed name
      case 't' if in.startsWith("true", pos) && keywordBoundary(4) =>
        pos += 4; Term.bool(true)
      case 'f' if in.startsWith("false", pos) && keywordBoundary(5) =>
        pos += 5; Term.bool(false)
      case _ => iriTerm()
    }

    // ---- RDF-star quoted triples (turtle_parser.yrl:64-72)

    /** quotedTriple ::= '<<' qtSubject verb qtObject '>>' */
    private def quotedTriple(): Term = {
      pos += 2 // '<<'
      skipWs()
      val s = qtSubject()
      skipWs()
      val p = verb()
      skipWs()
      val o = qtObject()
      skipWs()
      if (!(peek == '>' && peekAt(1) == '>')) fail("expected '>>'")
      pos += 2
      val t = Triple(s, p, o)
      if (!t.isValid) fail("invalid quoted triple (position constraints)")
      Term.quoted(t)
    }

    /** qtSubject ::= iri | BlankNode | quotedTriple (no property lists,
      * no collections inside a quoted triple). */
    private def qtSubject(): Term = peek match {
      case '<' if peekAt(1) == '<' => quotedTriple()
      case '<' => iriTermFromRef()
      case '_' => blankNodeLabel()
      case '[' =>
        if (anonAhead()) { val b = freshBnode(); pos = skipAnon(pos); b }
        else fail("property list not allowed in quoted triple")
      case _ => iriTerm()
    }

    /** qtObject ::= iri | BlankNode | literal | quotedTriple */
    private def qtObject(): Term = peek match {
      case '<' if peekAt(1) == '<' => quotedTriple()
      case '<' => iriTermFromRef()
      case '_' => blankNodeLabel()
      case '[' =>
        if (anonAhead()) { val b = freshBnode(); pos = skipAnon(pos); b }
        else fail("property list not allowed in quoted triple")
      case '"' | '\'' => rdfLiteral()
      case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') => numericLiteral()
      case 't' if matchesKeyword("true") => pos += 4; Term.bool(true)
      case 'f' if matchesKeyword("false") => pos += 5; Term.bool(false)
      case _ => iriTerm()
    }

    // ---- terms

    private def iriTerm(): Term = peek match {
      case '<' => iriTermFromRef()
      case _ => Term.iri(prefixedName())
    }

    private def iriTermFromRef(): Term = Term.iri(resolveIri(iriRef()))

    private def resolveIri(ref: String): String =
      if (Iri.isAbsolute(ref)) ref
      else base match {
        case Some(b) => Iri.resolve(ref, b)
        case None if ref.isEmpty => fail("relative IRI with no base")
        case None => fail(s"relative IRI <$ref> with no base")
      }

    /** IRIREF token: <...> with UCHAR escapes, rejecting forbidden chars. */
    private def iriRef(): String = {
      expect('<')
      val sb = new StringBuilder
      var done = false
      while (!done) {
        if (atEnd) fail("unterminated IRI")
        val c = peek
        if (c == '>') { done = true; pos += 1 }
        else if (c == '\\') {
          // UCHAR may not smuggle in forbidden IRI characters (the W3C
          // eval-bad tests:  , <, > must be rejected)
          val decoded: Seq[Char] = peekAt(1) match {
            case 'u' => Seq(readHex(4)); case 'U' => readHexChars(8).toSeq
            case _ => fail("bad escape in IRI")
          }
          for (dc <- decoded)
            if (dc <= ' ' || dc == '<' || dc == '>' || dc == '"' || dc == '{' ||
              dc == '}' || dc == '|' || dc == '^' || dc == '`' || dc == '\\')
              fail("escaped char not allowed in IRI")
          sb.appendAll(decoded)
        } else if (c <= ' ' || c == '<' || c == '"' || c == '{' || c == '}' ||
          c == '|' || c == '^' || c == '`') fail(s"char not allowed in IRI")
        else { sb.append(c); pos += 1 }
      }
      sb.toString
    }

    private def readHex(n: Int): Char = {
      val v = Integer.parseInt(safeSub(pos + 2, pos + 2 + n), 16)
      pos += 2 + n
      v.toChar
    }
    private def readHexChars(n: Int): Array[Char] = {
      // parse as Long: 8 hex digits can overflow Int (\UFFFFFFFF), and an
      // in-range-but-invalid code point must be a TurtleError, not an
      // IllegalArgumentException from Character.toChars
      val v = java.lang.Long.parseLong(safeSub(pos + 2, pos + 2 + n), 16)
      pos += 2 + n
      if (v > Character.MAX_CODE_POINT || !Character.isValidCodePoint(v.toInt))
        fail(f"code point out of range: \\U$v%08X")
      Character.toChars(v.toInt)
    }
    private def safeSub(a: Int, b: Int): String = {
      if (b > in.length) fail("truncated escape")
      val s = in.substring(a, b)
      if (!s.forall(ch => Character.digit(ch, 16) >= 0)) fail("bad hex escape")
      s
    }

    // PNAME_NS: PN_PREFIX? ':'
    private def pnameNs(): String = {
      val start = pos
      if (isPnCharsBase(peek)) {
        pos += 1
        // interior dot RUNS are legal in PN_PREFIX ("e..g:"): consume a
        // run only when PN_CHARS continues after it
        var scanning = true
        while (scanning) {
          if (isPnChars(peek)) pos += 1
          else if (peek == '.') {
            var j = pos
            while (j < in.length && in.charAt(j) == '.') j += 1
            if (j < in.length && isPnChars(in.charAt(j))) pos = j
            else scanning = false
          } else scanning = false
        }
      }
      val name = in.substring(start, pos)
      expect(':')
      name
    }

    /** PrefixedName: PNAME_LN | PNAME_NS, with PN_LOCAL escapes. */
    private def prefixedName(): String = {
      val p = pnameNs()
      val ns = prefixes.getOrElse(p, fail(s"undefined prefix '$p:'"))
      val local = new StringBuilder
      def localChar(c: Char): Boolean = isPnChars(c) || c == ':'
      var done = false
      var first = true
      while (!done) {
        val c = peek
        if (c == '\\' && isPnLocalEsc(peekAt(1))) { local.append(peekAt(1)); pos += 2 }
        else if (c == '%' && Character.digit(peekAt(1), 16) >= 0 && Character.digit(peekAt(2), 16) >= 0) {
          local.append(c).append(peekAt(1)).append(peekAt(2)); pos += 3
        }
        else if (first && (isPnCharsU(c) || c == ':' || (c >= '0' && c <= '9'))) { local.append(c); pos += 1 }
        else if (!first && localChar(c)) { local.append(c); pos += 1 }
        else if (!first && c == '.' && (localChar(peekAt(1)) || peekAt(1) == '.' ||
          (peekAt(1) == '\\' && isPnLocalEsc(peekAt(2))) || peekAt(1) == '%')) {
          local.append(c); pos += 1
        }
        else done = true
        first = false
      }
      ns + local.toString
    }

    private def isPnLocalEsc(c: Char): Boolean =
      "_~.-!$&'()*+,;=/?#@%".indexOf(c) >= 0

    private def isPnCharsBase(c: Char): Boolean =
      (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= 0xC0 && c <= 0xD6) || (c >= 0xD8 && c <= 0xF6) ||
        (c >= 0xF8 && c <= 0x02FF) || (c >= 0x0370 && c <= 0x037D) ||
        (c >= 0x037F && c <= 0x1FFF) || (c >= 0x200C && c <= 0x200D) ||
        (c >= 0x2070 && c <= 0x218F) || (c >= 0x2C00 && c <= 0x2FEF) ||
        (c >= 0x3001 && c <= 0xD7FF) || (c >= 0xF900 && c <= 0xFDCF) ||
        (c >= 0xFDF0 && c <= 0xFFFD) || Character.isSurrogate(c) // astral plane

    private def isPnCharsU(c: Char): Boolean = isPnCharsBase(c) || c == '_'

    private def isPnChars(c: Char): Boolean =
      isPnCharsU(c) || c == '-' || (c >= '0' && c <= '9') || c == 0xB7 ||
        (c >= 0x0300 && c <= 0x036F) || (c >= 0x203F && c <= 0x2040)

    private def blankNodeLabel(): Term = {
      if (peekAt(1) != ':') fail("expected '_:'")
      pos += 2
      val start = pos
      if (!(isPnCharsU(peek) || (peek >= '0' && peek <= '9'))) fail("bad bnode label start")
      pos += 1
      // dots are interior-only (a label cannot END with '.'): consume a
      // dot run only when PN_CHARS continues after it — the trailing
      // dot(s) lex as statement terminators / syntax errors instead
      var scanning = true
      while (scanning) {
        if (isPnChars(peek)) pos += 1
        else if (peek == '.') {
          var j = pos
          while (j < in.length && in.charAt(j) == '.') j += 1
          if (j < in.length && isPnChars(in.charAt(j))) pos = j
          else scanning = false
        } else scanning = false
      }
      // explicit labels are REMAPPED through the same per-document issuer
      // as anonymous nodes (the reference's decoder does the same): a
      // verbatim label could collide with a generated `genid<n>`, silently
      // merging two distinct nodes
      Term.bnode(labelMap.getOrElseUpdate(in.substring(start, pos), {
        val id = s"genid$bnodeCounter"; bnodeCounter += 1; id
      }))
    }

    private val labelMap = scala.collection.mutable.HashMap.empty[String, String]

    private def freshBnode(): Term = {
      val t = Term.bnode(s"genid$bnodeCounter")
      bnodeCounter += 1
      t
    }

    /** Is '[' immediately closed (ANON)? */
    private def anonAhead(): Boolean = skipAnon(pos) >= 0
    private def skipAnon(from: Int): Int = {
      var i = from + 1
      while (i < in.length && (in.charAt(i) == ' ' || in.charAt(i) == '\t' ||
        in.charAt(i) == '\n' || in.charAt(i) == '\r')) i += 1
      if (i < in.length && in.charAt(i) == ']') i + 1 else -1
    }

    private def bnodePropertyList(): Term = {
      expect('[')
      val b = freshBnode()
      skipWs()
      predicateObjectList(b)
      skipWs()
      expect(']')
      b
    }

    private def collection(): Term = {
      expect('(')
      skipWs()
      val items = Vector.newBuilder[Term]
      while (peek != ')') {
        items += objectTerm()
        skipWs()
        if (atEnd) fail("unterminated collection")
      }
      pos += 1
      // expansion per decoder/ast.ex:157-185
      val list = items.result()
      if (list.isEmpty) RdfNil
      else {
        val nodes = list.map(_ => freshBnode())
        for (i <- list.indices) {
          emit(nodes(i), RdfFirst, list(i))
          emit(nodes(i), RdfRest, if (i == list.length - 1) RdfNil else nodes(i + 1))
        }
        nodes.head
      }
    }

    // ---- literals

    private def rdfLiteral(): Term = {
      val lex = stringToken()
      if (peek == '@') {
        pos += 1
        val start = pos
        while (Character.isLetterOrDigit(peek) || peek == '-') pos += 1
        val tag = in.substring(start, pos)
        // RDF 1.2 directional language strings ("--ltr"/"--rtl", lowercase):
        // typed rdf:dirLangString, direction packed as "lang--dir" (see
        // NTriples for the schema rationale; Term.langBase/baseDirection)
        if (!tag.matches("[a-zA-Z]+(-[a-zA-Z0-9]+)*(--(ltr|rtl))?")) fail("bad language tag")
        if (tag.contains("--"))
          Term(TermKind.LITERAL, lex, Vocab.rdfDirLangString, tag.toLowerCase)
        else Term.langLit(lex, tag)
      } else if (peek == '^' && peekAt(1) == '^') {
        pos += 2
        skipWs()
        val dt = iriTerm()
        Term.typedLit(lex, dt.value)
      } else Term.str(lex)
    }

    private def stringToken(): String = {
      val q = peek
      if (in.startsWith(s"$q$q$q", pos)) longString(q)
      else shortString(q)
    }

    private def shortString(q: Char): String = {
      pos += 1
      val sb = new StringBuilder
      var done = false
      while (!done) {
        if (atEnd) fail("unterminated string")
        val c = peek
        if (c == q) { done = true; pos += 1 }
        else if (c == '\n' || c == '\r') fail("newline in short string")
        else if (c == '\\') readEscape(sb)
        else { sb.append(c); pos += 1 }
      }
      sb.toString
    }

    private def longString(q: Char): String = {
      pos += 3
      val sb = new StringBuilder
      var done = false
      while (!done) {
        if (atEnd) fail("unterminated long string")
        if (peek == q && peekAt(1) == q && peekAt(2) == q) { done = true; pos += 3 }
        else if (peek == '\\') readEscape(sb)
        else { sb.append(peek); pos += 1 }
      }
      sb.toString
    }

    private def readEscape(sb: StringBuilder): Unit = peekAt(1) match {
      case 't' => sb.append('\t'); pos += 2
      case 'b' => sb.append('\b'); pos += 2
      case 'n' => sb.append('\n'); pos += 2
      case 'r' => sb.append('\r'); pos += 2
      case 'f' => sb.append('\f'); pos += 2
      case '"' => sb.append('"'); pos += 2
      case '\'' => sb.append('\''); pos += 2
      case '\\' => sb.append('\\'); pos += 2
      case 'u' => sb.append(readHex(4))
      case 'U' => sb.appendAll(readHexChars(8))
      case other => fail(s"bad escape \\$other")
    }

    private def numericLiteral(): Term = {
      val start = pos
      if (peek == '+' || peek == '-') pos += 1
      var digits = 0
      while (peek >= '0' && peek <= '9') { pos += 1; digits += 1 }
      var isDecimal = false
      // '.' consumed when it starts a fraction: digits follow, or an
      // exponent follows directly ("123.E+1" is a DOUBLE token) — otherwise
      // the dot terminates the statement
      if (peek == '.') {
        var j = pos + 1
        var fracDigits = 0
        while (j < in.length && in.charAt(j) >= '0' && in.charAt(j) <= '9') { j += 1; fracDigits += 1 }
        val expFollows = j < in.length && (in.charAt(j) == 'e' || in.charAt(j) == 'E') && digits > 0
        if (fracDigits > 0 || expFollows) {
          isDecimal = fracDigits > 0
          pos = j
          digits += fracDigits
        }
      }
      var isDouble = false
      if ((peek == 'e' || peek == 'E') && digits > 0) {
        isDouble = true
        pos += 1
        if (peek == '+' || peek == '-') pos += 1
        if (!(peek >= '0' && peek <= '9')) fail("bad double exponent")
        while (peek >= '0' && peek <= '9') pos += 1
      }
      if (digits == 0) fail("expected numeric literal")
      val lex = in.substring(start, pos)
      if (isDouble) Term.typedLit(lex, Vocab.xsdDouble)
      else if (isDecimal) Term.typedLit(lex, Vocab.xsdDecimal)
      else Term.typedLit(lex, Vocab.xsdInteger)
    }
  }
}

package graft.core

/** N-Triples / N-Quads codec. Line-oriented and embarrassingly parallel —
  * the distribution strategy is `spark.read.text` + per-partition parse,
  * the same per-line streaming the reference does
  * (`lib/rdf/serializations/ntriples/decoder.ex:26-34`).
  *
  * Grammar follows W3C N-Triples/N-Quads (the reference's
  * `src/ntriples_lexer.xrl` / `src/nquads_parser.yrl`); escaping rules match
  * `ntriples/encoder.ex:125-134` and the shared UCHAR/ECHAR handling in
  * `lib/rdf/serialization/parse_helper.ex`.
  */
object NTriples {

  final case class ParseError(msg: String, line: String)
    extends Exception(s"$msg in: $line")

  // ------------------------------------------------------------------ encode

  /** Escape per encoder.ex:125-134: backslash, tab, backspace, newline, CR,
    * form feed, double quote. All other characters pass through as UTF-8. */
  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\f' => sb.append("\\f")
        case '"' => sb.append("\\\"")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Canonical N-Triples escaping (canonical N-Quads per RDFC-1.0 test
    * suite): ECHAR for \b \t \n \f \r \" \\; remaining C0 controls and
    * U+007F as UPPERCASE UCHAR; everything else raw UTF-8. */
  def canonicalEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\f' => sb.append("\\f")
        case '\r' => sb.append("\\r")
        case '"' => sb.append("\\\"")
        case _ if c < ' ' || c.toInt == 0x7f => sb.append(f"\\u${c.toInt}%04X")
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def canonicalTermString(t: Term): String = t.kind match {
    case TermKind.LITERAL =>
      val q = "\"" + canonicalEscape(t.value) + "\""
      if (t.lang != null) q + "@" + t.lang
      else if (t.datatype == null || t.datatype == Vocab.xsdString) q
      else q + "^^<" + t.datatype + ">"
    case TermKind.TRIPLE =>
      // re-canonicalize inner literals with canonicalEscape
      val inner = parseQuotedString(t.value)
      "<< " + canonicalTermString(inner.s) + " " + canonicalTermString(inner.p) +
        " " + canonicalTermString(inner.o) + " >>"
    case _ => termString(t)
  }

  def canonicalQuadLine(q: Quad): String = {
    val base = s"${canonicalTermString(q.s)} ${canonicalTermString(q.p)} ${canonicalTermString(q.o)}"
    if (q.g == null) base + " ." else base + s" ${canonicalTermString(q.g)} ."
  }

  def termString(t: Term): String = t.kind match {
    case TermKind.IRI => "<" + t.value + ">"
    case TermKind.BNODE => "_:" + t.value
    case TermKind.LITERAL =>
      val q = "\"" + escape(t.value) + "\""
      if (t.lang != null) q + "@" + t.lang
      else if (t.datatype == null || t.datatype == Vocab.xsdString) q
      else q + "^^<" + t.datatype + ">"
    // a quoted triple's value IS its canonical "<< s p o >>" byte form
    case TermKind.TRIPLE => t.value
    case k => throw new IllegalArgumentException(s"unsupported term kind $k")
  }

  /** Canonical N-Triples-star byte form of a quoted triple — the `value` of
    * a kind=TRIPLE term. Built from termString so the form is unique per
    * triple, making string equality == term equality. */
  def quotedString(t: Triple): String =
    "<< " + termString(t.s) + " " + termString(t.p) + " " + termString(t.o) + " >>"

  /** Destructure the canonical "<< s p o >>" form back into a Triple. */
  def parseQuotedString(value: String): Triple = {
    val p = new LineParser(value)
    p.skipWs()
    val t = p.quotedTriple()
    p.skipWs()
    if (!p.atEnd) p.fail("trailing content after '>>'")
    t
  }

  def tripleLine(t: Triple): String =
    s"${termString(t.s)} ${termString(t.p)} ${termString(t.o)} ."

  def quadLine(q: Quad): String =
    if (q.g == null) tripleLine(q.triple)
    else s"${termString(q.s)} ${termString(q.p)} ${termString(q.o)} ${termString(q.g)} ."

  def encode(triples: Iterator[Triple], sorted: Boolean = false): Iterator[String] = {
    val lines = triples.map(tripleLine)
    // :sort option = Unicode CODE POINT sort of emitted lines
    // (ntriples/encoder.ex:24-30) — default String order compares UTF-16
    // units, inverting supplementary-plane vs U+E000.. (the Column path's
    // orderBy compares UTF-8 bytes, which IS code point order)
    if (sorted) lines.toSeq.sorted(Rdfc10.codePointOrdering).iterator else lines
  }

  // ------------------------------------------------------------------ decode

  /** Parse one N-Quads line; returns None for blank/comment-only lines.
    * N-Triples lines parse as quads with g=null. */
  def parseLine(line: String): Option[Quad] = {
    val p = new LineParser(line)
    p.skipWs()
    if (p.atEnd) return None
    val s = p.term()
    p.skipWs(); val pr = p.term()
    p.skipWs(); val o = p.term()
    p.skipWs()
    val g = if (p.peek != '.') { val t = p.term(); p.skipWs(); t } else null
    p.expect('.')
    p.skipWs()
    if (!p.atEnd) p.fail("trailing content after '.'")
    val quad = Quad(s, pr, o, g)
    if (!quad.isValid) p.fail("invalid statement (position constraints)")
    Some(quad)
  }

  def parseTripleLine(line: String): Option[Triple] =
    parseLine(line).map { q =>
      if (q.g != null) throw ParseError("graph term not allowed in N-Triples", line)
      q.triple
    }

  /** Unescape ECHAR/UCHAR sequences (parse_helper.ex UCHAR handling). */
  def unescape(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '"' => sb.append('"'); i += 2
          case '\'' => sb.append('\''); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' =>
            val cp = Integer.parseInt(s.substring(i + 2, i + 6), 16)
            sb.append(cp.toChar); i += 6
          case 'U' =>
            val cp = Integer.parseInt(s.substring(i + 2, i + 10), 16)
            sb.appendAll(Character.toChars(cp)); i += 10
          case other => throw new IllegalArgumentException(s"bad escape \\$other")
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private final class LineParser(line: String) {
    private var pos = 0
    def atEnd: Boolean = pos >= line.length || line.charAt(pos) == '#'
    def peek: Char = if (pos < line.length) line.charAt(pos) else '\u0000'
    def peekAt(o: Int): Char =
      if (pos + o < line.length) line.charAt(pos + o) else '\u0000'
    def skipWs(): Unit = {
      while (pos < line.length && (line.charAt(pos) == ' ' || line.charAt(pos) == '\t')) pos += 1
    }
    def expect(c: Char): Unit = {
      if (pos >= line.length || line.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }
    def fail(msg: String): Nothing = throw ParseError(s"$msg at col $pos", line)

    def term(): Term = peek match {
      case '<' if peekAt(1) == '<' => Term.quoted(quotedTriple())
      case '<' => iriRef()
      case '_' => bnode()
      case '"' => literal()
      case _ => fail("expected term")
    }

    /** RDF-star quoted triple "<< t t t >>" (ntriples-star grammar): inner
      * subject ∈ {IRI, bnode, quoted}, predicate ∈ {IRI}, object any. */
    def quotedTriple(): Triple = {
      pos += 2 // '<<'
      skipWs()
      val s = term()
      skipWs(); val p = term()
      skipWs(); val o = term()
      skipWs()
      if (!(peek == '>' && peekAt(1) == '>')) fail("expected '>>'")
      pos += 2
      val t = Triple(s, p, o)
      if (!t.isValid) fail("invalid quoted triple (position constraints)")
      t
    }

    private def iriRef(): Term = {
      pos += 1
      val start = pos
      val sb = new StringBuilder
      var done = false
      while (!done) {
        if (pos >= line.length) fail("unterminated IRI")
        val c = line.charAt(pos)
        if (c == '>') { done = true; pos += 1 }
        else if (c == '\\') {
          // only UCHAR allowed in IRIREF — and the DECODED character must
          // itself be legal in an IRI (an escaped space or '>' would
          // produce a term string its own parser rejects)
          val decoded: Seq[Char] =
            if (pos + 1 >= line.length) fail("dangling backslash in IRI")
            else line.charAt(pos + 1) match {
              case 'u' => val v = readHexAt(4); Seq(v.toChar)
              case 'U' => readHexCharsAt()
              case _ => fail("bad escape in IRI")
            }
          for (dc <- decoded)
            if (dc <= ' ' || dc == '<' || dc == '>' || dc == '"' || dc == '{' ||
              dc == '}' || dc == '|' || dc == '^' || dc == '`' || dc == '\\')
              fail("escaped char not allowed in IRI")
          sb.appendAll(decoded)
        } else if (c <= ' ' || c == '<' || c == '"' || c == '{' || c == '}' || c == '|' || c == '^' || c == '`') {
          fail(s"character '$c' not allowed in IRI")
        } else { sb.append(c); pos += 1 }
      }
      val v = sb.toString
      if (v.isEmpty && start == pos - 1) fail("empty IRI")
      if (!Iri.isAbsolute(v)) fail("relative IRI in N-Triples")
      Term.iri(v)
    }

    private def bnode(): Term = {
      if (pos + 1 >= line.length || line.charAt(pos + 1) != ':') fail("expected '_:'")
      pos += 2
      val start = pos
      while (pos < line.length && isBnodeChar(line.charAt(pos), pos == start)) pos += 1
      var end = pos
      // label may not end with '.'
      while (end > start && line.charAt(end - 1) == '.') end -= 1
      if (end == start) fail("empty blank node label")
      pos = end
      Term.bnode(line.substring(start, end))
    }

    private def isBnodeChar(c: Char, first: Boolean): Boolean = {
      // PN_CHARS-shaped: beyond ASCII, only LETTERS continue (>= 'À'
      // alone admitted punctuation like the em-dash, producing labels the
      // Turtle parser's exact tables reject on re-parse)
      val base = Character.isLetterOrDigit(c) || c == '_' ||
        (c >= 'À' && Character.isLetter(c))
      if (first) base else base || c == '-' || c == '.' || c == '·'
    }

    /** n hex digits at pos+2 as an int; ParseError (never a raw JVM
      * exception) on truncation or bad digits. Advances pos. */
    private def readHexAt(n: Int): Int = {
      if (pos + 2 + n > line.length) fail("truncated \\u escape")
      val h = line.substring(pos + 2, pos + 2 + n)
      if (!h.forall(ch => Character.digit(ch, 16) >= 0)) fail(s"bad hex '$h'")
      pos += 2 + n
      Integer.parseInt(h, 16)
    }

    /** \U escape: 8 hex digits to chars, range-checked. Advances pos. */
    private def readHexCharsAt(): Seq[Char] = {
      if (pos + 10 > line.length) fail("truncated \\U escape")
      val h = line.substring(pos + 2, pos + 10)
      if (!h.forall(ch => Character.digit(ch, 16) >= 0)) fail(s"bad hex '$h'")
      val v = java.lang.Long.parseLong(h, 16)
      if (v > Character.MAX_CODE_POINT || !Character.isValidCodePoint(v.toInt))
        fail(s"code point out of range: \\U$h")
      pos += 10
      Character.toChars(v.toInt).toSeq
    }

    private def literal(): Term = {
      pos += 1
      val sb = new StringBuilder
      var done = false
      while (!done) {
        if (pos >= line.length) fail("unterminated literal")
        val c = line.charAt(pos)
        if (c == '"') { done = true; pos += 1 }
        else if (c == '\\') {
          if (pos + 1 >= line.length) fail("dangling backslash")
          line.charAt(pos + 1) match {
            case 't' => sb.append('\t'); pos += 2
            case 'b' => sb.append('\b'); pos += 2
            case 'n' => sb.append('\n'); pos += 2
            case 'r' => sb.append('\r'); pos += 2
            case 'f' => sb.append('\f'); pos += 2
            case '"' => sb.append('"'); pos += 2
            case '\'' => sb.append('\''); pos += 2
            case '\\' => sb.append('\\'); pos += 2
            case 'u' => sb.append(readHexAt(4).toChar)
            case 'U' => sb.appendAll(readHexCharsAt())
            case other => fail(s"bad escape \\$other")
          }
        } else { sb.append(c); pos += 1 }
      }
      val lex = sb.toString
      if (pos < line.length && line.charAt(pos) == '@') {
        pos += 1
        val start = pos
        while (pos < line.length && (Character.isLetterOrDigit(line.charAt(pos)) || line.charAt(pos) == '-')) pos += 1
        if (pos == start) fail("empty language tag")
        val tag = line.substring(start, pos)
        // RDF 1.2 directional language strings: optional base direction
        // suffix "--ltr"/"--rtl" (lowercase only; the reference does not
        // support these yet — its syntax suite skips nt-ttl-base-1/2).
        // RDF 1.2 assigns them datatype rdf:dirLangString (NOT langString),
        // so typed dispatch and term equality distinguish them; the flat
        // 4-field schema packs "lang--dir" into the lang slot (accessors
        // Term.langBase / Term.baseDirection split it back out).
        if (!tag.matches("[a-zA-Z]+(-[a-zA-Z0-9]+)*(--(ltr|rtl))?")) fail("bad language tag")
        val dt = if (tag.contains("--")) Vocab.rdfDirLangString else Vocab.rdfLangString
        // data-model lowercase normalization, like the reference's LangString
        Term(TermKind.LITERAL, lex, dt, tag.toLowerCase)
      } else if (pos + 1 < line.length && line.charAt(pos) == '^' && line.charAt(pos + 1) == '^') {
        pos += 2
        // '^^' and IRIREF are separate terminals: whitespace between them
        // is legal, and a missing '<' must say so rather than swallowing
        // the next character as the bracket
        skipWs()
        if (pos >= line.length || line.charAt(pos) != '<')
          fail("expected '<' after '^^'")
        val dt = iriRef()
        Term.typedLit(lex, dt.value)
      } else Term.str(lex)
    }
  }

  /** Parse a whole document (for tests / small files). */
  def parseDocument(text: String): Seq[Quad] =
    text.split("\n", -1).iterator.flatMap { l =>
      parseLine(if (l.endsWith("\r")) l.dropRight(1) else l)
    }.toSeq
}

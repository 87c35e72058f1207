package graft.sparql

import graft.core.{Iri, Term, Vocab}
import graft.engine.Bgp.{Bound, Node, QPat, V}
import Ast._

/** Hand-written SPARQL 1.1 lexer + recursive-descent parser (same house
  * style as the Turtle parser, `graft.core.Turtle`). Covers the query
  * language's SELECT / ASK / CONSTRUCT / DESCRIBE forms: BGPs with full
  * Turtle sugar (`;` `,` `a`, blank-node property lists, collections,
  * RDF-star quoted patterns), property paths (`^ / | + * ?` and forward
  * negated sets), OPTIONAL / UNION / MINUS / GRAPH / FILTER / BIND /
  * VALUES / sub-SELECT, the full expression grammar with precedence,
  * aggregates, and solution modifiers (GROUP BY / HAVING / ORDER BY /
  * LIMIT / OFFSET). FROM / FROM NAMED dataset clauses parse to a [[Ast.Scoped]]
  * wrapper that [[Sparql]] resolves against the quad frame's named graphs;
  * SERVICE is rejected with a clear message (no federation endpoint).
  *
  * Prefixed names and relative IRIs resolve at parse time against the
  * prologue (PREFIX/BASE), so the AST carries only absolute terms.
  */
object SparqlParser {

  final case class SparqlParseError(msg: String, line: Int, col: Int)
      extends RuntimeException(s"SPARQL parse error at line $line:$col: $msg")

  /** Parse a query string; `base` seeds the prologue BASE (a BASE directive
    * in the query overrides it). */
  def parse(query: String, base: String = null): Query = {
    val toks = new Lexer(query).tokenize()
    new Parser(query, toks, Option(base)).parseQuery()
  }

  /** Parse a SPARQL 1.1 Update request (';'-separated operations). */
  def parseUpdate(update: String, base: String = null): UpdateScript = {
    val toks = new Lexer(update).tokenize()
    new Parser(update, toks, Option(base)).parseUpdateScript()
  }

  // ------------------------------------------------------------------ tokens
  private[sparql] sealed trait Tok { def pos: Int }
  private[sparql] final case class TIri(v: String, pos: Int) extends Tok
  private[sparql] final case class TPName(prefix: String, local: String, pos: Int) extends Tok
  private[sparql] final case class TVar(name: String, pos: Int) extends Tok
  private[sparql] final case class TBnode(label: String, pos: Int) extends Tok
  private[sparql] final case class TStr(v: String, pos: Int) extends Tok
  private[sparql] final case class TLang(tag: String, pos: Int) extends Tok
  /** kind: 0 = integer, 1 = decimal, 2 = double. */
  private[sparql] final case class TNum(lex: String, kind: Int, pos: Int) extends Tok
  private[sparql] final case class TWord(w: String, pos: Int) extends Tok
  private[sparql] final case class TPunct(s: String, pos: Int) extends Tok
  private[sparql] final case class TEof(pos: Int) extends Tok

  // ------------------------------------------------------------------- lexer
  private[sparql] final class Lexer(in: String) {
    private var pos = 0
    private def atEnd = pos >= in.length
    private def peek: Char = if (atEnd) '\u0000' else in.charAt(pos)
    private def peekAt(o: Int): Char =
      if (pos + o >= in.length) '\u0000' else in.charAt(pos + o)

    private def err(msg: String, at: Int): Nothing = {
      val upTo = in.substring(0, math.min(at, in.length))
      val line = upTo.count(_ == '\n') + 1
      val col = at - upTo.lastIndexOf('\n')
      throw SparqlParseError(msg, line, col)
    }

    def tokenize(): Vector[Tok] = {
      val out = Vector.newBuilder[Tok]
      skipWs()
      while (!atEnd) {
        out += next()
        skipWs()
      }
      out += TEof(pos)
      out.result()
    }

    private def skipWs(): Unit = {
      var go = true
      while (go) {
        while (!atEnd && Character.isWhitespace(peek)) pos += 1
        if (!atEnd && peek == '#') { while (!atEnd && peek != '\n') pos += 1 }
        else go = false
      }
    }

    private def next(): Tok = {
      val start = pos
      peek match {
        case '<' => iriOrLt(start)
        case '?' | '$' if isVarStart(peekAt(1)) => variable(start)
        case '?' => pos += 1; TPunct("?", start)
        case '$' => err("'$' not followed by a variable name", start)
        case '_' if peekAt(1) == ':' => bnodeLabel(start)
        case '"' | '\'' => TStr(stringLit(), start)
        case '@' => langTag(start)
        case c if c.isDigit => number(start)
        case '.' if peekAt(1).isDigit => number(start)
        case '^' if peekAt(1) == '^' => pos += 2; TPunct("^^", start)
        case '|' if peekAt(1) == '|' => pos += 2; TPunct("||", start)
        case '&' if peekAt(1) == '&' => pos += 2; TPunct("&&", start)
        case '!' if peekAt(1) == '=' => pos += 2; TPunct("!=", start)
        case '>' if peekAt(1) == '=' => pos += 2; TPunct(">=", start)
        case ':' => pname(start)
        case c if c == '{' || c == '}' || c == '(' || c == ')' || c == '[' ||
            c == ']' || c == ',' || c == ';' || c == '.' || c == '=' ||
            c == '>' || c == '!' || c == '+' || c == '-' || c == '*' ||
            c == '/' || c == '^' || c == '|' =>
          pos += 1; TPunct(c.toString, start)
        case c if isPnCharsBase(c) => wordOrPname(start)
        case c => err(s"unexpected character '$c'", start)
      }
    }

    private def isVarStart(c: Char): Boolean =
      c == '_' || c.isDigit || isPnCharsBase(c)

    private def isPnCharsBase(c: Char): Boolean =
      Character.isLetter(c) // covers the grammar's unicode letter ranges

    private def isPnChars(c: Char): Boolean =
      isPnCharsBase(c) || c == '_' || c == '-' || c.isDigit || c == '·'

    /** '<' is an IRIREF when a '>' closes it before any char illegal inside
      * an IRI; otherwise the less-than / '<=' operator. */
    private def iriOrLt(start: Int): Tok = {
      var i = pos + 1
      val sb = new StringBuilder
      var ok = true
      var done = false
      while (ok && !done && i < in.length) {
        val c = in.charAt(i)
        if (c == '>') done = true
        else if (c == '\\') {
          // UCHAR escapes only
          if (i + 1 < in.length && (in.charAt(i + 1) == 'u' || in.charAt(i + 1) == 'U')) {
            val n = if (in.charAt(i + 1) == 'u') 4 else 8
            if (i + 2 + n <= in.length) {
              val hex = in.substring(i + 2, i + 2 + n)
              val cp =
                try Integer.parseInt(hex, 16)
                catch { case _: NumberFormatException =>
                  err(s"bad \\u escape '$hex' in IRI", start) }
              if (!Character.isValidCodePoint(cp))
                err(s"code point out of range in IRI: $hex", start)
              sb.appendAll(Character.toChars(cp)); i += 1 + n
            } else ok = false
          } else ok = false
        } else if (c <= ' ' || c == '<' || c == '"' || c == '{' || c == '}' ||
            c == '|' || c == '^' || c == '`') ok = false
        else sb.append(c)
        i += 1
      }
      if (ok && done) { pos = i; TIri(sb.toString, start) }
      else if (peekAt(1) == '=') { pos += 2; TPunct("<=", start) }
      else { pos += 1; TPunct("<", start) }
    }

    private def variable(start: Int): Tok = {
      pos += 1
      val sb = new StringBuilder
      // VARNAME: PN_CHARS_U | digit (no '-', unlike PN_CHARS)
      while (!atEnd && (isPnCharsBase(peek) || peek.isDigit || peek == '_')) {
        sb.append(peek); pos += 1
      }
      if (sb.isEmpty) err("empty variable name", start)
      TVar(sb.toString, start)
    }

    private def bnodeLabel(start: Int): Tok = {
      pos += 2
      val sb = new StringBuilder
      while (!atEnd && (isPnChars(peek) || (peek == '.' && isPnChars(peekAt(1))))) {
        sb.append(peek); pos += 1
      }
      if (sb.isEmpty) err("empty blank node label", start)
      TBnode(sb.toString, start)
    }

    private def langTag(start: Int): Tok = {
      pos += 1
      val sb = new StringBuilder
      while (!atEnd && (peek.isLetter || peek.isDigit || peek == '-')) {
        sb.append(peek); pos += 1
      }
      if (sb.isEmpty || !sb.charAt(0).isLetter) err("bad language tag", start)
      TLang(sb.toString, start)
    }

    private def stringLit(): String = {
      val quote = peek
      val long = peekAt(1) == quote && peekAt(2) == quote
      pos += (if (long) 3 else 1)
      val sb = new StringBuilder
      var done = false
      while (!done) {
        if (atEnd) err("unterminated string", pos)
        val c = peek
        if (long && c == quote && peekAt(1) == quote && peekAt(2) == quote) {
          pos += 3; done = true
        } else if (!long && c == quote) { pos += 1; done = true }
        else if (!long && (c == '\n' || c == '\r')) err("newline in short string", pos)
        else if (c == '\\') {
          pos += 1
          peek match {
            case 't' => sb.append('\t'); pos += 1
            case 'b' => sb.append('\b'); pos += 1
            case 'n' => sb.append('\n'); pos += 1
            case 'r' => sb.append('\r'); pos += 1
            case 'f' => sb.append('\f'); pos += 1
            case '"' => sb.append('"'); pos += 1
            case '\'' => sb.append('\''); pos += 1
            case '\\' => sb.append('\\'); pos += 1
            case 'u' => pos += 1; sb.appendAll(Character.toChars(readHex(4)))
            case 'U' =>
              pos += 1
              val cp = readHex(8)
              if (!Character.isValidCodePoint(cp))
                err(f"code point out of range: \\U$cp%08X", pos)
              sb.appendAll(Character.toChars(cp))
            case c2 => err(s"bad string escape '\\$c2'", pos)
          }
        } else { sb.append(c); pos += 1 }
      }
      sb.toString
    }

    private def readHex(n: Int): Int = {
      if (pos + n > in.length) err("truncated \\u escape", pos)
      val s = in.substring(pos, pos + n)
      pos += n
      try Integer.parseInt(s, 16)
      catch { case _: NumberFormatException => err(s"bad hex '$s'", pos) }
    }

    private def number(start: Int): Tok = {
      val sb = new StringBuilder
      while (!atEnd && peek.isDigit) { sb.append(peek); pos += 1 }
      var kind = 0
      if (peek == '.' && peekAt(1).isDigit) {
        kind = 1; sb.append('.'); pos += 1
        while (!atEnd && peek.isDigit) { sb.append(peek); pos += 1 }
      }
      if (peek == 'e' || peek == 'E') {
        val save = pos
        var j = pos + 1
        if (j < in.length && (in.charAt(j) == '+' || in.charAt(j) == '-')) j += 1
        if (j < in.length && in.charAt(j).isDigit) {
          kind = 2
          while (pos < j) { sb.append(peek); pos += 1 }
          while (!atEnd && peek.isDigit) { sb.append(peek); pos += 1 }
        } else pos = save
      }
      TNum(sb.toString, kind, start)
    }

    private def pname(start: Int): Tok = {
      // starts at ':' (empty prefix) — shared local-part scan
      pos += 1
      TPName("", pnLocal(), start)
    }

    private def wordOrPname(start: Int): Tok = {
      val sb = new StringBuilder
      while (!atEnd && (isPnChars(peek) || (peek == '.' && (isPnChars(peekAt(1)) || peekAt(1) == '.')))) {
        // '.' inside a bareword only happens for prefixes like "foo.bar:" —
        // accept and let the ':' check decide; trailing '.' never consumed
        if (peek == '.') {
          // only valid if this turns out to be a pname; tentatively accept
          // when a ':' follows further on in the same token
          var j = pos
          while (j < in.length && (isPnChars(in.charAt(j)) || in.charAt(j) == '.')) j += 1
          if (j < in.length && in.charAt(j) == ':') { sb.append(peek); pos += 1 }
          else return finishWord(sb, start)
        } else { sb.append(peek); pos += 1 }
      }
      if (peek == ':') { pos += 1; TPName(sb.toString, pnLocal(), start) }
      else finishWord(sb, start)
    }

    private def finishWord(sb: StringBuilder, start: Int): Tok =
      TWord(sb.toString, start)

    /** PN_LOCAL: letters/digits/_/-/./:/%XX plus backslash escapes; no
      * trailing '.'. */
    private def pnLocal(): String = {
      val sb = new StringBuilder
      def localChar(c: Char): Boolean = isPnChars(c) || c == ':'
      var done = false
      while (!done && !atEnd) {
        val c = peek
        if (localChar(c)) { sb.append(c); pos += 1 }
        else if (c == '.') {
          // dots are interior-only (PN_LOCAL cannot end with '.'): consume
          // a run of dots only when a local-name char follows the run
          var j = pos
          while (j < in.length && in.charAt(j) == '.') j += 1
          def at(k: Int): Char = if (k < in.length) in.charAt(k) else '\u0000'
          val cont = j < in.length && {
            val d = in.charAt(j)
            localChar(d) || (d == '%' && isHex(at(j + 1)) && isHex(at(j + 2))) ||
              (d == '\\' && isPnLocalEsc(at(j + 1)))
          }
          if (cont) while (pos < j) { sb.append('.'); pos += 1 }
          else done = true
        }
        else if (c == '%' && isHex(peekAt(1)) && isHex(peekAt(2))) {
          sb.append(c).append(peekAt(1)).append(peekAt(2)); pos += 3
        } else if (c == '\\' && isPnLocalEsc(peekAt(1))) {
          sb.append(peekAt(1)); pos += 2
        } else done = true
      }
      sb.toString
    }

    private def isHex(c: Char): Boolean =
      c.isDigit || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

    private def isPnLocalEsc(c: Char): Boolean =
      "_~.-!$&'()*+,;=/?#@%".indexOf(c) >= 0
  }

  // ------------------------------------------------------------------ parser
  private final class Parser(in: String, toks: Vector[Tok], initialBase: Option[String]) {
    private var i = 0
    private var prefixes = Map.empty[String, String]
    private var base: Option[String] = initialBase
    private var bnodeCtr = 0
    private val mentions = scala.collection.mutable.LinkedHashSet.empty[String]
    /** Accumulates the TPs of the triples block currently being parsed. */
    private var tps: scala.collection.mutable.ArrayBuffer[TP] = null

    private def peek: Tok = toks(i)
    private def peekAt(o: Int): Tok = toks(math.min(i + o, toks.length - 1))
    private def advance(): Tok = { val t = toks(i); i += 1; t }

    private def err(msg: String, t: Tok = null): Nothing = {
      val at = if (t == null) peek.pos else t.pos
      val upTo = in.substring(0, math.min(at, in.length))
      val line = upTo.count(_ == '\n') + 1
      val col = at - upTo.lastIndexOf('\n')
      throw SparqlParseError(msg, line, col)
    }

    private def isWord(kw: String): Boolean = peek match {
      case TWord(w, _) => w.equalsIgnoreCase(kw)
      case _ => false
    }
    private def takeWord(kw: String): Boolean =
      if (isWord(kw)) { i += 1; true } else false
    private def expectWord(kw: String): Unit =
      if (!takeWord(kw)) err(s"expected $kw")
    private def isPunct(s: String): Boolean = peek match {
      case TPunct(p, _) => p == s
      case _ => false
    }
    private def takePunct(s: String): Boolean =
      if (isPunct(s)) { i += 1; true } else false
    private def expectPunct(s: String): Unit =
      if (!takePunct(s)) err(s"expected '$s'")

    private def freshHidden(tag: String): String = {
      bnodeCtr += 1; s"_${tag}$bnodeCtr"
    }

    private def mention(v: String): Unit =
      if (!v.startsWith("_")) mentions += v

    // ------------------------------------------------------------- prologue
    private def prologue(): Unit = {
      var go = true
      while (go) {
        if (takeWord("PREFIX")) {
          val (p, l) = peek match {
            case TPName(pf, lo, _) => i += 1; (pf, lo)
            case _ => err("expected prefix name after PREFIX")
          }
          if (l.nonEmpty) err("prefix declaration must end with ':'")
          val iri = expectIriRef()
          prefixes += p -> iri
        } else if (takeWord("BASE")) {
          base = Some(resolveIri(expectIriRef()))
        } else go = false
      }
    }

    private def expectIriRef(): String = peek match {
      case TIri(v, _) => i += 1; resolveIri(v)
      case _ => err("expected <IRI>")
    }

    private def resolveIri(ref: String): String =
      if (Iri.isAbsolute(ref)) ref
      else base match {
        case Some(b) => Iri.resolve(ref, b)
        case None => err(s"relative IRI <$ref> with no BASE")
      }

    private def resolvePName(prefix: String, local: String, t: Tok): String =
      prefixes.get(prefix) match {
        case Some(ns) => ns + local
        case None => err(s"undeclared prefix '$prefix:'", t)
      }

    // ---------------------------------------------------------------- query
    def parseQuery(): Query = {
      prologue()
      val q =
        if (isWord("SELECT")) selectQuery(sub = false)
        else if (isWord("ASK")) { i += 1; datasetClause(); Ast.Ask(groupGraphPattern()) }
        else if (isWord("CONSTRUCT")) constructQuery()
        else if (isWord("DESCRIBE")) describeQuery()
        else err("expected SELECT, ASK, CONSTRUCT or DESCRIBE")
      val withVals = trailingValues(q)
      val scoped =
        if (dsDefault.nonEmpty || dsNamed.nonEmpty)
          Scoped(withVals, dsDefault, dsNamed)
        else withVals
      peek match {
        case TEof(_) => scoped
        case t => err("unexpected trailing input", t)
      }
    }

    // FROM / FROM NAMED clauses, collected where the grammar allows them
    // (top-level query forms only) and attached to the query as a Scoped
    // wrapper by parseQuery.
    private var dsDefault = Vector.empty[Term]
    private var dsNamed = Vector.empty[Term]
    private def datasetClause(sub: Boolean = false): Unit =
      while (isWord("FROM")) {
        if (sub) err("FROM is not allowed in a subquery")
        i += 1
        val named = takeWord("NAMED")
        val t = peek match {
          case TIri(v, _) => i += 1; Term.iri(resolveIri(v))
          case tk @ TPName(p, l, _) => i += 1; Term.iri(resolvePName(p, l, tk))
          case tk => err("FROM needs an IRI", tk)
        }
        if (named) dsNamed :+= t else dsDefault :+= t
      }

    // ---------------------------------------------------------------- update
    def parseUpdateScript(): UpdateScript = {
      val ops = Vector.newBuilder[UpdateOp]
      var go = true
      while (go) {
        prologue() // each operation may carry its own PREFIX/BASE block
        if (peek.isInstanceOf[TEof]) go = false
        else {
          ops += updateOp()
          if (!takePunct(";")) go = false
        }
      }
      peek match {
        case TEof(_) => UpdateScript(ops.result())
        case t => err("expected ';' between update operations or end of input", t)
      }
    }

    /** Blank nodes (hidden `_bn*` vars) are forbidden in every DELETE
      * context (SPARQL 1.1 Update §3.1.3) — they could never match. */
    private def rejectBnodes(qs: Seq[QuadPat], ctx: String): Seq[QuadPat] = {
      for (q <- qs; n <- Seq(q.s, q.o)) n match {
        case V(name) if name.startsWith("_bn") =>
          err(s"blank nodes are not allowed in $ctx")
        case _ => ()
      }
      qs
    }

    private def updateOp(): UpdateOp = {
      if (takeWord("INSERT")) {
        if (takeWord("DATA")) InsertData(quadBlock(ground = true))
        else modify(del = Nil, withGraph = None, needInsert = true)
      }
      else if (takeWord("DELETE")) {
        if (takeWord("DATA"))
          DeleteData(rejectBnodes(quadBlock(ground = true), "DELETE DATA"))
        else if (takeWord("WHERE"))
          // §3.1.3: the DELETE WHERE pattern is also the delete template,
          // so blank nodes are forbidden in it like any DELETE template
          DeleteWhere(rejectBnodes(quadBlock(ground = false), "DELETE WHERE"))
        else {
          val del = rejectBnodes(quadBlock(ground = false), "DELETE templates")
          if (takeWord("INSERT")) modify(del, withGraph = None, needInsert = true)
          else modify(del, withGraph = None, needInsert = false, insParsed = Some(Nil))
        }
      }
      else if (takeWord("WITH")) {
        val g = expectIriTerm()
        if (takeWord("DELETE")) {
          if (takeWord("WHERE")) {
            // WITH g DELETE WHERE: pin every un-GRAPHed quad to g
            val qs = rejectBnodes(quadBlock(ground = false), "DELETE WHERE")
            DeleteWhere(qs.map(q => q.copy(g = q.g.orElse(Some(Bound(g))))))
          } else {
            val del = rejectBnodes(quadBlock(ground = false), "DELETE templates")
            if (takeWord("INSERT")) modify(del, Some(g), needInsert = true)
            else modify(del, Some(g), needInsert = false, insParsed = Some(Nil))
          }
        } else if (takeWord("INSERT")) modify(Nil, Some(g), needInsert = true)
        else err("WITH needs a DELETE or INSERT clause")
      }
      else if (isWord("CLEAR") || isWord("DROP")) { i += 1; clearOp() }
      else if (isWord("ADD") || isWord("MOVE") || isWord("COPY")) {
        val op = peek.asInstanceOf[TWord].w.toUpperCase; i += 1
        takeWord("SILENT")
        val from = graphOrDefault()
        expectWord("TO")
        val to = graphOrDefault()
        GraphCopy(op, from, to)
      }
      else if (takeWord("CREATE")) {
        takeWord("SILENT"); expectWord("GRAPH"); expectIriTerm()
        // graphs exist implicitly in the quad-frame model: CREATE is a no-op
        ClearOp("NOOP", None)
      }
      else if (isWord("LOAD")) err("LOAD is not supported — read data with RdfIO and pass it as a DataFrame")
      else err("expected an update operation (INSERT/DELETE/WITH/CLEAR/DROP/ADD/MOVE/COPY/CREATE)")
    }

    private def modify(del: Seq[QuadPat], withGraph: Option[Term],
                       needInsert: Boolean,
                       insParsed: Option[Seq[QuadPat]] = None): Modify = {
      val ins = insParsed.getOrElse {
        if (needInsert) quadBlock(ground = false) else Nil
      }
      if (isWord("USING")) err("USING dataset clauses are not supported")
      expectWord("WHERE")
      val where = groupGraphPattern()
      Modify(del, ins, where, withGraph)
    }

    private def clearOp(): ClearOp = {
      takeWord("SILENT")
      if (takeWord("DEFAULT")) ClearOp("DEFAULT", None)
      else if (takeWord("NAMED")) ClearOp("NAMED", None)
      else if (takeWord("ALL")) ClearOp("ALL", None)
      else if (takeWord("GRAPH")) ClearOp("GRAPH", Some(expectIriTerm()))
      else err("CLEAR/DROP needs GRAPH <iri>, DEFAULT, NAMED or ALL")
    }

    private def graphOrDefault(): Option[Term] =
      if (takeWord("DEFAULT")) None
      else { takeWord("GRAPH"); Some(expectIriTerm()) }

    private def expectIriTerm(): Term = peek match {
      case TIri(v, _) => i += 1; Term.iri(resolveIri(v))
      case t @ TPName(p, l, _) => i += 1; Term.iri(resolvePName(p, l, t))
      case _ => err("expected an IRI")
    }

    /** `{ triples (GRAPH g { triples })* }` — the QuadData / QuadPattern
      * production. `ground = true` rejects variables (INSERT/DELETE DATA);
      * bnode-derived hidden vars stay (fresh-label semantics applied by the
      * translator). */
    private def quadBlock(ground: Boolean): Seq[QuadPat] = {
      expectPunct("{")
      val out = Vector.newBuilder[QuadPat]
      def harvest(g: Option[Node]): Unit = {
        val buf = scala.collection.mutable.ArrayBuffer.empty[TP]
        val saved = tps
        tps = buf
        while (startsTriples) {
          triplesSameSubject()
          while (takePunct(".")) ()
        }
        tps = saved
        // DATA blocks must be ground (recursing into quoted-triple terms:
        // a nested variable is the same error, and a nested blank node
        // would need per-operation minting inside the quoted term, which
        // the engine does not do — reject both with parse errors here
        // rather than opaque engine errors later)
        def checkGround(n: Node, nested: Boolean): Unit = n match {
          case V(name) if !name.startsWith("_bn") =>
            err(s"variables are not allowed in DATA blocks (?$name)")
          case V(_) if nested =>
            err("blank nodes inside quoted triples are not supported in DATA blocks")
          case QPat(qs, qp, qo) =>
            Seq(qs, qp, qo).foreach(checkGround(_, nested = true))
          case _ => ()
        }
        for (tp <- buf) tp.p match {
          case Left(p) =>
            if (ground)
              (Seq(tp.s, p, tp.o) ++ g).foreach(checkGround(_, nested = false))
            out += QuadPat(tp.s, p, tp.o, g)
          case Right(_) => err("property paths are not allowed in update templates")
        }
      }
      var go = true
      while (go) {
        harvest(None)
        if (takeWord("GRAPH")) {
          val gn: Node = peek match {
            case TVar(n, _) if !ground => i += 1; mention(n); V(n)
            case _ => Bound(expectIriTerm())
          }
          expectPunct("{")
          harvest(Some(gn))
          expectPunct("}")
          while (takePunct(".")) ()
        } else go = false
      }
      expectPunct("}")
      out.result()
    }

    private def trailingValues(q: Query): Query =
      if (!isWord("VALUES")) q
      else {
        val v = valuesBlock()
        def add(g: Group) = Group(g.elems :+ v)
        q match {
          case s: Select => s.copy(where = add(s.where))
          case a: Ast.Ask => a.copy(where = add(a.where))
          case c: Construct => c.copy(where = add(c.where))
          case d: Describe =>
            d.copy(where = Some(add(d.where.getOrElse(Group(Nil)))))
          case s: Scoped => s // unreachable: Scoped wraps AFTER trailingValues
        }
      }

    private def selectQuery(sub: Boolean): Select = {
      expectWord("SELECT")
      val distinct = takeWord("DISTINCT")
      val reduced = !distinct && takeWord("REDUCED")
      var proj = Vector.empty[(Expr, Option[String])]
      if (takePunct("*")) ()
      else {
        var go = true
        while (go) peek match {
          case TVar(n, _) => i += 1; mention(n); proj :+= (EVar(n): Expr, None)
          case TPunct("(", _) =>
            i += 1
            val e = expression()
            expectWord("AS")
            val v = expectVar()
            expectPunct(")")
            proj :+= (e, Some(v))
          case _ => go = false
        }
        if (proj.isEmpty) err("SELECT needs at least one variable or (expr AS ?v)")
      }
      datasetClause(sub)
      val where = { takeWord("WHERE"); groupGraphPattern() }
      // solution modifiers
      var groupBy = Vector.empty[(Expr, Option[String])]
      if (isWord("GROUP")) {
        i += 1; expectWord("BY")
        var go = true
        while (go) peek match {
          case TVar(n, _) => i += 1; groupBy :+= (EVar(n): Expr, None)
          case TPunct("(", _) =>
            i += 1
            val e = expression()
            val as = if (takeWord("AS")) Some(expectVar()) else None
            expectPunct(")")
            groupBy :+= (e, as)
          case _ => go = false
        }
        if (groupBy.isEmpty) err("GROUP BY needs at least one ?var or (expr [AS ?v])")
      }
      var having = Vector.empty[Expr]
      if (isWord("HAVING")) {
        i += 1
        while (isPunct("(")) { i += 1; having :+= expression(); expectPunct(")") }
        if (having.isEmpty) err("HAVING needs at least one (constraint)")
      }
      var orderBy = Vector.empty[(Expr, Boolean)]
      if (isWord("ORDER")) {
        i += 1; expectWord("BY")
        var go = true
        while (go) {
          if (takeWord("ASC")) { expectPunct("("); orderBy :+= (expression(), true); expectPunct(")") }
          else if (takeWord("DESC")) { expectPunct("("); orderBy :+= (expression(), false); expectPunct(")") }
          else peek match {
            case TVar(n, _) => i += 1; orderBy :+= (EVar(n): Expr, true)
            case TPunct("(", _) => i += 1; orderBy :+= (expression(), true); expectPunct(")")
            case _ => go = false
          }
        }
        if (orderBy.isEmpty) err("ORDER BY needs at least one condition")
      }
      var limit: Option[Long] = None
      var offset: Option[Long] = None
      var go = true
      while (go) {
        if (isWord("LIMIT")) { i += 1; limit = Some(expectInt()) }
        else if (isWord("OFFSET")) { i += 1; offset = Some(expectInt()) }
        else go = false
      }
      Select(distinct, reduced, proj, where, groupBy, having, orderBy,
        limit, offset, mentions.toSeq)
    }

    private def constructQuery(): Construct = {
      expectWord("CONSTRUCT")
      val template = Vector.newBuilder[(Node, Node, Node)]
      val buf = scala.collection.mutable.ArrayBuffer.empty[TP]
      def parseTemplate(): Unit = {
        expectPunct("{")
        val saved = tps
        tps = buf
        while (!isPunct("}")) {
          triplesSameSubject()
          while (takePunct(".")) ()
        }
        tps = saved
        for (tp <- buf) tp.p match {
          case Left(n) => template += ((tp.s, n, tp.o))
          case Right(_) => err("property paths are not allowed in CONSTRUCT templates")
        }
        expectPunct("}")
      }
      // CONSTRUCT WHERE { triples } (§10.2.2): the pattern IS the template
      val shorthand = !isPunct("{")
      val where =
        if (shorthand) {
          datasetClause()
          expectWord("WHERE")
          parseTemplate()
          Group(Seq(EBgp(buf.toSeq)))
        } else {
          parseTemplate()
          datasetClause()
          takeWord("WHERE")
          groupGraphPattern()
        }
      var limit: Option[Long] = None
      var offset: Option[Long] = None
      var go = true
      while (go) {
        if (isWord("LIMIT")) { i += 1; limit = Some(expectInt()) }
        else if (isWord("OFFSET")) { i += 1; offset = Some(expectInt()) }
        else go = false
      }
      Construct(template.result(), where, limit, offset)
    }

    private def describeQuery(): Describe = {
      expectWord("DESCRIBE")
      var vars = Vector.empty[String]
      var iris = Vector.empty[Term]
      val star = takePunct("*")
      if (!star) {
        var go = true
        while (go) peek match {
          case TVar(n, _) => i += 1; mention(n); vars :+= n
          case TIri(v, _) => i += 1; iris :+= Term.iri(resolveIri(v))
          case t @ TPName(p, l, _) => i += 1; iris :+= Term.iri(resolvePName(p, l, t))
          case _ => go = false
        }
        if (vars.isEmpty && iris.isEmpty)
          err("DESCRIBE needs at least one IRI or ?var (or *)")
      }
      datasetClause()
      val where =
        if (takeWord("WHERE") || isPunct("{")) Some(groupGraphPattern()) else None
      if (star) {
        // DESCRIBE * = every in-scope variable (the WHERE's visible vars,
        // in textual mention order — mentions only accumulate from the
        // DESCRIBE clause and its own WHERE in this query form)
        if (where.isEmpty) err("DESCRIBE * needs a WHERE clause")
        Describe(mentions.toSeq, Vector.empty, where)
      } else Describe(vars, iris, where)
    }

    private def expectVar(): String = peek match {
      case TVar(n, _) => i += 1; mention(n); n
      case _ => err("expected a ?variable")
    }

    private def expectInt(): Long = peek match {
      case t @ TNum(lex, 0, _) =>
        i += 1
        try lex.toLong
        catch { case _: NumberFormatException =>
          err(s"integer out of range: $lex", t) }
      case _ => err("expected a non-negative integer")
    }

    // --------------------------------------------------------- group pattern
    private def groupGraphPattern(): Group = {
      expectPunct("{")
      if (isWord("SELECT")) {
        val q = selectQuery(sub = true)
        expectPunct("}")
        return Group(Seq(ESubSelect(q)))
      }
      val elems = Vector.newBuilder[Element]
      while (!isPunct("}")) {
        if (isWord("OPTIONAL")) { i += 1; elems += EOptional(groupGraphPattern()) }
        else if (isWord("MINUS")) { i += 1; elems += EMinusG(groupGraphPattern()) }
        else if (isWord("GRAPH")) {
          i += 1
          val gn = peek match {
            case TVar(n, _) => i += 1; mention(n); V(n)
            case TIri(v, _) => i += 1; Bound(Term.iri(resolveIri(v)))
            case t @ TPName(p, l, _) => i += 1; Bound(Term.iri(resolvePName(p, l, t)))
            case _ => err("GRAPH needs a ?var or IRI")
          }
          elems += EGraphG(gn, groupGraphPattern())
        }
        else if (isWord("FILTER")) {
          i += 1
          elems += EFilter(constraint())
        }
        else if (isWord("BIND")) {
          i += 1; expectPunct("(")
          val e = expression()
          expectWord("AS")
          val v = expectVar()
          expectPunct(")")
          elems += EBind(e, v)
        }
        else if (isWord("VALUES")) elems += valuesBlock()
        else if (isWord("SERVICE")) err("SERVICE is not supported")
        else if (isPunct("{")) {
          // group, or UNION chain
          var alts = Vector(groupGraphPattern())
          while (takeWord("UNION")) alts :+= groupGraphPattern()
          elems += (alts match {
            case Vector(Group(Seq(s: ESubSelect))) => s // unwrap { SELECT ... }
            case Vector(g) => EGroup(g)
            case _ => EUnion(alts)
          })
        }
        else if (isPunct(".")) i += 1
        else {
          // a triples block
          val buf = scala.collection.mutable.ArrayBuffer.empty[TP]
          val saved = tps
          tps = buf
          triplesSameSubject()
          while (takePunct(".") && startsTriples) triplesSameSubject()
          tps = saved
          elems += EBgp(buf.toSeq)
        }
      }
      expectPunct("}")
      Group(elems.result())
    }

    private def startsTriples: Boolean = peek match {
      case TVar(_, _) | TIri(_, _) | TPName(_, _, _) | TBnode(_, _) |
           TStr(_, _) | TNum(_, _, _) => true
      case TPunct("[", _) | TPunct("(", _) => true
      case TPunct("<", _) => peekAt(1) match {
        case TPunct("<", _) => true // RDF-star << ... >>
        case _ => false
      }
      case TWord(w, _) => w.equalsIgnoreCase("true") || w.equalsIgnoreCase("false")
      case _ => false
    }

    private def valuesBlock(): EValues = {
      expectWord("VALUES")
      val vars = Vector.newBuilder[String]
      val single = peek match {
        case TVar(n, _) => i += 1; mention(n); vars += n; true
        case TPunct("(", _) =>
          i += 1
          while (!takePunct(")")) vars += expectVar()
          false
        case _ => err("VALUES needs ?var or (?v1 ?v2 ...)")
      }
      val vs = vars.result()
      if (vs.isEmpty) err("VALUES needs at least one variable")
      expectPunct("{")
      val rows = Vector.newBuilder[Seq[Option[Term]]]
      while (!isPunct("}")) {
        if (single) rows += Seq(valuesCell())
        else {
          expectPunct("(")
          val row = Vector.newBuilder[Option[Term]]
          while (!takePunct(")")) row += valuesCell()
          val r = row.result()
          if (r.length != vs.length)
            err(s"VALUES row has ${r.length} cells for ${vs.length} variables")
          rows += r
        }
      }
      expectPunct("}")
      EValues(vs, rows.result())
    }

    private def valuesCell(): Option[Term] =
      if (takeWord("UNDEF")) None
      else Some(dataTerm())

    /** A ground term (no variables) — VALUES cells. */
    private def dataTerm(): Term = peek match {
      case TIri(v, _) => i += 1; Term.iri(resolveIri(v))
      case t @ TPName(p, l, _) => i += 1; Term.iri(resolvePName(p, l, t))
      case TStr(_, _) => literal()
      case TNum(_, _, _) => numericLiteral("")
      case TPunct("+", _) => i += 1; numericLiteral("")
      case TPunct("-", _) => i += 1; numericLiteral("-")
      case TWord(w, _) if w.equalsIgnoreCase("true") => i += 1; Term.bool(true)
      case TWord(w, _) if w.equalsIgnoreCase("false") => i += 1; Term.bool(false)
      case _ => err("expected an RDF term")
    }

    private def literal(): Term = {
      val lex = peek match { case TStr(v, _) => i += 1; v; case _ => err("expected string") }
      peek match {
        case TLang(tag, _) => i += 1; Term.langLit(lex, tag)
        case TPunct("^^", _) =>
          i += 1
          val dt = peek match {
            case TIri(v, _) => i += 1; resolveIri(v)
            case t @ TPName(p, l, _) => i += 1; resolvePName(p, l, t)
            case _ => err("expected datatype IRI after ^^")
          }
          Term.typedLit(lex, dt)
        case _ => Term.str(lex)
      }
    }

    private def numericLiteral(sign: String): Term = peek match {
      case TNum(lex, kind, _) =>
        i += 1
        val dt = kind match {
          case 0 => Vocab.xsdInteger
          case 1 => Vocab.xsdDecimal
          case _ => Vocab.xsdDouble
        }
        Term.typedLit(sign + lex, dt)
      case _ => err("expected a number")
    }

    // ------------------------------------------------------- triple patterns
    private def triplesSameSubject(): Unit = peek match {
      // TriplesNode subjects ([...] and (...)) may omit the property list
      case TPunct("[", _) =>
        val s = bnodePropertyList(); propertyList(s, optional = true)
      case TPunct("(", _) =>
        val s = collection(); propertyList(s, optional = true)
      case _ =>
        val s = varOrTerm(); propertyList(s, optional = false)
    }

    private def propertyList(s: Node, optional: Boolean): Unit = {
      if (optional && !startsVerb) return
      var go = true
      while (go) {
        val verb = verbPath()
        objectList(s, verb)
        if (takePunct(";")) {
          while (takePunct(";")) ()
          go = startsVerb
        } else go = false
      }
    }

    private def startsVerb: Boolean = peek match {
      case TVar(_, _) | TIri(_, _) | TPName(_, _, _) => true
      case TWord(w, _) => w == "a"
      case TPunct("^", _) | TPunct("(", _) | TPunct("!", _) => true
      case _ => false
    }

    private def objectList(s: Node, p: Either[Node, Path]): Unit = {
      var go = true
      while (go) {
        val o = objectNode()
        tps += TP(s, p, o)
        go = takePunct(",")
      }
    }

    private def objectNode(): Node = peek match {
      case TPunct("[", _) => bnodePropertyList()
      case TPunct("(", _) => collection()
      case _ => varOrTerm()
    }

    /** `[ p1 o1 ; p2 o2 ]` — a fresh hidden variable carrying its property
      * list (SPARQL's bnode-as-variable semantics). */
    private def bnodePropertyList(): Node = {
      expectPunct("[")
      val v = V(freshHidden("bnp"))
      if (!takePunct("]")) {
        propertyList(v, optional = false)
        expectPunct("]")
      }
      v
    }

    /** `( e1 e2 ... )` — rdf:first/rest chain over fresh hidden vars. */
    private def collection(): Node = {
      expectPunct("(")
      if (takePunct(")")) return Bound(Term.iri(Vocab.rdfNil))
      val first = Term.iri(Vocab.rdfFirst)
      val rest = Term.iri(Vocab.rdfRest)
      val head = V(freshHidden("bncoll"))
      var cur = head
      var done = false
      while (!done) {
        val item = objectNode()
        tps += TP(cur, Left(Bound(first)), item)
        if (takePunct(")")) {
          tps += TP(cur, Left(Bound(rest)), Bound(Term.iri(Vocab.rdfNil)))
          done = true
        } else {
          val nxt = V(freshHidden("bncoll"))
          tps += TP(cur, Left(Bound(rest)), nxt)
          cur = nxt
        }
      }
      head
    }

    private def varOrTerm(): Node = peek match {
      case TVar(n, _) => i += 1; mention(n); V(n)
      case TIri(v, _) => i += 1; Bound(Term.iri(resolveIri(v)))
      case t @ TPName(p, l, _) => i += 1; Bound(Term.iri(resolvePName(p, l, t)))
      case TBnode(label, _) => i += 1; V("_bn_" + label)
      case TStr(_, _) => Bound(literal())
      case TNum(_, _, _) => Bound(numericLiteral(""))
      case TPunct("+", _) => i += 1; Bound(numericLiteral(""))
      case TPunct("-", _) => i += 1; Bound(numericLiteral("-"))
      case TWord(w, _) if w.equalsIgnoreCase("true") => i += 1; Bound(Term.bool(true))
      case TWord(w, _) if w.equalsIgnoreCase("false") => i += 1; Bound(Term.bool(false))
      case TPunct("<", _) if { peekAt(1) match { case TPunct("<", _) => true; case _ => false } } =>
        quotedPattern()
      case t => err("expected a term or variable", t)
    }

    /** RDF-star quoted triple pattern `<< s p o >>`. */
    private def quotedPattern(): Node = {
      expectPunct("<"); expectPunct("<")
      val s = varOrTerm()
      val p = peek match {
        case TWord("a", _) => i += 1; Bound(Term.iri(Vocab.rdfType))
        case _ => varOrTerm()
      }
      val o = varOrTerm()
      expectPunct(">"); expectPunct(">")
      graft.engine.Bgp.dsl.qt(s, p, o)
    }

    // --------------------------------------------------------------- paths
    private def verbPath(): Either[Node, Path] = peek match {
      case TVar(n, _) => i += 1; mention(n); Left(V(n))
      case TWord("a", _) => i += 1; Left(Bound(Term.iri(Vocab.rdfType)))
      case _ =>
        val p = pathAlternative()
        p match {
          case PLink(t) => Left(Bound(t))
          case other => Right(other)
        }
    }

    private def pathAlternative(): Path = {
      var p = pathSequence()
      while (takePunct("|")) p = PAlt(p, pathSequence())
      p
    }

    private def pathSequence(): Path = {
      var p = pathEltOrInverse()
      while (takePunct("/")) p = PSeq(p, pathEltOrInverse())
      p
    }

    private def pathEltOrInverse(): Path =
      if (takePunct("^")) PInv(pathElt()) else pathElt()

    private def pathElt(): Path = {
      val prim = pathPrimary()
      if (takePunct("+")) PMod(prim, '+')
      else if (takePunct("*")) PMod(prim, '*')
      else if (takePunct("?")) PMod(prim, '?')
      else prim
    }

    private def pathPrimary(): Path = peek match {
      case TIri(v, _) => i += 1; PLink(Term.iri(resolveIri(v)))
      case t @ TPName(p, l, _) => i += 1; PLink(Term.iri(resolvePName(p, l, t)))
      case TWord("a", _) => i += 1; PLink(Term.iri(Vocab.rdfType))
      case TPunct("(", _) => i += 1; val p = pathAlternative(); expectPunct(")"); p
      case TPunct("!", _) =>
        i += 1
        val fwd = Vector.newBuilder[Term]
        val rev = Vector.newBuilder[Term]
        def member(): Unit =
          if (takePunct("^")) rev += negSetIri() else fwd += negSetIri()
        if (takePunct("(")) {
          member()
          while (takePunct("|")) member()
          expectPunct(")")
        } else member()
        negSet(fwd.result(), rev.result())
      case t => err("expected a property path element", t)
    }

    /** SPARQL §18.2.2.4: a mixed negated property set splits into the
      * forward NPS over the forward members and the INVERSE of the NPS
      * over the `^`-members — `!(:p|^:q)` ≡ `!(:p) | ^(!(:q))` with each
      * side present only when its member list is non-empty. */
    private def negSet(fwd: Seq[Term], rev: Seq[Term]): Path =
      (fwd.nonEmpty, rev.nonEmpty) match {
        case (true, false) => PNeg(fwd)
        case (false, true) => PInv(PNeg(rev))
        case (true, true) => PAlt(PNeg(fwd), PInv(PNeg(rev)))
        case (false, false) => err("empty negated property set")
      }

    private def negSetIri(): Term = peek match {
      case TIri(v, _) => i += 1; Term.iri(resolveIri(v))
      case t @ TPName(p, l, _) => i += 1; Term.iri(resolvePName(p, l, t))
      case TWord("a", _) => i += 1; Term.iri(Vocab.rdfType)
      case t => err("negated property sets take IRI links (optionally ^-inverted)", t)
    }

    // ---------------------------------------------------------- expressions
    private def constraint(): Expr = peek match {
      case TPunct("(", _) => i += 1; val e = expression(); expectPunct(")"); e
      case TWord(_, _) | TIri(_, _) | TPName(_, _, _) => primaryExpr()
      case t => err("FILTER needs (expr), a builtin call, or a function call", t)
    }

    def expression(): Expr = orExpr()

    private def orExpr(): Expr = {
      var e = andExpr()
      while (takePunct("||")) e = EBin("||", e, andExpr())
      e
    }

    private def andExpr(): Expr = {
      var e = relExpr()
      while (takePunct("&&")) e = EBin("&&", e, relExpr())
      e
    }

    private def relExpr(): Expr = {
      val l = addExpr()
      peek match {
        case TPunct(op @ ("=" | "!=" | "<" | ">" | "<=" | ">="), _) =>
          i += 1; EBin(op, l, addExpr())
        case TWord(w, _) if w.equalsIgnoreCase("IN") =>
          i += 1; EIn(l, exprList(), negated = false)
        case TWord(w, _) if w.equalsIgnoreCase("NOT") =>
          i += 1; expectWord("IN"); EIn(l, exprList(), negated = true)
        case _ => l
      }
    }

    private def exprList(): Seq[Expr] = {
      expectPunct("(")
      if (takePunct(")")) return Nil
      val out = Vector.newBuilder[Expr]
      out += expression()
      while (takePunct(",")) out += expression()
      expectPunct(")")
      out.result()
    }

    private def addExpr(): Expr = {
      var e = mulExpr()
      var go = true
      while (go) {
        if (takePunct("+")) e = EBin("+", e, mulExpr())
        else if (takePunct("-")) e = EBin("-", e, mulExpr())
        else go = false
      }
      e
    }

    private def mulExpr(): Expr = {
      var e = unaryExpr()
      var go = true
      while (go) {
        if (takePunct("*")) e = EBin("*", e, unaryExpr())
        else if (takePunct("/")) e = EBin("/", e, unaryExpr())
        else go = false
      }
      e
    }

    private def unaryExpr(): Expr =
      if (takePunct("!")) ENot(unaryExpr())
      else if (takePunct("-")) ENeg(unaryExpr())
      else if (takePunct("+")) unaryExpr()
      else primaryExpr()

    private val aggregates = Set("COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE", "GROUP_CONCAT")

    private def primaryExpr(): Expr = peek match {
      case TPunct("(", _) => i += 1; val e = expression(); expectPunct(")"); e
      case TVar(n, _) => i += 1; mention(n); EVar(n)
      case TStr(_, _) => EConst(literal())
      case TNum(_, _, _) => EConst(numericLiteral(""))
      case TWord(w, _) if w.equalsIgnoreCase("true") => i += 1; EConst(Term.bool(true))
      case TWord(w, _) if w.equalsIgnoreCase("false") => i += 1; EConst(Term.bool(false))
      case TWord(w, _) if w.equalsIgnoreCase("EXISTS") =>
        i += 1; EExists(groupGraphPattern(), negated = false)
      case TWord(w, _) if w.equalsIgnoreCase("NOT") =>
        i += 1; expectWord("EXISTS"); EExists(groupGraphPattern(), negated = true)
      case TWord(w, _) if aggregates(w.toUpperCase) => aggregate(w.toUpperCase)
      case TWord(w, _) => builtinCall(w.toUpperCase)
      case TIri(v, _) =>
        i += 1
        val iri = resolveIri(v)
        if (isPunct("(")) ECall(iri, exprList()) else EConst(Term.iri(iri))
      case t @ TPName(p, l, _) =>
        i += 1
        val iri = resolvePName(p, l, t)
        if (isPunct("(")) ECall(iri, exprList()) else EConst(Term.iri(iri))
      case t => err("expected an expression", t)
    }

    private def aggregate(fn: String): Expr = {
      i += 1
      expectPunct("(")
      val distinct = takeWord("DISTINCT")
      if (fn == "COUNT" && takePunct("*")) {
        expectPunct(")")
        return EAgg("COUNT", distinct, None, None)
      }
      val arg = expression()
      var sep: Option[String] = None
      if (fn == "GROUP_CONCAT" && takePunct(";")) {
        expectWord("SEPARATOR")
        expectPunct("=")
        sep = Some(peek match {
          case TStr(s, _) => i += 1; s
          case _ => err("SEPARATOR needs a string")
        })
      }
      expectPunct(")")
      EAgg(fn, distinct, Some(arg), sep)
    }

    private def builtinCall(fn: String): Expr = {
      i += 1
      if (!isPunct("(")) err(s"expected '(' after $fn")
      ECall(fn, exprList())
    }
  }
}

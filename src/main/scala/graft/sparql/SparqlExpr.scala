package graft.sparql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType, StringType}
import graft.core.{Term, TermKind, Vocab, Xsd, XsdOps, XPathRegex}
import graft.engine.Terms
import Ast._

/** SPARQL expression compiler: AST expression -> one Spark `Column` over a
  * solution frame (one term-struct column per variable, [[Terms.termSchema]]).
  *
  * Uniform value model: EVERY compiled expression yields a term struct; a
  * NULL struct is "error or unbound" — SPARQL's error value maps onto SQL
  * NULL, so Spark's Kleene three-valued `AND`/`OR` gives exactly the
  * spec's `&&`/`||` error tables (§17.2), and a FILTER keeps a row iff the
  * effective boolean value is true (NULL rows drop, like SQL WHERE).
  *
  * Everything stays a pure Column expression (whole-stage codegen) except
  * two documented escapes: datatype-cast calls (`xsd:integer(?x)` et al.)
  * bridge to the tested Scala `XsdOps.cast` via a UDF, and non-constant
  * REGEX patterns evaluate through `XPathRegex`. All string->number
  * conversions use `try_cast` (NULL on bad lexical = SPARQL type error),
  * never ANSI `cast` which would throw mid-query.
  *
  * Documented divergences from the spec (each chosen for distributed
  * execution, mirroring the engine's algebra contract in `Bgp.scala`):
  *  - numeric arithmetic: integer op integer stays exact 64-bit
  *    (`try_add`/`try_subtract`/`try_multiply`: overflow = error); any
  *    other combination computes in double and yields xsd:double
  *    (xsd:decimal beyond double precision collapses; integer division
  *    yields xsd:double, not decimal). Comparison (`= != < <= > >=`, IN)
  *    likewise: integer-vs-integer is exact 64-bit; mixed numeric pairs
  *    and integers beyond Long range compare in double.
  *  - `"chat"@en = "chat"` compares false rather than raising.
  *  - aggregates are compiled by [[Sparql]], not here.
  */
object SparqlExpr {

  final case class SparqlCompileError(msg: String) extends RuntimeException(msg)

  val nullTerm: Column = lit(null).cast(Terms.termSchema)
  private val nullBool: Column = lit(null).cast(BooleanType)
  private val nullStr: Column = lit(null).cast(StringType)

  private def kindOf(t: Column) = t("kind")
  private def v(t: Column) = t("value")
  private def dt(t: Column) = t("datatype")
  private def lang(t: Column) = t("lang")

  private val numericDts: Seq[String] =
    (Xsd.integerFamily + Vocab.xsdDecimal + Vocab.xsdDouble + Vocab.xsdFloat).toSeq.sorted
  private val integerDts: Seq[String] = Xsd.integerFamily.toSeq.sorted

  private def isLit(t: Column): Column =
    t.isNotNull && kindOf(t) === TermKind.LITERAL
  private def isNumeric(t: Column): Column =
    isLit(t) && dt(t).isin(numericDts: _*)
  private def isIntegerT(t: Column): Column =
    isLit(t) && dt(t).isin(integerDts: _*)
  private def isStringish(t: Column): Column =
    isLit(t) && (dt(t) === Vocab.xsdString || dt(t) === Vocab.rdfLangString ||
      dt(t) === Vocab.rdfDirLangString)
  private def isSimpleStr(t: Column): Column =
    isLit(t) && dt(t) === Vocab.xsdString
  private def isBoolT(t: Column): Column =
    isLit(t) && dt(t) === Vocab.xsdBoolean
  private def isDateTimeT(t: Column): Column =
    isLit(t) && (dt(t) === Vocab.xsdDateTime || dt(t) === Vocab.xsdDate)

  /** Numeric value as double; NULL when not numeric or bad lexical. */
  def numD(t: Column): Column =
    when(isNumeric(t), v(t).try_cast(DoubleType)).otherwise(lit(null).cast(DoubleType))

  /** Exact 64-bit value for integer-family literals. */
  private def numL(t: Column): Column =
    when(isIntegerT(t), v(t).try_cast(LongType)).otherwise(lit(null).cast(LongType))

  /** Boolean lexical value; NULL on bad lexical. */
  private def bv(t: Column): Column =
    when(v(t).isin("true", "1"), lit(true))
      .when(v(t).isin("false", "0"), lit(false))
      .otherwise(nullBool)

  /** Timestamp value of a dateTime/date literal (session TZ for zoneless). */
  private def ts(t: Column): Column = v(t).try_cast("timestamp")

  private def boolTerm(b: Column): Column =
    when(b.isNotNull,
      Terms.typedLit(when(b, "true").otherwise("false"), Vocab.xsdBoolean))
      .otherwise(nullTerm)

  private def strTerm(s: Column): Column =
    when(s.isNotNull, Terms.strLit(s)).otherwise(nullTerm)

  private def intTerm(n: Column): Column =
    when(n.isNotNull, Terms.typedLit(n.cast(StringType), Vocab.xsdInteger))
      .otherwise(nullTerm)

  private def dblTerm(d: Column): Column =
    when(d.isNotNull, Terms.typedLit(d.cast(StringType), Vocab.xsdDouble))
      .otherwise(nullTerm)

  // -------------------------------------------------------------------- EBV
  /** Effective boolean value (§17.2.2): three-valued (NULL = type error).
    * Invalid boolean/numeric lexicals are FALSE (the spec's quirk), not
    * errors. */
  def ebv(t: Column): Column =
    when(t.isNull || kindOf(t) =!= TermKind.LITERAL, nullBool)
      .when(dt(t) === Vocab.xsdBoolean, coalesce(bv(t), lit(false)))
      .when(dt(t).isin(numericDts: _*), {
        val d = v(t).try_cast(DoubleType)
        coalesce(d =!= 0.0 && !isnan(d), lit(false))
      })
      .when(isStringish(t), length(v(t)) > 0)
      .otherwise(nullBool)

  // ------------------------------------------------------------- comparison
  /** RDFterm-equal (§17.4.1.7) as a three-valued boolean column.
    * Integer-vs-integer compares EXACTLY in 64-bit (two distinct integers
    * beyond 2^53 never conflate); only mixed-type numeric pairs — and
    * integers beyond Long range — ride the double branch. */
  def rdfEquals(a: Column, b: Column): Column =
    when(a.isNull || b.isNull, nullBool)
      .when(isIntegerT(a) && isIntegerT(b) &&
        numL(a).isNotNull && numL(b).isNotNull, numL(a) === numL(b))
      .when(isNumeric(a) && isNumeric(b), numD(a) === numD(b))
      .when(isBoolT(a) && isBoolT(b), bv(a) === bv(b))
      .when(isDateTimeT(a) && isDateTimeT(b), ts(a) === ts(b))
      .when(isStringish(a) && isStringish(b),
        v(a) === v(b) && coalesce(lang(a), lit("")) === coalesce(lang(b), lit("")))
      .when(isLit(a) && isLit(b),
        // unknown datatypes: identical terms equal, otherwise unanswerable
        when(a === b, lit(true)).otherwise(nullBool))
      .otherwise(a === b) // IRI/bnode/quoted: term identity

  /** Operator `<` (§17.3 operator mapping); `op` ∈ {"<", "<=", ">", ">="}. */
  def rdfCompare(op: String, a: Column, b: Column): Column = {
    def by[T](l: Column, r: Column): Column = op match {
      case "<" => l < r
      case "<=" => l <= r
      case ">" => l > r
      case ">=" => l >= r
    }
    when(a.isNull || b.isNull, nullBool)
      .when(isIntegerT(a) && isIntegerT(b) &&
        numL(a).isNotNull && numL(b).isNotNull, by(numL(a), numL(b)))
      .when(isNumeric(a) && isNumeric(b), by(numD(a), numD(b)))
      .when(isSimpleStr(a) && isSimpleStr(b), by(v(a), v(b)))
      .when(isBoolT(a) && isBoolT(b), by(bv(a).cast("int"), bv(b).cast("int")))
      .when(isDateTimeT(a) && isDateTimeT(b), by(ts(a), ts(b)))
      .otherwise(nullBool)
  }

  // ------------------------------------------------------------- arithmetic
  private def arith(op: String, a: Column, b: Column): Column = {
    val approx: Column = op match {
      case "+" => numD(a) + numD(b)
      case "-" => numD(a) - numD(b)
      case "*" => numD(a) * numD(b)
      case "/" => numD(a) / numD(b) // double division: /0 -> ±Inf, like xsd:double
    }
    val guard = !isNumeric(a) || !isNumeric(b)
    if (op == "/") when(guard, nullTerm).otherwise(dblTerm(approx))
    else {
      val exact: Column = op match {
        case "+" => try_add(numL(a), numL(b))
        case "-" => try_subtract(numL(a), numL(b))
        case "*" => try_multiply(numL(a), numL(b))
      }
      when(guard, nullTerm)
        .when(isIntegerT(a) && isIntegerT(b), intTerm(exact))
        .otherwise(dblTerm(approx))
    }
  }

  // -------------------------------------------------------------- compile
  /** Is this AST node boolean-valued (compilable via [[compileBool]])? */
  private def isBoolExpr(e: Expr): Boolean = e match {
    case EBin("||" | "&&" | "=" | "!=" | "<" | "<=" | ">" | ">=", _, _) => true
    case ENot(_) | EIn(_, _, _) => true
    case _ => false
  }

  /** Boolean-valued compilation: a three-valued BooleanType Column. This
    * path is LOAD-BEARING for plan size, not a convenience: logical
    * operators compose raw booleans here, where the term-struct route
    * (`ebv(boolTerm(x))`) would re-reference each operand subtree a dozen
    * times per nesting level — Catalyst traversals do not memoize shared
    * subtrees, so that multiplies analysis cost exponentially with
    * expression depth (measured: a two-level FILTER took minutes before
    * this split, milliseconds after). FILTER compiles through this
    * directly: NULL (error) rows drop, exactly SQL WHERE. */
  def compileBool(e: Expr, env: Map[String, Column]): Column = e match {
    case EBin("||", l, r) => compileBool(l, env) || compileBool(r, env)
    case EBin("&&", l, r) => compileBool(l, env) && compileBool(r, env)
    case EBin("=", l, r) => rdfEquals(compile(l, env), compile(r, env))
    case EBin("!=", l, r) => !rdfEquals(compile(l, env), compile(r, env))
    case EBin(op @ ("<" | "<=" | ">" | ">="), l, r) =>
      rdfCompare(op, compile(l, env), compile(r, env))
    case ENot(x) => !compileBool(x, env)
    case EIn(x, list, negated) =>
      val t = compile(x, env)
      val hits = list.map(i => rdfEquals(t, compile(i, env)))
      val any = hits.foldLeft(lit(false))(_ || _) // Kleene OR: matches IN's error table
      if (negated) !any else any
    case other => ebv(compile(other, env))
  }

  /** Compile an expression against `env` (variable -> term column). Vars
    * absent from `env` are unbound (NULL). EExists must be rewritten to a
    * flag variable by the translator before compiling. */
  def compile(e: Expr, env: Map[String, Column]): Column = e match {
    case b if isBoolExpr(b) => boolTerm(compileBool(b, env))
    case EVar(n) => env.getOrElse(n, nullTerm)
    case EConst(t) => Terms.constTerm(t)
    case EBin(op @ ("+" | "-" | "*" | "/"), l, r) =>
      arith(op, compile(l, env), compile(r, env))
    case EBin(op, _, _) => throw SparqlCompileError(s"unknown operator $op")
    case ENeg(x) =>
      val t = compile(x, env)
      when(isIntegerT(t), intTerm(-numL(t)))
        .when(isNumeric(t), dblTerm(-numD(t)))
        .otherwise(nullTerm)
    case EExists(_, _) =>
      throw SparqlCompileError(
        "EXISTS reached the expression compiler — the translator must rewrite it to a flag column")
    case EAgg(fn, _, _, _) =>
      throw SparqlCompileError(
        s"aggregate $fn outside an aggregation context (GROUP BY / aggregate projection)")
    case ECall(fn, args) => call(fn, args.map(compile(_, env)), args, env)
    case other => throw SparqlCompileError(s"unexpected expression $other")
  }

  // --------------------------------------------------------------- builtins
  private lazy val castUdf =
    udf((kind: Byte, value: String, dtIri: String, lang: String, target: String) =>
      XsdOps.cast(Term(kind, value, dtIri, lang), target).orNull)

  private lazy val regexUdf =
    udf((value: String, pattern: String, flags: String) =>
      if (value == null || pattern == null) None
      else try Some(XPathRegex.matches(value, pattern, if (flags == null) "" else flags))
      catch { case _: Exception => None })

  private lazy val encodeUriUdf = udf((s: String) =>
    if (s == null) null
    else {
      val sb = new StringBuilder
      for (b <- s.getBytes(java.nio.charset.StandardCharsets.UTF_8)) {
        val c = (b & 0xff).toChar
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
            (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~')
          sb.append(c)
        else sb.append(f"%%${b & 0xff}%02X")
      }
      sb.toString
    })

  /** String-literal argument guard: the lexical value when arg is
    * xsd:string / rdf:langString, else NULL (type error). */
  private def strArg(t: Column): Column =
    when(isStringish(t), v(t)).otherwise(nullStr)

  /** §17.4.3.2 argument compatibility for two-string builtins: both
    * stringish AND arg2 simple/xsd:string or sharing arg1's language tag.
    * Never NULL (a non-literal input is simply incompatible). */
  private def compatible(t1: Column, t2: Column): Column = {
    val l1 = coalesce(lang(t1), lit(""))
    val l2 = coalesce(lang(t2), lit(""))
    isStringish(t1) && isStringish(t2) && (l2 === "" || l2 === l1)
  }

  /** Result carries arg1's language/datatype (XPath string-fn convention). */
  private def likeArg1(t: Column, newValue: Column): Column =
    when(t.isNull || newValue.isNull, nullTerm)
      .otherwise(Terms.term(lit(TermKind.LITERAL), newValue, dt(t), lang(t)))

  private def constStr(e: Expr): Option[String] = e match {
    case EConst(t) if t.isLiteral => Some(t.value)
    case _ => None
  }

  private def call(fn: String, as: Seq[Column], raw: Seq[Expr],
                   env: Map[String, Column]): Column = {
    def a0 = as(0); def a1 = as(1); def a2 = as(2)
    def arity(n: Int*): Unit =
      if (!n.contains(as.length))
        throw SparqlCompileError(s"$fn takes ${n.mkString(" or ")} argument(s), got ${as.length}")
    fn match {
      case "BOUND" => arity(1); boolTerm(a0.isNotNull)
      case "COALESCE" => if (as.isEmpty) nullTerm else coalesce(as: _*)
      case "IF" =>
        arity(3)
        val c = compileBool(raw(0), env) // no term round-trip for the condition
        when(c, a1).when(!c, a2).otherwise(nullTerm)
      case "SAMETERM" => arity(2); boolTerm(when(a0.isNull || a1.isNull, nullBool).otherwise(a0 === a1))
      case "ISIRI" | "ISURI" => arity(1); boolTerm(when(a0.isNull, nullBool).otherwise(kindOf(a0) === TermKind.IRI))
      case "ISBLANK" => arity(1); boolTerm(when(a0.isNull, nullBool).otherwise(kindOf(a0) === TermKind.BNODE))
      case "ISLITERAL" => arity(1); boolTerm(when(a0.isNull, nullBool).otherwise(kindOf(a0) === TermKind.LITERAL))
      case "ISNUMERIC" => arity(1); boolTerm(when(a0.isNull, nullBool).otherwise(isNumeric(a0) && numD(a0).isNotNull))
      case "ISTRIPLE" => arity(1); boolTerm(when(a0.isNull, nullBool).otherwise(kindOf(a0) === TermKind.TRIPLE))

      case "STR" =>
        arity(1)
        when(a0.isNull || kindOf(a0) === TermKind.BNODE, nullTerm)
          .otherwise(strTerm(v(a0)))
      case "LANG" =>
        arity(1)
        when(isLit(a0), strTerm(coalesce(lang(a0), lit("")))).otherwise(nullTerm)
      case "DATATYPE" =>
        arity(1)
        when(isLit(a0),
          Terms.iri(coalesce(dt(a0), lit(Vocab.xsdString)))).otherwise(nullTerm)
      case "IRI" | "URI" =>
        arity(1)
        when(a0.isNull, nullTerm)
          .when(kindOf(a0) === TermKind.IRI, a0)
          .when(isSimpleStr(a0), Terms.iri(v(a0)))
          .otherwise(nullTerm)
      case "BNODE" =>
        arity(0)
        Terms.bnode(regexp_replace(expr("uuid()"), "-", ""))
      case "STRDT" =>
        arity(2)
        when(isSimpleStr(a0) && kindOf(a1) === TermKind.IRI,
          Terms.term(lit(TermKind.LITERAL), v(a0), v(a1), nullStr)).otherwise(nullTerm)
      case "STRLANG" =>
        arity(2)
        when(isSimpleStr(a0) && isSimpleStr(a1) && length(v(a1)) > 0,
          Terms.langLit(v(a0), v(a1))).otherwise(nullTerm)

      case "STRLEN" => arity(1); intTerm(length(strArg(a0)))
      case "UCASE" => arity(1); likeArg1(a0, upper(strArg(a0)))
      case "LCASE" => arity(1); likeArg1(a0, lower(strArg(a0)))
      case "CONTAINS" =>
        arity(2)
        boolTerm(when(compatible(a0, a1), v(a0).contains(v(a1))).otherwise(nullBool))
      case "STRSTARTS" =>
        arity(2)
        boolTerm(when(compatible(a0, a1), v(a0).startsWith(v(a1))).otherwise(nullBool))
      case "STRENDS" =>
        arity(2)
        boolTerm(when(compatible(a0, a1), v(a0).endsWith(v(a1))).otherwise(nullBool))
      case "SUBSTR" =>
        arity(2, 3)
        // XPath fn:substring: positions p with round(start) <= p <
        // round(start) + round(length), intersected with [1, len] — NOT
        // Spark substr (whose negative start counts from the string end).
        // round = XPath round (half-up toward +inf). Bounds clamp keeps
        // the int casts exact; NaN windows collapse to the empty string.
        val src = strArg(a0)
        val rs = floor(numD(a1) + 0.5)
        val rl = if (as.length == 3) floor(numD(a2) + 0.5) else lit(4.6e18)
        val from = least(greatest(rs, lit(1.0)), lit(2.147483647e9))
        val end = least(rs + rl, lit(2.147483647e9)) // exclusive
        val eff = end - from
        val bad = src.isNull || rs.isNull ||
          (if (as.length == 3) numD(a2).isNull else lit(false))
        val resVal = when(bad, nullStr)
          .when(eff > 0, substring(src, from.cast("int"), eff.cast("int")))
          .otherwise(lit(""))
        likeArg1(a0, resVal)
      case "CONCAT" if as.isEmpty => strTerm(lit(""))
      case "CONCAT" =>
        // lang preserved iff every arg shares it; else plain xsd:string
        val vals = as.map(strArg)
        val anyNull = vals.map(_.isNull).foldLeft(lit(false))(_ || _)
        val langs = as.map(t => coalesce(lang(t), lit("")))
        val sameLang = langs.foldLeft(lit(true))((acc, l) => acc && l === langs.head)
        when(anyNull, nullTerm)
          .when(sameLang && langs.head =!= "",
            Terms.term(lit(TermKind.LITERAL), concat(vals: _*),
              lit(Vocab.rdfLangString), langs.head))
          .otherwise(strTerm(concat(vals: _*)))
      case "STRBEFORE" =>
        arity(2)
        val h = v(a0); val n = v(a1)
        val idx = locate2(h, n)
        when(!compatible(a0, a1), nullTerm)
          .when(length(n) === 0, likeArg1(a0, lit("")))
          .when(idx > 0, likeArg1(a0, substring(h, lit(1), idx - 1)))
          .otherwise(strTerm(lit("")))
      case "STRAFTER" =>
        arity(2)
        val h = v(a0); val n = v(a1)
        val idx = locate2(h, n)
        when(!compatible(a0, a1), nullTerm)
          .when(length(n) === 0, likeArg1(a0, h))
          .when(idx > 0, likeArg1(a0, substring(h, idx + length(n), lit(Int.MaxValue))))
          .otherwise(strTerm(lit("")))
      case "ENCODE_FOR_URI" => arity(1); strTerm(encodeUriUdf(strArg(a0)))
      case "REGEX" =>
        arity(2, 3)
        (constStr(raw(1)), if (raw.length == 3) constStr(raw(2)) else Some("")) match {
          case (Some(p), Some(f)) =>
            // constant pattern+flags -> codegen'd RLIKE via XPath translation
            boolTerm(when(strArg(a0).isNull, nullBool)
              .otherwise(Terms.matchesPattern(strArg(a0), p, f)))
          case _ =>
            val flags = if (as.length == 3) strArg(a2) else lit("")
            boolTerm(regexUdf(strArg(a0), strArg(a1), flags))
        }
      case "REPLACE" =>
        arity(3, 4)
        (constStr(raw(1)), if (raw.length == 4) constStr(raw(3)) else Some("")) match {
          case (Some(p), Some(f)) =>
            likeArg1(a0, regexp_replace(strArg(a0),
              lit(XPathRegex.inlinePattern(p, f)), strArg(a2)))
          case _ => throw SparqlCompileError(
            "REPLACE needs a constant pattern (and flags) — dynamic patterns are not supported")
        }
      case "LANGMATCHES" =>
        arity(2)
        val tag = lower(strArg(a0)); val range = lower(strArg(a1))
        boolTerm(when(tag.isNull || range.isNull, nullBool)
          .when(range === "*", length(tag) > 0)
          .otherwise(tag === range || tag.startsWith(concat(range, lit("-")))))

      case "ABS" =>
        arity(1)
        when(isIntegerT(a0), intTerm(abs(numL(a0))))
          .when(isNumeric(a0), dblTerm(abs(numD(a0)))).otherwise(nullTerm)
      case "CEIL" =>
        arity(1)
        when(isIntegerT(a0), a0)
          .when(isNumeric(a0), dblTerm(ceil(numD(a0)).cast(DoubleType))).otherwise(nullTerm)
      case "FLOOR" =>
        arity(1)
        when(isIntegerT(a0), a0)
          .when(isNumeric(a0), dblTerm(floor(numD(a0)).cast(DoubleType))).otherwise(nullTerm)
      case "ROUND" =>
        arity(1)
        when(isIntegerT(a0), a0)
          // round-half-up toward +inf, the XPath rule (round(-2.5) = -2)
          .when(isNumeric(a0), dblTerm(floor(numD(a0) + 0.5).cast(DoubleType)))
          .otherwise(nullTerm)
      case "RAND" => arity(0); dblTerm(rand())

      case "YEAR" => arity(1); dtPart(a0, "^(-?\\d{4,})-")
      case "MONTH" => arity(1); dtPart(a0, "^-?\\d{4,}-(\\d{2})")
      case "DAY" => arity(1); dtPart(a0, "^-?\\d{4,}-\\d{2}-(\\d{2})")
      case "HOURS" => arity(1); dtPart(a0, "T(\\d{2}):")
      case "MINUTES" => arity(1); dtPart(a0, "T\\d{2}:(\\d{2}):")
      case "SECONDS" =>
        arity(1)
        val m = regexp_extract(v(a0), "T\\d{2}:\\d{2}:(\\d{2}(?:\\.\\d+)?)", 1)
        when(isDateTimeT(a0) && m =!= "",
          Terms.typedLit(m, Vocab.xsdDecimal)).otherwise(nullTerm)
      case "TZ" =>
        arity(1)
        when(isDateTimeT(a0),
          strTerm(regexp_extract(v(a0), "(Z|[+-]\\d{2}:\\d{2})$", 1)))
          .otherwise(nullTerm)
      case "TIMEZONE" =>
        arity(1)
        val z = regexp_extract(v(a0), "(Z|[+-]\\d{2}:\\d{2})$", 1)
        val h = regexp_extract(z, "^([+-])(\\d{2}):", 2).try_cast("int")
        val m = regexp_extract(z, ":(\\d{2})$", 1).try_cast("int")
        val sign = when(z.startsWith("-"), "-").otherwise("")
        val dur = when(z === "Z", "PT0S").otherwise(concat(
          sign, lit("PT"),
          when(h > 0 || m === 0, concat(h.cast(StringType), lit("H"))).otherwise(lit("")),
          when(m > 0, concat(m.cast(StringType), lit("M"))).otherwise(lit(""))))
        when(isDateTimeT(a0) && z =!= "",
          Terms.typedLit(dur, Vocab.xsd + "dayTimeDuration")).otherwise(nullTerm)
      case "NOW" =>
        arity(0)
        Terms.typedLit(
          date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"),
          Vocab.xsdDateTime)

      case "UUID" => arity(0); Terms.iri(concat(lit("urn:uuid:"), expr("uuid()")))
      case "STRUUID" => arity(0); strTerm(expr("uuid()"))
      case "MD5" => arity(1); strTerm(md5(strArg(a0).cast("binary")))
      case "SHA1" => arity(1); strTerm(sha1(strArg(a0).cast("binary")))
      case "SHA256" => arity(1); strTerm(lower(sha2(strArg(a0).cast("binary"), 256)))
      case "SHA384" => arity(1); strTerm(lower(sha2(strArg(a0).cast("binary"), 384)))
      case "SHA512" => arity(1); strTerm(lower(sha2(strArg(a0).cast("binary"), 512)))

      // RDF-star accessors over the canonical quoted-triple byte form
      case "SUBJECT" | "PREDICATE" | "OBJECT" =>
        arity(1)
        val parsed = Terms.parseQuoted(v(a0))
        val part = fn match {
          case "SUBJECT" => parsed("s"); case "PREDICATE" => parsed("p")
          case _ => parsed("o")
        }
        when(kindOf(a0) === TermKind.TRIPLE, part).otherwise(nullTerm)

      case iri if iri.contains(":") =>
        // datatype-cast form: xsd:integer(?x) etc. (builtin names never
        // contain ':') — bridge to the tested XsdOps.cast
        arity(1)
        castUdf(kindOf(a0), v(a0), dt(a0), lang(a0), lit(iri))
      case other => throw SparqlCompileError(s"unsupported function $other()")
    }
  }

  /** 1-based first occurrence of `needle` in `haystack`; 0 when absent,
    * NULL on NULL input (SQL locate with dynamic needle). */
  private def locate2(haystack: Column, needle: Column): Column =
    call_function("locate", needle, haystack)

  private def dtPart(t: Column, pattern: String): Column = {
    val m = regexp_extract(v(t), pattern, 1)
    when(isDateTimeT(t) && m =!= "", intTerm(m.try_cast(LongType))).otherwise(nullTerm)
  }
}

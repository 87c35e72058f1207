package graft.core

import java.math.{BigDecimal => JBD, MathContext, RoundingMode}

/** XSD/SPARQL scalar operation library over literal terms — the reference's
  * expression layer (SURVEY §2.7):
  * - numeric add/subtract/multiply/divide with the XPath type-promotion
  *   matrix (lib/rdf/xsd/datatypes/numeric.ex:135-330): integer op integer
  *   -> integer, EXCEPT divide -> decimal; decimal+double -> double;
  *   anything+double -> double
  * - abs/round(precision)/ceil/floor (numeric.ex:329-446)
  * - SPARQL effective boolean value + 3-valued logic
  *   (lib/rdf/xsd/datatypes/boolean.ex:76-223); nil/None propagates like
  *   SQL NULL
  * - cross-type value compare (numeric.ex:74-95, literal.ex:317-336)
  * - casts (per-datatype do_cast)
  *
  * All functions are Option-valued: None = SPARQL error/invalid, which the
  * Spark layer maps to null columns.
  */
object XsdOps {

  sealed trait Num {
    def toDouble: Double
  }
  final case class NInt(v: BigInt) extends Num { def toDouble: Double = v.toDouble }
  final case class NDec(v: JBD) extends Num { def toDouble: Double = v.doubleValue }
  final case class NDbl(v: Double) extends Num { def toDouble: Double = v }

  def parseNumeric(t: Term): Option[Num] =
    if (t == null || !t.isLiteral) None
    else t.datatype match {
      // xsd:integer plus the 12 bounded subtypes; a facet-violating lexical
      // (e.g. "300"^^xsd:byte) is an invalid literal -> None
      case dt if Xsd.integerFamily.contains(dt) =>
        if (Xsd.valid(t.value, dt)) Some(NInt(BigInt(t.value))) else None
      case Vocab.xsdDecimal =>
        if (Xsd.validDecimal(t.value)) Some(NDec(new JBD(t.value))) else None
      case Vocab.xsdDouble | Vocab.xsdFloat => Xsd.parseDouble(t.value).map(NDbl)
      case _ => None
    }

  def numericTerm(n: Num): Term = n match {
    case NInt(v) => Term.typedLit(v.toString, Vocab.xsdInteger)
    case NDec(v) => Term.typedLit(
      Xsd.canonicalDecimal(v.toPlainString).getOrElse(v.toPlainString), Vocab.xsdDecimal)
    case NDbl(v) => Term.typedLit(Xsd.canonicalDoubleValue(v), Vocab.xsdDouble)
  }

  // promotion: double > decimal > integer (numeric.ex result_type)
  private def promote(a: Num, b: Num): (Num, Num) = (a, b) match {
    case (NDbl(_), _) | (_, NDbl(_)) => (NDbl(a.toDouble), NDbl(b.toDouble))
    case (NDec(_), NInt(y)) => (a, NDec(new JBD(y.bigInteger)))
    case (NInt(x), NDec(_)) => (NDec(new JBD(x.bigInteger)), b)
    case _ => (a, b)
  }

  def add(a: Term, b: Term): Option[Term] = binop(a, b) {
    case (NInt(x), NInt(y)) => Some(NInt(x + y))
    case (NDec(x), NDec(y)) => Some(NDec(x.add(y)))
    case (NDbl(x), NDbl(y)) => Some(NDbl(x + y))
    case _ => None
  }

  def subtract(a: Term, b: Term): Option[Term] = binop(a, b) {
    case (NInt(x), NInt(y)) => Some(NInt(x - y))
    case (NDec(x), NDec(y)) => Some(NDec(x.subtract(y)))
    case (NDbl(x), NDbl(y)) => Some(NDbl(x - y))
    case _ => None
  }

  def multiply(a: Term, b: Term): Option[Term] = binop(a, b) {
    case (NInt(x), NInt(y)) => Some(NInt(x * y))
    case (NDec(x), NDec(y)) => Some(NDec(x.multiply(y)))
    case (NDbl(x), NDbl(y)) => Some(NDbl(x * y))
    case _ => None
  }

  /** integer ÷ integer -> DECIMAL (numeric.ex divide); ÷0 invalid except
    * double (INF/NaN). */
  def divide(a: Term, b: Term): Option[Term] = binop(a, b) {
    case (NInt(x), NInt(y)) =>
      if (y == 0) None
      else Some(NDec(new JBD(x.bigInteger).divide(new JBD(y.bigInteger), MathContext.DECIMAL128)))
    case (NDec(x), NDec(y)) =>
      if (y.signum == 0) None
      else Some(NDec(x.divide(y, MathContext.DECIMAL128)))
    case (NDbl(x), NDbl(y)) => Some(NDbl(x / y))
    case _ => None
  }

  private def binop(a: Term, b: Term)(f: (Num, Num) => Option[Num]): Option[Term] =
    for {
      na <- parseNumeric(a); nb <- parseNumeric(b)
      (pa, pb) = promote(na, nb)
      r <- f(pa, pb)
    } yield numericTerm(r)

  def abs(a: Term): Option[Term] = parseNumeric(a).map {
    case NInt(v) => NInt(v.abs)
    case NDec(v) => NDec(v.abs)
    case NDbl(v) => NDbl(math.abs(v))
  }.map(numericTerm)

  /** XPath fn:round: half rounds toward positive infinity (HALF_CEILING via
    * HALF_UP on positives / HALF_DOWN handling). */
  def round(a: Term, precision: Int = 0): Option[Term] = parseNumeric(a).map {
    case NInt(v) if precision >= 0 => NInt(v)
    case NInt(v) =>
      // half toward +inf on negatives too (XPath): HALF_UP would round
      // -25 at precision -1 to -30 instead of -20
      NInt(BigInt(new JBD(v.bigInteger).setScale(precision,
        if (v.signum >= 0) RoundingMode.HALF_UP else RoundingMode.HALF_DOWN)
        .setScale(0).toBigInteger))
    case NDec(v) =>
      val r = v.setScale(precision,
        if (v.signum >= 0) RoundingMode.HALF_UP else RoundingMode.HALF_DOWN)
      NDec(r)
    case NDbl(v) =>
      val f = math.pow(10, precision)
      NDbl(math.floor(v * f + 0.5) / f)
  }.map(numericTerm)

  def ceil(a: Term): Option[Term] = parseNumeric(a).map {
    case n @ NInt(_) => n
    case NDec(v) => NDec(v.setScale(0, RoundingMode.CEILING))
    case NDbl(v) => NDbl(math.ceil(v))
  }.map(numericTerm)

  def floor(a: Term): Option[Term] = parseNumeric(a).map {
    case n @ NInt(_) => n
    case NDec(v) => NDec(v.setScale(0, RoundingMode.FLOOR))
    case NDbl(v) => NDbl(math.floor(v))
  }.map(numericTerm)

  // ------------------------------------------------------------- boolean/EBV

  /** SPARQL effective boolean value (boolean.ex:76-111): boolean literal ->
    * its value (invalid lexical -> false); string -> non-empty; numeric ->
    * non-zero and non-NaN; other terms -> error (None). */
  def ebv(t: Term): Option[Boolean] =
    if (t == null || !t.isLiteral) None
    else t.datatype match {
      case Vocab.xsdBoolean => Some(t.value == "true" || t.value == "1")
      case Vocab.xsdString => Some(t.value.nonEmpty)
      case Vocab.rdfLangString => Some(t.value.nonEmpty)
      case dt if Xsd.integerFamily.contains(dt) =>
        Some(if (Xsd.valid(t.value, dt)) BigInt(t.value) != 0 else false)
      case Vocab.xsdDecimal =>
        Some(if (Xsd.validDecimal(t.value)) new JBD(t.value).signum != 0 else false)
      case Vocab.xsdDouble | Vocab.xsdFloat =>
        Some(Xsd.parseDouble(t.value).exists(d => !d.isNaN && d != 0.0))
      case _ => None
    }

  def not(t: Term): Option[Boolean] = ebv(t).map(!_)

  /** 3-valued AND/OR with None propagation (boolean.ex logical_and/or):
    * false AND error = false; true OR error = true; else error. */
  def logicalAnd(a: Option[Boolean], b: Option[Boolean]): Option[Boolean] = (a, b) match {
    case (Some(false), _) | (_, Some(false)) => Some(false)
    case (Some(true), Some(true)) => Some(true)
    case _ => None
  }

  def logicalOr(a: Option[Boolean], b: Option[Boolean]): Option[Boolean] = (a, b) match {
    case (Some(true), _) | (_, Some(true)) => Some(true)
    case (Some(false), Some(false)) => Some(false)
    case _ => None
  }

  // ---------------------------------------------------------------- compare

  /** Value comparison within comparable datatypes; None for incomparable
    * (literal.ex:317-336 returns nil). -1/0/1. */
  def compare(a: Term, b: Term): Option[Int] = compareRaw(a, b).map(Integer.signum)

  private def compareRaw(a: Term, b: Term): Option[Int] = {
    (parseNumeric(a), parseNumeric(b)) match {
      case (Some(x), Some(y)) =>
        val (px, py) = promote(x, y)
        (px, py) match {
          case (NInt(i), NInt(j)) => Some(i.compare(j))
          case (NDec(i), NDec(j)) => Some(i.compareTo(j))
          case (NDbl(i), NDbl(j)) =>
            if (i.isNaN || j.isNaN) None else Some(java.lang.Double.compare(i, j))
          case _ => None
        }
      case _ =>
        if (a == null || b == null || !a.isLiteral || !b.isLiteral) None
        else if (a.datatype == Vocab.xsdString && b.datatype == Vocab.xsdString)
          Some(a.value.compareTo(b.value))
        else if (a.datatype == Vocab.xsdBoolean && b.datatype == Vocab.xsdBoolean)
          (Xsd.canonicalBoolean(a.value), Xsd.canonicalBoolean(b.value)) match {
            // "false" < "true" holds lexicographically too
            case (Some(x), Some(y)) => Some(x.compareTo(y))
            case _ => None
          }
        else if (a.datatype == Vocab.xsdDateTime && b.datatype == Vocab.xsdDateTime)
          (Xsd.canonicalDateTime(a.value), Xsd.canonicalDateTime(b.value)) match {
            // both-canonical-UTC (or both naive): the YEAR compares
            // numerically (plain string compare inverts all negative
            // years — "-0002" > "-0001" — and misorders 5-digit years);
            // past the year the canonical fixed-width fields compare
            // lexicographically
            case (Some(x), Some(y)) if x.endsWith("Z") == y.endsWith("Z") =>
              def key(c: String): (Long, String) = {
                val neg = c.startsWith("-")
                val body = if (neg) c.substring(1) else c
                val dash = body.indexOf('-')
                (body.substring(0, dash).toLong * (if (neg) -1 else 1),
                  body.substring(dash))
              }
              val (ya, ra) = key(x); val (yb, rb) = key(y)
              Some(if (ya != yb) ya.compare(yb) else ra.compareTo(rb))
            case _ => None // timezone-indeterminate (date_time.ex semantics)
          }
        else None
    }
  }

  def lessThan(a: Term, b: Term): Option[Boolean] = compare(a, b).map(_ < 0)
  def greaterThan(a: Term, b: Term): Option[Boolean] = compare(a, b).map(_ > 0)

  /** Value equality (literal.ex:298-315 / iri.ex:363-387): term-identical
    * -> true; comparable literals -> value compare == 0 (so "1" and "01"
    * as xsd:integer are equal); same datatype but incomparable lexicals ->
    * false; different uncomparable datatypes -> None (the reference's
    * nil). Non-literals compare by identity. */
  def valueEqual(a: Term, b: Term): Option[Boolean] = {
    if (a == null || b == null) return None
    // op:numeric-equal: NaN equals NOTHING, itself included — checked
    // before the term-identity shortcut, which would report NaN = NaN
    def nan(t: Term): Boolean = t.isLiteral && t.value == "NaN" &&
      (t.datatype == Vocab.xsdDouble || t.datatype == Vocab.xsdFloat)
    if ((nan(a) || nan(b)) &&
        parseNumeric(a).isDefined && parseNumeric(b).isDefined)
      return Some(false)
    if (a == b) return Some(true)
    if (!a.isLiteral || !b.isLiteral)
      return if (a.kind == b.kind) Some(false)
        else if (!a.isLiteral && !b.isLiteral) Some(false)
        else None // resource vs literal: incomparable
    compare(a, b) match {
      case Some(c) => Some(c == 0)
      case None =>
        // same datatype: distinct (possibly invalid) lexicals -> not equal;
        // unrelated datatypes: unknown (nil)
        if (a.datatype == b.datatype && a.lang == b.lang) Some(false) else None
    }
  }

  /** Sortable key for a deterministic TOTAL order over terms (used for
    * orderBy): kind, then per-datatype comparable encoding, falling back to
    * NT byte form. Numerics are encoded so byte order == numeric order:
    * the first body char classes the value (' '=-INF < '!'=wide-negative <
    * '0'=negative < '5'=non-negative (incl. '5~'=wide-positive) < 'y'=+INF
    * < 'z'=NaN). Negatives invert digits and close with a '~' sentinel
    * (above any digit) so shorter fractions rank correctly (-1 > -1.5);
    * integer parts wider than the 20-digit pad get a 6-digit length header
    * so |x| >= 1e20 stays ordered. Fraction trailing zeros are stripped so
    * equal values ("1.5" vs "1.50") share one key. */
  def sortKey(t: Term): String = {
    if (t == null) return "\u0000"
    val tag = t.kind.toString
    if (!t.isLiteral) return s"$tag|${t.value}"
    parseNumeric(t) match {
      case Some(n) =>
        val bd = n match {
          case NInt(v) => new JBD(v.bigInteger)
          case NDec(v) => v
          case NDbl(v) if v.isNaN || v.isInfinite =>
            return s"$tag|N|" + (if (v.isNaN) "znan" else if (v > 0) "yinf" else " inf")
          case NDbl(v) => JBD.valueOf(v)
        }
        val neg = bd.signum < 0
        val abs = bd.abs.toPlainString
        val (ip, fp0) = abs.indexOf('.') match {
          case -1 => (abs, "")
          case i => (abs.substring(0, i), abs.substring(i + 1))
        }
        val fp = fp0.reverse.dropWhile(_ == '0').reverse
        def inv(s: String) = s.map(c => if (c.isDigit) ('9' - (c - '0')).toChar else c)
        val body =
          if (!neg) {
            if (ip.length <= 20) "5" + ("0" * (20 - ip.length)) + ip + "." + fp
            else "5~" + f"${ip.length}%06d" + ip + "." + fp
          } else {
            if (ip.length <= 20) "0" + inv(("0" * (20 - ip.length)) + ip + "." + fp) + "~"
            else "!" + f"${999999 - ip.length}%06d" + inv(ip + "." + fp) + "~"
          }
        s"$tag|N|$body"
      case None => s"$tag|S|${NTriples.termString(t)}"
    }
  }

  // ------------------------------------------------------------------ casts

  /** Cast a literal to a target datatype (per-datatype do_cast rules:
    * boolean -> 1.0/0.0 for numerics, numeric -> canonical string, string
    * parsed). None on invalid. */
  def cast(t: Term, targetDatatype: String): Option[Term] = {
    if (t == null || !t.isLiteral) return None
    val lex = t.value
    targetDatatype match {
      case Vocab.xsdString =>
        // None = a KNOWN datatype with an invalid lexical (cast error);
        // unknown datatypes pass through (canonicalLexical yields Some)
        Xsd.canonicalLexical(lex, t.datatype).map(Term.str)
      case Vocab.xsdBoolean => t.datatype match {
        case Vocab.xsdBoolean => Some(Term.typedLit(Xsd.canonicalBoolean(lex).getOrElse(return None), Vocab.xsdBoolean))
        case Vocab.xsdString => Xsd.canonicalBoolean(lex).map(Term.typedLit(_, Vocab.xsdBoolean))
        case _ => parseNumeric(t).map(n => Term.bool(n.toDouble != 0.0 && !n.toDouble.isNaN))
      }
      case Vocab.xsdDouble => t.datatype match {
        case Vocab.xsdBoolean =>
          Xsd.canonicalBoolean(lex).map(b => Term.dbl(if (b == "true") 1.0 else 0.0))
        case Vocab.xsdString => Xsd.parseDouble(lex).map(Term.dbl)
        case _ => parseNumeric(t).map(n => Term.dbl(n.toDouble))
      }
      case Vocab.xsdFloat =>
        // the float constructor (SPARQL §17.5): double rules, value passed
        // through float precision, result typed xsd:float
        def toF(d: Double): Term =
          Term.typedLit(Xsd.canonicalDoubleValue(d.toFloat.toDouble), Vocab.xsdFloat)
        t.datatype match {
          case Vocab.xsdBoolean =>
            Xsd.canonicalBoolean(lex).map(b => toF(if (b == "true") 1.0 else 0.0))
          case Vocab.xsdString => Xsd.parseDouble(lex).map(toF)
          case _ => parseNumeric(t).map(n => toF(n.toDouble))
        }
      case Vocab.xsdDateTime => t.datatype match {
        case Vocab.xsdDateTime | Vocab.xsdString =>
          Xsd.canonicalDateTime(lex).map(Term.typedLit(_, Vocab.xsdDateTime))
        case Vocab.xsdDate =>
          // date -> dateTime: midnight at the date's timezone (XPath 19.1).
          // The timezone may be ANY offset, not just 'Z' — split the full
          // tz suffix off and re-append it after T00:00:00 (a '-05:00'
          // left in place would land before the time part, an invalid
          // xsd:dateTime lexical; reference: date.ex
          // comparison_normalization)
          Xsd.canonicalDate(lex).map { c =>
            val tzRe = "(Z|[+-]\\d{2}:\\d{2})$".r
            val (d0, tz) = tzRe.findFirstIn(c) match {
              case Some(z) => (c.dropRight(z.length), z)
              case None => (c, "")
            }
            Term.typedLit(s"${d0}T00:00:00$tz", Vocab.xsdDateTime)
          }
        case _ => None
      }
      case Vocab.xsdDecimal => t.datatype match {
        case Vocab.xsdBoolean =>
          Xsd.canonicalBoolean(lex).map(b => Term.typedLit(if (b == "true") "1.0" else "0.0", Vocab.xsdDecimal))
        case Vocab.xsdString =>
          if (Xsd.validDecimal(lex)) Some(Term.typedLit(Xsd.canonicalDecimal(lex).get, Vocab.xsdDecimal)) else None
        case Vocab.xsdDouble | Vocab.xsdFloat =>
          Xsd.parseDouble(lex).filterNot(d => d.isNaN || d.isInfinite)
            .map(d => numericTerm(NDec(JBD.valueOf(d))))
        case _ => parseNumeric(t).map {
          case NInt(v) => numericTerm(NDec(new JBD(v.bigInteger)))
          case other => numericTerm(other)
        }
      }
      case Vocab.xsdInteger => t.datatype match {
        case Vocab.xsdBoolean =>
          Xsd.canonicalBoolean(lex).map(b => Term.int(if (b == "true") 1 else 0))
        case Vocab.xsdString =>
          if (Xsd.validInteger(lex)) Some(Term.typedLit(Xsd.canonicalInteger(lex).get, Vocab.xsdInteger)) else None
        case _ => parseNumeric(t).map {
          case NInt(v) => Term.typedLit(v.toString, Vocab.xsdInteger)
          case NDec(v) => Term.typedLit(v.toBigInteger.toString, Vocab.xsdInteger)
          case NDbl(v) if v.isNaN || v.isInfinite => return None
          case NDbl(v) => Term.typedLit(BigDecimal(v).toBigInt.toString, Vocab.xsdInteger)
        }
      }
      // bounded-integer targets: cast through xsd:integer then apply the
      // facet check (restriction.ex semantics — out-of-range -> invalid)
      case dt if Xsd.integerFacets.contains(dt) =>
        cast(t, Vocab.xsdInteger).flatMap { it =>
          if (Xsd.validBoundedInteger(it.value, dt)) Some(Term.typedLit(it.value, dt))
          else None
        }
      case Vocab.xsdBase64Binary => t.datatype match {
        case Vocab.xsdBase64Binary | Vocab.xsdString =>
          Xsd.canonicalBase64(lex).map(Term.typedLit(_, Vocab.xsdBase64Binary))
        case _ => None
      }
      case Vocab.xsdAnyUri => t.datatype match {
        case Vocab.xsdString | Vocab.xsdAnyUri =>
          Some(Term.typedLit(lex, Vocab.xsdAnyUri))
        case _ => None
      }
      case _ => None
    }
  }
}

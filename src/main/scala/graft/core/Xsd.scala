package graft.core

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

/** XSD datatype kernel: lexical validation + canonical lexical forms.
  *
  * Canonical forms are byte-parity targets against the reference:
  * - boolean: lib/rdf/xsd/datatypes/boolean.ex (1/0 accepted, canonical true/false)
  * - integer: strip sign/leading zeros
  * - decimal: lib/rdf/xsd/datatypes/decimal.ex:100-122 — always one or more
  *   integer digits, a point, and at least one fraction digit, trailing
  *   zeros stripped ("1" -> "1.0", "010.020" -> "10.02", "-0" -> "-0.0")
  * - double: lib/rdf/xsd/datatypes/double.ex:98-128 — 15-significant-digit
  *   exponential form, fraction trailing-zero-stripped to >=1 digit,
  *   exponent without '+' or leading zeros ("1.0E0"), NaN/INF/-INF
  * - dateTime/date/time: ISO 8601, tz-shifted to UTC ('Z'), "+00:00"/"-00:00"
  *   -> "Z", "T24:00:00" -> next day (date_time.ex:25-100, date.ex:88-97,
  *   time.ex:123-126)
  */
object Xsd {

  // ---------------------------------------------------------------- boolean

  private val trueLex = Set("true", "1")
  private val falseLex = Set("false", "0")

  def validBoolean(lex: String): Boolean = trueLex(lex) || falseLex(lex)

  def canonicalBoolean(lex: String): Option[String] =
    if (trueLex(lex)) Some("true")
    else if (falseLex(lex)) Some("false")
    else None

  // ---------------------------------------------------------------- integer

  private val intRe = "^[+-]?[0-9]+$".r

  def validInteger(lex: String): Boolean = intRe.matches(lex)

  def canonicalInteger(lex: String): Option[String] =
    if (!validInteger(lex)) None
    else {
      val neg = lex.startsWith("-")
      val digits = lex.dropWhile(c => c == '+' || c == '-').dropWhile(_ == '0')
      val d = if (digits.isEmpty) "0" else digits
      Some(if (neg && d != "0") "-" + d else d)
    }

  // ---------------------------------------------------------------- decimal

  private val decRe = "^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)$".r

  def validDecimal(lex: String): Boolean = decRe.matches(lex)

  /** Canonical decimal: sign (kept even for -0), digits with no leading
    * zeros (but one before the point), a point, fraction with no trailing
    * zeros (but at least one digit). Matches the reference's
    * canonical_decimal test table. */
  def canonicalDecimal(lex: String): Option[String] =
    if (!validDecimal(lex)) None
    else {
      val neg = lex.startsWith("-")
      val unsigned = lex.dropWhile(c => c == '+' || c == '-')
      val (ip0, fp0) = unsigned.indexOf('.') match {
        case -1 => (unsigned, "")
        case i => (unsigned.substring(0, i), unsigned.substring(i + 1))
      }
      val ip = { val t = ip0.dropWhile(_ == '0'); if (t.isEmpty) "0" else t }
      val fp = { val t = fp0.reverse.dropWhile(_ == '0').reverse; if (t.isEmpty) "0" else t }
      Some((if (neg) "-" else "") + ip + "." + fp)
    }

  // ----------------------------------------------------------------- double

  private val dblRe = "^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)([eE][+-]?\\d+)?$".r

  def validDouble(lex: String): Boolean =
    lex == "NaN" || lex == "INF" || lex == "-INF" || lex == "+INF" || dblRe.matches(lex)

  def parseDouble(lex: String): Option[Double] = lex match {
    case "NaN" => Some(Double.NaN)
    case "INF" | "+INF" => Some(Double.PositiveInfinity)
    case "-INF" => Some(Double.NegativeInfinity)
    case l if dblRe.matches(l) => Some(java.lang.Double.parseDouble(l))
    case _ => None
  }

  def canonicalDouble(lex: String): Option[String] = parseDouble(lex).map(canonicalDoubleValue)

  /** 15-significant-digit exponential form mirroring Erlang's ~.15e followed
    * by the reference's fraction/exponent trimming (double.ex:100-128). */
  def canonicalDoubleValue(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d == Double.PositiveInfinity) "INF"
    else if (d == Double.NegativeInfinity) "-INF"
    else {
      val neg = d < 0.0 || (d == 0.0 && 1.0 / d < 0) // keep -0.0 sign
      val a = math.abs(d)
      if (a == 0.0) (if (neg) "-" else "") + "0.0E0"
      else {
        // round to 15 significant digits, normalized scientific notation
        val bd = new JBigDecimal(a).round(new MathContext(15, RoundingMode.HALF_EVEN))
        // unscaledValue * 10^-scale; exponent of first digit:
        val unscaled = bd.unscaledValue.toString
        val exp = unscaled.length - 1 - bd.scale
        val mantissaDigits = unscaled.reverse.dropWhile(_ == '0').reverse
        val md = if (mantissaDigits.isEmpty) "0" else mantissaDigits
        val intPart = md.substring(0, 1)
        val frac = if (md.length > 1) md.substring(1) else "0"
        (if (neg) "-" else "") + intPart + "." + frac + "E" + exp
      }
    }

  // ------------------------------------------------------- dateTime/date/time

  // date with optional timezone: yyyy-mm-dd(Z|+hh:mm|-hh:mm)?
  private val dateRe = "^(-?\\d{4,})-(\\d{2})-(\\d{2})(Z|[+-]\\d{2}:\\d{2})?$".r
  private val timeRe = "^(\\d{2}):(\\d{2}):(\\d{2})(\\.\\d+)?(Z|[+-]\\d{2}:\\d{2})?$".r
  private val dateTimeRe =
    "^(-?\\d{4,})-(\\d{2})-(\\d{2})T(\\d{2}):(\\d{2}):(\\d{2})(\\.\\d+)?(Z|[+-]\\d{2}:\\d{2})?$".r

  private def tzCanonical(tz: String): String =
    if (tz == null) "" else if (tz == "+00:00" || tz == "-00:00" || tz == "Z") "Z" else tz

  private def daysInMonth(y: Long, m: Int): Int = m match {
    case 1 | 3 | 5 | 7 | 8 | 10 | 12 => 31
    case 4 | 6 | 9 | 11 => 30
    case 2 => if ((y % 4 == 0 && y % 100 != 0) || y % 400 == 0) 29 else 28
    case _ => 0
  }

  private def validYmd(y: Long, m: Int, d: Int): Boolean =
    y != 0 && m >= 1 && m <= 12 && d >= 1 && d <= daysInMonth(y, m)

  private def validHms(h: Int, mi: Int, s: Int): Boolean =
    h <= 23 && mi <= 59 && s <= 59

  /** XSD timezoneFrag: offsets within -14:00..+14:00, minutes <= 59. The
    * lexical regexes accept any [+-]\d\d:\d\d shape, so without this an
    * out-of-range offset like +99:99 validated and canonicalized to a
    * garbage instant. */
  private def validTz(tz: String): Boolean =
    tz == null || tz == "Z" || {
      val h = tz.substring(1, 3).toInt; val m = tz.substring(4, 6).toInt
      m <= 59 && (h < 14 || (h == 14 && m == 0))
    }

  /** XSD yearFrag forbids a leading zero once the year exceeds 4 digits
    * ("02020" is not a lexical form of year 2020). */
  private def validYearLex(y: String): Boolean = {
    val digits = if (y.startsWith("-")) y.substring(1) else y
    digits.length == 4 || digits.charAt(0) != '0'
  }

  def validDate(lex: String): Boolean = lex match {
    case dateRe(y, m, d, tz) =>
      !lex.startsWith("+") && validYearLex(y) && validTz(tz) &&
        validYmd(y.toLong, m.toInt, d.toInt)
    case _ => false
  }

  def canonicalDate(lex: String): Option[String] = lex match {
    case dateRe(y, m, d, tz) if validDate(lex) =>
      // year re-rendered %04d (matching canonicalDateTime) so one value
      // never splits into two canonical keys
      val yy = y.toLong
      val ys = if (yy < 0) f"-${-yy}%04d" else f"$yy%04d"
      Some(s"$ys-$m-$d" + tzCanonical(tz))
    case _ => None
  }

  def validTime(lex: String): Boolean = lex match {
    case timeRe(h, m, s, f, tz) =>
      validTz(tz) && (validHms(h.toInt, m.toInt, s.toInt) ||
        // 24:00:00 (fraction zero) is valid and maps to 00:00:00
        // (XSD 1.1 §3.3.12 — validDateTime has the same special case)
        (h == "24" && m == "00" && s == "00" && fracCanonical(f).isEmpty))
    case _ => false
  }

  /** Time canonical: tz applied to shift into UTC (time.ex:84-121), fraction
    * kept with trailing zeros stripped. */
  def canonicalTime(lex: String): Option[String] = lex match {
    case timeRe(h0, m0, s, f, tz) if validTime(lex) =>
      var h = h0.toInt % 24; var m = m0.toInt // 24:00:00 -> 00:00:00
      if (tz != null && tz != "Z" && tz != "+00:00" && tz != "-00:00") {
        val sign = if (tz.charAt(0) == '+') 1 else -1
        val th = tz.substring(1, 3).toInt; val tm = tz.substring(4, 6).toInt
        var total = h * 60 + m - sign * (th * 60 + tm)
        total = ((total % 1440) + 1440) % 1440
        h = total / 60; m = total % 60
      }
      val frac = fracCanonical(f)
      Some(f"$h%02d:$m%02d:$s$frac" + (if (tz != null) "Z" else ""))
    case _ => None
  }

  private def fracCanonical(f: String): String =
    if (f == null) ""
    else {
      val t = f.substring(1).reverse.dropWhile(_ == '0').reverse
      if (t.isEmpty) "" else "." + t
    }

  def validDateTime(lex: String): Boolean = lex match {
    case dateTimeRe(y, mo, d, h, mi, s, f, tz) if !lex.startsWith("+") =>
      val yy = y.toLong
      validYearLex(y) && validTz(tz) && validYmd(yy, mo.toInt, d.toInt) &&
        (validHms(h.toInt, mi.toInt, s.toInt) ||
          // T24:00:00 (fraction zero) allowed, rolls to next day
          // (date_time.ex:58-67)
          (h == "24" && mi == "00" && s == "00" && fracCanonical(f).isEmpty))
    case _ => false
  }

  /** Canonical dateTime: shift tz to UTC, "+00:00" -> Z, T24 -> next-day T00,
    * strip trailing fraction zeros. */
  def canonicalDateTime(lex: String): Option[String] = lex match {
    case dateTimeRe(y, mo, d, h, mi, s, f, tz) if validDateTime(lex) =>
      var year = y.toLong; var month = mo.toInt; var day = d.toInt
      var hour = h.toInt; var minute = mi.toInt
      val sec = s.toInt
      if (hour == 24) { hour = 0; val r = addDays(year, month, day, 1); year = r._1; month = r._2; day = r._3 }
      if (tz != null && tz != "Z" && tz != "+00:00" && tz != "-00:00") {
        val sign = if (tz.charAt(0) == '+') 1 else -1
        val th = tz.substring(1, 3).toInt; val tm = tz.substring(4, 6).toInt
        var total = hour * 60 + minute - sign * (th * 60 + tm)
        var dayShift = 0
        while (total < 0) { total += 1440; dayShift -= 1 }
        while (total >= 1440) { total -= 1440; dayShift += 1 }
        hour = total / 60; minute = total % 60
        if (dayShift != 0) { val r = addDays(year, month, day, dayShift); year = r._1; month = r._2; day = r._3 }
      }
      val frac = fracCanonical(f)
      val ys = if (year < 0) f"-${-year}%04d" else f"$year%04d"
      Some(f"$ys-$month%02d-$day%02dT$hour%02d:$minute%02d:$sec%02d$frac" +
        (if (tz != null) "Z" else ""))
    case _ => None
  }

  private def addDays(y0: Long, m0: Int, d0: Int, delta: Int): (Long, Int, Int) = {
    var y = y0; var m = m0; var d = d0 + delta
    while (d > daysInMonth(y, m)) {
      d -= daysInMonth(y, m); m += 1
      if (m > 12) { m = 1; y += 1; if (y == 0) y = 1 }
    }
    while (d < 1) {
      m -= 1
      if (m < 1) { m = 12; y -= 1; if (y == 0) y = -1 }
      d += daysInMonth(y, m)
    }
    (y, m, d)
  }

  // --------------------------------------- bounded-integer subtypes (facets)

  /** MinInclusive/MaxInclusive facets of the 12 bounded-integer subtypes,
    * exactly the reference's restriction tree (lib/rdf/xsd/datatypes/
    * long.ex etc. via lib/rdf/xsd/datatype/restriction.ex): each derived
    * type is xsd:integer's lexical space narrowed to a value range. */
  val integerFacets: Map[String, (Option[BigInt], Option[BigInt])] = {
    val x = Vocab.xsd
    Map(
      x + "long" -> (Some(BigInt("-9223372036854775808")), Some(BigInt("9223372036854775807"))),
      x + "int" -> (Some(BigInt(-2147483648L)), Some(BigInt(2147483647L))),
      x + "short" -> (Some(BigInt(-32768)), Some(BigInt(32767))),
      x + "byte" -> (Some(BigInt(-128)), Some(BigInt(127))),
      x + "nonNegativeInteger" -> (Some(BigInt(0)), None),
      x + "positiveInteger" -> (Some(BigInt(1)), None),
      x + "unsignedLong" -> (Some(BigInt(0)), Some(BigInt("18446744073709551615"))),
      x + "unsignedInt" -> (Some(BigInt(0)), Some(BigInt(4294967295L))),
      x + "unsignedShort" -> (Some(BigInt(0)), Some(BigInt(65535))),
      x + "unsignedByte" -> (Some(BigInt(0)), Some(BigInt(255))),
      x + "nonPositiveInteger" -> (None, Some(BigInt(0))),
      x + "negativeInteger" -> (None, Some(BigInt(-1))))
  }

  /** All datatype IRIs whose value space is (a subset of) the integers. */
  val integerFamily: Set[String] = integerFacets.keySet + Vocab.xsdInteger

  def validBoundedInteger(lex: String, datatypeIri: String): Boolean =
    validInteger(lex) && (integerFacets.get(datatypeIri) match {
      case Some((min, max)) =>
        val v = BigInt(lex)
        min.forall(v >= _) && max.forall(v <= _)
      case None => datatypeIri == Vocab.xsdInteger
    })

  // ------------------------------------------------ base64Binary and anyURI

  /** base64Binary: valid iff strictly decodable (base64_binary.ex
    * lexical_mapping = Base.decode64); canonical form = re-encoding of the
    * decoded bytes (canonical_mapping = Base.encode64). */
  def parseBase64(lex: String): Option[Array[Byte]] =
    try Some(java.util.Base64.getDecoder.decode(lex))
    catch { case _: IllegalArgumentException => None }

  def validBase64(lex: String): Boolean = parseBase64(lex).isDefined

  def canonicalBase64(lex: String): Option[String] =
    parseBase64(lex).map(java.util.Base64.getEncoder.encodeToString)

  /** anyURI: the reference parses with URI.parse, which never rejects —
    * every lexical is valid, canonical form is the lexical itself
    * (any_uri.ex lexical_mapping). */
  def validAnyUri(lex: String): Boolean = true

  // ---------------------------------------------------------- open registry

  /** One pluggable datatype: lexical validation + canonical mapping. */
  final case class DatatypeDef(valid: String => Boolean,
                               canonical: String => Option[String])

  /** Open datatype registry (the reference's extension point,
    * lib/rdf/model/literal/datatype/registry.ex): users register custom
    * datatypes keyed by IRI; `Xsd.valid`/`canonicalLexical` consult it
    * after the built-ins. Unknown unregistered datatypes behave like
    * RDF.Literal.Generic — opaque lexical, always valid. The registry is a
    * JVM-static map, so executors see registrations made in a static
    * initializer / library setup (the broadcastable-dictionary pattern). */
  object DatatypeRegistry {
    private val defs =
      new java.util.concurrent.ConcurrentHashMap[String, DatatypeDef]()
    def register(iri: String, d: DatatypeDef): Unit = defs.put(iri, d)
    def unregister(iri: String): Unit = defs.remove(iri)
    def get(iri: String): Option[DatatypeDef] = Option(defs.get(iri))
  }

  // --------------------------------------------------------------- dispatch

  /** Validity of a lexical form for a datatype IRI; unregistered unknown
    * datatypes are treated like RDF.Literal.Generic — always valid as
    * opaque lexical. */
  def valid(lexical: String, datatypeIri: String): Boolean = datatypeIri match {
    case Vocab.xsdBoolean => validBoolean(lexical)
    case Vocab.xsdInteger => validInteger(lexical)
    case Vocab.xsdDecimal => validDecimal(lexical)
    case Vocab.xsdDouble | Vocab.xsdFloat => validDouble(lexical)
    case Vocab.xsdDateTime => validDateTime(lexical)
    case Vocab.xsdDate => validDate(lexical)
    case Vocab.xsdTime => validTime(lexical)
    case Vocab.xsdBase64Binary => validBase64(lexical)
    case Vocab.xsdAnyUri => validAnyUri(lexical)
    case Vocab.rdfJson => Jcs.valid(lexical)
    case dt if integerFacets.contains(dt) => validBoundedInteger(lexical, dt)
    case dt => DatatypeRegistry.get(dt).forall(_.valid(lexical))
  }

  /** Canonical lexical form; identity for unknown/string datatypes, None for
    * invalid lexicals. */
  def canonicalLexical(lexical: String, datatypeIri: String): Option[String] =
    datatypeIri match {
      case Vocab.xsdBoolean => canonicalBoolean(lexical)
      case Vocab.xsdInteger => canonicalInteger(lexical)
      case Vocab.xsdDecimal => canonicalDecimal(lexical)
      case Vocab.xsdDouble | Vocab.xsdFloat => canonicalDouble(lexical)
      case Vocab.xsdDateTime => canonicalDateTime(lexical)
      case Vocab.xsdDate => canonicalDate(lexical)
      case Vocab.xsdTime => canonicalTime(lexical)
      case Vocab.xsdBase64Binary => canonicalBase64(lexical)
      case Vocab.xsdAnyUri => Some(lexical)
      case Vocab.rdfJson => Jcs.canonicalize(lexical)
      case dt if integerFacets.contains(dt) =>
        if (validBoundedInteger(lexical, dt)) canonicalInteger(lexical) else None
      case dt => DatatypeRegistry.get(dt) match {
        case Some(d) => d.canonical(lexical)
        case None => Some(lexical)
      }
    }

  /** Canonicalize a literal term in place (non-literals unchanged). */
  def canonicalTerm(t: Term): Term =
    if (t == null || !t.isLiteral) t
    else canonicalLexical(t.value, t.datatype) match {
      case Some(c) if c != t.value => t.copy(value = c)
      case _ => t
    }
}

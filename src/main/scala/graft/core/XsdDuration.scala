package graft.core

import scala.math.BigDecimal

/** The XSD duration family — xsd:duration plus the two XPath/XQuery
  * totally-ordered subtypes xsd:yearMonthDuration and xsd:dayTimeDuration
  * (XML Schema 1.1 §3.3.6, §3.4.26, §3.4.27).
  *
  * The REFERENCE does not implement these (lib/rdf/xsd/datatype.ex:34-56
  * marks the duration family ❌); like hexBinary/gYear in [[XsdExtra]] they
  * are provided as registrations against the open `Xsd.DatatypeRegistry`,
  * so the engine can validate/canonicalize duration literals found in web
  * data without touching the built-in dispatch.
  *
  * Value space (XSD 1.1): a (months, seconds) pair with one overall sign.
  * Canonical form: months normalized to `yY mM`, seconds normalized to
  * `dD hH mM s(.fff)S`, zero components omitted, fractional seconds
  * without trailing zeros, and the shortest all-zero forms `PT0S` /
  * `P0M` / `PT0S` for duration / yearMonthDuration / dayTimeDuration.
  */
object XsdDuration {

  val xsdDuration: String = Vocab.xsd + "duration"
  val xsdYearMonthDuration: String = Vocab.xsd + "yearMonthDuration"
  val xsdDayTimeDuration: String = Vocab.xsd + "dayTimeDuration"

  // XSD 1.1 duration lexical: -?P[nY][nM][nD][T[nH][nM][n(.n+)?S]] with at
  // least one component present and 'T' only when followed by a time
  // component. Fractions allowed only on seconds.
  private val durRe =
    ("^(-)?P(?:(\\d+)Y)?(?:(\\d+)M)?(?:(\\d+)D)?" +
      // duSecondFrag = [0-9]+ | [0-9]* '.' [0-9]+ : "PT.5S" is valid
      "(?:T(?:(\\d+)H)?(?:(\\d+)M)?(?:(\\d+(?:\\.\\d+)?|\\.\\d+)S)?)?$").r

  /** Parsed value: overall sign, total months, total seconds (both >= 0). */
  final case class Value(negative: Boolean, months: BigInt, seconds: BigDecimal) {
    def signedMonths: BigInt = if (negative) -months else months
    def signedSeconds: BigDecimal = if (negative) -seconds else seconds
  }

  def parse(lex: String): Option[Value] = lex match {
    case durRe(sign, y, mo, d, h, mi, s) =>
      val parts = Seq(y, mo, d, h, mi, s)
      // "P" alone, or a trailing bare "T" (T with no time fields), is invalid
      val hasAny = parts.exists(_ != null)
      val bareT = lex.contains("T") && Seq(h, mi, s).forall(_ == null)
      if (!hasAny || bareT) None
      else {
        def big(x: String): BigInt = if (x == null) BigInt(0) else BigInt(x)
        val months = big(y) * 12 + big(mo)
        val secs = BigDecimal(big(d)) * 86400 + BigDecimal(big(h)) * 3600 +
          BigDecimal(big(mi)) * 60 +
          (if (s == null) BigDecimal(0) else BigDecimal(s))
        Some(Value(sign != null && (months != 0 || secs != 0), months, secs))
      }
    case _ => None
  }

  def validDuration(lex: String): Boolean = parse(lex).isDefined

  /** yearMonthDuration restricts the lexical space to Y/M components only. */
  def validYearMonthDuration(lex: String): Boolean =
    parse(lex).isDefined && !lex.exists(c => c == 'D' || c == 'T')

  /** dayTimeDuration restricts the lexical space to D/H/M/S components. */
  def validDayTimeDuration(lex: String): Boolean =
    parse(lex).isDefined && {
      // no Y, and no M before any T (months M vs minutes M)
      val beforeT = lex.indexOf('T') match {
        case -1 => lex
        case i  => lex.substring(0, i)
      }
      !lex.contains("Y") && !beforeT.contains("M")
    }

  private def stripFraction(s: BigDecimal): String = {
    val plain = s.underlying.stripTrailingZeros.toPlainString
    if (plain == "-0") "0" else plain
  }

  /** Canonical form of an already-parsed value. `yearMonthOnly` restricts
    * output to the yearMonthDuration lexical space (Y/M components and the
    * `P0M` zero); the dayTimeDuration space needs no flag — validation
    * guarantees `months == 0`, so Y/M components never print. */
  def format(v: Value, yearMonthOnly: Boolean = false): String = {
    val sb = new StringBuilder
    if (v.negative && (v.months != 0 || v.seconds != 0)) sb += '-'
    sb += 'P'
    val y = v.months / 12
    val mo = v.months % 12
    if (y != 0) sb ++= s"${y}Y"
    if (mo != 0) sb ++= s"${mo}M"
    if (!yearMonthOnly) {
      val totalSecs = v.seconds
      val d = totalSecs.quot(86400).toBigInt
      val rem1 = totalSecs - BigDecimal(d) * 86400
      val h = rem1.quot(3600).toBigInt
      val rem2 = rem1 - BigDecimal(h) * 3600
      val mi = rem2.quot(60).toBigInt
      val s = rem2 - BigDecimal(mi) * 60
      if (d != 0) sb ++= s"${d}D"
      if (h != 0 || mi != 0 || s != 0) {
        sb += 'T'
        if (h != 0) sb ++= s"${h}H"
        if (mi != 0) sb ++= s"${mi}M"
        if (s != 0) sb ++= s"${stripFraction(s)}S"
      }
    }
    if (sb.last == 'P') { // all components zero: shortest zero form
      if (yearMonthOnly) sb ++= "0M" else sb ++= "T0S"
    }
    sb.result()
  }

  def canonicalDuration(lex: String): Option[String] = parse(lex).map(format(_))

  def canonicalYearMonthDuration(lex: String): Option[String] =
    // parse ONCE (these run per-literal inside Spark UDF canonicalization);
    // the subtype facet is a lexical check on top of the shared grammar
    parse(lex).filter(_ => !lex.exists(c => c == 'D' || c == 'T'))
      .map(format(_, yearMonthOnly = true))

  def canonicalDayTimeDuration(lex: String): Option[String] =
    parse(lex).filter { _ =>
      val beforeT = lex.indexOf('T') match {
        case -1 => lex
        case i  => lex.substring(0, i)
      }
      !lex.contains("Y") && !beforeT.contains("M")
    }.map(format(_))

  private def isLeap(y: Long): Boolean = (y % 4 == 0 && y % 100 != 0) || y % 400 == 0
  private val monthDays = Array(31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
  private def monthLen(y: Long, m0: Int): Long =
    if (m0 == 1 && isLeap(y)) 29 else monthDays(m0).toLong

  /** Exact day span of adding `months` (signed) to the first of month
    * `refM` of year `refY` per XSD dateTime arithmetic (day-of-month 1
    * never clamps): the signed sum of consecutive Gregorian month
    * lengths. O(1)-ish: the Gregorian calendar repeats every 400 years
    * (4800 months = 146097 days exactly), so only the residual < 4800
    * months is summed by iteration. */
  private def spanDays(refY: Int, refM: Int, months: Long): Long = {
    val cycleMonths = 4800L
    val cycleDays = 146097L
    val cycles = Math.floorDiv(months, cycleMonths)
    var rem = months - cycles * cycleMonths // in [0, 4800)
    var days = cycles * cycleDays
    var y = refY.toLong; var m = refM - 1 // 0-indexed current month
    while (rem > 0) {
      days += monthLen(y, m.toInt); m += 1; if (m == 12) { m = 0; y += 1 }
      rem -= 1
    }
    days
  }

  /** XSD 1.1's four reference dateTimes (§3.3.6.2, all at T00:00:00Z):
    * chosen so that an order that holds from all four holds from every
    * starting instant. */
  private val referenceStarts = Seq((1696, 9), (1697, 2), (1903, 3), (1903, 7))

  /** Month counts beyond Long range fall back to conservative 28/31-day
    * month bounds instead of exact spans — still never the wrong sign,
    * only (astronomically) indeterminate more often. */
  private val exactMonthCap = BigInt(Long.MaxValue / 40000)

  /** XSD order relation on durations is PARTIAL: `a < b` iff
    * `ref + a < ref + b` for ALL FOUR reference dateTimes of XSD 1.1
    * §3.3.6.2 — evaluated here exactly, with Gregorian month-length sums
    * per reference (e.g. P2M > P57D is determinate: two consecutive
    * months span at least 59 days from every reference). Subtypes are
    * totally ordered. Returns None when indeterminate. */
  def compare(a: Value, b: Value): Option[Int] = {
    val ma = a.signedMonths
    val mb = b.signedMonths
    val ds = (a.signedSeconds - b.signedSeconds)
    if (ma == mb) Some(ds.signum)
    else if (ma.abs > exactMonthCap || mb.abs > exactMonthCap) {
      val dm = ma - mb
      // conservative bounds: dm months spans between dm*28 and dm*31 days
      val loDays = if (dm > 0) dm * 28 else dm * 31
      val hiDays = if (dm > 0) dm * 31 else dm * 28
      val lo = BigDecimal(loDays) * 86400 + ds
      val hi = BigDecimal(hiDays) * 86400 + ds
      if (lo > 0) Some(1)
      else if (hi < 0) Some(-1)
      // NEVER Some(0) here: ma != mb means the values are componentwise
      // DISTINCT (XSD 1.1 equality is per-component), so a straddling
      // bound is indeterminate — the same rule the exact branch below
      // applies to all-zero reference signs
      else None
    } else {
      val signs = referenceStarts.map { case (y, mo) =>
        val dDays = spanDays(y, mo, ma.toLong) - spanDays(y, mo, mb.toLong)
        (BigDecimal(dDays) * 86400 + ds).signum
      }
      if (signs.forall(_ > 0)) Some(1)
      // ma != mb here: XSD 1.1 defines duration EQUALITY componentwise
      // (months, seconds), so two distinct values whose month difference
      // is a whole number of 400-year cycles with compensating seconds
      // (P400Y vs P146097D: 4800 months = 146097 days from every
      // reference) are order-indeterminate, not equal — all-zero signs
      // must yield None, never Some(0)
      else if (signs.forall(_ < 0)) Some(-1)
      else None
    }
  }

  def compareLexical(a: String, b: String): Option[Int] =
    for { va <- parse(a); vb <- parse(b); c <- compare(va, vb) } yield c

  /** Idempotent registration into the open datatype registry. */
  def register(): Unit = {
    Xsd.DatatypeRegistry.register(xsdDuration,
      Xsd.DatatypeDef(validDuration, canonicalDuration))
    Xsd.DatatypeRegistry.register(xsdYearMonthDuration,
      Xsd.DatatypeDef(validYearMonthDuration, canonicalYearMonthDuration))
    Xsd.DatatypeRegistry.register(xsdDayTimeDuration,
      Xsd.DatatypeDef(validDayTimeDuration, canonicalDayTimeDuration))
  }
}

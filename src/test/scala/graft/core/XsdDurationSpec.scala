package graft.core

import org.scalatest.funsuite.AnyFunSuite

class XsdDurationSpec extends AnyFunSuite {

  test("duration validation") {
    assert(XsdDuration.validDuration("P1Y2M3DT4H5M6S"))
    assert(XsdDuration.validDuration("P1Y"))
    assert(XsdDuration.validDuration("PT0S"))
    assert(XsdDuration.validDuration("P0Y"))
    assert(XsdDuration.validDuration("-P60D"))
    assert(XsdDuration.validDuration("PT1M30.5S"))
    assert(XsdDuration.validDuration("PT0.001S"))
    // XML Schema invalid forms
    assert(!XsdDuration.validDuration("P"))           // no components
    assert(!XsdDuration.validDuration("PT"))          // bare T
    assert(!XsdDuration.validDuration("P1YT"))        // trailing bare T
    assert(!XsdDuration.validDuration("P-1Y"))        // sign inside
    assert(!XsdDuration.validDuration("P1S"))         // seconds outside T
    assert(!XsdDuration.validDuration("PT1Y"))        // years inside T
    assert(!XsdDuration.validDuration("P1.5Y"))       // fraction not on seconds
    assert(!XsdDuration.validDuration("1Y"))          // missing P
    assert(!XsdDuration.validDuration(""))
  }

  test("duSecondFrag with no leading digits: PT.5S is valid, canonical PT0.5S") {
    assert(XsdDuration.validDuration("PT.5S"))
    assert(XsdDuration.canonicalDuration("PT.5S").contains("PT0.5S"))
    assert(XsdDuration.canonicalDayTimeDuration("-PT.25S").contains("-PT0.25S"))
    assert(!XsdDuration.validDuration("PT.S"))
  }

  test("duration canonical form: months and seconds normalized, zeros dropped") {
    def c(l: String) = XsdDuration.canonicalDuration(l)
    assert(c("P1Y2M3DT4H5M6S").contains("P1Y2M3DT4H5M6S"))
    assert(c("P13M").contains("P1Y1M"))               // months -> Y,M
    assert(c("P24M").contains("P2Y"))
    assert(c("PT25H").contains("P1DT1H"))             // hours -> D,H
    assert(c("PT86400S").contains("P1D"))
    assert(c("PT90061S").contains("P1DT1H1M1S"))
    assert(c("P0Y0M0DT0H0M0S").contains("PT0S"))      // all-zero shortest form
    assert(c("-P0D").contains("PT0S"))                // negative zero is zero
    assert(c("PT1M90S").contains("PT2M30S"))
    assert(c("PT1.500S").contains("PT1.5S"))          // trailing fraction zeros
    assert(c("PT1.000S").contains("PT1S"))
    assert(c("-PT36H").contains("-P1DT12H"))
    assert(c("P1Y0M0DT0H0M0S").contains("P1Y"))
  }

  test("yearMonthDuration facet: Y/M only, canonical shortest") {
    assert(XsdDuration.validYearMonthDuration("P1Y2M"))
    assert(XsdDuration.validYearMonthDuration("-P13M"))
    assert(!XsdDuration.validYearMonthDuration("P1D"))
    assert(!XsdDuration.validYearMonthDuration("PT1S"))
    assert(!XsdDuration.validYearMonthDuration("P1Y1D"))
    assert(XsdDuration.canonicalYearMonthDuration("P13M").contains("P1Y1M"))
    assert(XsdDuration.canonicalYearMonthDuration("P0Y").contains("P0M"))
    assert(XsdDuration.canonicalYearMonthDuration("-P0M").contains("P0M"))
    assert(XsdDuration.canonicalYearMonthDuration("P1D").isEmpty)
  }

  test("dayTimeDuration facet: D/H/M/S only, canonical shortest") {
    assert(XsdDuration.validDayTimeDuration("P3DT4H"))
    assert(XsdDuration.validDayTimeDuration("PT0.5S"))
    assert(XsdDuration.validDayTimeDuration("-PT1M"))
    assert(XsdDuration.validDayTimeDuration("PT1M"))  // minutes M is fine
    assert(!XsdDuration.validDayTimeDuration("P1M"))  // months M is not
    assert(!XsdDuration.validDayTimeDuration("P1Y"))
    assert(!XsdDuration.validDayTimeDuration("P1Y1D"))
    assert(XsdDuration.canonicalDayTimeDuration("PT25H").contains("P1DT1H"))
    assert(XsdDuration.canonicalDayTimeDuration("P0D").contains("PT0S"))
    assert(XsdDuration.canonicalDayTimeDuration("P1M").isEmpty)
  }

  test("partial order: subtypes total, mixed month/day indeterminate") {
    def cmp(a: String, b: String) = XsdDuration.compareLexical(a, b)
    assert(cmp("P1Y", "P13M").contains(-1))
    assert(cmp("P2Y", "P13M").contains(1))
    assert(cmp("P12M", "P1Y").contains(0))
    assert(cmp("PT1H", "PT61M").contains(-1))
    assert(cmp("-P1D", "PT0S").contains(-1))
    // the XSD spec's classic indeterminate pairs
    assert(cmp("P1M", "P30D").isEmpty)
    assert(cmp("P1M", "P28D").isEmpty)                // Feb makes them equal
    assert(cmp("P1M", "P27D").contains(1))            // shortest month is 28 days
    assert(cmp("P1M", "P32D").contains(-1))           // longest month is 31 days
    assert(cmp("P5M", "P150D").isEmpty)
    assert(cmp("-P1M", "-P27D").contains(-1))
    // exact four-reference-dateTime bounds (XSD 1.1 §3.3.6.2): two
    // consecutive months span 59..62 days over the references, so
    // P2M > P57D is DETERMINATE — the conservative 28·n..31·n per-month
    // bound (56..62) would wrongly call it indeterminate
    assert(cmp("P2M", "P57D").contains(1))
    assert(cmp("P2M", "P58D").contains(1))
    assert(cmp("P2M", "P59D").isEmpty)  // equal starting at 1697-02-01
    assert(cmp("P2M", "P62D").isEmpty)  // equal starting at 1903-07-01
    assert(cmp("P2M", "P63D").contains(-1))
    assert(cmp("-P2M", "-P57D").contains(-1))
    // DISTINCT values equal from all four references stay indeterminate,
    // not equal: XSD 1.1 equality is componentwise (months, seconds), and
    // P400Y vs P146097D differ componentwise even though 4800 months is
    // exactly 146097 days from every Gregorian starting instant
    assert(cmp("P400Y", "P146097D").isEmpty)
    assert(cmp("P400Y", "P4800M").contains(0)) // componentwise-equal stays 0
    assert(cmp("P800Y", "P292194D").isEmpty)   // two cycles, same rule
  }

  test("property: canonical form is a fixpoint and value-preserving (2000 random durations)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val sign = if (rnd.nextBoolean()) "-" else ""
      def part(u: String, max: Int) =
        if (rnd.nextBoolean()) s"${rnd.nextInt(max)}$u" else ""
      val date = part("Y", 30) + part("M", 40) + part("D", 500)
      val time = part("H", 50) + part("M", 200) +
        (if (rnd.nextBoolean()) f"${rnd.nextInt(90)}%d.${rnd.nextInt(1000)}%03dS" else "")
      val lex = s"${sign}P$date" + (if (time.nonEmpty) s"T$time" else "")
      if (XsdDuration.validDuration(lex)) {
        val c1 = XsdDuration.canonicalDuration(lex).get
        // fixpoint: canonicalizing a canonical form is the identity
        assert(XsdDuration.canonicalDuration(c1).contains(c1), s"$lex -> $c1")
        // value-preserving: same (months, seconds) pair
        val (v0, v1) = (XsdDuration.parse(lex).get, XsdDuration.parse(c1).get)
        assert(v0.signedMonths == v1.signedMonths && v0.signedSeconds == v1.signedSeconds,
          s"$lex -> $c1")
        // order: equal to itself through the comparator
        assert(XsdDuration.compareLexical(lex, c1).contains(0), s"$lex vs $c1")
      }
    }
  }

  test("registry integration: duration literals canonicalize via dispatch") {
    XsdDuration.register()
    assert(Xsd.valid("PT25H", XsdDuration.xsdDuration))
    assert(!Xsd.valid("P", XsdDuration.xsdDuration))
    assert(Xsd.canonicalLexical("PT25H", XsdDuration.xsdDuration)
      .contains("P1DT1H"))
    assert(Xsd.canonicalLexical("P13M", XsdDuration.xsdYearMonthDuration)
      .contains("P1Y1M"))
    assert(Xsd.canonicalLexical("PT86461S", XsdDuration.xsdDayTimeDuration)
      .contains("P1DT1M1S"))
    assert(!Xsd.valid("P1D", XsdDuration.xsdYearMonthDuration))
  }
}

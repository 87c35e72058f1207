package graft.core

import org.scalatest.funsuite.AnyFunSuite

class XsdOpsSpec extends AnyFunSuite {
  private def i(v: Long) = Term.int(v)
  private def dec(s: String) = Term.typedLit(s, Vocab.xsdDecimal)
  private def dbl(s: String) = Term.typedLit(s, Vocab.xsdDouble)

  test("numeric type promotion matrix (numeric.ex)") {
    // integer + integer -> integer
    assert(XsdOps.add(i(1), i(2)).contains(i(3)))
    // integer / integer -> DECIMAL
    assert(XsdOps.divide(i(1), i(2)).get.datatype == Vocab.xsdDecimal)
    assert(XsdOps.divide(i(1), i(2)).get.value == "0.5")
    // decimal + integer -> decimal
    assert(XsdOps.add(dec("1.5"), i(1)).get == dec("2.5"))
    // decimal + double -> double
    assert(XsdOps.add(dec("1.5"), dbl("1.0E0")).get.datatype == Vocab.xsdDouble)
    // double keeps double
    assert(XsdOps.multiply(dbl("2.0E0"), dbl("3.0E0")).contains(dbl("6.0E0")))
    // divide by zero invalid except double
    assert(XsdOps.divide(i(1), i(0)).isEmpty)
    assert(XsdOps.divide(dec("1.0"), dec("0.0")).isEmpty)
    assert(XsdOps.divide(dbl("1.0E0"), dbl("0.0E0")).contains(dbl("INF")))
  }

  test("abs round ceil floor") {
    assert(XsdOps.abs(i(-5)).contains(i(5)))
    assert(XsdOps.abs(dec("-1.5")).contains(dec("1.5")))
    assert(XsdOps.round(dec("2.5")).contains(dec("3.0")))
    assert(XsdOps.round(dec("-2.5")).contains(dec("-2.0"))) // half to +inf
    assert(XsdOps.round(dec("2.4449"), 2).contains(dec("2.44")))
    assert(XsdOps.ceil(dec("1.1")).contains(dec("2.0")))
    assert(XsdOps.floor(dec("-1.1")).contains(dec("-2.0")))
    assert(XsdOps.round(dbl("2.5E0")).contains(dbl("3.0E0")))
  }

  test("effective boolean value (boolean.ex ebv)") {
    assert(XsdOps.ebv(Term.bool(true)).contains(true))
    assert(XsdOps.ebv(Term.str("")).contains(false))
    assert(XsdOps.ebv(Term.str("x")).contains(true))
    assert(XsdOps.ebv(i(0)).contains(false))
    assert(XsdOps.ebv(i(7)).contains(true))
    assert(XsdOps.ebv(dbl("NaN")).contains(false))
    // invalid boolean lexical -> false
    assert(XsdOps.ebv(Term.typedLit("maybe", Vocab.xsdBoolean)).contains(false))
    // non-literal -> error
    assert(XsdOps.ebv(Term.iri("http://x")).isEmpty)
  }

  test("3-valued logic with error propagation") {
    assert(XsdOps.logicalAnd(Some(false), None).contains(false))
    assert(XsdOps.logicalAnd(Some(true), None).isEmpty)
    assert(XsdOps.logicalOr(Some(true), None).contains(true))
    assert(XsdOps.logicalOr(Some(false), None).isEmpty)
    assert(XsdOps.not(Term.str("")).contains(true))
  }

  test("cross-type compare") {
    assert(XsdOps.compare(i(1), dec("1.0")).contains(0))
    assert(XsdOps.lessThan(i(1), dbl("1.5E0")).contains(true))
    assert(XsdOps.compare(Term.str("a"), Term.str("b")).contains(-1))
    assert(XsdOps.compare(Term.bool(false), Term.bool(true)).contains(-1))
    assert(XsdOps.compare(
      Term.typedLit("2010-01-01T01:00:00+01:00", Vocab.xsdDateTime),
      Term.typedLit("2010-01-01T00:00:00Z", Vocab.xsdDateTime)).contains(0))
    // incomparable -> None (literal.ex returns nil)
    assert(XsdOps.compare(Term.str("1"), i(1)).isEmpty)
    assert(XsdOps.compare(dbl("NaN"), dbl("1.0E0")).isEmpty)
  }

  test("sortKey gives a numeric-consistent total order") {
    val terms = Seq(dec("-10.5"), i(-2), dec("0.0"), i(1), dec("1.5"), dbl("2.0E0"), i(100))
    val sorted = scala.util.Random.shuffle(terms).sortBy(XsdOps.sortKey)
    assert(sorted.map(t => XsdOps.parseNumeric(t).get.toDouble) ==
      Seq(-10.5, -2.0, 0.0, 1.0, 1.5, 2.0, 100.0))
  }

  test("sortKey: negative fractions, wide integers, specials (ADVICE r1)") {
    def k(t: Term) = XsdOps.sortKey(t)
    // -1.5 < -1 (empty negative fraction closes with the high sentinel)
    assert(k(dec("-1.5")) < k(i(-1)))
    assert(k(dec("-1.55")) < k(dec("-1.5")))
    // equal values, different lexicals -> identical keys
    assert(k(dec("1.50")) == k(dec("1.5")))
    assert(k(dec("-1.50")) == k(dec("-1.5")))
    // integer parts wider than the 20-digit pad stay ordered
    val big = Term.typedLit("1" + "0" * 20, Vocab.xsdInteger)       // 1e20
    val bigger = Term.typedLit("2" + "0" * 20, Vocab.xsdInteger)
    val huge = Term.typedLit("1" + "0" * 25, Vocab.xsdInteger)      // 1e25
    assert(k(i(Long.MaxValue)) < k(big))
    assert(k(big) < k(bigger))
    assert(k(bigger) < k(huge))
    assert(k(Term.typedLit("-" + "1" + "0" * 20, Vocab.xsdInteger)) <
      k(Term.typedLit("-" + "9" * 20, Vocab.xsdInteger)))
    assert(k(Term.typedLit("-" + "1" + "0" * 25, Vocab.xsdInteger)) <
      k(Term.typedLit("-" + "1" + "0" * 20, Vocab.xsdInteger)))
    // -INF < wide negative < negative < 0 < positive < wide positive < +INF < NaN
    val order = Seq(dbl("-INF"), Term.typedLit("-" + "1" + "0" * 20, Vocab.xsdInteger),
      i(-1), i(0), i(1), big, dbl("INF"), dbl("NaN"))
    assert(order.map(k) == order.map(k).sorted)
  }

  test("casts (do_cast rules)") {
    assert(XsdOps.cast(Term.bool(true), Vocab.xsdDouble).contains(dbl("1.0E0")))
    assert(XsdOps.cast(Term.bool(false), Vocab.xsdInteger).contains(i(0)))
    assert(XsdOps.cast(Term.str("3.14"), Vocab.xsdDecimal).contains(dec("3.14")))
    assert(XsdOps.cast(dec("3.14"), Vocab.xsdInteger).contains(i(3)))
    assert(XsdOps.cast(dbl("1.0E2"), Vocab.xsdInteger).contains(i(100)))
    assert(XsdOps.cast(i(42), Vocab.xsdString).contains(Term.str("42")))
    assert(XsdOps.cast(dbl("NaN"), Vocab.xsdInteger).isEmpty)
    assert(XsdOps.cast(Term.str("abc"), Vocab.xsdInteger).isEmpty)
    assert(XsdOps.cast(i(0), Vocab.xsdBoolean).contains(Term.bool(false)))
  }

  test("float/dateTime casts, invalid-to-string, BCE compare, NaN equality") {
    // SPARQL constructor table: xsd:float and xsd:dateTime
    val f = XsdOps.cast(Term.str("1.5"), Vocab.xsdFloat)
    assert(f.exists(t => t.datatype == Vocab.xsdFloat && t.value == "1.5E0"))
    val dtv = XsdOps.cast(Term.str("2020-01-01T10:00:00+01:00"), Vocab.xsdDateTime)
    assert(dtv.contains(Term.typedLit("2020-01-01T09:00:00Z", Vocab.xsdDateTime)))
    assert(XsdOps.cast(
      Term.typedLit("2020-05-06Z", Vocab.xsdDate), Vocab.xsdDateTime)
      .contains(Term.typedLit("2020-05-06T00:00:00Z", Vocab.xsdDateTime)))
    // casting an INVALID known-typed literal to xsd:string is an error
    assert(XsdOps.cast(Term.typedLit("abc", Vocab.xsdInteger), Vocab.xsdString).isEmpty)
    assert(XsdOps.cast(Term.typedLit("raw", "http://example.com/custom"),
      Vocab.xsdString).contains(Term.str("raw")))
    // XPath round: half toward +inf for negative integers at negative
    // precision (-25 @ -1 -> -20, not -30)
    assert(XsdOps.round(i(-25), -1).contains(i(-20)))
    assert(XsdOps.round(i(25), -1).contains(i(30)))
    // BCE and 5-digit years order numerically, not lexically
    def dt(s: String) = Term.typedLit(s, Vocab.xsdDateTime)
    assert(XsdOps.lessThan(dt("-0002-01-01T00:00:00Z"), dt("-0001-01-01T00:00:00Z"))
      .contains(true))
    assert(XsdOps.lessThan(dt("2020-01-01T00:00:00Z"), dt("12020-01-01T00:00:00Z"))
      .contains(true))
    // op:numeric-equal: NaN equals nothing, itself included
    assert(XsdOps.valueEqual(dbl("NaN"), dbl("NaN")).contains(false))
  }

  test("XPathRegex.matches: flag table from the reference's regex_test.exs") {
    import XPathRegex.matches
    val poem =
      "<poem author=\"Wilhelm Busch\">\n" +
        "Kaum hat dies der Hahn gesehen,\n" +
        "Fängt er auch schon an zu krähen:\n" +
        "Kikeriki! Kikikerikih!!\n" +
        "Tak, tak, tak! - da kommen sie.\n" +
        "</poem>\n"
    // without flags (fn:matches is contains-a-match)
    assert(matches("abracadabra", "bra"))
    assert(matches("abracadabra", "^a.*a$"))
    assert(!matches("abracadabra", "^bra"))
    assert(!matches(poem, "Kaum.*krähen"))
    assert(!matches(poem, "^Kaum.*gesehen,$"))
    assert(!matches("foobar", "foo$"))
    // with flags
    assert(matches(poem, "Kaum.*krähen", "s"))
    assert(matches(poem, "^Kaum.*gesehen,$", "m"))
    assert(matches(poem, "kiki", "i"))
    assert(matches("foobar", "foo bar", "x")) // x: PATTERN whitespace removed
    assert(!matches("foo bar", "foo bar", "x"))
    // q flag: literal-quoting, alone or with i; no effect with m/s/x
    assert(!matches("abcd", ".*", "q"))
    assert(matches("Mr. B. Obama", "B. OBAMA", "iq"))
    assert(matches("abcd", ".*", "mq"))
    assert(matches("abcd", ".*", "qim"))
    assert(matches("abcd", ".*", "xqm"))
    // escaped-backslash patterns stay literal
    val bs = "\\"
    assert(matches("noe" + bs + "u0308l", "noe" + bs + bs + "u0308l"))
    // \UXXXXXXXX astral escape: matches the actual supplementary char
    val astral = new String(Character.toChars(0x1D4B8))
    assert(matches("x" + astral + "y", bs + "U0001D4B8"))
    // but an ESCAPED \U stays a literal backslash + U
    assert(matches("x" + bs + "U0001D4B8y", bs + bs + "U0001D4B8"))
    // invalid flag raises, like the reference
    assertThrows[IllegalArgumentException](matches("a", "a", "z"))
    assert(XPathRegex.matchesTerm(Term.str("abracadabra"), "bra"))
  }
}

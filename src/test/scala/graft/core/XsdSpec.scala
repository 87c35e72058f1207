package graft.core

import org.scalatest.funsuite.AnyFunSuite

class XsdSpec extends AnyFunSuite {

  test("canonical boolean") {
    assert(Xsd.canonicalBoolean("true").contains("true"))
    assert(Xsd.canonicalBoolean("1").contains("true"))
    assert(Xsd.canonicalBoolean("0").contains("false"))
    assert(Xsd.canonicalBoolean("TRUE").isEmpty)
  }

  test("canonical integer") {
    assert(Xsd.canonicalInteger("042").contains("42"))
    assert(Xsd.canonicalInteger("+42").contains("42"))
    assert(Xsd.canonicalInteger("-042").contains("-42"))
    assert(Xsd.canonicalInteger("-0").contains("0"))
    assert(Xsd.canonicalInteger("0").contains("0"))
    assert(Xsd.canonicalInteger("1.0").isEmpty)
  }

  // reference table: test/unit/xsd/datatypes/decimal_test.exs:189-209
  test("canonical decimal matches reference canonical_decimal table") {
    val cases = Seq(
      "0" -> "0.0", "0.0" -> "0.0", "0.001" -> "0.001", "-0" -> "-0.0",
      "-1" -> "-1.0", "-0.00" -> "-0.0", "1.00" -> "1.0", "1000" -> "1000.0",
      "1000.000000" -> "1000.0", "12345.000" -> "12345.0", "42" -> "42.0",
      "42.42" -> "42.42", "0.42" -> "0.42", "0.0042" -> "0.0042",
      "010.020" -> "10.02", "-1.23" -> "-1.23", "-0.0123" -> "-0.0123",
      "1" -> "1.0", "01" -> "1.0", "1." -> "1.0", "1.000000000" -> "1.0",
      "+001.00" -> "1.0")
    for ((in, out) <- cases)
      assert(Xsd.canonicalDecimal(in).contains(out), s"decimal $in")
    assert(Xsd.canonicalDecimal("1E+2").isEmpty) // exponent not decimal syntax
    assert(Xsd.canonicalDecimal("foo").isEmpty)
  }

  // reference: double.ex:98-128 — exponential form, trailing-zero strip
  test("canonical double") {
    val cases = Seq(
      "1.0" -> "1.0E0", "0.1" -> "1.0E-1", "1" -> "1.0E0", "-1" -> "-1.0E0",
      "100" -> "1.0E2", "1.234E10" -> "1.234E10", "0" -> "0.0E0",
      "-0" -> "-0.0E0", "12.34" -> "1.234E1", "0.0000123" -> "1.23E-5",
      "1e3" -> "1.0E3", "+2.5" -> "2.5E0",
      "NaN" -> "NaN", "INF" -> "INF", "-INF" -> "-INF")
    for ((in, out) <- cases)
      assert(Xsd.canonicalDouble(in).contains(out), s"double $in -> expected $out got ${Xsd.canonicalDouble(in)}")
    assert(Xsd.canonicalDouble("abc").isEmpty)
  }

  test("canonical dateTime") {
    assert(Xsd.canonicalDateTime("2010-01-01T00:00:00Z").contains("2010-01-01T00:00:00Z"))
    assert(Xsd.canonicalDateTime("2010-01-01T01:00:00+01:00").contains("2010-01-01T00:00:00Z"))
    assert(Xsd.canonicalDateTime("2010-01-01T00:00:00-01:00").contains("2010-01-01T01:00:00Z"))
    assert(Xsd.canonicalDateTime("2009-12-31T23:30:00-01:00").contains("2010-01-01T00:30:00Z"))
    assert(Xsd.canonicalDateTime("2010-01-01T00:00:00").contains("2010-01-01T00:00:00"))
    assert(Xsd.canonicalDateTime("2010-01-01T00:00:00.500Z").contains("2010-01-01T00:00:00.5Z"))
    assert(Xsd.canonicalDateTime("2010-01-01T00:00:00.000Z").contains("2010-01-01T00:00:00Z"))
    // T24 rolls to next day (date_time.ex:58-67)
    assert(Xsd.canonicalDateTime("2009-12-31T24:00:00").contains("2010-01-01T00:00:00"))
    assert(Xsd.canonicalDateTime("2010-01-01T00:00:00-00:00").contains("2010-01-01T00:00:00Z"))
    // '+'-prefixed years rejected (date_time.ex:34)
    assert(Xsd.canonicalDateTime("+2010-01-01T00:00:00Z").isEmpty)
    assert(Xsd.canonicalDateTime("0000-01-01T00:00:00Z").isEmpty) // year 0 invalid
    assert(Xsd.canonicalDateTime("2010-02-30T00:00:00Z").isEmpty)
  }

  test("canonical date and time") {
    assert(Xsd.canonicalDate("2010-01-01").contains("2010-01-01"))
    assert(Xsd.canonicalDate("2010-01-01+00:00").contains("2010-01-01Z"))
    assert(Xsd.canonicalDate("2010-01-01+01:00").contains("2010-01-01+01:00"))
    assert(Xsd.canonicalDate("2010-13-01").isEmpty)
    assert(Xsd.canonicalTime("12:30:45").contains("12:30:45"))
    assert(Xsd.canonicalTime("13:30:45+01:00").contains("12:30:45Z"))
    assert(Xsd.canonicalTime("00:30:45+01:00").contains("23:30:45Z"))
    assert(Xsd.canonicalTime("25:30:45").isEmpty)
  }

  test("24:00:00, timezone range, and year leading zeros (XSD edges)") {
    // 24:00:00 is a valid time mapping to 00:00:00 (validDateTime's T24
    // case, extended to the time branch)
    assert(Xsd.valid("24:00:00", Vocab.xsdTime))
    assert(Xsd.canonicalTime("24:00:00").contains("00:00:00"))
    assert(Xsd.canonicalTime("24:00:00Z").contains("00:00:00Z"))
    assert(!Xsd.valid("24:00:01", Vocab.xsdTime))
    assert(!Xsd.valid("24:00:00.5", Vocab.xsdTime))
    // timezoneFrag: -14:00..+14:00, minutes <= 59
    assert(!Xsd.valid("2020-01-01T00:00:00+99:99", Vocab.xsdDateTime))
    assert(!Xsd.valid("2020-01-01+15:00", Vocab.xsdDate))
    assert(!Xsd.valid("12:00:00+14:01", Vocab.xsdTime))
    assert(Xsd.valid("2020-01-01T00:00:00+14:00", Vocab.xsdDateTime))
    assert(Xsd.valid("2020-01-01T00:00:00-13:59", Vocab.xsdDateTime))
    // yearFrag: no leading zero past four digits; canonicalDate pads like
    // canonicalDateTime so one value has one canonical key
    assert(!Xsd.valid("02020-01-01", Vocab.xsdDate))
    assert(!Xsd.valid("02020-01-01T00:00:00", Vocab.xsdDateTime))
    assert(Xsd.valid("12020-01-01", Vocab.xsdDate))
    assert(Xsd.canonicalDate("-0012-03-04").contains("-0012-03-04"))
  }

  test("canonicalTerm leaves non-literals and unknown datatypes alone") {
    val i = Term.iri("http://example.com/")
    assert(Xsd.canonicalTerm(i) == i)
    val g = Term.typedLit("raw", "http://example.com/custom")
    assert(Xsd.canonicalTerm(g) == g)
    assert(Xsd.canonicalTerm(Term.typedLit("042", Vocab.xsdInteger)).value == "42")
  }

  test("bounded-integer subtypes enforce MinInclusive/MaxInclusive facets") {
    val x = Vocab.xsd
    // reference facet table (long.ex etc.)
    assert(Xsd.valid("127", x + "byte")); assert(!Xsd.valid("128", x + "byte"))
    assert(Xsd.valid("-128", x + "byte")); assert(!Xsd.valid("-129", x + "byte"))
    assert(Xsd.valid("65535", x + "unsignedShort")); assert(!Xsd.valid("65536", x + "unsignedShort"))
    assert(!Xsd.valid("-1", x + "unsignedByte"))
    assert(Xsd.valid("0", x + "nonNegativeInteger")); assert(!Xsd.valid("-1", x + "nonNegativeInteger"))
    assert(!Xsd.valid("0", x + "positiveInteger")); assert(Xsd.valid("1", x + "positiveInteger"))
    assert(Xsd.valid("0", x + "nonPositiveInteger")); assert(!Xsd.valid("1", x + "nonPositiveInteger"))
    assert(Xsd.valid("-1", x + "negativeInteger")); assert(!Xsd.valid("0", x + "negativeInteger"))
    assert(Xsd.valid("18446744073709551615", x + "unsignedLong"))
    assert(!Xsd.valid("18446744073709551616", x + "unsignedLong"))
    assert(Xsd.valid("-9223372036854775808", x + "long"))
    assert(!Xsd.valid("9223372036854775808", x + "long"))
    // canonical form strips sign/zeros like the base integer
    assert(Xsd.canonicalLexical("+042", x + "short").contains("42"))
    assert(Xsd.canonicalLexical("300", x + "byte").isEmpty)
    // numeric ops see them as integers (XsdOps.parseNumeric)
    assert(XsdOps.add(Term.typedLit("40", x + "short"), Term.typedLit("2", x + "byte"))
      .contains(Term.int(42)))
    assert(XsdOps.parseNumeric(Term.typedLit("300", x + "byte")).isEmpty)
    // casts into bounded targets re-check the facet
    assert(XsdOps.cast(Term.int(200), x + "unsignedByte")
      .contains(Term.typedLit("200", x + "unsignedByte")))
    assert(XsdOps.cast(Term.int(300), x + "unsignedByte").isEmpty)
  }

  test("base64Binary: strict decode validity, canonical = re-encode") {
    assert(Xsd.valid("aGVsbG8=", Vocab.xsdBase64Binary))
    assert(!Xsd.valid("not base64!", Vocab.xsdBase64Binary))
    assert(Xsd.canonicalBase64("aGVsbG8=").contains("aGVsbG8="))
    assert(XsdOps.cast(Term.str("aGVsbG8="), Vocab.xsdBase64Binary)
      .contains(Term.typedLit("aGVsbG8=", Vocab.xsdBase64Binary)))
  }

  test("anyURI accepts every lexical, canonical is identity (any_uri.ex)") {
    assert(Xsd.valid("http://example.com/x", Vocab.xsdAnyUri))
    assert(Xsd.valid("relative/ref", Vocab.xsdAnyUri))
    assert(Xsd.canonicalLexical("relative/ref", Vocab.xsdAnyUri).contains("relative/ref"))
  }

  test("open datatype registry: custom datatypes plug into valid/canonical") {
    val dt = "http://example.com/evenInt"
    Xsd.DatatypeRegistry.register(dt, Xsd.DatatypeDef(
      valid = lex => Xsd.validInteger(lex) && BigInt(lex) % 2 == 0,
      canonical = lex =>
        if (Xsd.validInteger(lex) && BigInt(lex) % 2 == 0) Xsd.canonicalInteger(lex)
        else None))
    try {
      assert(Xsd.valid("042", dt) && !Xsd.valid("3", dt))
      assert(Xsd.canonicalLexical("042", dt).contains("42"))
      assert(Xsd.canonicalLexical("3", dt).isEmpty)
    } finally Xsd.DatatypeRegistry.unregister(dt)
    // unregistered again -> Generic semantics
    assert(Xsd.valid("3", dt))
  }
}

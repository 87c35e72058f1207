package graft.core

/** Extra XSD datatypes the REFERENCE does not implement (its tree marks
  * hexBinary and the gYear family as not-implemented), provided here as
  * registrations against the open `Xsd.DatatypeRegistry` — both useful in
  * web data and a working demonstration that the registry extension point
  * carries real datatypes, not just test stubs. Call `XsdExtra.register()`
  * once (idempotent) to enable them.
  */
object XsdExtra {

  val xsdHexBinary: String = Vocab.xsd + "hexBinary"
  val xsdGYear: String = Vocab.xsd + "gYear"
  val xsdGYearMonth: String = Vocab.xsd + "gYearMonth"

  private val hexRe = "^([0-9a-fA-F]{2})*$".r
  // gYear: '-'? yyyy + tz?. XML Schema: 4 digits minimum, and "if more than
  // four digits, leading zeros are prohibited" — 5+ digit years must start
  // with a nonzero digit ("02026" is invalid), while exactly-4 forms keep
  // their leading zeros ("0206" is year 206).
  private val gYearRe = "^(-?(?:[1-9]\\d{4,}|\\d{4}))(Z|[+-]\\d{2}:\\d{2})?$".r
  private val gYearMonthRe = "^(-?(?:[1-9]\\d{4,}|\\d{4}))-(\\d{2})(Z|[+-]\\d{2}:\\d{2})?$".r

  def validHexBinary(lex: String): Boolean = hexRe.matches(lex)
  /** Canonical hexBinary is UPPERCASE hex digits (XML Schema 1.1 §3.3.18). */
  def canonicalHexBinary(lex: String): Option[String] =
    if (validHexBinary(lex)) Some(lex.toUpperCase) else None

  // XSD 1.1 allows year 0000, so any regex match is valid
  def validGYear(lex: String): Boolean = gYearRe.matches(lex)

  def canonicalGYear(lex: String): Option[String] = lex match {
    case gYearRe(y, tz) if validGYear(lex) =>
      Some(y + (if (tz == "+00:00" || tz == "-00:00") "Z" else Option(tz).getOrElse("")))
    case _ => None
  }

  def validGYearMonth(lex: String): Boolean = lex match {
    case gYearMonthRe(_, m, _) => m.toInt >= 1 && m.toInt <= 12
    case _ => false
  }

  def canonicalGYearMonth(lex: String): Option[String] = lex match {
    case gYearMonthRe(y, m, tz) if validGYearMonth(lex) =>
      Some(s"$y-$m" + (if (tz == "+00:00" || tz == "-00:00") "Z" else Option(tz).getOrElse("")))
    case _ => None
  }

  /** Idempotent registration into the open datatype registry. */
  def register(): Unit = {
    Xsd.DatatypeRegistry.register(xsdHexBinary,
      Xsd.DatatypeDef(validHexBinary, canonicalHexBinary))
    Xsd.DatatypeRegistry.register(xsdGYear,
      Xsd.DatatypeDef(validGYear, canonicalGYear))
    Xsd.DatatypeRegistry.register(xsdGYearMonth,
      Xsd.DatatypeDef(validGYearMonth, canonicalGYearMonth))
  }
}

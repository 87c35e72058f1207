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
  val xsdGMonthDay: String = Vocab.xsd + "gMonthDay"
  val xsdGDay: String = Vocab.xsd + "gDay"
  val xsdGMonth: String = Vocab.xsd + "gMonth"
  val xsdNormalizedString: String = Vocab.xsd + "normalizedString"
  val xsdToken: String = Vocab.xsd + "token"
  val xsdLanguage: String = Vocab.xsd + "language"
  val xsdNmtoken: String = Vocab.xsd + "NMTOKEN"
  val xsdName: String = Vocab.xsd + "Name"
  val xsdNcName: String = Vocab.xsd + "NCName"

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

  // ---- gMonthDay / gDay / gMonth (XML Schema 1.1 §3.3.12-14) -------------
  // Shared shape: fixed '--'/'---' prefix, two digits per component,
  // optional timezone; canonical form keeps the lexical but rewrites a
  // ±00:00 timezone to 'Z' (the same rule gYear uses above). Day bounds use
  // the month's maximum (Feb allows 29: some year admits it).

  private val gMonthDayRe = "^--(\\d{2})-(\\d{2})(Z|[+-]\\d{2}:\\d{2})?$".r
  private val gDayRe = "^---(\\d{2})(Z|[+-]\\d{2}:\\d{2})?$".r
  private val gMonthRe = "^--(\\d{2})(Z|[+-]\\d{2}:\\d{2})?$".r
  private val maxDay =
    Array(31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)

  private def canonTz(tz: String): String =
    if (tz == "+00:00" || tz == "-00:00") "Z" else Option(tz).getOrElse("")

  def validGMonthDay(lex: String): Boolean = lex match {
    case gMonthDayRe(m, d, _) =>
      val mi = m.toInt
      mi >= 1 && mi <= 12 && d.toInt >= 1 && d.toInt <= maxDay(mi - 1)
    case _ => false
  }
  def canonicalGMonthDay(lex: String): Option[String] = lex match {
    case gMonthDayRe(m, d, tz) if validGMonthDay(lex) =>
      Some(s"--$m-$d" + canonTz(tz))
    case _ => None
  }

  def validGDay(lex: String): Boolean = lex match {
    case gDayRe(d, _) => d.toInt >= 1 && d.toInt <= 31
    case _ => false
  }
  def canonicalGDay(lex: String): Option[String] = lex match {
    case gDayRe(d, tz) if validGDay(lex) => Some(s"---$d" + canonTz(tz))
    case _ => None
  }

  def validGMonth(lex: String): Boolean = lex match {
    case gMonthRe(m, _) => m.toInt >= 1 && m.toInt <= 12
    case _ => false
  }
  def canonicalGMonth(lex: String): Option[String] = lex match {
    case gMonthRe(m, tz) if validGMonth(lex) => Some(s"--$m" + canonTz(tz))
    case _ => None
  }

  // ---- normalizedString family (XML Schema 1.1 §3.4.1-6) ------------------
  // RDF literals carry the lexical as-is, so validity checks membership in
  // the type's value space directly (no whitespace facet pre-processing —
  // the facet belongs to XML parsing, not to an already-materialized RDF
  // lexical): normalizedString forbids tab/LF/CR; token additionally
  // forbids leading/trailing/double spaces; language is the RFC 3066 shape
  // the XSD spec fixes as its pattern; NMTOKEN/Name/NCName use the XML 1.0
  // NameChar productions over full code points. Canonical mapping is
  // identity on valid lexicals for all six.

  def validNormalizedString(lex: String): Boolean =
    !lex.exists(c => c == '\t' || c == '\n' || c == '\r')

  def validToken(lex: String): Boolean =
    validNormalizedString(lex) && !lex.startsWith(" ") &&
      !lex.endsWith(" ") && !lex.contains("  ")

  private val languageRe = "^[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*$".r
  def validLanguage(lex: String): Boolean = languageRe.matches(lex)

  // XML 1.0 5th ed. NameStartChar / NameChar over code points
  private def isNameStartChar(cp: Int): Boolean =
    cp == ':' || cp == '_' ||
      (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
      (cp >= 0xC0 && cp <= 0xD6) || (cp >= 0xD8 && cp <= 0xF6) ||
      (cp >= 0xF8 && cp <= 0x2FF) || (cp >= 0x370 && cp <= 0x37D) ||
      (cp >= 0x37F && cp <= 0x1FFF) || (cp >= 0x200C && cp <= 0x200D) ||
      (cp >= 0x2070 && cp <= 0x218F) || (cp >= 0x2C00 && cp <= 0x2FEF) ||
      (cp >= 0x3001 && cp <= 0xD7FF) || (cp >= 0xF900 && cp <= 0xFDCF) ||
      (cp >= 0xFDF0 && cp <= 0xFFFD) || (cp >= 0x10000 && cp <= 0xEFFFF)
  private def isNameChar(cp: Int): Boolean =
    isNameStartChar(cp) || cp == '-' || cp == '.' ||
      (cp >= '0' && cp <= '9') || cp == 0xB7 ||
      (cp >= 0x300 && cp <= 0x36F) || (cp >= 0x203F && cp <= 0x2040)

  private def codePoints(lex: String): Iterator[Int] = {
    val it = lex.codePoints().iterator()
    new Iterator[Int] {
      def hasNext: Boolean = it.hasNext
      def next(): Int = it.nextInt()
    }
  }

  def validNmtoken(lex: String): Boolean =
    lex.nonEmpty && codePoints(lex).forall(isNameChar)

  def validName(lex: String): Boolean = {
    val cps = codePoints(lex).toArray
    cps.nonEmpty && isNameStartChar(cps.head) && cps.tail.forall(isNameChar)
  }

  def validNcName(lex: String): Boolean =
    validName(lex) && !lex.contains(":")

  private def identityIfValid(valid: String => Boolean): Xsd.DatatypeDef =
    Xsd.DatatypeDef(valid, lex => if (valid(lex)) Some(lex) else None)

  /** Idempotent registration into the open datatype registry. */
  def register(): Unit = {
    Xsd.DatatypeRegistry.register(xsdHexBinary,
      Xsd.DatatypeDef(validHexBinary, canonicalHexBinary))
    Xsd.DatatypeRegistry.register(xsdGYear,
      Xsd.DatatypeDef(validGYear, canonicalGYear))
    Xsd.DatatypeRegistry.register(xsdGYearMonth,
      Xsd.DatatypeDef(validGYearMonth, canonicalGYearMonth))
    Xsd.DatatypeRegistry.register(xsdGMonthDay,
      Xsd.DatatypeDef(validGMonthDay, canonicalGMonthDay))
    Xsd.DatatypeRegistry.register(xsdGDay,
      Xsd.DatatypeDef(validGDay, canonicalGDay))
    Xsd.DatatypeRegistry.register(xsdGMonth,
      Xsd.DatatypeDef(validGMonth, canonicalGMonth))
    Xsd.DatatypeRegistry.register(xsdNormalizedString,
      identityIfValid(validNormalizedString))
    Xsd.DatatypeRegistry.register(xsdToken, identityIfValid(validToken))
    Xsd.DatatypeRegistry.register(xsdLanguage, identityIfValid(validLanguage))
    Xsd.DatatypeRegistry.register(xsdNmtoken, identityIfValid(validNmtoken))
    Xsd.DatatypeRegistry.register(xsdName, identityIfValid(validName))
    Xsd.DatatypeRegistry.register(xsdNcName, identityIfValid(validNcName))
  }
}

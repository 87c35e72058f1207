package graft.core

import java.util.regex.Pattern

/** XPath/XQuery `fn:matches` flavoured regex matching — the reference's
  * `RDF.XSD.Utils.Regex` (lib/rdf/xsd/utils/regex.ex:17-100) behind
  * `RDF.Literal.matches?/3` (lib/rdf/model/literal.ex:345-359).
  *
  * Flags (XQuery 1.0/XPath 2.0 F&O §7.6.1.1):
  *  - `i` case-insensitive, `s` dot-matches-newline, `m` multiline,
  *    `x` whitespace/comments ignored in the pattern
  *  - `q` quotes the pattern (all characters literal). Like the reference,
  *    `q` alone or with `i` switches to plain (case-folded) substring
  *    containment; combined with `m`/`s`/`x` the quoting is dropped and the
  *    pattern compiles as a regex ("if the q flag is used together with
  *    m, s or x, that flag has no effect" — the reference's reading).
  *
  * `\UXXXXXXXX` (8 hex digits) converts to Java's `\x{...}` astral escape
  * when the backslash is itself unescaped (even number of preceding
  * backslashes). fn:matches is CONTAINS-a-match, not full-match.
  */
object XPathRegex {

  def matches(value: String, pattern: String, flags: String = ""): Boolean = {
    if (qLiteral(flags)) {
      if (flags.contains('i'))
        value.toLowerCase.contains(pattern.toLowerCase)
      else value.contains(pattern)
    } else compile(pattern, flags).matcher(value).find()
  }

  /** `q` takes effect only alone or with `i` (regex.ex:47-51). */
  def qLiteral(flags: String): Boolean =
    flags.contains('q') && flags.forall(c => c == 'q' || c == 'i')

  /** Compile an XPath pattern+flags to a Java Pattern; throws
    * IllegalArgumentException on an unknown flag or bad pattern. */
  def compile(pattern: String, flags: String): Pattern = {
    var f = 0
    flags.foreach {
      case 'i' => f |= Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE
      case 's' => f |= Pattern.DOTALL
      case 'm' => f |= Pattern.MULTILINE
      case 'x' => f |= Pattern.COMMENTS
      case 'q' => // stripped before compiling (regex.ex:97-99)
      case c => throw new IllegalArgumentException(s"invalid XPath regex flag '$c'")
    }
    Pattern.compile(convertUtfEscaping(pattern), f)
  }

  /** Inline-flag prefix form of the same translation, for engines that take
    * one pattern string (Spark `rlike`): "(?ism x)" + converted pattern.
    * Only for the regex path — check [[qLiteral]] first. */
  def inlinePattern(pattern: String, flags: String): String = {
    flags.foreach { c =>
      if ("ismxq".indexOf(c.toInt) < 0)
        throw new IllegalArgumentException(s"invalid XPath regex flag '$c'")
    }
    // 'i' inlines as "iu": the compiled twin sets CASE_INSENSITIVE |
    // UNICODE_CASE, and bare (?i) is ASCII-only in Java regex — the two
    // paths would disagree on any non-ASCII case-insensitive match
    val fs = flags.distinct.flatMap {
      case 'i' => "iu"
      case c if "smx".indexOf(c.toInt) >= 0 => c.toString
      case _ => "" // 'q' is handled by quoting, not an inline flag
    }
    (if (fs.nonEmpty) s"(?$fs)" else "") + convertUtfEscaping(pattern)
  }

  private val utfEscape = Pattern.compile("(\\\\*)\\\\U([0-9A-Fa-f]{8})")

  /** `\UXXXXXXXX` -> `\x{XXXXXXXX}` when the `\U` backslash is unescaped
    * (an even number of backslashes precedes it); escaped forms pass
    * through untouched (regex.ex:63-81, spec-correct variant). */
  def convertUtfEscaping(pattern: String): String = {
    val m = utfEscape.matcher(pattern)
    // java.lang.StringBuilder: the 3-arg (CharSequence, start, end) append
    // exists there; scala's StringBuilder would auto-tuple the arguments
    // into append(Any)
    val sb = new java.lang.StringBuilder
    var last = 0
    while (m.find()) {
      sb.append(pattern, last, m.start())
      val escapes = m.group(1)
      if (escapes.length % 2 == 0)
        sb.append(escapes).append("\\x{").append(m.group(2)).append("}")
      else sb.append(m.group(0)) // the \U itself is escaped: literal
      last = m.end()
    }
    sb.append(pattern, last, pattern.length)
    sb.toString
  }

  /** Literal.matches?/3: match a TERM's lexical form. */
  def matchesTerm(t: Term, pattern: String, flags: String = ""): Boolean =
    matches(t.value, pattern, flags)
}

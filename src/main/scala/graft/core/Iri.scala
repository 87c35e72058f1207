package graft.core

/** IRI toolkit: RFC 3987 validation, RFC 3986 §5.2 base resolution, scheme
  * extraction, prefix tests, and percent-encoding normalization.
  *
  * Behavior mirrors the reference (`lib/rdf/model/iri.ex:149-354`,
  * `lib/rdf/model/iri/validation.ex`): IRIs stay unparsed strings; only the
  * basic RFC 3986 §5.2 algorithm is used for resolution (no syntax-based or
  * scheme-based normalization). Percent-encoding normalization is an
  * addition beyond the reference (uppercase hex digits, decode unreserved).
  */
object Iri {

  // RFC 3987 absolute-IRI validation regex (same grammar as the reference's
  // validation.ex, recomposed for java.util.regex).
  private val ucschar =
    "\\x{00A0}-\\x{D7FF}\\x{F900}-\\x{FDCF}\\x{FDF0}-\\x{FFEF}" +
      "\\x{10000}-\\x{1FFFD}\\x{20000}-\\x{2FFFD}\\x{30000}-\\x{3FFFD}" +
      "\\x{40000}-\\x{4FFFD}\\x{50000}-\\x{5FFFD}\\x{60000}-\\x{6FFFD}" +
      "\\x{70000}-\\x{7FFFD}\\x{80000}-\\x{8FFFD}\\x{90000}-\\x{9FFFD}" +
      "\\x{A0000}-\\x{AFFFD}\\x{B0000}-\\x{BFFFD}\\x{C0000}-\\x{CFFFD}" +
      "\\x{D0000}-\\x{DFFFD}\\x{E1000}-\\x{EFFFD}"
  private val iprivate = "[\\x{E000}-\\x{F8FF}\\x{F0000}-\\x{FFFFD}\\x{100000}-\\x{10FFFD}]"
  private val schemePat = "[A-Za-z](?:[A-Za-z0-9+\\-\\.])*"
  private val port = "[0-9]*"
  private val ipLiteral = "\\[[0-9A-Fa-f:\\.]*\\]" // simplified, no IPvFuture
  private val pctEncoded = "%[0-9A-Fa-f][0-9A-Fa-f]"
  private val subDelims = "[!\\$&'\\(\\)\\*\\+,;=]"
  private val iunreserved = s"(?:[A-Za-z0-9\\._~\\-$ucschar])"
  private val ipchar = s"(?:$iunreserved|$pctEncoded|$subDelims|[:@])"
  private val iquery = s"(?:$ipchar|$iprivate|/|\\?)*"
  private val ifragment = s"(?:$ipchar|/|\\?)*"
  private val isegment = s"(?:$ipchar)*"
  private val isegmentNz = s"(?:$ipchar)+"
  private val ipathAbempty = s"(?:/$isegment)*"
  private val ipathAbsolute = s"/(?:$isegmentNz(?:/$isegment)*)?"
  private val ipathRootless = s"$isegmentNz(?:/$isegment)*"
  private val iregName = s"(?:$iunreserved|$pctEncoded|$subDelims)*"
  private val ihost = s"(?:$ipLiteral|$iregName)"
  private val iuserinfo = s"(?:$iunreserved|$pctEncoded|$subDelims|:)*"
  private val iauthority = s"(?:$iuserinfo@)?$ihost(?::$port)?"
  private val ihierPart =
    s"(?://$iauthority$ipathAbempty)|(?:$ipathAbsolute)|(?:$ipathRootless)|"

  private val iriPattern = java.util.regex.Pattern.compile(
    s"^$schemePat:(?:$ihierPart)(?:\\?$iquery)?(?:#$ifragment)?$$")

  def valid(iri: String): Boolean =
    iri != null && iriPattern.matcher(iri).matches()

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*):".r

  /** Scheme of an absolute IRI, else null (iri.ex:262-274). */
  def scheme(iri: String): String =
    schemeRe.findFirstMatchIn(iri).map(_.group(1)).orNull

  def isAbsolute(iri: String): Boolean = iri != null && scheme(iri) != null

  // --- RFC 3986 §5.2 components: (scheme, authority, path, query, fragment)
  // authority/query/fragment are null when absent (important for §5.3).
  private[core] def parts(ref: String): (String, String, String, String, String) = {
    var rest = ref
    var frag: String = null
    val h = rest.indexOf('#')
    if (h >= 0) { frag = rest.substring(h + 1); rest = rest.substring(0, h) }
    var query: String = null
    val q = rest.indexOf('?')
    if (q >= 0) { query = rest.substring(q + 1); rest = rest.substring(0, q) }
    var sch: String = null
    val m = schemeRe.findFirstMatchIn(rest)
    if (m.isDefined) { sch = m.get.group(1); rest = rest.substring(m.get.end) }
    var auth: String = null
    if (rest.startsWith("//")) {
      val afterAuth = rest.indexWhere(c => c == '/' || c == '?' || c == '#', 2)
      if (afterAuth < 0) { auth = rest.substring(2); rest = "" }
      else { auth = rest.substring(2, afterAuth); rest = rest.substring(afterAuth) }
    }
    (sch, auth, rest, query, frag)
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[core] def removeDotSegments(path: String): String = {
    val out = new StringBuilder
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        val i = out.lastIndexOf("/")
        out.setLength(if (i >= 0) i else 0)
      } else if (in == "/..") {
        in = "/"
        val i = out.lastIndexOf("/")
        out.setLength(if (i >= 0) i else 0)
      } else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val i = in.indexOf('/', start)
        if (i < 0) { out.append(in); in = "" }
        else { out.append(in.substring(0, i)); in = in.substring(i) }
      }
    }
    out.toString
  }

  /** RFC 3986 §5.2.3 merge paths. */
  private def mergePaths(baseAuth: String, basePath: String, refPath: String): String =
    if (baseAuth != null && basePath.isEmpty) "/" + refPath
    else {
      val i = basePath.lastIndexOf('/')
      if (i < 0) refPath else basePath.substring(0, i + 1) + refPath
    }

  /** RFC 3986 §5.2 transform-reference + §5.3 recomposition. Returns null if
    * base is not absolute (iri.ex:218-231). */
  def resolve(ref: String, base: String): String = {
    if (ref == null) return null // a null href column reaches the UDF
    if (isAbsolute(ref)) {
      // strict §5.2.2: an absolute reference still gets its path
      // dot-segments removed ("s:a/../b" resolves to "s:b")
      val (rs, ra, rp, rq, rf) = parts(ref)
      val sb = new StringBuilder
      sb.append(rs).append(':')
      if (ra != null) sb.append("//").append(ra)
      sb.append(removeDotSegments(rp))
      if (rq != null) sb.append('?').append(rq)
      if (rf != null) sb.append('#').append(rf)
      return sb.toString
    }
    if (!isAbsolute(base)) return null
    val (bs, ba, bp, bq, _) = parts(base)
    val (rs, ra, rp, rq, rf) = parts(ref)
    var (ts, ta, tp, tq) = (bs, ba, "", bq)
    // rs is always null here (isAbsolute(ref) returned above)
    if (ra != null) { ta = ra; tp = removeDotSegments(rp); tq = rq }
    else if (rp.isEmpty) { tp = bp; tq = if (rq != null) rq else bq }
    else {
      tp = if (rp.startsWith("/")) removeDotSegments(rp)
      else removeDotSegments(mergePaths(ba, bp, rp))
      tq = rq
    }
    val sb = new StringBuilder
    sb.append(ts).append(':')
    if (ta != null) sb.append("//").append(ta)
    sb.append(tp)
    if (tq != null) sb.append('?').append(tq)
    if (rf != null) sb.append('#').append(rf)
    sb.toString
  }

  /** Prefix tests (iri.ex:300-354). */
  def inNamespace(iri: String, ns: String): Boolean = iri.startsWith(ns)

  /** Percent-encoding normalization (RFC 3986 §6.2.2.1-2, north-star addition
    * beyond the reference): hex digits uppercased; encodings of unreserved
    * characters decoded. */
  def normalizePercentEncoding(iri: String): String = {
    if (iri == null || iri.indexOf('%') < 0) return iri
    val sb = new StringBuilder(iri.length)
    var i = 0
    while (i < iri.length) {
      val c = iri.charAt(i)
      if (c == '%' && i + 2 < iri.length &&
          isHex(iri.charAt(i + 1)) && isHex(iri.charAt(i + 2))) {
        val v = Integer.parseInt(iri.substring(i + 1, i + 3), 16)
        val ch = v.toChar
        if (v < 128 && (Character.isLetterOrDigit(ch) || ch == '-' || ch == '.' || ch == '_' || ch == '~'))
          sb.append(ch)
        else
          sb.append('%').append(Character.toUpperCase(iri.charAt(i + 1)))
            .append(Character.toUpperCase(iri.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
}

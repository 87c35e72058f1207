package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass HTML field extraction as a native Catalyst expression.
  *
  * The extraction hot path needs three fields per page — title, first href,
  * body text — which as `regexp_extract` Columns cost three full regex
  * scans (plus three UTF8String->String conversions) per row. This
  * expression computes all three in ONE index-scan pass and stays inside
  * whole-stage codegen (`doGenCode` emits a static call, like Spark's own
  * string built-ins). On the 100 TB crawl table this is the
  * bytes-per-second limiter, so per-byte cost here is the scaling lever.
  *
  * Semantics are byte-equivalent to the regexes they replace:
  *   title: `<title>([^<]*)</title>` — first `<title>` whose content runs
  *          to a `</title>`
  *   href:  `href="([^"]*)"` — first occurrence
  *   text:  `<p>(.*)</p>` — greedy, `.` excludes line terminators (Java
  *          regex default): first `<p>` with a `</p>` on the same line,
  *          content to the LAST same-line `</p>`
  * No match yields "" (empty string), matching `regexp_extract`.
  */
case class HtmlParts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = HtmlScan.schema
  override def prettyName: String = "html_parts"

  override def nullSafeEval(input: Any): Any =
    HtmlScan.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HtmlScan.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlParts =
    copy(child = newChild)
}

/** Static scan kernel (separate object so the codegen'd Java can call the
  * static forwarder directly). */
object HtmlScan {

  val schema: StructType = StructType(Seq(
    StructField("title", StringType, nullable = false),
    StructField("href", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  // Java-regex '.' exclusions: LF, CR, NEL, LS, PS
  private def isLineTerminator(c: Char): Boolean =
    c == '\n' || c == '\r' || c.toInt == 0x85 || c.toInt == 0x2028 || c.toInt == 0x2029

  def extract(u: UTF8String): InternalRow = {
    val s = u.toString
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(title(s)),
      UTF8String.fromString(href(s)),
      UTF8String.fromString(text(s))))
  }

  /** `<title>([^<]*)</title>`: at each `<title>` occurrence the content is
    * the run of non-'<' chars; it matches iff that run is closed by
    * `</title>`. */
  def title(s: String): String = {
    var i = s.indexOf("<title>")
    while (i >= 0) {
      val j = i + 7
      val k = s.indexOf('<', j)
      if (k < 0) return ""
      if (s.startsWith("</title>", k)) return s.substring(j, k)
      i = s.indexOf("<title>", i + 1)
    }
    ""
  }

  /** `href="([^"]*)"`: first `href="`, content to the next quote. */
  def href(s: String): String = {
    val i = s.indexOf("href=\"")
    if (i < 0) return ""
    val j = i + 6
    val k = s.indexOf('"', j)
    if (k < 0) "" else s.substring(j, k)
  }

  /** `<p>(.*)</p>` with Java-regex `.` (no line terminators), greedy: for
    * each `<p>`, content runs to the LAST `</p>` before the next line
    * terminator; first `<p>` with such a close wins. */
  def text(s: String): String = {
    var i = s.indexOf("<p>")
    while (i >= 0) {
      val j = i + 3
      var limit = j
      while (limit < s.length && !isLineTerminator(s.charAt(limit))) limit += 1
      val k = s.lastIndexOf("</p>", limit - 4)
      if (k >= j) return s.substring(j, k)
      i = s.indexOf("<p>", i + 1)
    }
    ""
  }
}

package graft.expressions

import java.util.regex.Pattern
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HtmlParts is only allowed to exist because it is byte-equivalent to the
  * regexp_extract columns it replaces — this spec is that contract. */
class HtmlPartsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def re(p: String, s: String): String = {
    val m = Pattern.compile(p).matcher(s)
    if (m.find()) m.group(1) else ""
  }

  private val adversarial = Seq(
    "<html><head><title>Doc 1</title></head><body><p>hello world</p><a href=\"/doc/2\">x</a></body></html>",
    "<title></title><p></p>",                        // empty captures
    "<title>no close",                               // unterminated title
    "<title>a<b></title>",                           // '<' inside title run
    "<title>x</title><title>y</title>",              // first-match wins
    "no markup at all",
    "<p>a</p><p>b</p>",                              // greedy: last close
    "<p>a</p>\n<p>b</p>",                            // '.' stops at newline
    "<p>line1\nstill open</p>",                      // close on other line
    "<p>nested <p>inner</p> tail</p>",               // closes at LAST </p>
    "href=\"first\" href=\"second\"",
    "href=\"unterminated",
    "<p>before <title>t</title> after</p> href=\"h\"",
    "<title>almost</titl><title>real</title>",       // bad close then good
    "<p>nel</p>", "<p>a b</p><p>c</p>",    // unicode terminators
    "<p>trail</p>x", "x<p></p>", "<p></p></p>")

  test("HtmlScan.title/href/text are byte-equivalent to the regexes") {
    for (s <- adversarial) {
      assert(HtmlScan.title(s) == re("<title>([^<]*)</title>", s), s"title: $s")
      assert(HtmlScan.href(s) == re("href=\"([^\"]*)\"", s), s"href: $s")
      assert(HtmlScan.text(s) == re("<p>(.*)</p>", s), s"text: $s")
    }
  }

  test("random fuzz parity against java.util.regex") {
    val rnd = new scala.util.Random(20260816)
    val atoms = Seq("<p>", "</p>", "<title>", "</title>", "href=\"", "\"",
      "a", "<", ">", "\n", "x y", " ")
    for (_ <- 1 to 2000) {
      val s = Seq.fill(rnd.nextInt(12))(atoms(rnd.nextInt(atoms.size))).mkString
      assert(HtmlScan.title(s) == re("<title>([^<]*)</title>", s), s"title: ${s.replace("\n", "\\n")}")
      assert(HtmlScan.href(s) == re("href=\"([^\"]*)\"", s), s"href: ${s.replace("\n", "\\n")}")
      assert(HtmlScan.text(s) == re("<p>(.*)</p>", s), s"text: ${s.replace("\n", "\\n")}")
    }
  }

  test("Spark plan parity: HtmlParts fields == regexp_extract columns") {
    import spark.implicits._
    import graft.pipeline.WebKg
    val docs = Seq(
      (0L, "the customer joins a part order", "en", "src0", 31L),
      (9L, "no title page text", "de", "src1", 18L),
      (10L, "dup page text spark", "en", "src1", 19L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val pages = WebKg.synthesizeWebPages(docs)
    val cmp = pages.select(
      WebKg.htmlParts(col("html")).as("hp"),
      WebKg.extractedTitle.as("rt"), WebKg.extractedHref.as("rh"),
      WebKg.extractedText.as("rx"))
    val bad = cmp.filter(col("hp.title") =!= col("rt") ||
      col("hp.href") =!= col("rh") || col("hp.text") =!= col("rx"))
    assert(bad.isEmpty, bad.collect().mkString("\n"))
  }

  test("html_parts is callable from SQL after function registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT html_parts('<html><title>t</title><p>body</p></html>') AS hp")
      .select("hp.title", "hp.text").collect().head
    assert(r.getString(0) == "t" && r.getString(1) == "body")
  }

  test("HtmlParts stays inside whole-stage codegen (no fallback)") {
    import graft.pipeline.WebKg
    // a range source forces a real codegen stage (a local Seq would be
    // evaluated as LocalTableScan with no stage at all)
    val df = spark.range(10)
      .select(concat(lit("<html><title>t"), col("id"),
        lit("</title><p>b</p></html>")).as("html"))
      .select(WebKg.htmlParts(col("html")).as("hp"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project") && plan.contains("html_parts"), plan)
    assert(df.count() == 10)
  }
}

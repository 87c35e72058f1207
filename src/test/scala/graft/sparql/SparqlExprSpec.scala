package graft.sparql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Term, Vocab}
import graft.engine.Terms
import Ast._

class SparqlExprSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  private val px =
    "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"

  /** Parse one expression by wrapping it in a SELECT projection. */
  private def parseExpr(s: String): Expr =
    SparqlParser.parse(px + s"SELECT (($s) AS ?r) WHERE {}")
      .asInstanceOf[Select].projection.head._1

  /** Evaluate an expression over a one-row frame with `env` variables. */
  private def eval(exprStr: String, env: Map[String, Term] = Map.empty): Term = {
    var df = spark.range(1).toDF()
    for ((n, t) <- env) df = df.withColumn(n, Terms.constTerm(t))
    val envC = env.keys.map(n => n -> col(n)).toMap
    val c = SparqlExpr.compile(parseExpr(exprStr), envC)
    val row = df.select(c.as("r")).collect().head
    if (row.isNullAt(0)) null
    else {
      val r = row.getStruct(0)
      Term(r.getByte(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3))
    }
  }

  private def T(v: String, dt: String) = Term.typedLit(v, dt)

  test("arithmetic: exact integers, double promotion, division") {
    assert(eval("1 + 2") == Term.int(3))
    assert(eval("7 - 10") == Term.int(-3))
    assert(eval("6 * 7") == Term.int(42))
    assert(eval("3 * 2.5") == T("7.5", Vocab.xsdDouble))
    assert(eval("10 / 4") == T("2.5", Vocab.xsdDouble))
    assert(eval("?x + 1", Map("x" -> Term.int(5))) == Term.int(6))
    // long overflow is a type error, not a wrap
    assert(eval("9223372036854775807 + 1") == null)
    // non-numeric operand is a type error
    assert(eval("1 + \"a\"") == null)
    assert(eval("-(5)") == Term.int(-5))
  }

  test("comparisons across numeric, string, boolean, dateTime") {
    assert(eval("2 < 10") == Term.bool(true))
    assert(eval("2 >= 10") == Term.bool(false))
    assert(eval("\"a\" < \"b\"") == Term.bool(true))
    assert(eval("false < true") == Term.bool(true))
    assert(eval("\"2020-01-01T00:00:00\"^^xsd:dateTime < \"2021-06-01T00:00:00\"^^xsd:dateTime")
      == Term.bool(true))
    assert(eval("2 < \"a\"") == null) // incomparable -> error
  }

  test("RDFterm-equal: value equality by type, term identity otherwise") {
    assert(eval("\"1\"^^xsd:integer = \"01\"^^xsd:integer") == Term.bool(true))
    assert(eval("sameTerm(\"1\"^^xsd:integer, \"01\"^^xsd:integer)") == Term.bool(false))
    assert(eval("\"chat\"@en = \"chat\"@EN") == Term.bool(true))
    assert(eval("\"chat\"@en = \"chat\"") == Term.bool(false))
    assert(eval("<http://a> = <http://a>") == Term.bool(true))
    assert(eval("<http://a> != <http://b>") == Term.bool(true))
    // RDFterm-equal: distinct literals in incomparable value spaces -> error
    assert(eval("1 = \"x\"") == null)
    assert(eval("\"x\"^^<http://unknown/dt> = \"y\"^^<http://unknown/dt>") == null)
    assert(eval("\"x\"^^<http://unknown/dt> = \"x\"^^<http://unknown/dt>") == Term.bool(true))
  }

  test("EBV and three-valued logic match the spec's error tables") {
    assert(eval("1 && true") == Term.bool(true))
    assert(eval("!(\"\")") == Term.bool(true))
    assert(eval("\"x\" || false") == Term.bool(true))
    // error || true = true; error && false = false; error otherwise propagates
    assert(eval("(1 < \"a\") || true") == Term.bool(true))
    assert(eval("(1 < \"a\") && false") == Term.bool(false))
    assert(eval("(1 < \"a\") || false") == null)
    assert(eval("(1 < \"a\") && true") == null)
    // invalid numeric lexical has EBV false
    assert(eval("!(\"zzz\"^^xsd:integer)") == Term.bool(true))
  }

  test("string functions") {
    assert(eval("STRLEN(\"chat\")") == Term.int(4))
    assert(eval("UCASE(\"foo\"@en)") == Term.langLit("FOO", "en"))
    assert(eval("LCASE(\"BAR\")") == Term.str("bar"))
    assert(eval("CONTAINS(\"foobar\", \"oba\")") == Term.bool(true))
    assert(eval("STRSTARTS(\"foobar\", \"foo\")") == Term.bool(true))
    assert(eval("STRENDS(\"foobar\", \"bar\")") == Term.bool(true))
    assert(eval("SUBSTR(\"foobar\", 4)") == Term.str("bar"))
    assert(eval("SUBSTR(\"foobar\", 4, 2)") == Term.str("ba"))
    assert(eval("CONCAT(\"a\", \"b\", \"c\")") == Term.str("abc"))
    assert(eval("CONCAT(\"a\"@en, \"b\"@en)") == Term.langLit("ab", "en"))
    assert(eval("CONCAT(\"a\"@en, \"b\"@fr)") == Term.str("ab"))
    assert(eval("STRBEFORE(\"abc\", \"b\")") == Term.str("a"))
    assert(eval("STRAFTER(\"abc\", \"b\")") == Term.str("c"))
    assert(eval("STRAFTER(\"abc\", \"\")") == Term.str("abc"))
    assert(eval("STRBEFORE(\"abc\", \"xyz\")") == Term.str(""))
    assert(eval("REPLACE(\"abcd\", \"b\", \"Z\")") == Term.str("aZcd"))
    assert(eval("ENCODE_FOR_URI(\"a b/~\")") == Term.str("a%20b%2F~"))
    assert(eval("STRLEN(1)") == null) // non-string argument -> error
  }

  test("REGEX with XPath flags, constant and dynamic") {
    assert(eval("REGEX(\"abc\", \"^AB\", \"i\")") == Term.bool(true))
    assert(eval("REGEX(\"abc\", \"^ab\")") == Term.bool(true))
    assert(eval("REGEX(\"abc\", \"^B\")") == Term.bool(false))
    // dynamic pattern goes through the XPathRegex UDF
    assert(eval("REGEX(\"abc\", ?p)", Map("p" -> Term.str("a.c"))) == Term.bool(true))
    assert(eval("LANGMATCHES(LANG(\"x\"@en-US), \"en\")") == Term.bool(true))
    assert(eval("LANGMATCHES(LANG(\"x\"@fr), \"en\")") == Term.bool(false))
    assert(eval("LANGMATCHES(LANG(\"x\"@fr), \"*\")") == Term.bool(true))
  }

  test("term accessors and constructors") {
    assert(eval("STR(<http://a/b>)") == Term.str("http://a/b"))
    assert(eval("STR(42)") == Term.str("42"))
    assert(eval("LANG(\"x\"@en)") == Term.str("en"))
    assert(eval("LANG(\"x\")") == Term.str(""))
    assert(eval("DATATYPE(1)") == Term.iri(Vocab.xsdInteger))
    assert(eval("DATATYPE(\"x\")") == Term.iri(Vocab.xsdString))
    assert(eval("IRI(\"http://z\")") == Term.iri("http://z"))
    assert(eval("STRDT(\"5\", xsd:byte)") == T("5", Vocab.xsd + "byte"))
    assert(eval("STRLANG(\"x\", \"en\")") == Term.langLit("x", "en"))
    assert(eval("isIRI(<http://x>)") == Term.bool(true))
    assert(eval("isLiteral(1)") == Term.bool(true))
    assert(eval("isBlank(1)") == Term.bool(false))
    assert(eval("isNumeric(\"5\"^^xsd:integer)") == Term.bool(true))
    assert(eval("isNumeric(\"x\")") == Term.bool(false))
  }

  test("BOUND, COALESCE, IF over unbound variables") {
    val env = Map("x" -> Term.int(1))
    assert(eval("BOUND(?x)", env) == Term.bool(true))
    assert(eval("BOUND(?y)", env) == Term.bool(false))
    assert(eval("COALESCE(?y, 5)", env) == Term.int(5))
    assert(eval("IF(1 > 2, \"then\", \"else\")") == Term.str("else"))
    assert(eval("IF(1 < \"a\", 1, 2)") == null) // erroring condition -> error
  }

  test("IN / NOT IN") {
    assert(eval("2 IN (1, 2, 3)") == Term.bool(true))
    assert(eval("2 NOT IN (3, 4)") == Term.bool(true))
    assert(eval("2 IN ()") == Term.bool(false))
    assert(eval("<http://a> IN (<http://a>)") == Term.bool(true))
  }

  test("numeric rounding family") {
    assert(eval("ABS(-2.5)") == T("2.5", Vocab.xsdDouble))
    assert(eval("ABS(-3)") == Term.int(3))
    assert(eval("CEIL(2.2)") == T("3.0", Vocab.xsdDouble))
    assert(eval("FLOOR(2.8)") == T("2.0", Vocab.xsdDouble))
    assert(eval("ROUND(2.5)") == T("3.0", Vocab.xsdDouble))
    assert(eval("ROUND(-2.5)") == T("-2.0", Vocab.xsdDouble)) // XPath half-ceiling
  }

  test("dateTime component accessors") {
    val dtl = "\"2011-01-10T14:45:13.815-05:00\"^^xsd:dateTime"
    assert(eval(s"YEAR($dtl)") == Term.int(2011))
    assert(eval(s"MONTH($dtl)") == Term.int(1))
    assert(eval(s"DAY($dtl)") == Term.int(10))
    assert(eval(s"HOURS($dtl)") == Term.int(14))
    assert(eval(s"MINUTES($dtl)") == Term.int(45))
    assert(eval(s"SECONDS($dtl)") == T("13.815", Vocab.xsdDecimal))
    assert(eval(s"TZ($dtl)") == Term.str("-05:00"))
    assert(eval(s"TIMEZONE($dtl)") == T("-PT5H", Vocab.xsd + "dayTimeDuration"))
    assert(eval("TZ(\"2011-01-10T14:45:13\"^^xsd:dateTime)") == Term.str(""))
  }

  test("hashes") {
    assert(eval("MD5(\"abc\")") == Term.str("900150983cd24fb0d6963f7d28e17f72"))
    assert(eval("SHA256(\"abc\")") ==
      Term.str("ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"))
  }

  test("datatype casts bridge to XsdOps.cast") {
    assert(eval("xsd:integer(\"42\")") == Term.int(42))
    assert(eval("xsd:boolean(\"1\")") == Term.bool(true))
    assert(eval("xsd:double(1)") == T("1.0E0", Vocab.xsdDouble))
    assert(eval("xsd:byte(300)") == null) // facet violation -> error
    assert(eval("xsd:integer(\"abc\")") == null)
  }

  test("RDF-star accessors") {
    val q = Term.quoted(graft.core.Triple(
      Term.iri("http://s"), Term.iri("http://p"), Term.int(5)))
    assert(eval("SUBJECT(?t)", Map("t" -> q)) == Term.iri("http://s"))
    assert(eval("OBJECT(?t)", Map("t" -> q)) == Term.int(5))
    assert(eval("isTRIPLE(?t)", Map("t" -> q)) == Term.bool(true))
  }
}

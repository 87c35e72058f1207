package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Skolem, Term, Vocab, XsdOps}

/** Parity between the Column twins in Terms and their Scala-API originals:
  * the whole point of the Column versions is to keep the hot path inside
  * whole-stage codegen WITHOUT changing a byte of output. */
class TermsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("intSortKey Column == XsdOps.sortKey for non-negative integers") {
    import spark.implicits._
    val lexes = Seq("0", "1", "7", "42", "100", "99999", "12345678901234567890",
      // past 20 digits: the length-header form, never lpad truncation
      "123456789012345678901", "999999999999999999999999999999")
    val got = lexes.toDF("lex")
      .select(col("lex"), Terms.intSortKey(col("lex")).as("k"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for (lex <- lexes)
      assert(got(lex) == XsdOps.sortKey(Term.typedLit(lex, Vocab.xsdInteger)),
        s"intSortKey mismatch for $lex")
  }

  test("skolemLabel Column == Skolem.label") {
    import spark.implicits._
    val rows = Seq(("http://ex.org/page/1", "author"),
      ("http://ex.org/page/2", "b0"), ("urn:x", ""))
    val got = rows.toDF("scope", "local")
      .select(col("scope"), col("local"),
        Terms.skolemLabel(col("scope"), col("local")).as("sk"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    for ((scope, local) <- rows)
      assert(got((scope, local)) == Skolem.label(scope, local))
  }

  test("skolemLabel plan contains no UDF") {
    import spark.implicits._
    val df = Seq("a").toDF("x")
      .select(Terms.skolemLabel(col("x"), lit("l")).as("sk"))
    assert(!df.queryExecution.executedPlan.toString.contains("UDF"))
  }

  test("matchesPattern: fn:matches as a pure Column (no UDF)") {
    import spark.implicits._
    val df = Seq("abracadabra", "Mr. B. Obama", "line1\nKaum x").toDF("x")
    def n(pattern: String, flags: String = "") =
      df.filter(Terms.matchesPattern(col("x"), pattern, flags)).count()
    assert(n("bra") == 1)
    assert(n("^bra") == 0)
    assert(n("B. OBAMA", "iq") == 1) // literal-quoted, case-folded contains
    assert(n(".*", "q") == 0)        // quoted: no row contains literal ".*"
    assert(n("^Kaum", "m") == 1)     // multiline
    val plan = df.filter(Terms.matchesPattern(col("x"), "bra", "i"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"))
  }

  test("Column uuidV3Hex equals the kernel computation, UDF-free") {
    import spark.implicits._
    import graft.core.Generators
    val ns = Generators.namespaceDns
    val names = Seq("python.org", "http://example.org/doc/1", "", "über")
    val df = names.toDF("name")
    val got = df.select(col("name"), Terms.uuidV3Hex(ns, col("name")).as("u"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for (n <- names)
      assert(got(n) == Generators.uuidV3Hex(ns, n), n)
    val plan = df.select(Terms.uuidV3Hex(ns, col("name")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"))
    // dashed + urn formats
    val dashed = df.select(Terms.uuidDashed(Terms.uuidV3Hex(ns, col("name"))))
      .head().getString(0)
    assert(dashed == Generators.dashed(Generators.uuidV3Hex(ns, "python.org")) ||
      dashed.matches("[0-9a-f]{8}(-[0-9a-f]{4}){3}-[0-9a-f]{12}"))
  }

  test("incrementIds issues deterministic counter ids in the given order") {
    import spark.implicits._
    val df = Seq(("c", 3), ("a", 1), ("b", 2)).toDF("k", "v")
    val ids = Graphs.incrementIds(df, Seq(col("k")), prefix = "b")
      .collect().map(r => r.getAs[String]("k") -> r.getAs[String]("gen_id")).toMap
    assert(ids == Map("a" -> "b0", "b" -> "b1", "c" -> "b2"))
  }
}

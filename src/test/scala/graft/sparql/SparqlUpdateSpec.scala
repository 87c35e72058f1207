package graft.sparql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Quad, Term, TermKind, Triple}

class SparqlUpdateSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private val ex = "http://ex.org/"
  private def i(s: String) = Term.iri(ex + s)
  private val P = s"PREFIX : <$ex>\n"

  private def triples: DataFrame = {
    import spark.implicits._
    Seq(
      Triple(i("a"), i("p"), Term.int(1)),
      Triple(i("a"), i("q"), Term.int(2)),
      Triple(i("b"), i("p"), Term.int(3))
    ).toDF()
  }

  private def quads: DataFrame = {
    import spark.implicits._
    Seq(
      Quad(i("a"), i("p"), Term.int(1), null),
      Quad(i("a"), i("p"), Term.int(2), i("g1")),
      Quad(i("b"), i("p"), Term.int(3), i("g2"))
    ).toDF()
  }

  private def upd(data: DataFrame, text: String): DataFrame =
    Sparql.update(spark, data, P + text)

  private def lines(df: DataFrame): Set[String] = {
    val cols = df.columns
    df.collect().map { r =>
      cols.indices.map(j => if (r.isNullAt(j)) "-" else {
        val s = r.getStruct(j); s"${s.getByte(0)}:${s.getString(1)}"
      }).mkString(" ")
    }.toSet
  }

  test("INSERT DATA adds set-semantically; triple shape preserved") {
    val out = upd(triples, "INSERT DATA { :c :p 9 . :a :p 1 }")
    assert(out.columns.toSeq == Seq("s", "p", "o"))
    assert(out.count() == 4) // :a :p 1 already present
    assert(lines(out).contains(s"0:${ex}c 0:${ex}p 2:9"))
  }

  test("INSERT DATA into a named graph promotes triples to quads") {
    val out = upd(triples, "INSERT DATA { GRAPH :g9 { :c :p 9 } }")
    assert(out.columns.toSeq == Seq("s", "p", "o", "g"))
    assert(out.filter(out("g").isNotNull).count() == 1)
  }

  test("INSERT DATA bnodes mint fresh labels once per operation") {
    val out = upd(triples, "INSERT DATA { _:x :p 7 . _:x :q 8 }")
    val bn = out.filter(out("s")("kind") === TermKind.BNODE)
    assert(bn.count() == 2)
    // one bnode shared by both inserted triples
    assert(bn.select(bn("s")("value")).distinct().count() == 1)
  }

  test("DELETE DATA removes exactly the ground quads") {
    val out = upd(triples, "DELETE DATA { :a :q 2 . :zz :p 0 }")
    assert(out.count() == 2)
    assert(!lines(out).exists(_.contains(s"${ex}q")))
  }

  test("DELETE WHERE uses the pattern as both match and template") {
    val out = upd(triples, "DELETE WHERE { ?s :p ?o }")
    assert(lines(out) == Set(s"0:${ex}a 0:${ex}q 2:2"))
  }

  test("DELETE/INSERT WHERE rewrites solutions") {
    val out = upd(triples,
      """DELETE { ?s :p ?o } INSERT { ?s :renamed ?o } WHERE { ?s :p ?o }""")
    assert(out.count() == 3)
    assert(out.filter(out("p")("value") === ex + "renamed").count() == 2)
    assert(out.filter(out("p")("value") === ex + "p").count() == 0)
  }

  test("INSERT-only modify with FILTER") {
    val out = upd(triples,
      "INSERT { ?s :big true } WHERE { ?s :p ?o FILTER(?o >= 3) }")
    assert(out.count() == 4)
    assert(lines(out).contains(s"0:${ex}b 0:${ex}big 2:true"))
  }

  test("template bnodes in INSERT mint per solution") {
    val out = upd(triples,
      "INSERT { ?s :card [ :v ?o ] } WHERE { ?s :p ?o }")
    // 2 solutions × 2 template triples + 3 original
    assert(out.count() == 7)
    val bn = out.filter(out("o")("kind") === TermKind.BNODE)
    assert(bn.select(bn("o")("value")).distinct().count() == 2)
  }

  test("WITH pins WHERE and templates to one named graph") {
    val out = upd(quads,
      "WITH :g1 DELETE { ?s :p ?o } INSERT { ?s :p2 ?o } WHERE { ?s :p ?o }")
    val g1 = out.filter(out("g").isNotNull &&
      out("g")("value") === ex + "g1")
    assert(lines(g1) == Set(s"0:${ex}a 0:${ex}p2 2:2 0:${ex}g1"))
    // default graph and g2 untouched
    assert(out.filter(out("g").isNull).count() == 1)
  }

  test("GRAPH blocks in templates and patterns") {
    val out = upd(quads,
      "DELETE WHERE { GRAPH ?g { ?s :p ?o } }")
    assert(out.count() == 1) // only the default-graph quad survives
    val out2 = upd(quads,
      "INSERT { GRAPH :g3 { ?s :copied ?o } } WHERE { GRAPH :g1 { ?s :p ?o } }")
    assert(out2.filter(out2("g").isNotNull &&
      out2("g")("value") === ex + "g3").count() == 1)
  }

  test("CLEAR / DROP family") {
    assert(upd(quads, "CLEAR DEFAULT").count() == 2)
    assert(upd(quads, "CLEAR NAMED").count() == 1)
    assert(upd(quads, "CLEAR ALL").count() == 0)
    assert(upd(quads, "CLEAR GRAPH :g1").count() == 2)
    assert(upd(quads, "DROP SILENT GRAPH :g2").count() == 2)
    assert(upd(quads, "CREATE GRAPH :gnew").count() == 3) // no-op
  }

  test("ADD / MOVE / COPY graphs") {
    val add = upd(quads, "ADD DEFAULT TO :g1")
    assert(add.count() == 4)
    val move = upd(quads, "MOVE GRAPH :g1 TO GRAPH :g2")
    assert(move.filter(move("g").isNotNull &&
      move("g")("value") === ex + "g1").count() == 0)
    assert(move.filter(move("g").isNotNull &&
      move("g")("value") === ex + "g2").count() == 1)
    assert(lines(move).exists(_.endsWith(s"2:2 0:${ex}g2")))
    val copy = upd(quads, "COPY GRAPH :g1 TO GRAPH :g2")
    assert(copy.count() == 3)
    assert(lines(copy).exists(_.endsWith(s"2:2 0:${ex}g2")))
  }

  test("operations compose left to right with ';'") {
    val out = upd(triples,
      """INSERT DATA { :c :p 9 } ;
        |DELETE WHERE { ?s :p ?o } ;
        |INSERT DATA { :done :p 1 }""".stripMargin)
    assert(lines(out) == Set(s"0:${ex}a 0:${ex}q 2:2",
      s"0:${ex}done 0:${ex}p 2:1"))
  }

  test("update errors: vars in DATA, bnodes in DELETE, LOAD, USING") {
    def fails(s: String, frag: String): Unit = {
      val e = intercept[RuntimeException](upd(triples, s))
      assert(e.getMessage.contains(frag), s"got: ${e.getMessage}")
    }
    fails("INSERT DATA { ?s :p 1 }", "variables are not allowed")
    fails("DELETE DATA { _:b :p 1 }", "blank nodes are not allowed")
    fails("DELETE { _:b :p 1 } WHERE { ?s :p ?o }", "blank nodes are not allowed")
    fails("LOAD <http://x>", "LOAD is not supported")
    fails("DELETE { ?s :p ?o } USING <http://g> WHERE { ?s :p ?o }",
      "USING dataset clauses are not supported")
  }
}

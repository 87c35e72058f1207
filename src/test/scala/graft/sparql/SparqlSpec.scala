package graft.sparql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Quad, Term, Triple}

class SparqlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  private val ex = "http://ex.org/"
  private def i(s: String) = Term.iri(ex + s)

  private def triples: DataFrame = {
    import spark.implicits._
    Seq(
      Triple(i("alice"), i("knows"), i("bob")),
      Triple(i("bob"), i("knows"), i("carol")),
      Triple(i("alice"), i("likes"), i("dave")),
      Triple(i("alice"), i("name"), Term.str("Alice")),
      Triple(i("bob"), i("name"), Term.str("Bob")),
      Triple(i("carol"), i("name"), Term.str("Carol")),
      Triple(i("dave"), i("name"), Term.str("Dave")),
      Triple(i("alice"), i("age"), Term.int(30)),
      Triple(i("bob"), i("age"), Term.int(25)),
      Triple(i("carol"), i("age"), Term.int(35)),
      Triple(i("dave"), i("age"), Term.int(25))
    ).toDF()
  }

  private def quads: DataFrame = {
    import spark.implicits._
    Seq(
      Quad(i("alice"), i("name"), Term.str("Alice"), null),
      Quad(i("alice"), i("knows"), i("bob"), i("g1")),
      Quad(i("bob"), i("knows"), i("carol"), i("g1")),
      Quad(i("alice"), i("knows"), i("carol"), i("g2"))
    ).toDF()
  }

  private val P = s"PREFIX : <$ex>\nPREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"

  /** Run a SELECT and flatten to value strings, as a set of row lists
    * (null stays null). */
  private def vals(q: String, data: DataFrame = triples): Set[List[String]] =
    graft.engine.Bgp.values(Sparql.select(spark, data, P + q))
      .collect().map(r => (0 until r.length).map(j =>
        if (r.isNullAt(j)) null else r.getString(j)).toList).toSet

  private def valsOrdered(q: String, data: DataFrame = triples): List[List[String]] =
    graft.engine.Bgp.values(Sparql.select(spark, data, P + q))
      .collect().map(r => (0 until r.length).map(j =>
        if (r.isNullAt(j)) null else r.getString(j)).toList).toList

  private def cols(q: String, data: DataFrame = triples): Seq[String] =
    Sparql.select(spark, data, P + q).columns.toSeq

  test("basic BGP with filter and projection") {
    val r = vals("SELECT ?n WHERE { ?p :age ?a ; :name ?n FILTER(?a > 26) }")
    assert(r == Set(List("Alice"), List("Carol")))
  }

  test("SELECT * follows textual mention order") {
    assert(cols("SELECT * WHERE { ?who :name ?n . ?who :age ?a }")
      == Seq("who", "n", "a"))
  }

  test("OPTIONAL leaves unmatched rows with NULL (unbound)") {
    val r = vals(
      """SELECT ?n ?friend WHERE {
        |  ?p :name ?n OPTIONAL { ?p :knows ?friend }
        |}""".stripMargin)
    assert(r == Set(
      List("Alice", ex + "bob"), List("Bob", ex + "carol"),
      List("Carol", null), List("Dave", null)))
  }

  test("UNION aligns columns by name") {
    val r = vals(
      "SELECT ?x WHERE { { ?x :knows :bob } UNION { ?x :knows :carol } }")
    assert(r == Set(List(ex + "alice"), List(ex + "bob")))
  }

  test("MINUS removes compatible solutions") {
    val r = vals(
      "SELECT ?p WHERE { ?p :age ?a MINUS { ?p :knows ?y } }")
    assert(r == Set(List(ex + "carol"), List(ex + "dave")))
  }

  test("FILTER EXISTS / NOT EXISTS, also nested inside an expression") {
    val r1 = vals("SELECT ?n WHERE { ?p :name ?n FILTER EXISTS { ?p :knows ?q } }")
    assert(r1 == Set(List("Alice"), List("Bob")))
    val r2 = vals("SELECT ?n WHERE { ?p :name ?n FILTER NOT EXISTS { ?p :knows ?q } }")
    assert(r2 == Set(List("Carol"), List("Dave")))
    // EXISTS composed with || — needs the flag-column form
    val r3 = vals(
      """SELECT ?n WHERE { ?p :name ?n ; :age ?a
        |  FILTER(?a >= 35 || EXISTS { ?p :knows ?q }) }""".stripMargin)
    assert(r3 == Set(List("Alice"), List("Bob"), List("Carol")))
  }

  test("BIND and SELECT expressions") {
    val r = vals(
      """SELECT ?n ?y WHERE {
        |  ?p :name ?n ; :age ?a BIND(?a + 10 AS ?y) FILTER(?y <= 35)
        |}""".stripMargin)
    assert(r == Set(List("Bob", "35"), List("Dave", "35")))
    val r2 = vals(
      "SELECT (UCASE(?n) AS ?u) WHERE { :alice :name ?n }")
    assert(r2 == Set(List("ALICE")))
  }

  test("VALUES constrains and can introduce unbound cells") {
    val r = vals(
      """SELECT ?p ?a WHERE {
        |  ?p :age ?a VALUES ?p { :alice :carol }
        |}""".stripMargin)
    assert(r == Set(List(ex + "alice", "30"), List(ex + "carol", "35")))
  }

  test("property paths: sequence, alternative, inverse") {
    assert(vals("SELECT ?x WHERE { :alice :knows/:knows ?x }")
      == Set(List(ex + "carol")))
    assert(vals("SELECT ?x WHERE { :alice :knows|:likes ?x }")
      == Set(List(ex + "bob"), List(ex + "dave")))
    assert(vals("SELECT ?x WHERE { :carol ^:knows ?x }")
      == Set(List(ex + "bob")))
    assert(vals("SELECT ?x WHERE { :alice :knows/:name ?x }")
      == Set(List("Bob")))
  }

  test("property paths: + * ? and negated sets") {
    assert(vals("SELECT ?x WHERE { :alice :knows+ ?x }")
      == Set(List(ex + "bob"), List(ex + "carol")))
    // p* includes the zero-length path: alice herself
    assert(vals("SELECT ?x WHERE { :alice :knows* ?x }")
      == Set(List(ex + "alice"), List(ex + "bob"), List(ex + "carol")))
    assert(vals("SELECT ?x WHERE { :alice :knows? ?x }")
      == Set(List(ex + "alice"), List(ex + "bob")))
    // everything alice relates to EXCEPT via knows/name/age
    assert(vals("SELECT ?x WHERE { :alice !(:knows|:name|:age) ?x }")
      == Set(List(ex + "dave")))
  }

  test("aggregates with GROUP BY and HAVING") {
    val r = vals(
      """SELECT ?a (COUNT(*) AS ?n) (GROUP_CONCAT(?name; SEPARATOR=",") AS ?who)
        |WHERE { ?p :age ?a ; :name ?name }
        |GROUP BY ?a HAVING(COUNT(*) > 1)""".stripMargin)
    assert(r == Set(List("25", "2", "Bob,Dave")))
  }

  test("GROUP BY with no aggregate = one solution per distinct key") {
    val r = vals("SELECT ?a WHERE { ?p :age ?a } GROUP BY ?a")
    assert(r == Set(List("25"), List("30"), List("35")))
    // grouped HAVING without aggregates is legal too
    val h = vals("SELECT ?a WHERE { ?p :age ?a } GROUP BY ?a HAVING(?a > 26)")
    assert(h == Set(List("30"), List("35")))
  }

  test("COUNT(DISTINCT *) counts distinct solutions") {
    // ?p :knows ?q yields 2 distinct solutions; the UNION duplicates them
    val r = vals(
      """SELECT (COUNT(DISTINCT *) AS ?n) (COUNT(*) AS ?all) WHERE {
        |  { ?p :knows ?q } UNION { ?p :knows ?q }
        |}""".stripMargin)
    assert(r == Set(List("2", "4")))
  }

  test("global aggregates: SUM exact, AVG double, MIN/MAX by term order") {
    val r = vals(
      """SELECT (SUM(?a) AS ?s) (AVG(?a) AS ?m) (MIN(?a) AS ?lo) (MAX(?a) AS ?hi)
        |WHERE { ?p :age ?a }""".stripMargin)
    assert(r == Set(List("115", "28.75", "25", "35")))
    val d = vals("SELECT (COUNT(DISTINCT ?a) AS ?n) (SUM(DISTINCT ?a) AS ?s) WHERE { ?p :age ?a }")
    assert(d == Set(List("3", "90")))
  }

  test("ORDER BY / LIMIT / OFFSET / DISTINCT") {
    val r = valsOrdered(
      "SELECT ?n WHERE { ?p :name ?n ; :age ?a } ORDER BY DESC(?a) ?n LIMIT 3")
    assert(r == List(List("Carol"), List("Alice"), List("Bob")))
    val off = valsOrdered(
      "SELECT ?n WHERE { ?p :name ?n ; :age ?a } ORDER BY ?a ?n OFFSET 1 LIMIT 2")
    assert(off == List(List("Dave"), List("Alice")))
    val d = vals("SELECT DISTINCT ?a WHERE { ?p :age ?a }")
    assert(d == Set(List("25"), List("30"), List("35")))
  }

  test("subselect composes with the outer group") {
    val r = vals(
      """SELECT ?n ?cnt WHERE {
        |  ?p :name ?n .
        |  { SELECT ?p (COUNT(*) AS ?cnt) WHERE { ?p :knows ?q } GROUP BY ?p }
        |}""".stripMargin)
    assert(r == Set(List("Alice", "1"), List("Bob", "1")))
  }

  test("GRAPH naming no graph in the dataset is the empty multiset (§18.6)") {
    assert(!Sparql.askQuery(spark, quads, P + "ASK { GRAPH :nope {} }"))
    assert(Sparql.askQuery(spark, quads, P + "ASK { GRAPH :g1 {} }"))
    // even a vacuously-matching sub-pattern stays empty for a missing graph
    val r = vals(
      "SELECT ?s WHERE { GRAPH :nope { OPTIONAL { ?s :knows ?o } } }", quads)
    assert(r.isEmpty)
  }

  test("query bnode shared between a plain pattern and a path joins under GRAPH ?g") {
    import spark.implicits._
    val g1 = i("gx")
    val data = Seq(
      Quad(i("a"), i("p"), i("m1"), g1),
      Quad(i("m1"), i("q"), i("c"), g1),
      // a :q chain NOT reachable from ?x :p — joinable only through the
      // shared bnode, so a dropped bnode column would admit it
      Quad(i("z"), i("q"), i("e"), g1)).toDF()
    val r = vals(
      "SELECT ?g ?x ?y WHERE { GRAPH ?g { ?x :p _:mm . _:mm :q+ ?y } }", data)
    assert(r == Set(List(ex + "gx", ex + "a", ex + "c")))
  }

  test("GRAPH with bound name and with a variable") {
    val r1 = vals("SELECT ?x WHERE { GRAPH :g2 { :alice :knows ?x } }", quads)
    assert(r1 == Set(List(ex + "carol")))
    val r2 = vals("SELECT ?g WHERE { GRAPH ?g { ?s :knows ?o } }", quads)
    assert(r2 == Set(List(ex + "g1"), List(ex + "g2")))
    // default graph is not visible to GRAPH ?g
    val r3 = vals("SELECT ?g ?s WHERE { GRAPH ?g { ?s :name ?n } }", quads)
    assert(r3.isEmpty)
  }

  test("negated property sets with inverse members") {
    import spark.implicits._
    val edges = Seq(
      Triple(i("a"), i("p1"), i("b")),
      Triple(i("b"), i("p2"), i("c"))).toDF()
    // forward-only NPS: predicate not in the set
    val r1 = vals("SELECT ?x ?y WHERE { ?x !(:p1) ?y }", edges)
    assert(r1 == Set(List(ex + "b", ex + "c")))
    // pure inverse NPS: inverse of the triples whose predicate is NOT p1
    val r2 = vals("SELECT ?x ?y WHERE { ?x !(^:p1) ?y }", edges)
    assert(r2 == Set(List(ex + "c", ex + "b")))
    // mixed: forward part over !p1 UNION inverse part over !p2
    val r3 = vals("SELECT ?x ?y WHERE { ?x !(:p1|^:p2) ?y }", edges)
    assert(r3 == Set(List(ex + "b", ex + "c"), List(ex + "b", ex + "a")))
  }

  test("nested GRAPH blocks re-scope and join on shared variables") {
    // variable outer, bound inner: inner matches in g1 regardless of ?g
    val r1 = vals(
      """SELECT ?g ?s ?x WHERE {
        |  GRAPH ?g { ?s :knows :carol GRAPH :g1 { :alice :knows ?x } }
        |}""".stripMargin, quads)
    assert(r1 == Set(
      List(ex + "g1", ex + "bob", ex + "bob"),
      List(ex + "g2", ex + "alice", ex + "bob")))
    // bound outer, variable inner: inner ranges over ALL named graphs
    val r2 = vals(
      """SELECT ?h ?y WHERE {
        |  GRAPH :g2 { ?s :knows ?o GRAPH ?h { ?y :knows :carol } }
        |}""".stripMargin, quads)
    assert(r2 == Set(
      List(ex + "g1", ex + "bob"), List(ex + "g2", ex + "alice")))
    // shared graph variable: inner and outer bind the SAME ?g
    val r3 = vals(
      """SELECT ?g WHERE {
        |  GRAPH ?g { :alice :knows ?o GRAPH ?g { ?s :knows :carol } }
        |}""".stripMargin, quads)
    assert(r3 == Set(List(ex + "g1"), List(ex + "g2")))
  }

  test("property paths under GRAPH ?var stay within one named graph") {
    // g1 chains alice->bob->carol; g2 has only alice->carol
    val r1 = vals(
      "SELECT ?g ?x WHERE { GRAPH ?g { :alice :knows+ ?x } }", quads)
    assert(r1 == Set(
      List(ex + "g1", ex + "bob"), List(ex + "g1", ex + "carol"),
      List(ex + "g2", ex + "carol")))
    // zero-or-more: reflexive over each graph's OWN nodes
    val r2 = vals(
      "SELECT ?g ?x WHERE { GRAPH ?g { :bob :knows* ?x } }", quads)
    assert(r2 == Set(
      List(ex + "g1", ex + "bob"), List(ex + "g1", ex + "carol")))
    // sequence composes within one graph only (no cross-graph hop)
    val r3 = vals(
      "SELECT ?g ?x WHERE { GRAPH ?g { :alice :knows/:knows ?x } }", quads)
    assert(r3 == Set(List(ex + "g1", ex + "carol")))
    // a path joins with a plain pattern on the graph variable
    val r4 = vals(
      """SELECT ?g ?x WHERE {
        |  GRAPH ?g { :alice :knows+ ?x . ?x :knows ?z }
        |}""".stripMargin, quads)
    assert(r4 == Set(List(ex + "g1", ex + "bob")))
  }

  test("FROM / FROM NAMED assemble the query dataset from named graphs") {
    // FROM :g1 — the default graph becomes g1's triples; the frame's own
    // default graph (alice name Alice) is NOT part of the dataset
    val r1 = vals("SELECT ?s FROM :g1 WHERE { ?s :knows ?o }", quads)
    assert(r1 == Set(List(ex + "alice"), List(ex + "bob")))
    val r1b = vals("SELECT ?n FROM :g1 WHERE { ?s :name ?n }", quads)
    assert(r1b.isEmpty)
    // FROM merges multiple graphs (set semantics)
    val r2 = vals(
      "SELECT ?s ?o FROM :g1 FROM :g2 WHERE { ?s :knows ?o }", quads)
    assert(r2.size == 3)
    // FROM NAMED restricts GRAPH ?g to the listed graphs only
    val r3 = vals(
      "SELECT ?g ?s FROM NAMED :g2 WHERE { GRAPH ?g { ?s :knows ?o } }",
      quads)
    assert(r3 == Set(List(ex + "g2", ex + "alice")))
    // FROM NAMED alone leaves an EMPTY default graph
    val r4 = vals(
      "SELECT ?n FROM NAMED :g1 WHERE { ?s :name ?n }", quads)
    assert(r4.isEmpty)
    // FROM + FROM NAMED compose
    val r5 = vals(
      """SELECT ?s ?g FROM :g2 FROM NAMED :g1 WHERE {
        |  ?s :knows ?o GRAPH ?g { ?x :knows ?y }
        |}""".stripMargin, quads)
    assert(r5 == Set(List(ex + "alice", ex + "g1")))
    // FROM inside a subquery is a parse error
    assertThrows[SparqlParser.SparqlParseError] {
      Sparql.select(spark, quads, P +
        "SELECT ?s WHERE { { SELECT ?s FROM :g1 WHERE { ?s :knows ?o } } }")
    }
  }

  test("ASK") {
    assert(Sparql.askQuery(spark, triples, P + "ASK { :alice :knows :bob }"))
    assert(!Sparql.askQuery(spark, triples, P + "ASK { :bob :knows :alice }"))
    val df = Sparql.query(spark, triples, P + "ASK { ?s :age 35 }")
    assert(df.collect().head.getBoolean(0))
  }

  test("CONSTRUCT builds a deduplicated graph, with template bnodes") {
    val g = Sparql.query(spark, triples, P +
      """CONSTRUCT { ?p :aged ?a . ?p :profiled true }
        |WHERE { ?p :age ?a FILTER(?a = 25) }""".stripMargin)
    assert(g.count() == 4)
    assert(g.filter(g("p")("value") === ex + "profiled").count() == 2)
    // template bnode: one fresh bnode per solution row
    val b = Sparql.query(spark, triples, P +
      "CONSTRUCT { ?p :card [ :v ?a ] } WHERE { ?p :age ?a }")
    assert(b.count() == 8) // 4 solutions × 2 template triples
    assert(b.filter(b("o")("kind") === graft.core.TermKind.BNODE)
      .select(b("o")("value")).distinct().count() == 4)
  }

  test("CONSTRUCT WHERE shorthand and collection templates") {
    val g = Sparql.query(spark, triples, P +
      "CONSTRUCT WHERE { ?p :knows ?q }")
    assert(g.count() == 2)
    assert(g.collect().forall(_.getStruct(1).getString(1) == ex + "knows"))
    // a collection in a CONSTRUCT template mints fresh rdf:first/rest
    // chains per solution (the _bncoll hidden vars are template bnodes)
    val c = Sparql.query(spark, triples, P +
      "CONSTRUCT { ?p :pair (1 2) } WHERE { ?p :age 25 }")
    // per solution: 1 pair triple + 2 first + 2 rest = 5; 2 solutions
    assert(c.count() == 10)
    assert(c.filter(c("p")("value") ===
      "http://www.w3.org/1999/02/22-rdf-syntax-ns#first").count() == 4)
  }

  test("integer comparison is exact beyond 2^53") {
    import spark.implicits._
    val big = Seq(
      Triple(i("x"), i("n"), Term.int(9007199254740993L)),
      Triple(i("y"), i("n"), Term.int(9007199254740992L))).toDF()
    val r = vals(
      """SELECT ?s WHERE { ?s :n ?v FILTER(?v = 9007199254740993) }""",
      big)
    assert(r == Set(List(ex + "x")))
    val lt = vals(
      """SELECT ?s WHERE { ?s :n ?v FILTER(?v < 9007199254740993) }""",
      big)
    assert(lt == Set(List(ex + "y")))
  }

  test("SUBSTR follows XPath substring rules, not Spark substr") {
    // round(start) window intersected with [1, len]; negative start never
    // counts from the end
    val r = vals(
      """SELECT ?a ?b ?c ?d WHERE { ?p :name ?n FILTER(?n = "Alice")
        |BIND(SUBSTR("hello", -2, 3) AS ?a)
        |BIND(SUBSTR("hello", 0, 3) AS ?b)
        |BIND(SUBSTR("hello", 2) AS ?c)
        |BIND(SUBSTR("hello", 1.5, 2.6) AS ?d) }""".stripMargin)
    // XPath: (-2,3) -> "", (0,3) -> "he", (2,inf) -> "ello",
    // (1.5,2.6) -> round to (2,3) -> positions 2..4 -> "ell"
    assert(r == Set(List("", "he", "ello", "ell")))
  }

  test("two-string builtins enforce §17.4.3.2 argument compatibility") {
    import spark.implicits._
    val d = Seq(
      Triple(i("a"), i("v"), Term.langLit("abc", "en")),
      Triple(i("b"), i("v"), Term.str("abc"))).toDF()
    // incompatible pair -> type error -> FILTER drops the row
    val r = vals(
      """SELECT ?s WHERE { ?s :v ?x FILTER(CONTAINS(?x, "b"@fr)) }""", d)
    assert(r.isEmpty)
    // same-language pair stays compatible
    val ok = vals(
      """SELECT ?s WHERE { ?s :v ?x FILTER(CONTAINS(?x, "b"@en)) }""", d)
    assert(ok == Set(List(ex + "a")))
    // STRAFTER with an incompatible pair is an error (unbound), not ""
    val sb = vals(
      """SELECT ?y WHERE { ?s :v ?x
        |BIND(STRAFTER(?x, "b"@cy) AS ?y) }""".stripMargin, d)
    assert(sb == Set(List(null.asInstanceOf[String])))
  }

  test("DESCRIBE returns subject descriptions") {
    val d = Sparql.query(spark, triples, P +
      "DESCRIBE ?p WHERE { ?p :age 35 }")
    assert(d.count() == 2) // carol: name + age
    val d2 = Sparql.query(spark, triples, P + "DESCRIBE :dave")
    assert(d2.count() == 2)
  }

  test("projected-but-never-bound variable yields an all-NULL column") {
    val r = vals("SELECT ?n ?ghost WHERE { :alice :name ?n }")
    assert(r == Set(List("Alice", null)))
  }

  test("bnodes in patterns act as hidden joined variables") {
    val r = vals("SELECT ?n WHERE { [ :knows ?q ] :name ?n . ?q :name \"Carol\" }")
    assert(r == Set(List("Bob")))
  }

  test("IN filter and arithmetic in FILTER") {
    val r = vals(
      "SELECT ?n WHERE { ?p :name ?n ; :age ?a FILTER(?a IN (25, 35) && ?a * 2 < 60) }")
    assert(r == Set(List("Bob"), List("Dave")))
  }
}

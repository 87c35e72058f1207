package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Term, Triple}
import graft.engine.Bgp.dsl._

class BgpSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private val ex = "http://ex.org/"
  private def triples = {
    import spark.implicits._
    Seq(
      Triple(Term.iri(ex + "alice"), Term.iri(ex + "knows"), Term.iri(ex + "bob")),
      Triple(Term.iri(ex + "bob"), Term.iri(ex + "knows"), Term.iri(ex + "carol")),
      Triple(Term.iri(ex + "alice"), Term.iri(ex + "name"), Term.str("Alice")),
      Triple(Term.iri(ex + "bob"), Term.iri(ex + "name"), Term.str("Bob")),
      Triple(Term.iri(ex + "carol"), Term.iri(ex + "name"), Term.str("Carol")),
      Triple(Term.iri(ex + "self"), Term.iri(ex + "sameAs"), Term.iri(ex + "self"))
    ).toDF()
  }

  test("empty BGP yields exactly one empty solution (SPARQL 5.2.2)") {
    val r = Bgp.execute(spark, triples, Bgp.Pattern(Seq.empty))
    assert(r.count() == 1)
    assert(r.columns.isEmpty)
  }

  test("single pattern scan with bound predicate") {
    // projected columns come back variable-name-sorted: ("n", "s")
    val q = Bgp.Pattern(Seq(pat(v("s"), iri(ex + "name"), v("n"))))
    val r = Bgp.executeValues(spark, triples, q).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(r == Set("Alice" -> (ex + "alice"), "Bob" -> (ex + "bob"), "Carol" -> (ex + "carol")))
  }

  test("join chain over shared variable") {
    val q = Bgp.Pattern(Seq(
      pat(v("a"), iri(ex + "knows"), v("b")),
      pat(v("b"), iri(ex + "knows"), v("c"))))
    val r = Bgp.executeValues(spark, triples, q).collect()
    assert(r.length == 1)
    assert(r.head.getString(0) == ex + "alice" && r.head.getString(2) == ex + "carol")
  }

  test("repeated variable = self-equality constraint") {
    val q = Bgp.Pattern(Seq(pat(v("x"), iri(ex + "sameAs"), v("x"))))
    val r = Bgp.executeValues(spark, triples, q).collect()
    assert(r.map(_.getString(0)).toSeq == Seq(ex + "self"))
  }

  test("underscore-prefixed vars join but are not projected") {
    val q = Bgp.Pattern(Seq(
      pat(v("_p"), iri(ex + "knows"), v("b")),
      pat(v("b"), iri(ex + "name"), v("n"))))
    val r = Bgp.executeValues(spark, triples, q)
    assert(r.columns.toSeq == Seq("b", "n"))
    assert(r.collect().map(_.getString(1)).toSet == Set("Bob", "Carol"))
  }

  test("disjoint patterns cross-product") {
    val q = Bgp.Pattern(Seq(
      pat(iri(ex + "alice"), iri(ex + "name"), v("an")),
      pat(iri(ex + "bob"), iri(ex + "name"), v("bn"))))
    val r = Bgp.executeValues(spark, triples, q).collect()
    assert(r.length == 1)
  }

  test("fully bound pattern acts as existence filter") {
    val hit = Bgp.Pattern(Seq(pat(iri(ex + "alice"), iri(ex + "knows"), iri(ex + "bob"))))
    assert(Bgp.execute(spark, triples, hit).count() == 1)
    val miss = Bgp.Pattern(Seq(pat(iri(ex + "alice"), iri(ex + "knows"), iri(ex + "carol"))))
    assert(Bgp.execute(spark, triples, miss).count() == 0)
  }

  private def starTriples = {
    import spark.implicits._
    val base = Triple(Term.iri(ex + "alice"), Term.iri(ex + "age"), Term.int(30))
    val base2 = Triple(Term.iri(ex + "bob"), Term.iri(ex + "age"), Term.int(40))
    Seq(
      base, base2,
      // annotations: << s p o >> certainty n
      Triple(Term.quoted(base), Term.iri(ex + "certainty"), Term.dec(BigDecimal("0.9"))),
      Triple(Term.quoted(base2), Term.iri(ex + "certainty"), Term.dec(BigDecimal("0.5"))),
      // nested: << << s p o >> certainty x >> saidBy carol
      Triple(Term.quoted(Triple(Term.quoted(base), Term.iri(ex + "certainty"),
        Term.dec(BigDecimal("0.9")))), Term.iri(ex + "saidBy"), Term.iri(ex + "carol"))
    ).toDF()
  }

  test("quoted-triple pattern destructures and unifies nested vars (RDF-star)") {
    // who has an annotated age, and with what certainty?
    val q = Bgp.Pattern(Seq(
      pat(qt(v("who"), iri(ex + "age"), v("age")), iri(ex + "certainty"), v("c"))))
    val r = Bgp.executeValues(spark, starTriples, q).collect()
      .map(r => (r.getString(2), r.getString(0), r.getString(1))).toSet
    assert(r == Set((ex + "alice", "30", "0.9"), (ex + "bob", "40", "0.5")))
  }

  test("fully bound quoted pattern collapses to a constant (dsl.qt)") {
    val q = Bgp.Pattern(Seq(
      pat(qt(iri(ex + "alice"), iri(ex + "age"),
        term(Term.int(30))), iri(ex + "certainty"), v("c"))))
    val r = Bgp.executeValues(spark, starTriples, q).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("0.9"))
  }

  test("two-level nested quoted pattern") {
    val q = Bgp.Pattern(Seq(
      pat(qt(qt(v("who"), iri(ex + "age"), v("age")), iri(ex + "certainty"), v("c")),
        iri(ex + "saidBy"), v("src"))))
    val r = Bgp.executeValues(spark, starTriples, q).collect()
    assert(r.length == 1)
    val row = r.head // columns sorted: age, c, src, who
    assert(row.getString(0) == "30" && row.getString(1) == "0.9" &&
      row.getString(2) == ex + "carol" && row.getString(3) == ex + "alice")
  }

  test("quoted pattern joins with plain patterns on shared vars") {
    import spark.implicits._
    val withNames = starTriples.unionByName(Seq(
      Triple(Term.iri(ex + "alice"), Term.iri(ex + "name"), Term.str("Alice")),
      Triple(Term.iri(ex + "bob"), Term.iri(ex + "name"), Term.str("Bob"))).toDF())
    val q = Bgp.Pattern(Seq(
      pat(v("who"), iri(ex + "name"), v("n")),
      pat(qt(v("who"), iri(ex + "age"), v("age")), iri(ex + "certainty"),
        term(Term.dec(BigDecimal("0.9"))))))
    val r = Bgp.executeValues(spark, withNames, q).collect()
    assert(r.length == 1 && r.head.getString(1) == "Alice")
  }

  test("planner prefers bound-subject patterns first (query_planner.ex heuristic)") {
    val p1 = pat(v("a"), v("b"), v("c"))          // 3 free vars
    val p2 = pat(iri(ex + "alice"), iri(ex + "knows"), v("a")) // 1 free var, bound s+p
    val p3 = pat(v("a"), iri(ex + "name"), v("n"))  // 2 free vars
    val planned = Bgp.plan(Seq(p1, p3, p2))
    assert(planned.head == p2)
    assert(planned(1) == p3) // 'a' solved after p2 -> p3 has fewest unsolved
    assert(planned(2) == p1)
  }

  // ------------------------------------------------------ solution algebra

  private def sol(q: Bgp.Pattern) = Bgp.execute(spark, triples, q)

  test("OPTIONAL extends matches and leaves non-matches unbound (LeftJoin)") {
    // everyone with a name, optionally who they know
    val base = sol(Bgp.Pattern(Seq(pat(v("who"), iri(ex + "name"), v("n")))))
    val opt = sol(Bgp.Pattern(Seq(pat(v("who"), iri(ex + "knows"), v("o")))))
    val r = Bgp.values(Bgp.optional(base, opt)).collect()
      .map(x => (x.getAs[String]("who"), Option(x.getAs[String]("o")))).toSet
    assert(r == Set(
      (ex + "alice") -> Some(ex + "bob"),
      (ex + "bob") -> Some(ex + "carol"),
      (ex + "carol") -> None)) // carol knows nobody: o stays unbound
  }

  test("OPTIONAL with disjoint domains is a left-padded cross product") {
    val base = sol(Bgp.Pattern(Seq(pat(iri(ex + "alice"), iri(ex + "name"), v("n")))))
    val opt = sol(Bgp.Pattern(Seq(pat(iri(ex + "bob"), iri(ex + "knows"), v("k")))))
    assert(Bgp.optional(base, opt).count() == 1)
    // empty optional side still keeps every base row (all-null padding)
    val none = sol(Bgp.Pattern(Seq(pat(iri(ex + "carol"), iri(ex + "knows"), v("k")))))
    val padded = Bgp.values(Bgp.optional(base, none)).collect()
    assert(padded.length == 1 && padded.head.isNullAt(1))
  }

  test("UNION aligns by variable name, missing vars unbound") {
    val a = sol(Bgp.Pattern(Seq(pat(v("who"), iri(ex + "knows"), v("o")))))
    val b = sol(Bgp.Pattern(Seq(pat(v("who"), iri(ex + "name"), v("n")))))
    val u = Bgp.values(Bgp.union(a, b))
    assert(u.columns.sorted.toSeq == Seq("n", "o", "who"))
    assert(u.count() == 5) // 2 knows + 3 name, bag semantics
    assert(u.filter("o IS NULL").count() == 3 && u.filter("n IS NULL").count() == 2)
  }

  test("MINUS removes on shared vars; disjoint domains remove NOTHING (§8.3.3)") {
    val all = sol(Bgp.Pattern(Seq(pat(v("who"), iri(ex + "name"), v("n")))))
    val knowers = sol(Bgp.Pattern(Seq(pat(v("who"), iri(ex + "knows"), v("k")))))
    val r = Bgp.values(Bgp.minus(all, knowers)).collect()
    assert(r.map(_.getAs[String]("who")).toSet == Set(ex + "carol"))
    // the spec gotcha: no shared variable -> nothing removed
    val disjoint = sol(Bgp.Pattern(Seq(pat(v("x"), iri(ex + "knows"), v("y")))))
    assert(Bgp.minus(all, disjoint).count() == all.count())
  }

  test("EXISTS / NOT EXISTS: semi/anti; disjoint domains DO eliminate") {
    val all = sol(Bgp.Pattern(Seq(pat(v("who"), iri(ex + "name"), v("n")))))
    val knowers = sol(Bgp.Pattern(Seq(pat(v("who"), iri(ex + "knows"), v("k")))))
    assert(Bgp.values(Bgp.exists(all, knowers)).collect()
      .map(_.getAs[String]("who")).toSet == Set(ex + "alice", ex + "bob"))
    assert(Bgp.values(Bgp.notExists(all, knowers)).collect()
      .map(_.getAs[String]("who")).toSet == Set(ex + "carol"))
    // NOT EXISTS diverges from MINUS on disjoint domains: it eliminates
    val disjoint = sol(Bgp.Pattern(Seq(pat(v("x"), iri(ex + "knows"), v("y")))))
    assert(Bgp.notExists(all, disjoint).count() == 0)
    assert(Bgp.exists(all, disjoint).count() == all.count())
  }

  test("joinSolutions composes a closure frame with a BGP result") {
    val names = sol(Bgp.Pattern(Seq(pat(v("who"), iri(ex + "name"), v("n")))))
    val cl = Bgp.closure(triples, Term.iri(ex + "knows"), sVar = "who", oVar = "dst")
    val r = Bgp.values(Bgp.joinSolutions(names, cl)).collect()
      .map(x => (x.getAs[String]("who"), x.getAs[String]("dst"))).toSet
    assert(r == Set(
      (ex + "alice") -> (ex + "bob"), (ex + "alice") -> (ex + "carol"),
      (ex + "bob") -> (ex + "carol")))
  }

  test("closure: p+ on a chain, p* adds zero-hop pairs") {
    val plus = Bgp.values(Bgp.closure(triples, Term.iri(ex + "knows"))).collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(plus == Set(
      (ex + "alice") -> (ex + "bob"), (ex + "bob") -> (ex + "carol"),
      (ex + "alice") -> (ex + "carol")))
    val star = Bgp.values(Bgp.closure(triples, Term.iri(ex + "knows"),
      reflexive = true)).collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(star == plus ++ Set(ex + "alice", ex + "bob", ex + "carol").map(x => x -> x))
  }

  test("closure terminates on cycles and covers all intra-cycle pairs") {
    import spark.implicits._
    val p = Term.iri(ex + "next")
    val cyc = Seq(
      Triple(Term.iri(ex + "n1"), p, Term.iri(ex + "n2")),
      Triple(Term.iri(ex + "n2"), p, Term.iri(ex + "n3")),
      Triple(Term.iri(ex + "n3"), p, Term.iri(ex + "n1"))).toDF()
    val r = Bgp.values(Bgp.closure(cyc, p)).collect()
    // every ordered pair incl. self-loops through the cycle: 3x3
    assert(r.length == 9)
  }

  test("closure on an absent predicate is empty") {
    assert(Bgp.closure(triples, Term.iri(ex + "nope")).count() == 0)
  }

  // ------------------------------------------------------- GRAPH patterns

  private def quads = {
    import spark.implicits._
    import graft.core.Quad
    val name = Term.iri(ex + "name")
    Seq(
      Quad(Term.iri(ex + "alice"), name, Term.str("Alice"), Term.iri(ex + "g1")),
      Quad(Term.iri(ex + "bob"), name, Term.str("Bob"), Term.iri(ex + "g1")),
      Quad(Term.iri(ex + "carol"), name, Term.str("Carol"), Term.iri(ex + "g2")),
      Quad(Term.iri(ex + "alice"), Term.iri(ex + "knows"), Term.iri(ex + "bob"),
        Term.iri(ex + "g1")),
      Quad(Term.iri(ex + "carol"), Term.iri(ex + "knows"), Term.iri(ex + "alice"),
        Term.iri(ex + "g2")),
      // default graph: must be invisible to GRAPH patterns
      Quad(Term.iri(ex + "dave"), name, Term.str("Dave"), null)
    ).toDF()
  }

  test("GRAPH with bound name pins the block to one named graph") {
    val q = Bgp.Pattern(Seq(pat(v("s"), iri(ex + "name"), v("n"))))
    val r = Bgp.values(Bgp.executeGraph(spark, quads, iri(ex + "g2"), q)).collect()
    assert(r.map(_.getAs[String]("n")).toSeq == Seq("Carol"))
  }

  test("GRAPH variable joins patterns WITHIN one graph and binds the name") {
    // who knows someone AND has a name in the SAME graph?
    val q = Bgp.Pattern(Seq(
      pat(v("who"), iri(ex + "knows"), v("o")),
      pat(v("who"), iri(ex + "name"), v("n"))))
    val r = Bgp.values(Bgp.executeGraph(spark, quads, v("gr"), q)).collect()
      .map(x => (x.getAs[String]("gr"), x.getAs[String]("n"))).toSet
    // carol's knows-edge is in g2 where she also has a name; alice's pair
    // is in g1; carol->alice does NOT pick up alice's g1 name (cross-graph)
    assert(r == Set((ex + "g1") -> "Alice", (ex + "g2") -> "Carol"))
  }

  test("GRAPH never sees the default graph; empty BGP enumerates graphs") {
    val q = Bgp.Pattern(Seq(pat(v("s"), iri(ex + "name"), v("n"))))
    val all = Bgp.values(Bgp.executeGraph(spark, quads, v("gr"), q)).collect()
    assert(!all.exists(_.getAs[String]("n") == "Dave"))
    val graphs = Bgp.values(Bgp.executeGraph(spark, quads, v("gr"),
      Bgp.Pattern(Seq.empty))).collect().map(_.getString(0)).toSet
    assert(graphs == Set(ex + "g1", ex + "g2"))
    assert(Bgp.executeGraph(spark, quads, iri(ex + "g1"),
      Bgp.Pattern(Seq.empty)).count() == 1)
    // §18.6: an IRI naming NO graph in the dataset = the empty multiset,
    // never a vacuous solution
    assert(Bgp.executeGraph(spark, quads, iri(ex + "nope"),
      Bgp.Pattern(Seq.empty)).count() == 0)
  }

  test("two path() chains compose without capturing each other's intermediates") {
    import spark.implicits._
    // a -p-> m -q-> x and b -r-> n -s2-> y: DIFFERENT mid nodes, so a
    // shared hidden name would join m to n and kill both chains
    val edges = Seq(
      Triple(Term.iri(ex + "a"), Term.iri(ex + "p"), Term.iri(ex + "m")),
      Triple(Term.iri(ex + "m"), Term.iri(ex + "q"), Term.iri(ex + "x")),
      Triple(Term.iri(ex + "b"), Term.iri(ex + "r"), Term.iri(ex + "n")),
      Triple(Term.iri(ex + "n"), Term.iri(ex + "s2"), Term.iri(ex + "y"))).toDF()
    val p1 = Bgp.path(Seq(v("u"), iri(ex + "p"), iri(ex + "q"), v("ux")))
    val p2 = Bgp.path(Seq(v("w"), iri(ex + "r"), iri(ex + "s2"), v("wy")))
    val r = Bgp.values(Bgp.execute(spark, edges,
      Bgp.Pattern(p1.patterns ++ p2.patterns))).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[String]("u") == ex + "a" && row.getAs[String]("ux") == ex + "x")
    assert(row.getAs[String]("w") == ex + "b" && row.getAs[String]("wy") == ex + "y")
  }

  test("a pattern listed twice stays twice in the plan") {
    val t = pat(v("s"), iri(ex + "knows"), v("o"))
    assert(Bgp.plan(Seq(t, t)).length == 2)
  }

  test("closure fuzz: path doubling matches an in-memory reference closure") {
    import spark.implicits._
    val p = Term.iri(ex + "e")
    val rnd = new scala.util.Random(42) // seeded: deterministic failures
    for (trial <- 0 until 8) {
      val n = 4 + rnd.nextInt(8) // 4-11 nodes
      val m = 3 + rnd.nextInt(16) // 3-18 edges, duplicates/cycles welcome
      val edges = Seq.fill(m)((rnd.nextInt(n), rnd.nextInt(n)))
      // in-memory reference: iterate-to-fixpoint pair composition
      var ref = edges.toSet
      var grew = true
      while (grew) {
        val next = ref ++ (for ((a, b) <- ref; (c, d) <- ref if b == c) yield (a, d))
        grew = next.size != ref.size
        ref = next
      }
      val df = edges.map { case (a, b) =>
        Triple(Term.iri(s"$ex$a"), p, Term.iri(s"$ex$b"))
      }.toDF()
      val got = Bgp.values(Bgp.closure(df, p)).collect()
        .map(r => (r.getString(0).stripPrefix(ex).toInt,
          r.getString(1).stripPrefix(ex).toInt)).toSet
      assert(got == ref, s"trial $trial: n=$n edges=$edges")
    }
  }
}

package graft.sparql

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Term, Vocab}
import graft.engine.Bgp.{Bound, V}
import Ast._

class SparqlParserSpec extends AnyFunSuite {

  private def sel(q: String): Select =
    SparqlParser.parse(q).asInstanceOf[Select]

  private def bgp(g: Group): Seq[TP] =
    g.elems.collect { case EBgp(tps) => tps }.flatten

  test("basic select with prefixes, 'a', ; and , sugar") {
    val q = sel(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?name ?mbox WHERE {
        |  ?x a foaf:Person ;
        |     foaf:name ?name ;
        |     foaf:knows ?y, ?z .
        |  ?y foaf:mbox ?mbox
        |}""".stripMargin)
    assert(!q.distinct)
    assert(q.projection.map(_._1) == Seq(EVar("name"), EVar("mbox")))
    val tps = bgp(q.where)
    assert(tps.length == 5)
    assert(tps.head == TP(V("x"), Left(Bound(Term.iri(Vocab.rdfType))),
      Bound(Term.iri("http://xmlns.com/foaf/0.1/Person"))))
    assert(tps(2) == TP(V("x"),
      Left(Bound(Term.iri("http://xmlns.com/foaf/0.1/knows"))), V("y")))
    assert(tps(3).o == V("z"))
  }

  test("literals: lang tags, datatypes, numbers, booleans") {
    val q = sel(
      """SELECT * WHERE {
        |  ?a <http://p/1> "chat"@en .
        |  ?a <http://p/2> "5"^^<http://www.w3.org/2001/XMLSchema#byte> .
        |  ?a <http://p/3> 42 .
        |  ?a <http://p/4> 3.14 .
        |  ?a <http://p/5> 1.0e6 .
        |  ?a <http://p/6> true .
        |  ?a <http://p/7> -7
        |}""".stripMargin)
    val os = bgp(q.where).map(_.o)
    assert(os(0) == Bound(Term.langLit("chat", "en")))
    assert(os(1) == Bound(Term.typedLit("5", Vocab.xsd + "byte")))
    assert(os(2) == Bound(Term.typedLit("42", Vocab.xsdInteger)))
    assert(os(3) == Bound(Term.typedLit("3.14", Vocab.xsdDecimal)))
    assert(os(4) == Bound(Term.typedLit("1.0e6", Vocab.xsdDouble)))
    assert(os(5) == Bound(Term.bool(true)))
    assert(os(6) == Bound(Term.typedLit("-7", Vocab.xsdInteger)))
  }

  test("optional, union, minus, graph, bind, filter structure") {
    val q = sel(
      """PREFIX : <http://ex/>
        |SELECT ?s WHERE {
        |  ?s :p ?o .
        |  OPTIONAL { ?s :q ?r }
        |  { ?s :t1 ?u } UNION { ?s :t2 ?u }
        |  MINUS { ?s :bad true }
        |  GRAPH ?g { ?s :in ?g2 }
        |  BIND(?o AS ?o2)
        |  FILTER(?o2 > 3)
        |}""".stripMargin)
    val kinds = q.where.elems.map(_.getClass.getSimpleName)
    assert(kinds == Seq("EBgp", "EOptional", "EUnion", "EMinusG", "EGraphG",
      "EBind", "EFilter"))
    val EUnion(alts) = q.where.elems(2): @unchecked
    assert(alts.length == 2)
    val EGraphG(gn, _) = q.where.elems(4): @unchecked
    assert(gn == V("g"))
  }

  test("expression precedence: || over && over comparison over + over *") {
    val q = sel("SELECT ?x WHERE { ?x ?p ?y FILTER(?a || ?b && ?c = ?d + ?e * ?f) }")
    val EFilter(e) = q.where.elems(1): @unchecked
    assert(e == EBin("||", EVar("a"), EBin("&&", EVar("b"),
      EBin("=", EVar("c"), EBin("+", EVar("d"),
        EBin("*", EVar("e"), EVar("f")))))))
  }

  test("builtin calls, IN, NOT EXISTS, casts") {
    val q = sel(
      """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        |SELECT ?x WHERE {
        |  ?x ?p ?v
        |  FILTER(STRSTARTS(STR(?x), "http://") && ?v IN (1, 2) &&
        |         NOT EXISTS { ?x ?q "z" } && xsd:integer(?v) != 3)
        |}""".stripMargin)
    val EFilter(e) = q.where.elems(1): @unchecked
    val EBin("&&", EBin("&&", EBin("&&", c1, c2), c3), c4) = e: @unchecked
    assert(c1 == ECall("STRSTARTS", Seq(ECall("STR", Seq(EVar("x"))),
      EConst(Term.str("http://")))))
    assert(c2 == EIn(EVar("v"), Seq(EConst(Term.int(1)), EConst(Term.int(2))), false))
    assert(c3.isInstanceOf[EExists] && c3.asInstanceOf[EExists].negated)
    assert(c4 == EBin("!=", ECall(Vocab.xsdInteger, Seq(EVar("v"))),
      EConst(Term.int(3))))
  }

  test("property paths: sequence, alternative, inverse, mods, negated set") {
    val q = sel(
      """PREFIX : <http://ex/>
        |SELECT * WHERE {
        |  ?a :p/:q ?b .
        |  ?a :p|:q ?c .
        |  ?a ^:p ?d .
        |  ?a :p+ ?e .
        |  ?a :p* ?f .
        |  ?a :p? ?g .
        |  ?a !(:p|:q) ?h .
        |  ?a (:p/:q)+ ?i
        |}""".stripMargin)
    def p(i: Int) = bgp(q.where)(i).p
    val l = Term.iri("http://ex/p"); val r = Term.iri("http://ex/q")
    assert(p(0) == Right(PSeq(PLink(l), PLink(r))))
    assert(p(1) == Right(PAlt(PLink(l), PLink(r))))
    assert(p(2) == Right(PInv(PLink(l))))
    assert(p(3) == Right(PMod(PLink(l), '+')))
    assert(p(4) == Right(PMod(PLink(l), '*')))
    assert(p(5) == Right(PMod(PLink(l), '?')))
    assert(p(6) == Right(PNeg(Seq(l, r))))
    assert(p(7) == Right(PMod(PSeq(PLink(l), PLink(r)), '+')))
  }

  test("negated property sets split inverse members (§18.2.2.4)") {
    val q = sel(
      """PREFIX : <http://ex/>
        |SELECT * WHERE {
        |  ?a !(^:p) ?b .
        |  ?a !(:p|^:q) ?c .
        |  ?a !(^:p|:q|^:r) ?d
        |}""".stripMargin)
    def p(i: Int) = bgp(q.where)(i).p
    val l = Term.iri("http://ex/p"); val r = Term.iri("http://ex/q")
    val s = Term.iri("http://ex/r")
    assert(p(0) == Right(PInv(PNeg(Seq(l)))))
    assert(p(1) == Right(PAlt(PNeg(Seq(l)), PInv(PNeg(Seq(r))))))
    assert(p(2) == Right(PAlt(PNeg(Seq(r)), PInv(PNeg(Seq(l, s))))))
  }

  test("a plain iri path collapses to a Bound node (BGP-native shape)") {
    val q = sel("SELECT * WHERE { ?a <http://ex/p> ?b }")
    assert(bgp(q.where).head.p == Left(Bound(Term.iri("http://ex/p"))))
  }

  test("blank node property lists and collections expand to hidden vars") {
    val q = sel(
      """PREFIX : <http://ex/>
        |SELECT ?n WHERE { [ :name ?n ; :likes (1 2) ] }""".stripMargin)
    val tps = bgp(q.where)
    // [ ... ] -> 2 pattern rows; (1 2) -> 4 rows (first/rest per element)
    assert(tps.length == 6)
    val subj = tps.head.s
    assert(subj.asInstanceOf[V].name.startsWith("_bnp"))
    assert(tps.count(_.p == Left(Bound(Term.iri(Vocab.rdfFirst)))) == 2)
    assert(tps.count(_.p == Left(Bound(Term.iri(Vocab.rdfNil)))) == 0)
    assert(tps.count(_.o == Bound(Term.iri(Vocab.rdfNil))) == 1)
  }

  test("bnode labels become hidden variables shared across mentions") {
    val q = sel("SELECT ?v WHERE { _:b <http://p/a> ?v . _:b <http://p/c> 1 }")
    val tps = bgp(q.where)
    assert(tps(0).s == V("_bn_b") && tps(1).s == V("_bn_b"))
  }

  test("aggregates, group by, having, order by, limit, offset") {
    val q = sel(
      """PREFIX : <http://ex/>
        |SELECT ?g (COUNT(*) AS ?n) (SUM(?v) AS ?s)
        |       (GROUP_CONCAT(DISTINCT ?l; SEPARATOR="|") AS ?ls)
        |WHERE { ?x :g ?g ; :v ?v ; :l ?l }
        |GROUP BY ?g HAVING(COUNT(*) > 2)
        |ORDER BY DESC(?n) ?g LIMIT 10 OFFSET 5""".stripMargin)
    assert(q.projection(1) == (EAgg("COUNT", false, None, None), Some("n")))
    assert(q.projection(3)._1 == EAgg("GROUP_CONCAT", true, Some(EVar("l")), Some("|")))
    assert(q.groupBy == Seq((EVar("g"), None)))
    assert(q.having == Seq(EBin(">", EAgg("COUNT", false, None, None),
      EConst(Term.int(2)))))
    assert(q.orderBy == Seq((EVar("n"), false), (EVar("g"), true)))
    assert(q.limit.contains(10L) && q.offset.contains(5L))
  }

  test("VALUES inline and trailing, with UNDEF") {
    val q = sel(
      """SELECT * WHERE { ?s ?p ?o . VALUES ?s { <http://a> <http://b> } }
        |VALUES (?p ?o) { (<http://p> UNDEF) }""".stripMargin)
    val vs = q.where.elems.collect { case v: EValues => v }
    assert(vs.length == 2)
    assert(vs(0).rows == Seq(Seq(Some(Term.iri("http://a"))),
      Seq(Some(Term.iri("http://b")))))
    assert(vs(1).vars == Seq("p", "o"))
    assert(vs(1).rows == Seq(Seq(Some(Term.iri("http://p")), None)))
  }

  test("subselect") {
    val q = sel(
      """SELECT ?s WHERE {
        |  ?s <http://p> ?o .
        |  { SELECT ?o (COUNT(*) AS ?c) WHERE { ?z <http://q> ?o } GROUP BY ?o }
        |}""".stripMargin)
    val sub = q.where.elems.collect { case ESubSelect(s) => s }
    assert(sub.length == 1 && sub.head.groupBy.nonEmpty)
  }

  test("construct, ask, describe forms") {
    val c = SparqlParser.parse(
      """PREFIX : <http://ex/>
        |CONSTRUCT { ?s :linked ?o . ?o a :Target }
        |WHERE { ?s :p ?o }""".stripMargin).asInstanceOf[Construct]
    assert(c.template.length == 2)
    assert(c.template(1)._2 == Bound(Term.iri(Vocab.rdfType)))

    val a = SparqlParser.parse("ASK { ?s ?p ?o }").asInstanceOf[Ast.Ask]
    assert(a.where.elems.length == 1)

    val d = SparqlParser.parse(
      "DESCRIBE ?x <http://ex/thing> WHERE { ?x <http://ex/p> 1 }")
      .asInstanceOf[Describe]
    assert(d.vars == Seq("x") && d.iris == Seq(Term.iri("http://ex/thing")))
  }

  test("RDF-star quoted triple patterns") {
    val q = sel(
      """SELECT ?c WHERE { << ?s <http://p> ?o >> <http://certainty> ?c }""")
    val tp = bgp(q.where).head
    assert(tp.s.isInstanceOf[graft.engine.Bgp.QPat])
  }

  test("iri-vs-less-than disambiguation") {
    val q = sel("SELECT * WHERE { ?a <http://p> ?b FILTER(?a < ?b && ?b <= 3) }")
    val EFilter(e) = q.where.elems(1): @unchecked
    assert(e == EBin("&&", EBin("<", EVar("a"), EVar("b")),
      EBin("<=", EVar("b"), EConst(Term.int(3)))))
  }

  test("BASE resolution and relative IRIs") {
    val q = sel(
      """BASE <http://base.org/dir/>
        |SELECT * WHERE { </abs> <rel> <../up> }""".stripMargin)
    val tp = bgp(q.where).head
    assert(tp.s == Bound(Term.iri("http://base.org/abs")))
    assert(tp.p == Left(Bound(Term.iri("http://base.org/dir/rel"))))
    assert(tp.o == Bound(Term.iri("http://base.org/up")))
  }

  test("mention order drives SELECT * (textual first mention)") {
    val q = sel("SELECT * WHERE { ?b <http://p> ?a . ?a <http://q> ?c }")
    assert(q.mentionOrder == Seq("b", "a", "c"))
  }

  test("errors: undeclared prefix, subquery FROM, SERVICE, unterminated") {
    def fails(s: String, frag: String): Unit = {
      val e = intercept[SparqlParser.SparqlParseError](SparqlParser.parse(s))
      assert(e.getMessage.contains(frag), s"got: ${e.getMessage}")
    }
    fails("SELECT * WHERE { ?s foo:p 1 }", "undeclared prefix")
    fails("SELECT * WHERE { { SELECT * FROM <http://g> WHERE { ?s ?p ?o } } }",
      "FROM is not allowed in a subquery")
    fails("SELECT * WHERE { SERVICE <http://x> { ?s ?p ?o } }", "SERVICE")
    fails("SELECT * WHERE { ?s ?p \"x }", "unterminated")
    fails("SELECT * WHERE { ?s <rel> ?o }", "no BASE")
  }

  test("FROM / FROM NAMED parse to a Scoped wrapper") {
    val q = SparqlParser.parse(
      "SELECT * FROM <http://g1> FROM NAMED <http://g2> FROM <http://g3> " +
        "WHERE { ?s ?p ?o }")
    q match {
      case Scoped(inner, dflt, named) =>
        assert(inner.isInstanceOf[Select])
        assert(dflt == Seq(Term.iri("http://g1"), Term.iri("http://g3")))
        assert(named == Seq(Term.iri("http://g2")))
      case other => fail(s"expected Scoped, got $other")
    }
  }

  test("comments and case-insensitive keywords") {
    val q = sel(
      """select distinct ?s # trailing comment
        |where { ?s ?p ?o } limit 3""".stripMargin)
    assert(q.distinct && q.limit.contains(3L))
  }

  test("CONSTRUCT WHERE shorthand: the pattern is the template") {
    val q = SparqlParser.parse(
      "CONSTRUCT WHERE { ?s <http://p> ?o . ?o a <http://C> }")
      .asInstanceOf[Construct]
    assert(q.template.length == 2)
    assert(q.template.head == ((V("s"), Bound(Term.iri("http://p")), V("o"))))
    assert(bgp(q.where).length == 2)
    // with a solution modifier
    val q2 = SparqlParser.parse(
      "CONSTRUCT WHERE { ?s ?p ?o } LIMIT 5").asInstanceOf[Construct]
    assert(q2.limit.contains(5L))
  }

  test("collections are _bn-hidden vars (usable in templates/DATA blocks)") {
    val q = sel("SELECT * WHERE { ?s <http://p> (1 2) }")
    val vars = bgp(q.where).flatMap(tp => Seq(tp.s, tp.o)).collect {
      case V(n) if n.startsWith("_") => n
    }
    assert(vars.nonEmpty && vars.forall(_.startsWith("_bn")), vars)
    // INSERT DATA with a collection is legal SPARQL and must parse
    val up = SparqlParser.parseUpdate(
      "INSERT DATA { <http://s> <http://p> (1 2) }")
    assert(up.ops.length == 1)
  }

  test("DELETE WHERE rejects blank nodes like any delete template") {
    val e = intercept[SparqlParser.SparqlParseError] {
      SparqlParser.parseUpdate("DELETE WHERE { ?s <http://p> [] }")
    }
    assert(e.getMessage.contains("blank nodes"))
    val e2 = intercept[SparqlParser.SparqlParseError] {
      SparqlParser.parseUpdate(
        "WITH <http://g> DELETE WHERE { ?s <http://p> _:b }")
    }
    assert(e2.getMessage.contains("blank nodes"))
  }

  test("DATA-block ground check recurses into quoted triples") {
    val e = intercept[SparqlParser.SparqlParseError] {
      SparqlParser.parseUpdate(
        "INSERT DATA { << <http://s> <http://p> ?o >> <http://q> 1 }")
    }
    assert(e.getMessage.contains("variables are not allowed"))
    val e2 = intercept[SparqlParser.SparqlParseError] {
      SparqlParser.parseUpdate(
        "INSERT DATA { << <http://s> <http://p> _:b >> <http://q> 1 }")
    }
    assert(e2.getMessage.contains("quoted triples"))
  }

  test("PN_LOCAL cannot end with a dot; interior dot runs are kept") {
    val q = sel("PREFIX : <http://e/> SELECT * WHERE { :s.s.s :p :a.. }")
    val tps = bgp(q.where)
    // :s.s.s keeps interior dots; :a's trailing dots are NOT part of the
    // name (they lex as statement separators)
    assert(tps.head.s == Bound(Term.iri("http://e/s.s.s")))
    assert(tps.head.o == Bound(Term.iri("http://e/a")))
  }

  test("DESCRIBE * describes every in-scope variable") {
    val q = SparqlParser.parse(
      "DESCRIBE * WHERE { ?a <http://p> ?b }").asInstanceOf[Describe]
    assert(q.vars == Seq("a", "b") && q.iris.isEmpty)
    intercept[SparqlParser.SparqlParseError] {
      SparqlParser.parse("DESCRIBE *") // no WHERE: nothing in scope
    }
  }

  test("malformed escapes and out-of-range ints raise SparqlParseError") {
    intercept[SparqlParser.SparqlParseError] {
      SparqlParser.parse("SELECT * WHERE { <http://e\\uXYZW> ?p ?o }")
    }
    intercept[SparqlParser.SparqlParseError] {
      SparqlParser.parse("SELECT * WHERE { ?s ?p \"\\U00110000\" }")
    }
    intercept[SparqlParser.SparqlParseError] {
      SparqlParser.parse(
        "SELECT * WHERE { ?s ?p ?o } LIMIT 99999999999999999999")
    }
  }
}

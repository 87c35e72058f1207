package graft.w3c

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** W3C conformance: manifest-driven acceptance tests over the vendored
  * fixtures (same suites the reference runs in test/acceptance). Asserts
  * FULL pass — any regression names the failing entries. */
class W3cSuitesSpec extends AnyFunSuite {

  private def runSuite(dir: String, base: String,
                       skips: Set[String] = Set.empty): Unit = {
    val suite = W3c.loadManifest(dir, base)
    assert(suite.entries.nonEmpty, s"no entries in $dir")
    def basename(e: W3c.Entry): String = e.action.map { a =>
      val f = a.substring(a.lastIndexOf('/') + 1)
      val i = f.lastIndexOf('.')
      if (i > 0) f.substring(0, i) else f
    }.getOrElse("")
    val run = suite.entries.filterNot(e => skips(basename(e)))
    val failures = run.flatMap { e =>
      W3c.runEntry(suite, e) match {
        case W3c.Pass => None
        case W3c.Fail(r) => Some(s"${e.name.getOrElse(e.iri)}: $r")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size}/${run.size} failed:\n  " + failures.take(10).mkString("\n  "))
  }

  private val root = "/root/reference/test/data/rdf-tests/rdf11"
  private val webBase = "https://w3c.github.io/rdf-tests/rdf/rdf11"

  test("W3C RDF 1.1 Turtle suite (301 tests)") {
    runSuite(s"$root/rdf-turtle", s"$webBase/rdf-turtle/")
  }
  test("W3C RDF 1.1 N-Triples suite (70 tests)") {
    runSuite(s"$root/rdf-n-triples", s"$webBase/rdf-n-triples/")
  }
  test("W3C RDF 1.1 N-Quads suite (87 tests)") {
    runSuite(s"$root/rdf-n-quads", s"$webBase/rdf-n-quads/")
  }
  test("W3C RDF 1.1 TriG suite (341 tests)") {
    runSuite(s"$root/rdf-trig", s"$webBase/rdf-trig/")
  }

  // ---- RDF 1.2 / RDF-star suites (the same ones the reference runs in
  // test/acceptance/*star*). The reference SKIPS the six *-eval-bnode /
  // *-eval-annotation tests because star-aware dataset canonicalization
  // (the isomorphism backend) is not specified upstream (w3c/rdf-canon#2);
  // Rdfc10 now recurses through quoted-triple terms (a nested bnode keeps
  // the identity of its top-level occurrences), so this engine runs them.
  private val root12 = "/root/reference/test/data/rdf-tests/rdf12"
  private val webBase12 = "https://w3c.github.io/rdf-tests/rdf/rdf12"
  private val starEvalSkips = Set.empty[String]

  test("W3C RDF 1.2 Turtle-star syntax suite") {
    runSuite(s"$root12/rdf-turtle/syntax", s"$webBase12/rdf-turtle/syntax/")
  }
  test("W3C RDF 1.2 Turtle-star eval suite") {
    runSuite(s"$root12/rdf-turtle/eval", s"$webBase12/rdf-turtle/eval/", starEvalSkips)
  }
  test("W3C RDF 1.2 TriG-star syntax suite") {
    runSuite(s"$root12/rdf-trig/syntax", s"$webBase12/rdf-trig/syntax/")
  }
  test("W3C RDF 1.2 TriG-star eval suite") {
    runSuite(s"$root12/rdf-trig/eval", s"$webBase12/rdf-trig/eval/", starEvalSkips)
  }
  test("RDF-star N-Triples syntax suite") {
    runSuite("/root/reference/test/data/rdf-star/nt/syntax",
      "https://w3c.github.io/rdf-star/tests/nt/syntax#")
  }

  test("RDF-star N-Quads: graph-name variants parse and match the NT sibling") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val nqDir = "/root/reference/test/data/rdf-star/nq/syntax"
    val ntDir = "/root/reference/test/data/rdf-star/nt/syntax"
    val files = Files.list(Paths.get(nqDir)).iterator().asScala.toSeq
      .map(_.toString).filter(_.endsWith(".nq")).sorted
    assert(files.nonEmpty)
    for (f <- files) {
      val quads = NTriples.parseDocument(W3c.readFile(f))
      val graphs = quads.map(_.g).distinct
      assert(graphs == Seq(Term.iri("http://example/Graph")), s"$f graphs: $graphs")
      val nt = f.replace(nqDir, ntDir).replace("nquads-", "ntriples-").replace(".nq", ".nt")
      val triples = NTriples.parseDocument(W3c.readFile(nt))
      assert(quads.map(_.triple).toSet == triples.map(_.triple).toSet, s"$f != $nt")
    }
  }

  test("W3C RDFC-1.0 canonicalization suite (86 tests)") {
    val dir = "/root/reference/test/data/rdf-canon-tests"
    val base = "https://w3c.github.io/rdf-canon/tests/"
    val suite = W3c.loadManifest(dir, base)
    assert(suite.entries.nonEmpty)
    val failures = suite.entries.flatMap { e =>
      W3c.runCanonEntry(suite, e) match {
        case W3c.Pass => None
        case W3c.Fail(r) => Some(s"${e.name.getOrElse(e.iri)}: $r")
      }
    }
    assert(failures.isEmpty, failures.take(10).mkString("\n"))
  }

  test("star-aware canonicalization: nested bnodes keep their identity") {
    val p = Term.iri("http://e/p"); val o = Term.iri("http://e/o")
    def g(label: String): Seq[Quad] = {
      val b = Term.bnode(label)
      Seq(Quad(b, p, Term.quoted(Triple(b, p, o)), null))
    }
    // same shape, different labels: isomorphic (previously false — the
    // quoted occurrence was an opaque byte string)
    assert(Rdfc10.isomorphic(g("b1"), g("zzz")))
    // canonical output keeps the top-level/nested identity linked
    val (canon, _) = Rdfc10.canonicalize(g("b1"))
    assert(canon.head.s.value == "c14n0")
    assert(canon.head.o.value.contains("_:c14n0"), canon.head.o.value)
    assert(Rdfc10.isomorphic(g("b1"), canon))
    // a bnode appearing ONLY inside a quoted term still canonicalizes
    val only = Seq(Quad(Term.iri("http://e/s"), p,
      Term.quoted(Triple(Term.bnode("x"), p, o)), null))
    val (c2, m2) = Rdfc10.canonicalize(only)
    assert(m2.contains("x") && c2.head.o.value.contains("_:c14n0"))
    // code point order: astral chars sort AFTER U+E000.. (UTF-16 order
    // would invert these two lines)
    val l1 = Quad(Term.iri("http://e/s"), p, Term.str("�"), null)
    val l2 = Quad(Term.iri("http://e/s"), p, Term.str("😀"), null)
    val doc = Rdfc10.canonicalNQuads(Seq(l2, l1))
    assert(doc.indexOf("�") < doc.indexOf("😀"), doc)
  }

  test("isomorphism fixtures: isomorphic pairs match, non-isomorphic do not") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    def pairs(root: String): Seq[(String, Seq[Quad], Seq[Quad])] =
      Files.list(Paths.get(root)).iterator().asScala.toSeq.map(_.toString).sorted.map { d =>
        val fs = Files.list(Paths.get(d)).iterator().asScala.toSeq
          .map(_.toString).filter(f => f.endsWith(".nt") || f.endsWith(".nq")).sorted
        assert(fs.size == 2, s"$d: ${fs.size} files")
        (d, NTriples.parseDocument(W3c.readFile(fs(0))),
          NTriples.parseDocument(W3c.readFile(fs(1))))
      }
    for ((d, a, b) <- pairs("/root/reference/test/data/isomorphic"))
      assert(Rdfc10.isomorphic(a, b), s"$d should be isomorphic")
    for ((d, a, b) <- pairs("/root/reference/test/data/non-isomorphic"))
      assert(!Rdfc10.isomorphic(a, b), s"$d should NOT be isomorphic")
  }

  test("Turtle parser edges: label remap, case-sensitive booleans, dotted names") {
    // an explicit _:genid0 label can never merge with a generated
    // anonymous node (labels remap through the same per-document issuer)
    val g = Turtle.parse(
      "@prefix : <http://e/> . _:genid0 :p :o . [] :q :r .", "http://e/").triples
    assert(g.map(_.s.value).distinct.size == 2, g)
    // BooleanLiteral is case-sensitive: tRue is a syntax error...
    intercept[Turtle.TurtleError](
      Turtle.parse("@prefix : <http://e/> . :s :p tRue .", "http://e/"))
    // ...while `true:x` is a prefixed name, not a boolean
    val pn = Turtle.parse(
      "@prefix true: <http://t/> . true:x true:p true:o .", "http://e/").triples
    assert(pn.head.s.value == "http://t/x")
    // PN_PREFIX and bnode labels allow interior dot RUNS, never trailing
    val dots = Turtle.parse(
      "@prefix e..g: <http://d/> . e..g:a.b e..g:p _:l..m .", "http://e/").triples
    assert(dots.head.s.value == "http://d/a.b")
    intercept[Turtle.TurtleError](Turtle.parse(
      "@prefix : <http://e/> . :s :p _:b1.. ", "http://e/")) // stray 2nd dot
    // out-of-range \\U escapes are TurtleErrors, not JVM exceptions
    intercept[Turtle.TurtleError](Turtle.parse(
      "<http://e/s> <http://e/p> \"a\\UFFFFFFFF\" .", "http://e/"))
  }

  test("Turtle encoder compact forms: [] inlining and () list reconstruction") {
    val doc = """@prefix : <http://e/> .
                |:s :p [ :q "v" ; :r [ :t 1 ] ] .
                |:s :list (1 2 "three") .
                |:s :leaf [] .
                |:shared :a _:b . :shared2 :a _:b . _:b :x "y" .
                |[ :standalone true ] .""".stripMargin
    val g = Turtle.parse(doc, "http://e/").triples
    val enc = TurtleEncoder.encode(g, Map("" -> "http://e/"))
    // isomorphic after round-trip
    val back = Turtle.parse(enc, "http://e/").triples
    assert(Rdfc10.isomorphicTriples(g, back), s"encoded:\n$enc")
    // single-ref bnodes inlined, lists reconstructed, leaf as [],
    // anonymous top-level block; the doubly-referenced _:b stays labeled
    assert(enc.contains("[ "), enc)
    assert(enc.contains("(1 2 \"three\")"), enc)
    assert(enc.contains("[]"), enc)
    assert(enc.contains("_:"), enc) // shared bnode keeps its label
    assert(!enc.contains("rdf-syntax-ns#first"), enc) // chain fully consumed
  }

  test("Turtle encoder: PN_LOCAL-unsafe locals fall back to full IRIs, re-parseable") {
    import graft.core.Term
    // µ (U+00B5) passes Character.isLetterOrDigit but is NOT PN_CHARS —
    // a prefixed name ex:µg would not re-parse; é (U+00E9 >= 0xC0) is fine
    val g = Seq(
      graft.core.Triple(Term.iri("http://e/s"), Term.iri("http://e/µg"), Term.str("x")),
      graft.core.Triple(Term.iri("http://e/s"), Term.iri("http://e/pé"), Term.str("y")))
    val enc = TurtleEncoder.encode(g, Map("" -> "http://e/"))
    assert(enc.contains("<http://e/µg>"), enc) // full IRI, not :µg
    assert(enc.contains(":pé"), enc)           // PN_CHARS-safe local prefixed
    val back = Turtle.parse(enc, "http://e/").triples
    assert(Rdfc10.isomorphicTriples(g, back), s"encoded:\n$enc")
  }

  test("Turtle encoder: inline cycles demote to labeled bnodes, still isomorphic") {
    // a <-> b reference cycle, each referenced exactly once
    val a = Term.bnode("a"); val b = Term.bnode("b"); val p = Term.iri("http://e/p")
    val g = Seq(Triple(a, p, b), Triple(b, p, a))
    val enc = TurtleEncoder.encode(g)
    val back = Turtle.parse(enc).triples
    assert(Rdfc10.isomorphicTriples(g, back), s"encoded:\n$enc")
  }

  test("Turtle encoder: self-referential list head terminates and round-trips") {
    // _:l rdf:first _:l ; rdf:rest rdf:nil . — a reconstructed collection
    // whose single element is itself: cycle demotion must remove it from the
    // LIST structure (demoting only propInline used to loop forever here)
    val l = Term.bnode("l")
    val g = Seq(
      Triple(l, Term.iri(Vocab.rdfFirst), l),
      Triple(l, Term.iri(Vocab.rdfRest), Term.iri(Vocab.rdfNil)))
    val enc = TurtleEncoder.encode(g)
    val back = Turtle.parse(enc).triples
    assert(Rdfc10.isomorphicTriples(g, back), s"encoded:\n$enc")
  }

  test("Turtle encoder: list-of-lists cycle (head -> inner -> head) terminates") {
    // the list's single element is a bnode whose description references the
    // list head — whichever DFS order runs, the back edge lands on either
    // the propInline element or the LIST head; both must demote and stop
    val l = Term.bnode("l"); val m = Term.bnode("m")
    val p = Term.iri("http://e/p")
    val g = Seq(
      Triple(l, Term.iri(Vocab.rdfFirst), m),
      Triple(l, Term.iri(Vocab.rdfRest), Term.iri(Vocab.rdfNil)),
      Triple(m, p, l)) // cycle back to the list head
    val enc = TurtleEncoder.encode(g)
    val back = Turtle.parse(enc).triples
    assert(Rdfc10.isomorphicTriples(g, back), s"encoded:\n$enc")
  }

  test("Turtle encoder: bnodes inside quoted triples render labeled, never inlined") {
    val b = Term.bnode("b"); val c = Term.bnode("c")
    val s = Term.iri("http://e/s"); val p = Term.iri("http://e/p")
    val q = Term.iri("http://e/q"); val x = Term.iri("http://e/x")
    val g = Seq(
      // _:b: described, referenced once directly AND once inside << >> —
      // previously inlined at the direct site and duplicated inside the star
      Triple(b, x, Term.str("y")),
      Triple(s, p, b),
      Triple(s, q, Term.quoted(Triple(s, x, b))),
      // _:c: described, referenced ONLY inside << >> — previously emitted as
      // an anonymous [ ] block, orphaning the label in the star term
      Triple(c, x, Term.str("z")),
      Triple(s, q, Term.quoted(Triple(s, x, c))))
    val enc = TurtleEncoder.encode(g)
    assert(!enc.contains("<< ["), s"property list inside quoted triple:\n$enc")
    val back = Turtle.parse(enc).triples
    assert(Rdfc10.isomorphicTriples(g, back), s"encoded:\n$enc")
  }

  test("Turtle encoder round-trip over suite fixtures with bnodes/lists") {
    val dir = "/root/reference/test/data/rdf-tests/rdf11/rdf-turtle"
    val fixtures = Seq(
      "turtle-syntax-bnode-05.ttl", "turtle-syntax-bnode-06.ttl",
      "turtle-syntax-bnode-07.ttl", "turtle-syntax-bnode-08.ttl",
      "turtle-syntax-bnode-09.ttl", "turtle-syntax-bnode-10.ttl",
      "turtle-eval-lists-01.ttl", "turtle-eval-lists-02.ttl",
      "turtle-eval-lists-03.ttl", "turtle-eval-lists-04.ttl",
      "turtle-eval-lists-05.ttl",
      "turtle-subm-01.ttl", "turtle-subm-05.ttl", "turtle-subm-06.ttl",
      "turtle-subm-07.ttl", "turtle-subm-08.ttl", "turtle-subm-10.ttl",
      "turtle-subm-14.ttl")
    for (f <- fixtures) {
      val g = Turtle.parse(W3c.readFile(s"$dir/$f"), "http://example/base/").triples
      val enc = TurtleEncoder.encode(g)
      val back = Turtle.parse(enc, "http://example/base/").triples
      assert(Rdfc10.isomorphicTriples(g, back), s"$f encoded:\n$enc")
    }
  }

  test("Turtle encoder fuzz: 150 random graphs round-trip isomorphically") {
    val rnd = new scala.util.Random(20260816L)
    val ex = "http://e/"
    def randLiteral(): Term = rnd.nextInt(6) match {
      case 0 => Term.str(s"v${rnd.nextInt(50)} \"q\" \\n")
      case 1 => Term.int(rnd.nextInt(1000) - 500)
      case 2 => Term.typedLit(s"${rnd.nextInt(100)}.5", Vocab.xsdDecimal)
      case 3 => Term.typedLit("1.5E2", Vocab.xsdDouble)
      case 4 => Term.langLit(s"l${rnd.nextInt(20)}", "en")
      case _ => Term.bool(rnd.nextBoolean())
    }
    def randGraph(): Seq[Triple] = {
      val nBn = rnd.nextInt(4)
      // give each bnode a unique literal so RDFC stays cheap (no symmetry)
      val bnodes = (0 until nBn).map(i => Term.bnode(s"b$i"))
      val anchor = bnodes.zipWithIndex.map { case (b, i) =>
        Triple(b, Term.iri(ex + "id"), Term.str(s"bn$i")) }
      val body = (0 until 3 + rnd.nextInt(8)).map { _ =>
        val s = if (bnodes.nonEmpty && rnd.nextBoolean()) bnodes(rnd.nextInt(nBn))
                else Term.iri(ex + s"s${rnd.nextInt(5)}")
        val o = rnd.nextInt(4) match {
          case 0 if bnodes.nonEmpty => bnodes(rnd.nextInt(nBn))
          case 1 => Term.iri(ex + s"o${rnd.nextInt(5)}")
          case 2 => Term.quoted(Triple(Term.iri(ex + "qs"),
            Term.iri(ex + "qp"), randLiteral()))
          case _ => randLiteral()
        }
        Triple(s, Term.iri(ex + s"p${rnd.nextInt(4)}"), o)
      }
      // sometimes a collection
      val list = if (rnd.nextBoolean()) {
        val (h, ts) = graft.core.RdfList.toTriples(
          Seq(randLiteral(), randLiteral()), s"fuzz${rnd.nextInt(1000)}")
        Triple(Term.iri(ex + "s0"), Term.iri(ex + "list"), h) +: ts
      } else Nil
      (anchor ++ body ++ list).distinct
    }
    for (i <- 1 to 150) {
      val g = randGraph()
      val enc = TurtleEncoder.encode(g, Map("" -> ex))
      val back = Turtle.parse(enc, ex).triples
      assert(Rdfc10.isomorphicTriples(g, back), s"case $i:\n$enc")
    }
  }

  test("Turtle encoder round-trip: decode(encode(g)) isomorphic to g") {
    val g = Turtle.parse(W3c.readFile(
      "/root/reference/test/data/rdf-tests/rdf11/rdf-turtle/turtle-syntax-bnode-05.ttl"),
      "http://example/base/").triples
    val enc = TurtleEncoder.encode(g, Map("rdf" -> Vocab.rdf))
    val back = Turtle.parse(enc).triples
    assert(Rdfc10.isomorphicTriples(g, back), s"encoded:\n$enc")

    // and one with every literal shape
    val lits = Seq(
      Triple(Term.iri("http://e/s"), Term.iri("http://e/p"), Term.int(42)),
      Triple(Term.iri("http://e/s"), Term.iri("http://e/p"), Term.bool(true)),
      Triple(Term.iri("http://e/s"), Term.iri("http://e/p"),
        Term.typedLit("1.5", Vocab.xsdDecimal)),
      Triple(Term.iri("http://e/s"), Term.iri("http://e/p"),
        Term.typedLit("1.5E2", Vocab.xsdDouble)),
      Triple(Term.iri("http://e/s"), Term.iri("http://e/p"), Term.langLit("héllo\n", "en")),
      Triple(Term.bnode("x"), Term.iri("http://e/p"), Term.str("plain \"quoted\"")))
    val enc2 = TurtleEncoder.encode(lits)
    val back2 = Turtle.parse(enc2).triples
    assert(Rdfc10.isomorphicTriples(lits, back2), s"encoded:\n$enc2")
  }
}

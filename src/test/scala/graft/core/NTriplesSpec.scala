package graft.core

import org.scalatest.funsuite.AnyFunSuite

class NTriplesSpec extends AnyFunSuite {

  private val ex = "http://example.com/"

  test("encode terms") {
    assert(NTriples.termString(Term.iri(ex + "s")) == s"<${ex}s>")
    assert(NTriples.termString(Term.bnode("b1")) == "_:b1")
    assert(NTriples.termString(Term.str("hi")) == "\"hi\"")
    assert(NTriples.termString(Term.langLit("hi", "EN")) == "\"hi\"@en")
    assert(NTriples.termString(Term.int(42)) ==
      "\"42\"^^<http://www.w3.org/2001/XMLSchema#integer>")
    assert(NTriples.termString(Term.str("a\"b\n\\c\t")) == "\"a\\\"b\\n\\\\c\\t\"")
  }

  test("parse simple line") {
    val q = NTriples.parseLine(s"<${ex}s> <${ex}p> <${ex}o> .").get
    assert(q == Quad(Term.iri(ex + "s"), Term.iri(ex + "p"), Term.iri(ex + "o"), null))
  }

  test("parse literals") {
    val q = NTriples.parseLine(s"""<${ex}s> <${ex}p> "hello\\nworld" .""").get
    assert(q.o == Term.str("hello\nworld"))
    val q2 = NTriples.parseLine(s"""<${ex}s> <${ex}p> "bonjour"@fr-BE .""").get
    assert(q2.o == Term(TermKind.LITERAL, "bonjour", Vocab.rdfLangString, "fr-be"))
    val q3 = NTriples.parseLine(s"""<${ex}s> <${ex}p> "42"^^<${Vocab.xsdInteger}> .""").get
    assert(q3.o == Term.int(42))
    val q4 = NTriples.parseLine(s"""<${ex}s> <${ex}p> "\\u00E9\\U0001F600" .""").get
    assert(q4.o.value == "é😀")
  }

  test("parse bnodes and quads") {
    val q = NTriples.parseLine(s"_:a <${ex}p> _:b.1 <${ex}g> .").get
    assert(q.s == Term.bnode("a"))
    assert(q.o == Term.bnode("b.1"))
    assert(q.g == Term.iri(ex + "g"))
  }

  test("comments and blanks skipped") {
    assert(NTriples.parseLine("").isEmpty)
    assert(NTriples.parseLine("   # just a comment").isEmpty)
    val q = NTriples.parseLine(s"<${ex}s> <${ex}p> <${ex}o> . # trailing").get
    assert(q.s.value == ex + "s")
  }

  test("invalid lines rejected") {
    assertThrows[NTriples.ParseError](NTriples.parseLine(s"<${ex}s> <${ex}p> ."))
    assertThrows[NTriples.ParseError](NTriples.parseLine(s"""<${ex}s> "lit" <${ex}o> ."""))
    assertThrows[NTriples.ParseError](NTriples.parseLine(s"<relative> <${ex}p> <${ex}o> ."))
    assertThrows[NTriples.ParseError](NTriples.parseLine(s"<${ex}s> <${ex}p> <${ex}o>"))
  }

  test("round-trip property: encode then parse is identity (seeded fuzz)") {
    val rnd = new scala.util.Random(42)
    val chars = "abcXYZ09 \"\\\n\t\r\féä中😀'"
    def randStr(n: Int): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < n) {
        val c = chars.charAt(rnd.nextInt(chars.length))
        // avoid splitting surrogate pairs: 😀 is 2 chars in the pool string
        if (!Character.isSurrogate(c)) sb.append(c) else sb.append("😀")
        i += 1
      }
      sb.toString
    }
    def randObj(): Term = rnd.nextInt(5) match {
      case 0 => Term.iri(ex + "o" + rnd.nextInt(1000))
      case 1 => Term.bnode("b" + rnd.nextInt(1000))
      case 2 => Term.str(randStr(rnd.nextInt(20)))
      case 3 => Term.langLit(randStr(rnd.nextInt(20)), "en")
      case _ => Term.int(rnd.nextLong())
    }
    for (_ <- 1 to 500) {
      val s = if (rnd.nextBoolean()) Term.iri(ex + "s" + rnd.nextInt(100))
        else Term.bnode("s" + rnd.nextInt(100))
      val t = Triple(s, Term.iri(ex + "p" + rnd.nextInt(100)), randObj())
      val line = NTriples.tripleLine(t)
      assert(NTriples.parseTripleLine(line).contains(t), s"line: $line")
    }
  }

  test("sorted encode is code-point sorted") {
    val ts = Seq(
      Triple(Term.iri(ex + "b"), Term.iri(ex + "p"), Term.str("x")),
      Triple(Term.iri(ex + "a"), Term.iri(ex + "p"), Term.str("y")))
    val lines = NTriples.encode(ts.iterator, sorted = true).toSeq
    assert(lines == lines.sorted)
    assert(lines.head.contains("/a>"))
  }

  test("RDF-star quoted triples round-trip and validate positions") {
    val base = Triple(Term.iri(ex + "s"), Term.iri(ex + "p"), Term.str("o"))
    val q = Term.quoted(base)
    // construct -> destructure is the identity
    assert(q.asTriple.contains(base))
    // parse the quoted subject form, byte round-trip
    val line = s"${NTriples.termString(q)} <${ex}certainty> \"0.9\"^^<${Vocab.xsdDecimal}> ."
    val parsed = NTriples.parseTripleLine(line).get
    assert(parsed.s == q)
    assert(NTriples.tripleLine(parsed) == line)
    // nested quoting round-trips
    val nested = Term.quoted(Triple(q, Term.iri(ex + "r"), Term.int(1)))
    val line2 = s"${NTriples.termString(nested)} <${ex}z> <${ex}w> ."
    assert(NTriples.parseTripleLine(line2).get.s == nested)
    // quoted triple in predicate position -> reject
    assertThrows[NTriples.ParseError](
      NTriples.parseTripleLine(s"<${ex}a> ${NTriples.termString(q)} <${ex}b> ."))
    // literal as quoted-triple subject -> reject
    assertThrows[NTriples.ParseError](
      NTriples.parseTripleLine(s"""<< "XYZ" <${ex}p> <${ex}o> >> <${ex}q> <${ex}z> ."""))
    // quoted triple as graph name -> reject
    assertThrows[NTriples.ParseError](
      NTriples.parseLine(s"<${ex}a> <${ex}p> <${ex}b> ${NTriples.termString(q)} ."))
  }

  test("Turtle annotation {| |} asserts base triple plus quoted predications") {
    val doc = s"""@prefix : <$ex> .
                 |:s :p :o {| :r :z ; :w "v" |} .""".stripMargin
    val ts = Turtle.parse(doc).triples
    val base = Triple(Term.iri(ex + "s"), Term.iri(ex + "p"), Term.iri(ex + "o"))
    assert(ts.contains(base))
    assert(ts.contains(Triple(Term.quoted(base), Term.iri(ex + "r"), Term.iri(ex + "z"))))
    assert(ts.contains(Triple(Term.quoted(base), Term.iri(ex + "w"), Term.str("v"))))
    assert(ts.size == 3)
  }

  test("IRI escapes cannot smuggle forbidden chars; errors are ParseError") {
    // an escaped space/'>' inside an IRIREF is forbidden even when \u-encoded
    intercept[NTriples.ParseError](NTriples.parseLine(
      "<http://e/a\\u0020b> <http://e/p> <http://e/o> ."))
    intercept[NTriples.ParseError](NTriples.parseLine(
      "<http://e/a\\u003Eb> <http://e/p> <http://e/o> ."))
    // truncated / malformed escapes raise ParseError, never raw JVM errors
    intercept[NTriples.ParseError](NTriples.parseLine("<http://x/\\"))
    intercept[NTriples.ParseError](NTriples.parseLine(
      "<http://e/s> <http://e/p> \"\\uWXYZ\" ."))
    intercept[NTriples.ParseError](NTriples.parseLine(
      "<http://e/s> <http://e/p> \"\\U00110000\" ."))
    // whitespace between '^^' and the datatype IRIREF is legal
    val t = NTriples.parseLine(
      "<http://e/s> <http://e/p> \"5\"^^ <http://www.w3.org/2001/XMLSchema#integer> .")
    assert(t.exists(_.o.datatype.endsWith("integer")))
    // a missing '<' after '^^' names the real problem
    val e = intercept[NTriples.ParseError](NTriples.parseLine(
      "<http://e/s> <http://e/p> \"5\"^^xsd:integer ."))
    assert(e.msg.contains("expected '<'"))
    // non-letter punctuation beyond ASCII cannot continue a bnode label
    intercept[NTriples.ParseError](NTriples.parseLine(
      "<http://e/s> <http://e/p> _:a\u2014b ."))
  }
}

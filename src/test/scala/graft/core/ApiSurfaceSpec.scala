package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Pure-Scala API surface ported from the reference: PrefixMap,
  * PropertyMap, RDF.List read-back, rdf:JSON/JCS, EARL. */
class ApiSurfaceSpec extends AnyFunSuite {

  test("PrefixMap: add/put/merge conflict semantics (prefix_map.ex)") {
    val pm = PrefixMap.of("ex" -> "http://example.com/", "foaf" -> "http://xmlns.com/foaf/0.1/")
    assert(pm.namespace("ex").contains("http://example.com/"))
    assert(pm.prefix("http://xmlns.com/foaf/0.1/").contains("foaf"))
    // add: same mapping ok, different namespace refused
    assert(pm.add("ex", "http://example.com/").isRight)
    assert(pm.add("ex", "http://other.org/").isLeft)
    assert(pm.put("ex", "http://other.org/").namespace("ex").contains("http://other.org/"))
    // merge: conflict reported / resolver applied
    val other = PrefixMap.of("ex" -> "http://other.org/", "x" -> "http://x.org/")
    assert(pm.merge(other) == Left(Seq("ex")))
    val resolved = pm.merge(other, (_, ns1, _) => ns1)
    assert(resolved.namespace("ex").contains("http://example.com/"))
    assert(resolved.namespace("x").contains("http://x.org/"))
    assert(pm.drop("foaf").prefixes == Seq("ex"))
  }

  test("PrefixMap: longest-namespace match and pname expansion") {
    val pm = PrefixMap.of("a" -> "http://e.com/", "b" -> "http://e.com/deep/")
    assert(pm.prefixNamePair("http://e.com/deep/x").contains(("b", "x")))
    assert(pm.prefixNamePair("http://e.com/y").contains(("a", "y")))
    assert(pm.prefixNamePair("http://nope.org/z").isEmpty)
    assert(pm.expand("b:local").contains("http://e.com/deep/local"))
    assert(pm.expand("nope:local").isEmpty)
  }

  test("PropertyMap: bidirectional term<->IRI (property_map.ex)") {
    val pm = PropertyMap.of("name" -> "http://xmlns.com/foaf/0.1/name")
    assert(pm.iri("name").contains("http://xmlns.com/foaf/0.1/name"))
    assert(pm.term("http://xmlns.com/foaf/0.1/name").contains("name"))
    assert(pm.add("name", "http://other/").isLeft)
    assert(pm.put("name", "http://other/").iri("name").contains("http://other/"))
  }

  test("RdfList walks first/rest chains back out of a graph (list.ex)") {
    val doc = "@prefix : <http://e/> . :s :p (1 2 \"three\") ."
    val g = Turtle.parse(doc, "http://e/").triples
    val head = g.find(_.p.value == "http://e/p").get.o
    val l = RdfList.from(head, g).get
    assert(l.length == 3)
    assert(l.values.map(_.value) == Vector("1", "2", "three"))
    assert(l.isValid)
    // empty list = rdf:nil head
    assert(RdfList.from(Term.iri(Vocab.rdfNil), g).get.isEmpty)
    // broken chain: no description for the head
    assert(RdfList.from(Term.bnode("nowhere"), g).isEmpty)
    // cycle detection
    val n = Term.bnode("c")
    val cyc = Seq(
      Triple(n, Term.iri(Vocab.rdfFirst), Term.int(1)),
      Triple(n, Term.iri(Vocab.rdfRest), n))
    assert(RdfList.from(n, cyc).isEmpty)
    // toTriples round-trip with deterministic labels
    val (h2, ts2) = RdfList.toTriples(Seq(Term.int(1), Term.str("x")), "http://e/doc")
    val back = RdfList.from(h2, ts2).get
    assert(back.values == Vector(Term.int(1), Term.str("x")))
    assert(RdfList.toTriples(Seq(Term.int(1)), "http://e/doc")._1 ==
      RdfList.toTriples(Seq(Term.int(1)), "http://e/doc")._1)
  }

  test("JCS: RFC 8785 canonical JSON (rdf:JSON datatype)") {
    // key sorting, whitespace removal, escape minimization
    assert(Jcs.canonicalize("""{ "b" : 1, "a" : [true, null, "x"] }""")
      .contains("""{"a":[true,null,"x"],"b":1}"""))
    // number formatting: ECMA shortest forms
    assert(Jcs.canonicalize("[1.0, 1e1, 0.5, -0.0, 1e21, 1e-7, 333333333.3333333]")
      .contains("""[1,10,0.5,0,1e+21,1e-7,333333333.3333333]"""))
    // string escapes: control chars lowercase \u00xx, minimal ECHAR
    assert(Jcs.canonicalize("[\"\\u000b\\t\"]").contains("[\"\\u000b\\t\"]"))
    // duplicate keys rejected (I-JSON)
    assert(Jcs.canonicalize("""{"a":1,"a":2}""").isEmpty)
    assert(Jcs.canonicalize("not json").isEmpty)
    // Xsd dispatch integration
    assert(Xsd.valid("""{"b":1,"a":2}""", Vocab.rdfJson))
    assert(Xsd.canonicalLexical(""" { "b" : 1, "a" : 2 } """, Vocab.rdfJson)
      .contains("""{"a":2,"b":1}"""))
    assert(!Xsd.valid("{", Vocab.rdfJson))
  }

  test("XsdExtra: hexBinary and gYear-family plug in via the registry") {
    XsdExtra.register()
    assert(Xsd.valid("0fB7", XsdExtra.xsdHexBinary))
    assert(!Xsd.valid("0fB", XsdExtra.xsdHexBinary)) // odd digit count
    assert(Xsd.canonicalLexical("0fb7", XsdExtra.xsdHexBinary).contains("0FB7"))
    assert(Xsd.valid("2026", XsdExtra.xsdGYear))
    assert(Xsd.valid("-0044", XsdExtra.xsdGYear))
    assert(!Xsd.valid("202", XsdExtra.xsdGYear))
    assert(Xsd.canonicalLexical("2026+00:00", XsdExtra.xsdGYear).contains("2026Z"))
    assert(Xsd.valid("2026-08", XsdExtra.xsdGYearMonth))
    assert(!Xsd.valid("2026-13", XsdExtra.xsdGYearMonth))
    assert(Xsd.canonicalLexical("2026-08-00:00", XsdExtra.xsdGYearMonth)
      .contains("2026-08Z"))
    // XML Schema: leading zeros prohibited for years of more than 4 digits
    assert(!Xsd.valid("02026", XsdExtra.xsdGYear))
    assert(!Xsd.valid("-02026", XsdExtra.xsdGYear))
    assert(Xsd.valid("12026", XsdExtra.xsdGYear))
    assert(!Xsd.valid("02026-08", XsdExtra.xsdGYearMonth))
  }

  test("XsdExtra: gMonthDay/gDay/gMonth complete the Gregorian tree") {
    XsdExtra.register()
    assert(Xsd.valid("--08-17", XsdExtra.xsdGMonthDay))
    assert(Xsd.valid("--02-29", XsdExtra.xsdGMonthDay)) // some year has it
    assert(!Xsd.valid("--02-30", XsdExtra.xsdGMonthDay)) // no year does
    assert(!Xsd.valid("--13-01", XsdExtra.xsdGMonthDay))
    assert(!Xsd.valid("--08-17T00:00", XsdExtra.xsdGMonthDay))
    assert(Xsd.canonicalLexical("--08-17+00:00", XsdExtra.xsdGMonthDay)
      .contains("--08-17Z"))
    assert(Xsd.canonicalLexical("--08-17+05:00", XsdExtra.xsdGMonthDay)
      .contains("--08-17+05:00"))
    assert(Xsd.valid("---31", XsdExtra.xsdGDay))
    assert(!Xsd.valid("---32", XsdExtra.xsdGDay))
    assert(!Xsd.valid("--31", XsdExtra.xsdGDay)) // wrong prefix arity
    assert(Xsd.canonicalLexical("---05-00:00", XsdExtra.xsdGDay)
      .contains("---05Z"))
    assert(Xsd.valid("--12", XsdExtra.xsdGMonth))
    assert(!Xsd.valid("--00", XsdExtra.xsdGMonth))
    assert(Xsd.canonicalLexical("--12Z", XsdExtra.xsdGMonth).contains("--12Z"))
  }

  test("XsdExtra: normalizedString family validates value-space membership") {
    XsdExtra.register()
    assert(Xsd.valid("a  b c", XsdExtra.xsdNormalizedString))
    assert(!Xsd.valid("a\tb", XsdExtra.xsdNormalizedString))
    assert(!Xsd.valid("a\nb", XsdExtra.xsdNormalizedString))
    assert(Xsd.valid("a b c", XsdExtra.xsdToken))
    assert(!Xsd.valid(" a", XsdExtra.xsdToken))
    assert(!Xsd.valid("a ", XsdExtra.xsdToken))
    assert(!Xsd.valid("a  b", XsdExtra.xsdToken)) // double internal space
    assert(Xsd.valid("en-US", XsdExtra.xsdLanguage))
    assert(Xsd.valid("zh-Hant-TW", XsdExtra.xsdLanguage))
    assert(!Xsd.valid("toolonglang1", XsdExtra.xsdLanguage))
    assert(!Xsd.valid("en_US", XsdExtra.xsdLanguage))
    // NMTOKEN allows leading digits/dots; Name needs a NameStartChar
    assert(Xsd.valid("1.0-beta", XsdExtra.xsdNmtoken))
    assert(!Xsd.valid("a b", XsdExtra.xsdNmtoken))
    assert(Xsd.valid("xs:name", XsdExtra.xsdName))
    assert(!Xsd.valid("1name", XsdExtra.xsdName))
    assert(Xsd.valid("_under", XsdExtra.xsdNcName))
    assert(!Xsd.valid("xs:name", XsdExtra.xsdNcName)) // colon excluded
    assert(Xsd.valid("élève", XsdExtra.xsdNcName)) // Latin-1 letters
    // canonical mapping is identity on valid, None on invalid
    assert(Xsd.canonicalLexical("a b", XsdExtra.xsdToken).contains("a b"))
    assert(Xsd.canonicalLexical(" a", XsdExtra.xsdToken).isEmpty)
  }

  test("JCS: \\u escape requires exactly four hex digits (RFC 8259)") {
    // NB: built by concatenation — scalac pre-processes literal \u sequences
    def js(body: String) = "\"" + body + "\""
    val bs = "\\"
    assert(Jcs.parse(js(bs + "u0041")).contains(Jcs.JStr("A")))
    assert(Jcs.parse(js(bs + "u+041")).isEmpty) // parseInt would accept '+'
    assert(Jcs.parse(js(bs + "u-041")).isEmpty)
    assert(Jcs.parse(js(bs + "u00 1")).isEmpty)
  }

  test("RDF 1.2 directional language tags type as rdf:dirLangString") {
    val Seq(q) = NTriples.parseLine("""<http://e/s> <http://e/p> "x"@en--ltr .""").toSeq
    assert(q.o.datatype == Vocab.rdfDirLangString)
    assert(q.o.langBase == "en")
    assert(q.o.baseDirection == "ltr")
    // plain tags keep rdf:langString and a null direction
    val Seq(q2) = NTriples.parseLine("""<http://e/s> <http://e/p> "x"@en-US .""").toSeq
    assert(q2.o.datatype == Vocab.rdfLangString)
    assert(q2.o.langBase == "en-us" && q2.o.baseDirection == null)
    // dir and non-dir literals are distinct terms even with equal lexicals
    assert(q.o != Term.langLit("x", "en--ltr"))
    // round-trips through the NT writer
    assert(NTriples.termString(q.o) == "\"x\"@en--ltr")
    // and through Turtle
    val g = Turtle.parse("""<http://e/s> <http://e/p> "x"@en--rtl .""").triples
    assert(g.head.o.datatype == Vocab.rdfDirLangString)
    assert(g.head.o.baseDirection == "rtl")
  }

  test("source hygiene: no raw NUL bytes in any Scala source (keeps git text-diffs)") {
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    val roots = Seq(Paths.get("src/main/scala"), Paths.get("src/test/scala"))
    val offenders = roots.flatMap { root =>
      Files.walk(root).iterator().asScala
        .filter(p => p.toString.endsWith(".scala"))
        .filter(p => Files.readAllBytes(p).contains(0.toByte))
    }
    assert(offenders.isEmpty, s"raw NUL bytes in: ${offenders.mkString(", ")}")
  }

  test("Vocabulary namespace DSL: terms as identifiers, strict mode") {
    val schema = Vocabulary("http://schema.org/")
    assert(schema.name == Term.iri("http://schema.org/name"))
    assert(schema.Person == Term.iri("http://schema.org/Person"))
    assert(schema("weird-term") == Term.iri("http://schema.org/weird-term"))
    assert(schema.iri("name") == "http://schema.org/name")
    val strict = Vocabulary.strict("http://ex.org/v#", "alpha", "beta")
    assert(strict.alpha == Term.iri("http://ex.org/v#alpha"))
    assertThrows[NoSuchElementException](strict.gamma)
    assert(strict.terms.map(_.value) ==
      Seq("http://ex.org/v#alpha", "http://ex.org/v#beta"))
  }

  test("EARL report is valid Turtle with one assertion per test") {
    val rep = graft.w3c.Earl.report("https://example.org/graft",
      Seq("http://t/1" -> true, "http://t/2" -> false))
    val g = Turtle.parse(rep).triples
    assert(g.count(t => t.p.value == graft.w3c.Earl.earl + "outcome") == 2)
    assert(g.exists(t => t.o.value == graft.w3c.Earl.earl + "passed"))
    assert(g.exists(t => t.o.value == graft.w3c.Earl.earl + "failed"))
  }

  test("TriG encoder: default graph + named blocks round-trip") {
    import Sigils._
    val ex = "http://ex.org/"
    val quads = Seq(
      Quad(iri"${ex}s1", iri"${ex}p", lit"in default", null),
      Quad(iri"${ex}s1", iri"${ex}p", Term.int(1), iri"${ex}g1"),
      Quad(iri"${ex}s2", Term.iri(Vocab.rdfType), iri"${ex}T", iri"${ex}g1"),
      Quad(iri"${ex}s3", iri"${ex}p", lang"salut@fr", iri"${ex}g2"))
    val doc = TrigEncoder.encode(quads, Map("ex" -> ex))
    assert(doc.contains("@prefix ex:"))
    assert(doc.contains("GRAPH ex:g1 {"))
    assert(doc.contains("GRAPH ex:g2 {"))
    assert(doc.contains("ex:s2\n        a ex:T") || doc.contains("a ex:T"))
    val back = Turtle.parseTriG(doc).quads
    assert(back.toSet == quads.toSet)
    // bnode-containing graph: compare modulo bnode naming per graph
    val bq = Seq(
      Quad(iri"${ex}s4", iri"${ex}p", Term.bnode("x"), null),
      Quad(Term.bnode("x"), iri"${ex}q", lit"leaf", null))
    val doc2 = TrigEncoder.encode(bq)
    val back2 = Turtle.parseTriG(doc2).quads
    assert(Rdfc10.isomorphic(bq, back2))
  }

  test("TriG encoder: bnodes shared across graphs stay labeled (identity preserved)") {
    import Sigils._
    val ex = "http://ex.org/"
    // _:b is annotated in G1 and described in G2: an anonymous form in
    // either body would sever the identity on re-parse
    val bq = Seq(
      Quad(iri"${ex}a", iri"${ex}p", Term.bnode("b"), iri"${ex}g1"),
      Quad(Term.bnode("b"), iri"${ex}q", lit"leaf", iri"${ex}g2"),
      // and a bnode leaf used once in EACH of two graphs (would be "[]")
      Quad(iri"${ex}c", iri"${ex}p", Term.bnode("x"), iri"${ex}g1"),
      Quad(iri"${ex}d", iri"${ex}p", Term.bnode("x"), iri"${ex}g2"))
    val doc = TrigEncoder.encode(bq)
    assert(!doc.contains("[]") && !doc.contains("[ "), doc)
    val back = Turtle.parseTriG(doc).quads
    assert(Rdfc10.isomorphic(bq, back), doc)
    // within ONE graph, compact forms are still used
    val single = Seq(
      Quad(iri"${ex}a", iri"${ex}p", Term.bnode("y"), iri"${ex}g1"),
      Quad(Term.bnode("y"), iri"${ex}q", lit"leaf", iri"${ex}g1"))
    assert(TrigEncoder.encode(single).contains("[ "), TrigEncoder.encode(single))
  }

  test("sigil interpolators build terms like RDF.Sigils (~i/~b/~L)") {
    import Sigils._
    val host = "example.com"
    assert(iri"http://$host/x" == Term.iri("http://example.com/x"))
    assert(bnode"b1" == Term.bnode("b1"))
    assert(lit"hello" == Term.str("hello"))
    assert(lang"bonjour@fr" == Term.langLit("bonjour", "fr"))
    assertThrows[IllegalArgumentException](lang"notag")
  }

  test("GraphBuilder: base/prefix resolution, a, describe, exclude") {
    import Sigils._
    val g = GraphBuilder()
      .base("http://example.com/base/")
      .prefix("foaf", "http://xmlns.com/foaf/0.1/")
      .describe("<#me>")(
        ("foaf:name", lit"John"),
        ("foaf:age", Term.int(42)))
      .add("<#me>", GraphBuilder().a, "foaf:Person")
      .add("<other>", "foaf:knows", "<#me>")
      .add("<#me>", "foaf:nick", lit"dropme")
      .exclude("<#me>", "foaf:nick", lit"dropme")
      .build
    val me = Term.iri("http://example.com/base/#me")
    assert(g.size == 4)
    assert(g.contains(Triple(me,
      Term.iri("http://xmlns.com/foaf/0.1/name"), Term.str("John"))))
    assert(g.contains(Triple(me, Term.iri(Vocab.rdfType),
      Term.iri("http://xmlns.com/foaf/0.1/Person"))))
    assert(g.contains(Triple(Term.iri("http://example.com/base/other"),
      Term.iri("http://xmlns.com/foaf/0.1/knows"), me)))
    assert(!g.exists(_.p.value.endsWith("nick")))
    // built triples + declared prefixes feed the Turtle encoder directly
    val b = GraphBuilder().prefix("foaf", "http://xmlns.com/foaf/0.1/")
    val ttl = TurtleEncoder.encode(g,
      prefixes = Map("foaf" -> "http://xmlns.com/foaf/0.1/"))
    assert(ttl.contains("foaf:name") && ttl.contains("@prefix foaf:"))
    assert(b.prefixes.expand("foaf:name").contains("http://xmlns.com/foaf/0.1/name"))
  }
}

package graft.w3c

import java.nio.file.{Files, Paths}
import graft.core._

/** W3C test-suite harness: manifest-driven acceptance tests, the same model
  * the reference uses (test/support/test_suite.ex loads manifest.ttl and
  * generates one test per entry). Fixtures are read from the vendored
  * read-only copies under /root/reference/test/data. */
object W3c {

  val mf = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
  val rdft = "http://www.w3.org/ns/rdftest#"
  val rdfc = "https://w3c.github.io/rdf-canon/tests/vocab#"

  final case class Entry(iri: String, kinds: Set[String], name: Option[String],
                         action: Option[String], result: Option[String],
                         hashAlgorithm: Option[String] = None)

  final case class Suite(dir: String, base: String, entries: Seq[Entry])

  def readFile(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), java.nio.charset.StandardCharsets.UTF_8)

  /** Load a manifest.ttl; `base` is the IRI the action/result files resolve
    * against (assumedTestBase, or a synthetic file base). */
  def loadManifest(dir: String, base: String): Suite = {
    val doc = Turtle.parse(readFile(s"$dir/manifest.ttl"), base)
    val bySubj = doc.triples.groupBy(_.s)
    def objs(s: Term, p: String): Seq[Term] =
      bySubj.getOrElse(s, Nil).filter(_.p.value == p).map(_.o)
    val entries = doc.triples
      .filter(t => t.p.value == Vocab.rdfType &&
        (t.o.value.startsWith(rdft) || t.o.value.startsWith(rdfc)))
      .map(_.s).distinct
      .map { s =>
        Entry(
          s.value,
          objs(s, Vocab.rdfType).map(_.value).toSet,
          objs(s, mf + "name").headOption.map(_.value),
          objs(s, mf + "action").headOption.map(_.value),
          objs(s, mf + "result").headOption.map(_.value),
          objs(s, rdfc + "hashAlgorithm").headOption.map(_.value))
      }
    Suite(dir, base, entries)
  }

  /** Local filesystem path of a test file IRI (resolved under dir). */
  def localPath(dir: String, base: String, iri: String): String = {
    val rel = if (iri.startsWith(base)) iri.substring(base.length)
      else iri.substring(iri.lastIndexOf('/') + 1)
    s"$dir/$rel"
  }

  sealed trait Outcome
  case object Pass extends Outcome
  final case class Fail(reason: String) extends Outcome

  /** Run one syntax/eval entry for a line-based or Turtle format. */
  def runEntry(suite: Suite, e: Entry): Outcome = {
    val kind = e.kinds.find(_.startsWith(rdft)).getOrElse(e.kinds.head)
    val actionPath = e.action.map(a => localPath(suite.dir, suite.base, a))
    def parseAction(): Seq[Quad] = {
      val path = actionPath.get
      val content = readFile(path)
      if (path.endsWith(".ttl")) {
        val base = e.action.get
        Turtle.parse(content, base).triples.map(t => Quad(t.s, t.p, t.o, null))
      } else if (path.endsWith(".trig"))
        Turtle.parseTriG(content, e.action.get).quads
      else if (path.endsWith(".nt"))
        NTriples.parseDocument(content).map { q =>
          if (q.g != null) throw NTriples.ParseError("graph term in N-Triples", "")
          q
        }
      else NTriples.parseDocument(content)
    }
    def parseResult(): Seq[Quad] = {
      val path = localPath(suite.dir, suite.base, e.result.get)
      NTriples.parseDocument(readFile(path))
    }
    try {
      kind.stripPrefix(rdft) match {
        case "TestTurtlePositiveSyntax" | "TestNTriplesPositiveSyntax" |
             "TestNQuadsPositiveSyntax" | "TestTrigPositiveSyntax" =>
          parseAction(); Pass
        case "TestTurtleNegativeSyntax" | "TestNTriplesNegativeSyntax" |
             "TestNQuadsNegativeSyntax" | "TestTrigNegativeSyntax" |
             "TestTurtleNegativeEval" | "TestTrigNegativeEval" =>
          try { parseAction(); Fail("expected parse error, got success") }
          catch { case _: Exception => Pass }
        case "TestTurtleEval" | "TestTrigEval" =>
          val got = parseAction()
          val expected = parseResult()
          if (Rdfc10.isomorphic(got, expected)) Pass
          else Fail(s"not isomorphic: got ${got.size} quads, expected ${expected.size}")
        case other => Fail(s"unsupported test type $other")
      }
    } catch {
      case ex: Exception => Fail(s"${ex.getClass.getSimpleName}: ${ex.getMessage}")
    }
  }

  /** Run one RDFC-1.0 canonicalization entry (RDFC10EvalTest /
    * RDFC10MapTest / RDFC10NegativeEvalTest) — shared by the conformance
    * spec and the EARL report generator. */
  def runCanonEntry(suite: Suite, e: Entry): Outcome = {
    val kind = e.kinds.find(_.startsWith(rdfc)).map(_.stripPrefix(rdfc))
    val algo = e.hashAlgorithm.map {
      case "SHA384" => "SHA-384"; case "SHA512" => "SHA-512"; case a => a
    }.getOrElse("SHA-256")
    try {
      val in = NTriples.parseDocument(readFile(localPath(suite.dir, suite.base, e.action.get)))
      kind match {
        case Some("RDFC10EvalTest") =>
          val expected = readFile(localPath(suite.dir, suite.base, e.result.get))
          if (Rdfc10.canonicalNQuads(in, hashAlgorithm = algo) == expected) Pass
          else Fail("canonical nquads differ")
        case Some("RDFC10MapTest") =>
          val expectedJson = readFile(localPath(suite.dir, suite.base, e.result.get))
          val expPairs = "\"([^\"]+)\"\\s*:\\s*\"([^\"]+)\"".r
            .findAllMatchIn(expectedJson).map(m => m.group(1) -> m.group(2)).toMap
          val (_, mapping) = Rdfc10.canonicalize(in, hashAlgorithm = algo)
          if (mapping == expPairs) Pass else Fail("mapping differs")
        case Some("RDFC10NegativeEvalTest") =>
          // poison graph must trip the HNDQ call budget
          try { Rdfc10.canonicalize(in, hndqCallLimit = 3); Fail("no poison abort") }
          catch { case _: Rdfc10.PoisonedGraph => Pass }
        case other => Fail(s"unsupported $other")
      }
    } catch {
      case ex: Exception => Fail(s"${ex.getClass.getSimpleName}: ${ex.getMessage}")
    }
  }
}

/** Scorer: run the rdf11 Turtle/NT/NQ suites + rdf-canon and print rates.
  *   sbt "runMain graft.w3c.W3cScore [filter]"
  */
object W3cScore {
  import W3c._

  private val suites = Seq(
    ("/root/reference/test/data/rdf-tests/rdf11/rdf-turtle",
      "https://w3c.github.io/rdf-tests/rdf/rdf11/rdf-turtle/"),
    ("/root/reference/test/data/rdf-tests/rdf11/rdf-n-triples",
      "https://w3c.github.io/rdf-tests/rdf/rdf11/rdf-n-triples/"),
    ("/root/reference/test/data/rdf-tests/rdf11/rdf-n-quads",
      "https://w3c.github.io/rdf-tests/rdf/rdf11/rdf-n-quads/"),
    ("/root/reference/test/data/rdf-tests/rdf11/rdf-trig",
      "https://w3c.github.io/rdf-tests/rdf/rdf11/rdf-trig/"))

  private val subjectIri = "https://example.org/graft/rdfexspark"

  def main(args: Array[String]): Unit = {
    val filter = args.headOption.getOrElse("")
    for ((dir, base) <- suites if dir.contains(filter) || filter.isEmpty) {
      val suite = loadManifest(dir, base)
      var pass = 0; var fail = 0
      val failures = Seq.newBuilder[(String, String)]
      val results = Seq.newBuilder[(String, Boolean)]
      for (e <- suite.entries) {
        runEntry(suite, e) match {
          case Pass => pass += 1; results += e.iri -> true
          case Fail(r) =>
            fail += 1; failures += ((e.name.getOrElse(e.iri), r))
            results += e.iri -> false
        }
      }
      val name = dir.substring(dir.lastIndexOf('/') + 1)
      println(s"== $name: $pass pass, $fail fail, ${suite.entries.size} total")
      failures.result().take(25).foreach { case (n, r) => println(s"  FAIL $n: ${r.take(140)}") }
      // EARL report per suite (earl_formatter.ex shape)
      val out = java.nio.file.Paths.get(s"target/earl_reports/$name.ttl")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out, Earl.report(subjectIri, results.result()))
    }
    // rdf-canon suite
    canonScore(filter)
  }

  def canonScore(filter: String): Unit = {
    if (filter.nonEmpty && !"canon".contains(filter)) return
    val dir = "/root/reference/test/data/rdf-canon-tests"
    val base = "https://w3c.github.io/rdf-canon/tests/"
    val suite = loadManifest(dir, base)
    var pass = 0; var fail = 0
    val failures = Seq.newBuilder[(String, String)]
    for (e <- suite.entries) {
      val kind = e.kinds.find(_.startsWith(rdfc)).map(_.stripPrefix(rdfc)).getOrElse("?")
      val algo = e.hashAlgorithm.map {
        case "SHA384" => "SHA-384"; case "SHA512" => "SHA-512"; case a => a
      }.getOrElse("SHA-256")
      val r = try {
        val in = NTriples.parseDocument(readFile(localPath(dir, base, e.action.get)))
        kind match {
          case "RDFC10EvalTest" =>
            val expected = readFile(localPath(dir, base, e.result.get))
            val got = Rdfc10.canonicalNQuads(in, hashAlgorithm = algo)
            if (got == expected) Pass else Fail("canonical nquads differ")
          case "RDFC10MapTest" =>
            val expectedJson = readFile(localPath(dir, base, e.result.get))
            val (_, mapping) = Rdfc10.canonicalize(in, hashAlgorithm = algo)
            // compare as sorted key:value pairs against the trivial JSON
            val expPairs = "\"([^\"]+)\"\\s*:\\s*\"([^\"]+)\"".r
              .findAllMatchIn(expectedJson).map(m => m.group(1) -> m.group(2)).toMap
            if (mapping == expPairs) Pass
            else Fail(s"mapping differs: got $mapping expected $expPairs")
          case "RDFC10NegativeEvalTest" =>
            try { Rdfc10.canonicalize(in, hndqCallLimit = 3); Fail("expected poison abort") }
            catch { case _: Rdfc10.PoisonedGraph => Pass }
          case other => Fail(s"unsupported canon type $other")
        }
      } catch { case ex: Exception => Fail(s"${ex.getClass.getSimpleName}: ${ex.getMessage}") }
      r match {
        case Pass => pass += 1
        case Fail(reason) => fail += 1; failures += ((e.name.getOrElse(e.iri), reason))
      }
    }
    println(s"== rdf-canon: $pass pass, $fail fail, ${suite.entries.size} total")
    failures.result().take(25).foreach { case (n, r) => println(s"  FAIL $n: ${r.take(140)}") }
  }
}

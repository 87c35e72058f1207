package graft.w3c

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Turtle, Vocab}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** EARL regeneration + suite freshness (the CI face of the W3C suites):
  *
  *  1. every `manifest.ttl` vendored under the reference's test data is
  *     either exercised directly below or an umbrella whose children are —
  *     a newly vendored suite fails this test until it is wired in;
  *  2. every manifest entry is RUN against the current build or sits in
  *     the documented skip list with a reason (zero silent skips) —
  *     skipped entries appear in the report as earl:untested, never as
  *     silently-absent assertions;
  *  3. the regenerated reports are written to docs/earl/<suite>.ttl and
  *     round-trip through our own Turtle codec with one earl:Assertion
  *     per manifest entry.
  */
class EarlSpec extends AnyFunSuite {

  private val subject = "https://graft.dev/rdfex-spark"
  private val dataRoot = "/root/reference/test/data"
  private val outDir = Paths.get("docs/earl")

  // Documented skip list (entry action basename -> reason). Matches the
  // The reference skips the six star-eval bnode/annotation tests
  // (star-aware canonicalization is unspecified upstream,
  // w3c/rdf-canon#2); Rdfc10 now recurses through quoted-triple terms,
  // so this engine RUNS and passes them — no skips remain.
  private val skips: Map[String, String] = Map.empty

  private case class SuiteDef(id: String, dir: String, base: String,
                              canon: Boolean = false)

  private val web11 = "https://w3c.github.io/rdf-tests/rdf/rdf11"
  private val web12 = "https://w3c.github.io/rdf-tests/rdf/rdf12"
  private val suites = Seq(
    SuiteDef("rdf11-turtle", s"$dataRoot/rdf-tests/rdf11/rdf-turtle", s"$web11/rdf-turtle/"),
    SuiteDef("rdf11-ntriples", s"$dataRoot/rdf-tests/rdf11/rdf-n-triples", s"$web11/rdf-n-triples/"),
    SuiteDef("rdf11-nquads", s"$dataRoot/rdf-tests/rdf11/rdf-n-quads", s"$web11/rdf-n-quads/"),
    SuiteDef("rdf11-trig", s"$dataRoot/rdf-tests/rdf11/rdf-trig", s"$web11/rdf-trig/"),
    SuiteDef("rdf12-turtle-syntax", s"$dataRoot/rdf-tests/rdf12/rdf-turtle/syntax", s"$web12/rdf-turtle/syntax/"),
    SuiteDef("rdf12-turtle-eval", s"$dataRoot/rdf-tests/rdf12/rdf-turtle/eval", s"$web12/rdf-turtle/eval/"),
    SuiteDef("rdf12-trig-syntax", s"$dataRoot/rdf-tests/rdf12/rdf-trig/syntax", s"$web12/rdf-trig/syntax/"),
    SuiteDef("rdf12-trig-eval", s"$dataRoot/rdf-tests/rdf12/rdf-trig/eval", s"$web12/rdf-trig/eval/"),
    SuiteDef("rdf-star-nt-syntax", s"$dataRoot/rdf-star/nt/syntax", "https://w3c.github.io/rdf-star/tests/nt/syntax#"),
    SuiteDef("rdf-canon", s"$dataRoot/rdf-canon-tests", "https://w3c.github.io/rdf-canon/tests/", canon = true))

  // umbrella manifests: pure mf:include wrappers whose children are run
  private val umbrellas = Set(
    s"$dataRoot/rdf-tests/rdf12/rdf-turtle/manifest.ttl",
    s"$dataRoot/rdf-tests/rdf12/rdf-trig/manifest.ttl")

  private def basename(e: W3c.Entry): String = e.action.map { a =>
    val f = a.substring(a.lastIndexOf('/') + 1)
    val i = f.lastIndexOf('.')
    if (i > 0) f.substring(0, i) else f
  }.getOrElse("")

  test("every vendored W3C manifest is exercised (suite freshness)") {
    val manifests = Files.walk(Paths.get(dataRoot)).iterator().asScala
      .map(_.toString).filter(_.endsWith("/manifest.ttl")).toSet
    val covered = suites.map(_.dir + "/manifest.ttl").toSet
    val uncovered = manifests -- covered -- umbrellas
    assert(uncovered.isEmpty,
      s"vendored manifests with no suite wiring: ${uncovered.mkString(", ")}")
    // and no stale wiring: every configured suite's manifest still exists
    val missing = covered.filterNot(manifests)
    assert(missing.isEmpty, s"configured suites without manifests: $missing")
  }

  test("EARL reports regenerate from the current build with zero silent skips") {
    Files.createDirectories(outDir)
    val failures = scala.collection.mutable.Buffer[String]()
    val usedSkips = scala.collection.mutable.Set[String]()
    for (sd <- suites) {
      val suite = W3c.loadManifest(sd.dir, sd.base)
      assert(suite.entries.nonEmpty, s"${sd.id}: empty manifest")
      val outcomes = suite.entries.map { e =>
        skips.get(basename(e)) match {
          case Some(_) =>
            usedSkips += basename(e)
            (e.iri, "untested")
          case None =>
            val out = if (sd.canon) W3c.runCanonEntry(suite, e)
                      else W3c.runEntry(suite, e)
            out match {
              case W3c.Pass => (e.iri, "passed")
              case W3c.Fail(r) =>
                failures += s"${sd.id}/${e.name.getOrElse(e.iri)}: $r"
                (e.iri, "failed")
            }
        }
      }
      val report = Earl.reportWithOutcomes(subject, outcomes)
      Files.write(outDir.resolve(sd.id + ".ttl"), report.getBytes("UTF-8"))
      // round-trip through our own codec: one Assertion per manifest entry
      val parsed = Turtle.parse(report, "https://graft.dev/earl/")
      val nAssertions = parsed.triples.count(t =>
        t.p.value == Vocab.rdfType && t.o.value == Earl.earl + "Assertion")
      assert(nAssertions == suite.entries.size,
        s"${sd.id}: $nAssertions assertions for ${suite.entries.size} entries")
    }
    assert(failures.isEmpty,
      s"${failures.size} failed:\n  " + failures.take(10).mkString("\n  "))
    // stale-skip check: a skip entry that matches NO manifest entry is a
    // documentation rot signal
    val stale = skips.keySet -- usedSkips
    assert(stale.isEmpty, s"skip-list entries matching no manifest entry: $stale")
  }
}

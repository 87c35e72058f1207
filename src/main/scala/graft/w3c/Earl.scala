package graft.w3c

import graft.core.{Term, Triple, TurtleEncoder, Vocab}

/** EARL report generation — the reference's
  * `RDF.Test.EarlFormatter` (lib/rdf/test/earl_formatter.ex): one
  * earl:Assertion per test with an earl:TestResult outcome, serialized as
  * Turtle (the shape published under the reference's earl_reports/). */
object Earl {

  val earl = "http://www.w3.org/ns/earl#"
  val doap = "http://usefulinc.com/ns/doap#"
  val dc = "http://purl.org/dc/terms/"

  def prefixes: Map[String, String] =
    Map("earl" -> earl, "doap" -> doap, "dct" -> dc, "rdf" -> Vocab.rdf)

  /** Assertion triples for a test-suite run. `results` = (test IRI,
    * passed). Deterministic bnode labels so reports are reproducible. */
  def assertions(subjectIri: String,
                 results: Seq[(String, Boolean)]): Seq[Triple] =
    assertionsWithOutcomes(subjectIri,
      results.map { case (iri, p) => (iri, if (p) "passed" else "failed") })

  /** Assertion triples with an explicit EARL outcome per test: "passed" |
    * "failed" | "untested" | "inapplicable" | "cantTell" (earl vocabulary
    * outcome individuals) — "untested" is how a DOCUMENTED skip appears in
    * the report instead of being silently absent. */
  def assertionsWithOutcomes(subjectIri: String,
                             results: Seq[(String, String)]): Seq[Triple] = {
    val subj = Term.iri(subjectIri)
    val project = Seq(
      Triple(subj, Term.iri(Vocab.rdfType), Term.iri(doap + "Project")),
      Triple(subj, Term.iri(Vocab.rdfType), Term.iri(earl + "TestSubject")),
      Triple(subj, Term.iri(Vocab.rdfType), Term.iri(earl + "Software")))
    project ++ results.zipWithIndex.flatMap { case ((testIri, outcome), i) =>
      val a = Term.bnode(f"assertion$i%05d")
      val r = Term.bnode(f"result$i%05d")
      Seq(
        Triple(a, Term.iri(Vocab.rdfType), Term.iri(earl + "Assertion")),
        Triple(a, Term.iri(earl + "subject"), subj),
        Triple(a, Term.iri(earl + "test"), Term.iri(testIri)),
        Triple(a, Term.iri(earl + "mode"), Term.iri(earl + "automatic")),
        Triple(a, Term.iri(earl + "result"), r),
        Triple(r, Term.iri(Vocab.rdfType), Term.iri(earl + "TestResult")),
        Triple(r, Term.iri(earl + "outcome"), Term.iri(earl + outcome)))
    }
  }

  /** Full Turtle report document. */
  def report(subjectIri: String, results: Seq[(String, Boolean)]): String =
    TurtleEncoder.encode(assertions(subjectIri, results), prefixes)

  /** Full Turtle report with explicit outcomes. */
  def reportWithOutcomes(subjectIri: String,
                         results: Seq[(String, String)]): String =
    TurtleEncoder.encode(assertionsWithOutcomes(subjectIri, results), prefixes)
}

package graft.core

import scala.language.dynamics

/** Vocabulary namespace DSL — the ergonomic face of the reference's
  * compile-time vocabulary modules
  * (`lib/rdf/vocabulary/namespace/vocabulary_namespace.ex:30-62`, which
  * macro-generates one function per term). Scala's `Dynamic` gives the
  * same "terms as identifiers" surface without code generation:
  *
  * {{{
  * val schema = Vocabulary("http://schema.org/")
  * schema.name            // Term.iri("http://schema.org/name")
  * schema.Person          // Term.iri("http://schema.org/Person")
  * schema("weird-term")   // escape hatch for non-identifier locals
  * }}}
  *
  * `strict` vocabularies (the reference's `terms:` option) validate
  * against a known-term set and throw on unknown locals, catching typos at
  * call time the way the reference's compile-time modules catch them at
  * build time. Non-strict accepts any local part.
  */
final class Vocabulary private (val namespace: String,
                                known: Set[String]) extends Dynamic {

  private def make(local: String): Term = {
    if (known.nonEmpty && !known.contains(local))
      throw new NoSuchElementException(
        s"term '$local' is not in the strict vocabulary <$namespace> " +
          s"(known: ${known.toSeq.sorted.mkString(", ")})")
    Term.iri(namespace + local)
  }

  /** `vocab.someTerm` — the namespace-module call style. */
  def selectDynamic(local: String): Term = make(local)

  /** `vocab("any-local-part")` — escape hatch for locals that are not
    * valid Scala identifiers. */
  def apply(local: String): Term = make(local)

  /** IRI string of a term (common in Column-building code). */
  def iri(local: String): String = make(local).value

  /** All known terms of a strict vocabulary. */
  def terms: Seq[Term] =
    known.toSeq.sorted.map(l => Term.iri(namespace + l))
}

object Vocabulary {
  /** Open vocabulary: any local resolves. */
  def apply(namespace: String): Vocabulary =
    new Vocabulary(namespace, Set.empty)

  /** Strict vocabulary: only the listed terms resolve (the reference's
    * explicit `terms:` list). */
  def strict(namespace: String, terms: String*): Vocabulary =
    new Vocabulary(namespace, terms.toSet)
}

package graft.core

/** RDF collection (rdf:first/rdf:rest linked list) read-back API over a
  * triple set — the reference's `RDF.List` (lib/rdf/model/list.ex:36-150).
  * The decoder expands `( ... )` into first/rest chains; this walks a chain
  * back out of a graph. `from` returns None when the head does not start a
  * well-formed list (missing description, cycle, branching first/rest,
  * non-nil termination), mirroring `RDF.List.new/2` returning nil.
  */
final case class RdfList(head: Term, nodes: Vector[Term], values: Vector[Term]) {
  def isEmpty: Boolean = values.isEmpty
  def length: Int = values.length
  /** RDF.List.valid?: every node of a non-empty list is a blank node. */
  def isValid: Boolean = nodes.forall(_.isBnode)
}

object RdfList {

  private val nil = Term.iri(Vocab.rdfNil)

  def empty: RdfList = RdfList(nil, Vector.empty, Vector.empty)

  /** Walk the list starting at `head` over the given triples. */
  def from(head: Term, triples: Seq[Triple]): Option[RdfList] = {
    if (head == nil) return Some(empty)
    val bySubject = triples.groupBy(_.s)
    val nodes = Vector.newBuilder[Term]
    val values = Vector.newBuilder[Term]
    val seen = scala.collection.mutable.HashSet.empty[Term]
    var cur = head
    while (cur != nil) {
      if (seen(cur)) return None // cycle (list.ex duplicate check)
      seen += cur
      val ts = bySubject.getOrElse(cur, Nil)
      val firsts = ts.filter(_.p.value == Vocab.rdfFirst)
      val rests = ts.filter(_.p.value == Vocab.rdfRest)
      if (firsts.size != 1 || rests.size != 1) return None
      nodes += cur
      values += firsts.head.o
      cur = rests.head.o
      if (!(cur.isResource)) return None
    }
    Some(RdfList(head, nodes.result(), values.result()))
  }

  /** Build the first/rest triples for a list of values with deterministic
    * bnode labels derived from a scope (skolem-style — stable across
    * partitions/retries). Returns (head term, triples). */
  def toTriples(values: Seq[Term], scope: String): (Term, Seq[Triple]) =
    if (values.isEmpty) (nil, Nil)
    else {
      val nodes = values.indices.map(i =>
        Term.bnode(Skolem.label(scope, s"list$i")))
      val ts = values.indices.flatMap { i =>
        Seq(
          Triple(nodes(i), Term.iri(Vocab.rdfFirst), values(i)),
          Triple(nodes(i), Term.iri(Vocab.rdfRest),
            if (i == values.length - 1) nil else nodes(i + 1)))
      }
      (nodes.head, ts)
    }
}

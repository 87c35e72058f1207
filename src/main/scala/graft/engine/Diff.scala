package graft.engine

import org.apache.spark.sql.DataFrame

/** RDF.Diff (`lib/rdf/model/diff.ex`): a pair of graphs — `additions` and
  * `deletions` — with the reference's full algebra:
  *
  *  - `Diff.compute` (diff.ex:115-135, the graph/graph clause): statements
  *    only in the new version are additions, statements only in the
  *    original are deletions. Two anti-joins — one shuffle each on the full
  *    statement key, no driver-side iteration, so diffing two snapshots is
  *    linear in their size at any scale.
  *  - `union` (diff.ex:163-172): merge two diffs by set-union of their
  *    additions and deletions respectively.
  *  - `invert` (diff.ex:182-186): swap additions and deletions — the
  *    rollback diff.
  *  - `applyTo` (diff.ex:206-214): delete the deletions then add the
  *    additions; deletions not present in the target are ignored (the
  *    anti-join semantics give exactly that).
  *  - `isEmpty` (diff.ex:192-197).
  *
  * Frames must share one schema (the triple/quad columns). Works for both
  * string graphs (s/p/o strings) and term-struct graphs.
  */
final case class Diff(additions: DataFrame, deletions: DataFrame) {

  /** Union of two diffs: additions+additions, deletions+deletions
    * (diff.ex:163-172). */
  def union(other: Diff): Diff =
    Diff(Graphs.add(additions, other.additions),
         Graphs.add(deletions, other.deletions))

  /** Swap additions and deletions (diff.ex:182-186). */
  def invert: Diff = Diff(deletions, additions)

  /** Apply: (g - deletions) + additions (diff.ex:206-214). Deleting
    * statements that are not present is a no-op, like the reference. */
  def applyTo(g: DataFrame): DataFrame =
    Graphs.add(Graphs.delete(g, deletions), additions)

  /** Both sides empty (diff.ex:192-197). Two actions — use sparingly. */
  def isEmpty: Boolean = additions.isEmpty && deletions.isEmpty
}

object Diff {

  /** Diff two graph versions: original -> updated (diff.ex:115-135).
    * Null-safe on every column, so quad frames with a default graph
    * (g = null) diff correctly. */
  def compute(original: DataFrame, updated: DataFrame): Diff =
    Diff(
      additions = Graphs.antiNullSafe(updated, original),
      deletions = Graphs.antiNullSafe(original, updated))

  /** An empty diff over the given schema template. */
  def empty(template: DataFrame): Diff =
    Diff(template.limit(0), template.limit(0))
}

package graft.core

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Deterministic blank-node skolemization via salted 128-bit hashes.
  *
  * Replaces the reference's process-unique ids (`blank_node.ex:25` draws
  * `:erlang.unique_integer`) with a *pure* keyed id-issuer in the spirit of
  * `BlankNode.Generator.Increment.generate_for/2`
  * (`lib/rdf/blank_node_generator/increment.ex:36-45`) — same input key,
  * same id — but without any shared counter state, so identity is stable
  * across partitions, executors, retries, and job restarts. The hash is
  * MD5 (128-bit) over "salt:scope:label"; MD5 here is an id function, not a
  * security primitive, chosen because Spark (`functions.md5`) and common SQL
  * engines compute the identical bytes, which keeps the skolemizer
  * oracle-checkable.
  */
object Skolem {
  val defaultSalt = "graft-skolem-v1"

  def hash128Hex(s: String): String = {
    val md = MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    var i = 0
    while (i < d.length) { sb.append(f"${d(i) & 0xff}%02x"); i += 1 }
    sb.toString
  }

  /** Skolem label for a (scope, local-label) pair. Scope is typically the
    * document/page URL so per-document bnodes get globally unique,
    * deterministic identity. */
  def label(scope: String, local: String, salt: String = defaultSalt): String =
    "sk" + hash128Hex(s"$salt:$scope:$local")

  def skolemize(t: Term, scope: String, salt: String): Term =
    if (t != null && t.isBnode) Term(TermKind.BNODE, label(scope, t.value, salt), null, null)
    else t

  def skolemizeTriple(t: Triple, scope: String, salt: String = defaultSalt): Triple =
    Triple(skolemize(t.s, scope, salt), t.p, skolemize(t.o, scope, salt))

  /** Graph-wide term substitution — the `rename_resource` primitive
    * (`graph.ex:772-792`): old term -> new term across all positions. */
  def renameResource(t: Triple, from: Term, to: Term): Triple =
    Triple(
      if (t.s == from) to else t.s,
      if (t.p == from) to else t.p,
      if (t.o == from) to else t.o)
}

package graft.core

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Resource/blank-node generator algorithms — the reference's
  * `RDF.BlankNode.Generator.{Increment,Random,UUID}` family
  * (lib/rdf/blank_node_generator/) and `RDF.IRI.UUID.Generator`
  * (lib/rdf/resource_generator/generators/iri_uuid_generator.ex), which
  * supports UUID versions 3/5 (value-based) and 1/4 (random-based) in
  * `:urn` / `:default` / `:hex` formats.
  *
  * Value-based UUIDs here are the RFC 4122 name-based algorithms
  * (v3 = MD5, v5 = SHA-1) computed byte-exactly; the Column twins live in
  * `engine.Terms` (`uuidV3Hex` is a pure codegen expression and is
  * oracle-checked in the `rdf_uuid` registry query). Random-based
  * generation is inherently non-reproducible, matching the reference —
  * [[Skolem]] remains the deterministic identity mechanism the PIPELINE
  * uses; this module is the reference-parity API face.
  */
object Generators {

  /** RFC 4122 Appendix C predefined namespace IDs. */
  val namespaceDns: Array[Byte] = hexBytes("6ba7b8109dad11d180b400c04fd430c8")
  val namespaceUrl: Array[Byte] = hexBytes("6ba7b8119dad11d180b400c04fd430c8")

  def hexBytes(hex: String): Array[Byte] =
    hex.grouped(2).map(b => Integer.parseInt(b, 16).toByte).toArray

  private def hex(d: Array[Byte]): String = {
    val sb = new StringBuilder(d.length * 2)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  private def nameBased(algo: String, version: Int,
                        namespace: Array[Byte], name: String): String = {
    val md = MessageDigest.getInstance(algo)
    md.update(namespace)
    md.update(name.getBytes(StandardCharsets.UTF_8))
    val d = md.digest().take(16)
    d(6) = ((d(6) & 0x0f) | (version << 4)).toByte // version nibble
    d(8) = ((d(8) & 0x3f) | 0x80).toByte           // RFC 4122 variant
    hex(d)
  }

  /** UUIDv3 (name-based, MD5), 32-char lowercase hex form. */
  def uuidV3Hex(namespace: Array[Byte], name: String): String =
    nameBased("MD5", 3, namespace, name)

  /** UUIDv5 (name-based, SHA-1), 32-char lowercase hex form. */
  def uuidV5Hex(namespace: Array[Byte], name: String): String =
    nameBased("SHA-1", 5, namespace, name)

  /** UUIDv4 (random). Non-deterministic by definition (like the
    * reference's `Uniq.UUID.uuid4`). */
  def uuidV4Hex(): String = {
    val u = java.util.UUID.randomUUID()
    f"${u.getMostSignificantBits}%016x${u.getLeastSignificantBits}%016x"
  }

  /** 8-4-4-4-12 canonical form from the 32-char hex form. */
  def dashed(hex32: String): String =
    s"${hex32.substring(0, 8)}-${hex32.substring(8, 12)}-" +
      s"${hex32.substring(12, 16)}-${hex32.substring(16, 20)}-${hex32.substring(20)}"

  /** The reference's three output formats (iri_uuid_generator.ex):
    * `:urn` (urn:uuid:...), `:default` (prefix + dashed), `:hex`
    * (prefix + undashed). */
  def format(hex32: String, style: String, prefix: String = ""): String =
    style match {
      case "urn"     => "urn:uuid:" + dashed(hex32)
      case "hex"     => prefix + hex32
      case "default" => prefix + dashed(hex32)
      case other => throw new IllegalArgumentException(
        // a typo'd style silently producing the default shape would mint
        // malformed identifiers with no error
        s"unknown uuid format style '$other' (urn | hex | default)")
    }

  /** The Increment algorithm's pure core (increment.ex:36-45): label for
    * counter value n. Distributed issuing needs a total order — see
    * `Graphs.incrementIds`. */
  def incrementLabel(prefix: String, n: Long): String = s"$prefix$n"
}

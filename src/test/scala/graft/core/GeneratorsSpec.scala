package graft.core

import org.scalatest.funsuite.AnyFunSuite

class GeneratorsSpec extends AnyFunSuite {
  private val dns = Generators.namespaceDns

  test("uuidV3 matches java.util.UUID.nameUUIDFromBytes (RFC 4122 MD5 form)") {
    for (name <- Seq("python.org", "http://example.org/x", "", "über")) {
      val bytes = dns ++ name.getBytes("UTF-8")
      val javaForm = java.util.UUID.nameUUIDFromBytes(bytes).toString.replace("-", "")
      assert(Generators.uuidV3Hex(dns, name) == javaForm, name)
    }
    // the widely published vector: uuid3(NAMESPACE_DNS, "python.org")
    assert(Generators.dashed(Generators.uuidV3Hex(dns, "python.org")) ==
      "6fa459ea-ee8a-3ca4-894e-db77e160355e")
  }

  test("uuidV5 matches the published SHA-1 vector") {
    assert(Generators.dashed(Generators.uuidV5Hex(dns, "python.org")) ==
      "886313e1-3b8a-5372-9b90-0c9aee199e5d")
  }

  test("formats: urn / default / hex (iri_uuid_generator.ex surface)") {
    val h = Generators.uuidV3Hex(Generators.namespaceUrl, "http://ex.org/")
    assert(Generators.format(h, "urn").startsWith("urn:uuid:"))
    assert(Generators.format(h, "urn").count(_ == '-') == 4)
    assert(Generators.format(h, "default", "http://ex.com/") ==
      "http://ex.com/" + Generators.dashed(h))
    assert(Generators.format(h, "hex", "p:") == "p:" + h)
    // a typo'd style errors instead of silently minting the default shape
    intercept[IllegalArgumentException](Generators.format(h, "URN"))
  }

  test("uuidV4 is well-formed and (overwhelmingly) unique") {
    val ids = (1 to 100).map(_ => Generators.uuidV4Hex())
    assert(ids.forall(_.matches("[0-9a-f]{32}")))
    assert(ids.distinct.length == 100)
  }

  test("version and variant nibbles are set") {
    val h3 = Generators.uuidV3Hex(dns, "x")
    val h5 = Generators.uuidV5Hex(dns, "x")
    assert(h3.charAt(12) == '3' && h5.charAt(12) == '5')
    assert("89ab".contains(h3.charAt(16)) && "89ab".contains(h5.charAt(16)))
  }
}

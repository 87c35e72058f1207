package graft.core

import org.scalatest.funsuite.AnyFunSuite

class IriSpec extends AnyFunSuite {

  test("validation") {
    assert(Iri.valid("http://www.example.com/foo"))
    assert(Iri.valid("https://example.com/päge#frag"))
    assert(Iri.valid("urn:uuid:6e8bc430-9c3a-11d9-9669-0800200c9a66"))
    assert(Iri.valid("http://example.com/a?b=c&d=e"))
    assert(!Iri.valid("not an iri"))
    assert(!Iri.valid("http://example.com/a b"))
    assert(!Iri.valid("/relative/path"))
  }

  test("scheme") {
    assert(Iri.scheme("http://www.example.com/foo") == "http")
    assert(Iri.scheme("urn:x") == "urn")
    assert(Iri.scheme("not an iri") == null)
  }

  // RFC 3986 §5.4 reference resolution examples, base = http://a/b/c/d;p?q
  test("RFC 3986 5.4 normal examples") {
    val base = "http://a/b/c/d;p?q"
    val cases = Seq(
      "g:h" -> "g:h", "g" -> "http://a/b/c/g", "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/", "/g" -> "http://a/g", "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y", "g?y" -> "http://a/b/c/g?y",
      "#s" -> "http://a/b/c/d;p?q#s", "g#s" -> "http://a/b/c/g#s",
      "g?y#s" -> "http://a/b/c/g?y#s", ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x", "g;x?y#s" -> "http://a/b/c/g;x?y#s",
      "" -> "http://a/b/c/d;p?q", "." -> "http://a/b/c/", "./" -> "http://a/b/c/",
      ".." -> "http://a/b/", "../" -> "http://a/b/", "../g" -> "http://a/b/g",
      "../.." -> "http://a/", "../../" -> "http://a/", "../../g" -> "http://a/g")
    for ((ref, expected) <- cases)
      assert(Iri.resolve(ref, base) == expected, s"resolve($ref)")
  }

  test("RFC 3986 5.4.2 abnormal examples") {
    val base = "http://a/b/c/d;p?q"
    val cases = Seq(
      "../../../g" -> "http://a/g", "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g", "/../g" -> "http://a/g", "g." -> "http://a/b/c/g.",
      ".g" -> "http://a/b/c/.g", "g.." -> "http://a/b/c/g..", "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g", "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h", "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y", "g;x=1/../y" -> "http://a/b/c/y")
    for ((ref, expected) <- cases)
      assert(Iri.resolve(ref, base) == expected, s"resolve($ref)")
  }

  test("resolve with non-absolute base returns null") {
    assert(Iri.resolve("g", "/not/absolute") == null)
  }

  test("resolve: null ref is null; absolute refs get dot segments removed") {
    assert(Iri.resolve(null, "http://a/b/c") == null)
    // strict 5.2.2: the reference's own path normalizes even when absolute
    // (remove_dot_segments("a/../b") = "/b" — step 2C replaces the "/../"
    // prefix with "/" after popping the only output segment)
    assert(Iri.resolve("s:a/../b", "http://a/") == "s:/b")
    assert(Iri.resolve("http://h/x/./y/../z", "http://a/") == "http://h/x/z")
  }

  test("percent-encoding normalization") {
    assert(Iri.normalizePercentEncoding("http://ex.com/%7euser") == "http://ex.com/~user")
    assert(Iri.normalizePercentEncoding("http://ex.com/%7Euser") == "http://ex.com/~user")
    assert(Iri.normalizePercentEncoding("http://ex.com/a%2fb") == "http://ex.com/a%2Fb")
    assert(Iri.normalizePercentEncoding("http://ex.com/plain") == "http://ex.com/plain")
    assert(Iri.normalizePercentEncoding("http://ex.com/%41%20b") == "http://ex.com/A%20b")
  }

  test("namespace prefix test") {
    assert(Iri.inNamespace("http://ex.com/foo#Bar", "http://ex.com/foo#"))
    assert(!Iri.inNamespace("http://ex.com/foo#Bar", "http://other.com/"))
  }
}

class SkolemSpec extends AnyFunSuite {
  test("deterministic and scope-sensitive") {
    val a = Skolem.label("http://page/1", "b0")
    assert(a == Skolem.label("http://page/1", "b0"))
    assert(a != Skolem.label("http://page/2", "b0"))
    assert(a != Skolem.label("http://page/1", "b1"))
    assert(a.startsWith("sk") && a.length == 34)
  }

  test("skolemizeTriple maps only bnodes") {
    val t = Triple(Term.bnode("x"), Term.iri("http://p"), Term.str("v"))
    val sk = Skolem.skolemizeTriple(t, "scope")
    assert(sk.s.isBnode && sk.s.value != "x")
    assert(sk.p == t.p && sk.o == t.o)
  }

  test("renameResource substitutes across positions") {
    val old = Term.bnode("x"); val nw = Term.iri("http://ex/x")
    val t = Triple(old, Term.iri("http://p"), old)
    assert(Skolem.renameResource(t, old, nw) == Triple(nw, Term.iri("http://p"), nw))
  }
}

package graft.core

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import scala.collection.mutable

/** W3C RDF Dataset Canonicalization (RDFC-1.0).
  *
  * Same algorithm the reference implements
  * (`lib/rdf/canonicalization/canonicalization.ex`): first-degree hashes
  * over the canonical N-Quads byte form with self->_:a / other->_:z
  * substitution, canonical ids `c14n0, c14n1, ...` in hash order, N-degree
  * recursion with permutation exploration, and a poison-graph call budget
  * (`hndq_call_limit × |bnodes|`, canonicalization.ex:19-30).
  *
  * Inherently sequential per blank-node connected component; the Spark
  * deployment runs it inside per-component `mapGroups` (components in web
  * data are per-document and tiny). Skolemization makes most bnodes
  * deterministic before this runs — RDFC is for the serializer-equivalence
  * and isomorphism paths.
  */
object Rdfc10 {

  final case class PoisonedGraph(calls: Int)
    extends Exception(s"HNDQ call limit exceeded ($calls)")

  final class Issuer(prefix: String, var counter: Int = 0,
                     val issued: mutable.LinkedHashMap[String, String] = mutable.LinkedHashMap.empty) {
    def issue(label: String): String = issued.getOrElseUpdate(label, {
      val id = s"$prefix$counter"; counter += 1; id
    })
    def issuedId(label: String): Option[String] = issued.get(label)
    def copy(): Issuer = new Issuer(prefix, counter, issued.clone())
  }

  private def hashHex(algo: String, s: String): String = {
    val d = MessageDigest.getInstance(algo).digest(s.getBytes(StandardCharsets.UTF_8))
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  /** Every blank-node label in a term, recursing through quoted-triple
    * (RDF-star) terms — RDFC-1.0 predates RDF-star (w3c/rdf-canon#2), so
    * this extension treats a nested bnode exactly like a bnode in its
    * containing position: it shares identity with its top-level
    * occurrences and participates in hashing and relabeling (the
    * reference skips such inputs; ignoring the nested occurrence would
    * silently sever the bnode's identity instead). */
  private def bnodesOfTerm(t: Term): Seq[String] =
    if (t == null) Nil
    else if (t.isBnode) Seq(t.value)
    else if (t.kind == TermKind.TRIPLE && t.value.contains("_:")) {
      val tr = NTriples.parseQuotedString(t.value)
      Seq(tr.s, tr.p, tr.o).flatMap(bnodesOfTerm)
    } else Nil

  /** Rewrite every bnode label in a term (recursing through quoted
    * triples, rebuilding their canonical byte form). */
  private def mapBnodes(t: Term, f: String => String): Term =
    if (t == null) t
    else if (t.isBnode) {
      val nv = f(t.value)
      if (nv == t.value) t else Term(TermKind.BNODE, nv, null, null)
    } else if (t.kind == TermKind.TRIPLE && t.value.contains("_:")) {
      val tr = NTriples.parseQuotedString(t.value)
      Term.quoted(Triple(mapBnodes(tr.s, f), mapBnodes(tr.p, f), mapBnodes(tr.o, f)))
    } else t

  /** Canonicalize: returns (relabeled quads, bnode label -> canonical id).
    * hndqCallLimit <= 0 disables the guard. */
  def canonicalize(quads: Seq[Quad], hndqCallLimit: Int = 50,
                   hashAlgorithm: String = "SHA-256"): (Seq[Quad], Map[String, String]) = {
    val state = new State(quads, hndqCallLimit, hashAlgorithm)
    state.run()
    val mapping = state.canonicalIssuer.issued.toMap
    def relabel(t: Term): Term = mapBnodes(t, mapping)
    val out = quads.map(q => Quad(relabel(q.s), q.p, relabel(q.o), relabel(q.g)))
    (out, mapping)
  }

  /** Unicode CODE POINT order (what RDFC-1.0 sorts by): Java's String
    * ordering compares UTF-16 code units, which places supplementary-plane
    * characters (surrogates 0xD800+) BEFORE U+E000..U+FFFF instead of
    * after them. */
  private[core] val codePointOrdering: Ordering[String] =
    (a: String, b: String) => {
      var i = 0; var j = 0
      var r = 0
      while (r == 0 && i < a.length && j < b.length) {
        val ca = a.codePointAt(i); val cb = b.codePointAt(j)
        r = Integer.compare(ca, cb)
        i += Character.charCount(ca); j += Character.charCount(cb)
      }
      if (r != 0) r else Integer.compare(a.length - i, b.length - j)
    }

  /** Canonical N-Quads document: relabeled, sorted (code point order),
    * newline-terminated. */
  def canonicalNQuads(quads: Seq[Quad], hashAlgorithm: String = "SHA-256"): String = {
    val (c, _) = canonicalize(quads, hashAlgorithm = hashAlgorithm)
    c.map(NTriples.canonicalQuadLine).distinct.sorted(codePointOrdering)
      .map(_ + "\n").mkString
  }

  def isomorphic(a: Seq[Quad], b: Seq[Quad]): Boolean =
    canonicalNQuads(a) == canonicalNQuads(b)

  def isomorphicTriples(a: Seq[Triple], b: Seq[Triple]): Boolean =
    isomorphic(a.map(t => Quad(t.s, t.p, t.o, null)), b.map(t => Quad(t.s, t.p, t.o, null)))

  // ------------------------------------------------------------------ state

  private final class State(quads: Seq[Quad], hndqCallLimit: Int, hashAlgorithm: String) {
    private def sha256hex(s: String): String = hashHex(hashAlgorithm, s)

    val bnodeToQuads: Map[String, Seq[Quad]] = {
      val m = mutable.LinkedHashMap.empty[String, mutable.Buffer[Quad]]
      for (q <- quads; t <- Seq(q.s, q.o, q.g); bn <- bnodesOfTerm(t).distinct)
        m.getOrElseUpdate(bn, mutable.Buffer.empty) += q
      m.view.mapValues(_.toSeq).toMap
    }
    val canonicalIssuer = new Issuer("c14n")
    private val maxCalls: Long = // Long: Int multiply overflows ~42.9M bnodes
      if (hndqCallLimit <= 0) Long.MaxValue
      else hndqCallLimit.toLong * math.max(1, bnodeToQuads.size)
    private var calls = 0

    private val fdHashCache = mutable.HashMap.empty[String, String]

    def run(): Unit = {
      // step 3: first-degree hashes
      val hashToBn = mutable.TreeMap.empty[String, mutable.Buffer[String]]
      for (bn <- bnodeToQuads.keys) {
        val h = hashFirstDegree(bn)
        hashToBn.getOrElseUpdate(h, mutable.Buffer.empty) += bn
      }
      // step 4: unique hashes get canonical ids in hash order
      val shared = mutable.TreeMap.empty[String, Seq[String]]
      for ((h, bns) <- hashToBn) {
        if (bns.size == 1) canonicalIssuer.issue(bns.head)
        else shared(h) = bns.toSeq
      }
      // step 5: N-degree for shared hashes
      for ((_, bns) <- shared) {
        val hashPathList = mutable.Buffer.empty[(String, Issuer)]
        for (bn <- bns if canonicalIssuer.issuedId(bn).isEmpty) {
          val tempIssuer = new Issuer("b")
          tempIssuer.issue(bn)
          hashPathList += hashNDegree(bn, tempIssuer)
        }
        for ((_, issuer) <- hashPathList.sortBy(_._1); bn <- issuer.issued.keys)
          canonicalIssuer.issue(bn)
      }
    }

    def hashFirstDegree(bn: String): String = fdHashCache.getOrElseUpdate(bn, {
      def sub(t: Term): Term =
        mapBnodes(t, v => if (v == bn) "a" else "z")
      val lines = bnodeToQuads(bn).map { q =>
        NTriples.canonicalQuadLine(Quad(sub(q.s), q.p, sub(q.o), sub(q.g))) + "\n"
      }.sorted(codePointOrdering)
      sha256hex(lines.mkString)
    })

    private def hashRelated(related: String, quad: Quad, issuer: Issuer,
                            position: String): String = {
      val id = canonicalIssuer.issuedId(related).map("_:" + _)
        .orElse(issuer.issuedId(related).map("_:" + _))
        .getOrElse(hashFirstDegree(related))
      val input = position +
        (if (position != "g") "<" + quad.p.value + ">" else "") + id
      sha256hex(input)
    }

    def hashNDegree(identifier: String, issuerIn: Issuer): (String, Issuer) = {
      calls += 1
      if (calls > maxCalls) throw PoisonedGraph(calls)
      var issuer = issuerIn
      // Hn: related-hash -> bnodes
      val hn = mutable.TreeMap.empty[String, mutable.Buffer[String]]
      for (q <- bnodeToQuads(identifier)) {
        for ((t, posName) <- Seq((q.s, "s"), (q.o, "o"), (q.g, "g"));
             rel <- bnodesOfTerm(t) if rel != identifier) {
          val h = hashRelated(rel, q, issuer, posName)
          hn.getOrElseUpdate(h, mutable.Buffer.empty) += rel
        }
      }
      val data = new StringBuilder
      for ((relHash, bns) <- hn) {
        data.append(relHash)
        var chosenPath = ""
        var chosenIssuer: Issuer = null
        // permute the MULTISET as the spec does (the reference's Hn keeps
        // duplicates, canonicalization.ex builds `terms ++ new`); Scala's
        // .permutations already yields each distinct arrangement once
        for (perm <- bns.toSeq.permutations) {
          var issuerCopy = issuer.copy()
          val path = new StringBuilder
          val recursionList = mutable.Buffer.empty[String]
          var skip = false
          for (related <- perm if !skip) {
            canonicalIssuer.issuedId(related) match {
              case Some(cid) => path.append("_:").append(cid)
              case None =>
                if (issuerCopy.issuedId(related).isEmpty) recursionList += related
                path.append("_:").append(issuerCopy.issue(related))
            }
            if (chosenPath.nonEmpty && path.length >= chosenPath.length &&
              path.toString > chosenPath) skip = true
          }
          for (related <- recursionList if !skip) {
            val (resHash, resIssuer) = hashNDegree(related, issuerCopy)
            path.append("_:").append(issuerCopy.issue(related))
            path.append('<').append(resHash).append('>')
            issuerCopy = resIssuer
            if (chosenPath.nonEmpty && path.length >= chosenPath.length &&
              path.toString > chosenPath) skip = true
          }
          if (!skip && (chosenPath.isEmpty || path.toString < chosenPath)) {
            chosenPath = path.toString
            chosenIssuer = issuerCopy
          }
        }
        data.append(chosenPath)
        issuer = chosenIssuer
      }
      (sha256hex(data.toString), issuer)
    }
  }
}

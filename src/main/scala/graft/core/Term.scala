package graft.core

/** RDF 1.1 term model, Catalyst-friendly flat encoding.
  *
  * Semantics follow the reference's term model
  * (`lib/rdf/model/iri.ex:23-28`, `lib/rdf/model/blank_node.ex:13-16`,
  * `lib/rdf/model/literal.ex:10-17` in rdf-elixir/rdf-ex): an IRI is an
  * unparsed string, a blank node a label, a literal a lexical form plus
  * datatype IRI and optional language tag. We keep one flat struct for all
  * kinds so a `Dataset[Triple]` gets a fixed `StructType` schema
  * (kind: byte, value: string, datatype: string, lang: string).
  */
object TermKind {
  val IRI: Byte = 0
  val BNODE: Byte = 1
  val LITERAL: Byte = 2
  /** RDF-star quoted triple (RDF 1.2 triple term) */
  val TRIPLE: Byte = 3
}

/** One RDF term.
  * - kind=IRI:     value = IRI string;             datatype = null, lang = null
  * - kind=BNODE:   value = label (no "_:" prefix); datatype = null, lang = null
  * - kind=LITERAL: value = lexical form; datatype = datatype IRI
  *   (never null — plain literals carry xsd:string, language-tagged ones
  *   rdf:langString with lang != null)
  * - kind=TRIPLE:  value = the quoted triple's canonical N-Triples-star
  *   byte form "<< s p o >>" (the reference models triple-valued terms as
  *   nested tuples, lib/rdf/star/triple.ex:111 — a recursive struct can't
  *   be a fixed Spark schema, so we keep the schema flat and make the
  *   canonical byte form the identity: equality and hashing are plain
  *   string ops; destructuring parses on demand via Term.asTriple)
  */
final case class Term(kind: Byte, value: String, datatype: String, lang: String) {
  def isIri: Boolean = kind == TermKind.IRI
  def isBnode: Boolean = kind == TermKind.BNODE
  def isLiteral: Boolean = kind == TermKind.LITERAL
  /** RDF-star quoted triple. */
  def isQuoted: Boolean = kind == TermKind.TRIPLE
  /** IRI or blank node (rdf-ex `RDF.resource?`, lib/rdf.ex:238-260). */
  def isResource: Boolean = isIri || isBnode
  /** Destructure a quoted-triple term (None for other kinds). */
  def asTriple: Option[Triple] =
    if (isQuoted) Some(NTriples.parseQuotedString(value)) else None

  /** BCP47 language without the base-direction suffix. For a plain
    * rdf:langString this is `lang`; for an RDF 1.2 rdf:dirLangString the
    * flat 4-field schema packs "lang--dir" into the lang field, so this
    * strips the direction component. */
  def langBase: String =
    if (lang == null) null
    else lang.indexOf("--") match { case -1 => lang; case i => lang.substring(0, i) }

  /** Base direction ("ltr"/"rtl") of an rdf:dirLangString, else null. */
  def baseDirection: String =
    if (lang == null) null
    else lang.indexOf("--") match { case -1 => null; case i => lang.substring(i + 2) }
}

object Term {
  def iri(v: String): Term = Term(TermKind.IRI, v, null, null)
  /** Accepts labels with or without the "_:" prefix, like
    * `blank_node.ex:52` strips it on input. */
  def bnode(label: String): Term = {
    val l = if (label.startsWith("_:")) label.substring(2) else label
    Term(TermKind.BNODE, l, null, null)
  }
  def typedLit(lexical: String, datatypeIri: String): Term =
    Term(TermKind.LITERAL, lexical, datatypeIri, null)
  def langLit(lexical: String, language: String): Term =
    Term(TermKind.LITERAL, lexical, Vocab.rdfLangString, language.toLowerCase)

  // Elixir->XSD-style coercion table (lib/rdf/model/literal.ex:77-112)
  def str(v: String): Term = typedLit(v, Vocab.xsdString)
  def bool(v: Boolean): Term = typedLit(if (v) "true" else "false", Vocab.xsdBoolean)
  def int(v: Long): Term = typedLit(v.toString, Vocab.xsdInteger)
  def dbl(v: Double): Term = typedLit(Xsd.canonicalDoubleValue(v), Vocab.xsdDouble)
  def dec(v: BigDecimal): Term =
    typedLit(Xsd.canonicalDecimal(v.bigDecimal.toPlainString).getOrElse(v.bigDecimal.toPlainString), Vocab.xsdDecimal)

  /** RDF-star quoted triple as a term (star/statement.ex semantics). */
  def quoted(t: Triple): Term =
    Term(TermKind.TRIPLE, NTriples.quotedString(t), null, null)
}

/** A triple; position constraints per statement.ex:270-301, extended for
  * RDF-star (star/statement.ex): s ∈ {IRI, BNODE, TRIPLE}, p ∈ {IRI},
  * o ∈ {IRI, BNODE, LITERAL, TRIPLE}. */
final case class Triple(s: Term, p: Term, o: Term) {
  def isValid: Boolean =
    s != null && p != null && o != null &&
      (s.isResource || s.isQuoted) && p.isIri &&
      (o.isResource || o.isLiteral || o.isQuoted)
}

/** A quad; g = null means the default graph; g ∈ {IRI, BNODE, null}. */
final case class Quad(s: Term, p: Term, o: Term, g: Term) {
  def triple: Triple = Triple(s, p, o)
  def isValid: Boolean =
    Triple(s, p, o).isValid && (g == null || g.isResource)
}

/** Well-known vocabulary IRIs (public W3C namespaces). */
object Vocab {
  val xsd = "http://www.w3.org/2001/XMLSchema#"
  val rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val rdfs = "http://www.w3.org/2000/01/rdf-schema#"

  val xsdString = xsd + "string"
  val xsdBoolean = xsd + "boolean"
  val xsdInteger = xsd + "integer"
  val xsdDecimal = xsd + "decimal"
  val xsdDouble = xsd + "double"
  val xsdFloat = xsd + "float"
  val xsdDateTime = xsd + "dateTime"
  val xsdDate = xsd + "date"
  val xsdTime = xsd + "time"
  val xsdAnyUri = xsd + "anyURI"
  val xsdLong = xsd + "long"
  val xsdInt = xsd + "int"
  val xsdBase64Binary = xsd + "base64Binary"

  val rdfType = rdf + "type"
  val rdfLangString = rdf + "langString"
  /** RDF 1.2 directional language-tagged string datatype. */
  val rdfDirLangString = rdf + "dirLangString"
  val rdfJson = rdf + "JSON"
  val rdfFirst = rdf + "first"
  val rdfRest = rdf + "rest"
  val rdfNil = rdf + "nil"
}

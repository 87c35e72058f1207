package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{Term, TermKind, Triple, Quad, Vocab}

/** Column-level helpers for the flat term struct
  * (kind: byte, value: string, datatype: string, lang: string) — the Spark
  * encoding of the reference's term model (SURVEY.md §1.2). All constructors
  * are pure `Column` expressions so they stay inside whole-stage codegen.
  */
object Terms {

  val termSchema: StructType = StructType(Seq(
    StructField("kind", ByteType, nullable = false),
    StructField("value", StringType, nullable = false),
    StructField("datatype", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)))

  val tripleSchema: StructType = StructType(Seq(
    StructField("s", termSchema, nullable = false),
    StructField("p", termSchema, nullable = false),
    StructField("o", termSchema, nullable = false)))

  val quadSchema: StructType = tripleSchema.add(StructField("g", termSchema, nullable = true))

  private def nullStr: Column = lit(null).cast(StringType)

  def term(kind: Column, value: Column, datatype: Column, lang: Column): Column =
    struct(kind.cast(ByteType).as("kind"), value.as("value"),
      datatype.as("datatype"), lang.as("lang"))

  /** IRI term from a string column. */
  def iri(value: Column): Column =
    term(lit(TermKind.IRI), value, nullStr, nullStr)

  def bnode(label: Column): Column =
    term(lit(TermKind.BNODE), label, nullStr, nullStr)

  def typedLit(lexical: Column, datatypeIri: String): Column =
    term(lit(TermKind.LITERAL), lexical, lit(datatypeIri), nullStr)

  def strLit(lexical: Column): Column = typedLit(lexical, Vocab.xsdString)

  def intLit(v: Column): Column = typedLit(v.cast(StringType), Vocab.xsdInteger)

  def langLit(lexical: Column, language: Column): Column =
    term(lit(TermKind.LITERAL), lexical, lit(Vocab.rdfLangString), lower(language))

  def constTerm(t: Term): Column =
    term(lit(t.kind), lit(t.value),
      if (t.datatype == null) nullStr else lit(t.datatype),
      if (t.lang == null) nullStr else lit(t.lang))

  // predicates over term columns (rdf-ex term guards, lib/rdf.ex:238-310)
  def isIri(t: Column): Column = t("kind") === TermKind.IRI
  def isBnode(t: Column): Column = t("kind") === TermKind.BNODE
  def isLiteral(t: Column): Column = t("kind") === TermKind.LITERAL
  def isResource(t: Column): Column = isIri(t) || isBnode(t)

  /** N-Triples string form of a term column — pure Column expression
    * (escaping per ntriples/encoder.ex:125-134). Used by the distributed
    * serializer and by sortable key encoding. */
  def ntString(t: Column): Column = {
    val esc = ntEscape(t("value"))
    when(t("kind") === TermKind.IRI, concat(lit("<"), t("value"), lit(">")))
      .when(t("kind") === TermKind.BNODE, concat(lit("_:"), t("value")))
      // quoted triple: value IS the canonical "<< s p o >>" byte form
      .when(t("kind") === TermKind.TRIPLE, t("value"))
      .when(t("lang").isNotNull,
        concat(lit("\""), esc, lit("\"@"), t("lang")))
      .when(t("datatype").isNull || t("datatype") === Vocab.xsdString,
        concat(lit("\""), esc, lit("\"")))
      .otherwise(concat(lit("\""), esc, lit("\"^^<"), t("datatype"), lit(">")))
  }

  private def ntEscape(v: Column): Column = {
    // single-char translations cover \t \b \n \r \f; backslash and quote
    // need two-char targets -> regexp/replace chain, backslash FIRST
    var c = regexp_replace(v, "\\\\", "\\\\\\\\")
    c = replace2(c, "\t", "\\t"); c = replace2(c, "\b", "\\b")
    c = replace2(c, "\n", "\\n"); c = replace2(c, "\r", "\\r")
    c = replace2(c, "\f", "\\f")
    replace2(c, "\"", "\\\"")
  }

  private def replace2(c: Column, from: String, to: String): Column =
    regexp_replace(c, java.util.regex.Pattern.quote(from),
      java.util.regex.Matcher.quoteReplacement(to))

  /** Column twin of `XsdOps.sortKey` for NON-NEGATIVE xsd:integer
    * lexicals (the common hot path: ids, counts, order keys) — byte order
    * == numeric order, whole-stage-codegen friendly. Lexicals past 20
    * digits take the Scala twin's length-header form ("5~" + 6-digit
    * length + digits — lpad alone would TRUNCATE them to their first 20
    * digits, a silent misordering). Parity asserted in TermsSpec. */
  def intSortKey(lex: Column): Column = {
    val len = length(lex)
    val body = when(len <= 20, concat(lit("5"), lpad(lex, 20, "0"), lit(".")))
      .otherwise(concat(lit("5~"), lpad(len.cast(StringType), 6, "0"),
        lex, lit(".")))
    concat(lit(s"${TermKind.LITERAL}|N|"), body)
  }

  /** Column twin of `Skolem.label` — the deterministic salted skolem id as
    * a pure codegen'd expression for the extraction hot path; the Scala
    * function stays as the driver-side/API twin. */
  def skolemLabel(scope: Column, local: Column,
                  salt: String = graft.core.Skolem.defaultSalt): Column =
    concat(lit("sk"), md5(concat(lit(salt + ":"), scope, lit(":"), local)))

  def tripleLine(s: Column, p: Column, o: Column): Column =
    concat(ntString(s), lit(" "), ntString(p), lit(" "), ntString(o), lit(" ."))

  /** RDF-star quoted-triple term from three term columns — builds the same
    * canonical "<< s p o >>" byte form as `Term.quoted`/NTriples
    * .quotedString, as a pure Column expression (annotation emission stays
    * inside whole-stage codegen). */
  def quoted(s: Column, p: Column, o: Column): Column =
    term(lit(TermKind.TRIPLE),
      concat(lit("<< "), ntString(s), lit(" "), ntString(p), lit(" "),
        ntString(o), lit(" >>")),
      nullStr, nullStr)

  private val parseQuotedUdf = udf((v: String) =>
    try { if (v == null) null else graft.core.NTriples.parseQuotedString(v) }
    catch { case _: Exception => null })

  /** Destructure a quoted-triple term's canonical byte form into a struct
    * of (s, p, o) term structs. Genuinely lambda-shaped (recursive grammar)
    * so a UDF is the right tool; used only on the star-pattern match path,
    * never in bulk serialization. */
  def parseQuoted(value: Column): Column = parseQuotedUdf(value)

  /** XPath fn:matches over a string column (Literal.matches?/3 lifted to a
    * pure Column, no UDF): the q/qi flag forms become substring
    * containment, the regex forms inline their flags into the pattern —
    * Spark RLIKE is contains-a-match, exactly fn:matches — so both paths
    * stay inside whole-stage codegen. Throws driver-side on invalid flags,
    * like the reference raises. */
  def matchesPattern(c: Column, pattern: String, flags: String = ""): Column = {
    import graft.core.XPathRegex
    if (XPathRegex.qLiteral(flags)) {
      if (flags.contains('i')) lower(c).contains(pattern.toLowerCase)
      else c.contains(pattern)
    } else c.rlike(XPathRegex.inlinePattern(pattern, flags))
  }

  /** UUIDv3 (RFC 4122 name-based MD5) of a string column under a fixed
    * namespace, 32-char lowercase hex form, as a PURE Column expression —
    * byte-identical to `core.Generators.uuidV3Hex` (asserted in
    * GeneratorsSpec) and whole-stage-codegen'd: md5 over the namespace
    * bytes ++ utf8(name), then the version nibble spliced to '3' and the
    * variant nibble to (x & 3) | 8. Oracle-checked cross-engine in the
    * `rdf_uuid` registry query. */
  def uuidV3Hex(namespace: Array[Byte], name: Column): Column = {
    val h = md5(concat(lit(namespace), name.cast("binary")))
    val d17 = conv(substring(h, 17, 1), 16, 10).cast("int")
    val variant = element_at(
      array(lit("8"), lit("9"), lit("a"), lit("b")), (d17 % 4) + 1)
    concat(substring(h, 1, 12), lit("3"), substring(h, 14, 3),
      variant, substring(h, 18, 15))
  }

  /** 8-4-4-4-12 canonical form from a 32-char hex UUID column. */
  def uuidDashed(hex32: Column): Column =
    concat(substring(hex32, 1, 8), lit("-"), substring(hex32, 9, 4),
      lit("-"), substring(hex32, 13, 4), lit("-"), substring(hex32, 17, 4),
      lit("-"), substring(hex32, 21, 12))

  /** UUIDv4 per row (random — non-reproducible like the reference's
    * random-based generators; use Skolem/uuidV3 for stable identity). */
  def uuidV4(): Column = expr("uuid()")

  /** Typed dataset from a DataFrame with s/p/o struct columns. */
  def asTriples(df: DataFrame)(implicit spark: SparkSession): Dataset[Triple] = {
    import spark.implicits._
    df.select("s", "p", "o").as[Triple]
  }

  def asQuads(df: DataFrame)(implicit spark: SparkSession): Dataset[Quad] = {
    import spark.implicits._
    df.select("s", "p", "o", "g").as[Quad]
  }
}

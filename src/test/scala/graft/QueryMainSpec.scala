package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Dict, Materialize, WebKg}

/** The spark-submit SPARQL query entry over stores and RDF files. */
class QueryMainSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def pagesDf = {
    import spark.implicits._
    WebKg.synthesizeWebPages(Seq(
      (0L, "alpha beta gamma", "en", "src0", 16L),
      (1L, "delta epsilon zeta", "fr", "src1", 18L),
      (2L, "eta theta iota", "de", "src0", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
  }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_qm_$tag").toString

  private val titleQ =
    s"SELECT ?s ?t WHERE { ?s <${WebKg.pTitle}> ?t } ORDER BY ?s"

  test("SELECT over a plain store: lifted terms, parquet solutions") {
    val dir = tmp("plain")
    Materialize.materialize(
      WebKg.extractFlat(pagesDf), s"$dir/store", 4, "t1")
    val json = QueryMain.run(spark, Map(
      "--store" -> s"$dir/store", "--query-text" -> titleQ,
      "--out" -> s"$dir/sol"))
    assert(json.contains(""""form":"select""""))
    assert(json.contains(""""rows":3"""))
    val sol = spark.read.parquet(s"$dir/sol")
    assert(sol.columns.toSeq == Seq("s", "t"))
    // term structs, typed: subjects are IRIs, titles are xsd:string literals
    val r = sol.collect().map(r => (r.getStruct(0).getByte(0),
      r.getStruct(1).getByte(0))).distinct
    assert(r.toSeq == Seq((graft.core.TermKind.IRI, graft.core.TermKind.LITERAL)))
  }

  test("SELECT --format values flattens to lexical columns") {
    val dir = tmp("values")
    Materialize.materialize(
      WebKg.extractFlat(pagesDf), s"$dir/store", 4, "t1")
    QueryMain.run(spark, Map(
      "--store" -> s"$dir/store", "--query-text" -> titleQ,
      "--out" -> s"$dir/sol", "--format" -> "values"))
    val vals = spark.read.parquet(s"$dir/sol").collect()
      .map(_.getString(1)).sorted
    assert(vals.length == 3 && vals.forall(_.startsWith("Doc ")))
  }

  test("dict-encoded store decodes to the same solutions") {
    val dir = tmp("dict")
    Dict.materializeEncoded(
      WebKg.extractFlat(pagesDf), s"$dir/store", 4, "t1")
    val json = QueryMain.run(spark, Map(
      "--store" -> s"$dir/store", "--query-text" -> titleQ,
      "--out" -> s"$dir/sol"))
    assert(json.contains(""""rows":3"""))
  }

  test("encoded store + values SELECT runs in id space, same answer") {
    val dir = tmp("idq")
    Dict.materializeEncoded(WebKg.extractFlat(pagesDf), s"$dir/store", 4, "t1")
    Materialize.materialize(WebKg.extractFlat(pagesDf), s"$dir/plain", 4, "t1")
    val q = s"""SELECT ?s ?t WHERE {
               |  ?s <${WebKg.pTitle}> ?t . ?s <${WebKg.pLang}> "en" }""".stripMargin
    val json = QueryMain.run(spark, Map(
      "--store" -> s"$dir/store", "--query-text" -> q,
      "--out" -> s"$dir/sol", "--format" -> "values", "--buckets" -> "4"))
    assert(json.contains(""""idspace":true"""), json)
    val fast = spark.read.parquet(s"$dir/sol").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // reference: the decoded/typed path over the PLAIN store
    val ref = QueryMain.run(spark, Map(
      "--store" -> s"$dir/plain", "--query-text" -> q,
      "--out" -> s"$dir/ref", "--format" -> "values"))
    assert(!ref.contains(""""idspace""""))
    val slow = spark.read.parquet(s"$dir/ref").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(fast === slow)
    assert(fast.nonEmpty)
    // a shape the id-space path cannot take (ORDER BY) falls back to the
    // decode-then-typed-engine path on the SAME encoded store
    val json2 = QueryMain.run(spark, Map(
      "--store" -> s"$dir/store", "--query-text" -> titleQ,
      "--out" -> s"$dir/sol2", "--format" -> "values"))
    assert(!json2.contains(""""idspace"""") && json2.contains(""""rows":3"""))
    // a constant whose typed lift cannot be proven (IRI under a
    // string-lifted predicate) falls back — and the typed engine answers 0
    val irid = s"""SELECT ?s WHERE { ?s <${WebKg.pTitle}> <http://x> }"""
    val json3 = QueryMain.run(spark, Map(
      "--store" -> s"$dir/store", "--query-text" -> irid,
      "--out" -> s"$dir/sol3", "--format" -> "values"))
    assert(!json3.contains(""""idspace"""") && json3.contains(""""rows":0"""))
    // a --buckets value smaller than the store's lineage bucket ids aborts
    val err = intercept[RuntimeException] {
      QueryMain.run(spark, Map(
        "--store" -> s"$dir/store", "--query-text" -> q,
        "--out" -> s"$dir/sol4", "--format" -> "values", "--buckets" -> "1"))
    }
    assert(err.getMessage.contains("bucket"))
  }

  test("CONSTRUCT writes sorted deterministic N-Triples") {
    val dir = tmp("construct")
    Materialize.materialize(
      WebKg.extractFlat(pagesDf), s"$dir/store", 4, "t1")
    val q = s"""CONSTRUCT { ?s <${WebKg.vocab}name> ?t }
               |WHERE { ?s <${WebKg.pTitle}> ?t }""".stripMargin
    val json = QueryMain.run(spark, Map(
      "--store" -> s"$dir/store", "--query-text" -> q,
      "--out" -> s"$dir/nt"))
    assert(json.contains(""""form":"construct"""") && json.contains(""""rows":3"""))
    // output is real N-Triples: read it back through the decoder
    val back = graft.engine.RdfIO.readGraph(spark, s"$dir/nt", Some("ntriples"))
    assert(back.count() == 3)
    val lines = spark.read.text(s"$dir/nt").collect().map(_.getString(0))
    assert(lines.forall(_.contains(s"<${WebKg.vocab}name>")))
    assert(lines.sorted.sameElements(lines)) // sorted = true is deterministic
  }

  test("--update applies SPARQL Update functionally and writes the new graph") {
    val dir = tmp("upd")
    Materialize.materialize(WebKg.extractFlat(pagesDf), s"$dir/store", 4, "t1")
    val before = spark.read.parquet(s"$dir/store/data").count()
    val upd =
      s"""DELETE { ?s <${WebKg.pTitle}> ?t } WHERE { ?s <${WebKg.pTitle}> ?t } ;
         |INSERT DATA { <https://x.example.org/marker> <${WebKg.pTitle}> "Inserted" }""".stripMargin
    val f = java.nio.file.Files.createTempFile("graft_qm_upd", ".ru")
    java.nio.file.Files.writeString(f, upd)
    val json = QueryMain.run(spark, Map(
      "--store" -> s"$dir/store", "--update" -> f.toString,
      "--out" -> s"$dir/updated"))
    assert(json.contains(""""form":"update""""), json)
    // 3 titles deleted, 1 triple inserted
    assert(json.contains(s""""rows":${before - 3 + 1}"""), json)
    val out = spark.read.parquet(s"$dir/updated")
    assert(out.columns.toSeq == Seq("s", "p", "o"))
    // the store itself is untouched (functional update)
    assert(spark.read.parquet(s"$dir/store/data").count() == before)
    // the written frame queries directly as --data
    val check = QueryMain.run(spark, Map(
      "--data" -> s"$dir/updated", "--data-format" -> "parquet",
      "--query-text" -> titleQ, "--out" -> s"$dir/sol"))
    assert(check.contains(""""rows":1"""))
    // ntriples output of the same update is valid and title-free
    val json2 = QueryMain.run(spark, Map(
      "--store" -> s"$dir/store", "--update" -> f.toString,
      "--out" -> s"$dir/nt", "--format" -> "ntriples"))
    assert(json2.contains(""""form":"update""""))
    val back = graft.engine.RdfIO.readGraph(spark, s"$dir/nt", Some("ntriples"))
    assert(back.count() == before - 3 + 1)
  }

  test("ASK needs no --out and reports the boolean in the metrics line") {
    val dir = tmp("ask")
    Materialize.materialize(
      WebKg.extractFlat(pagesDf), s"$dir/store", 4, "t1")
    val yes = QueryMain.run(spark, Map("--store" -> s"$dir/store",
      "--query-text" -> s"ASK { ?s <${WebKg.pTitle}> ?t }"))
    assert(yes.contains(""""ask":true"""))
    val no = QueryMain.run(spark, Map("--store" -> s"$dir/store",
      "--query-text" -> s"ASK { ?s <${WebKg.vocab}nope> ?t }"))
    assert(no.contains(""""ask":false"""))
  }

  test("--data reads an RDF file and a parquet term frame") {
    val dir = tmp("data")
    val terms = WebKg.extractTriples(pagesDf)
    graft.engine.RdfIO.writeNTriples(terms, s"$dir/g.nt")
    val json = QueryMain.run(spark, Map(
      "--data" -> s"$dir/g.nt", "--query-text" -> titleQ,
      "--out" -> s"$dir/sol1"))
    assert(json.contains(""""rows":3"""))
    terms.write.parquet(s"$dir/g.parquet")
    val json2 = QueryMain.run(spark, Map(
      "--data" -> s"$dir/g.parquet", "--query-text" -> titleQ,
      "--out" -> s"$dir/sol2"))
    assert(json2.contains(""""rows":3"""))
  }

  test("strict validation: bad modes and formats abort") {
    def err(opts: Map[String, String]): String =
      intercept[RuntimeException](QueryMain.run(spark, opts)).getMessage
    assert(err(Map("--query-text" -> "ASK { ?s ?p ?o }"))
      .contains("exactly one of --store"))
    assert(err(Map("--store" -> "/x", "--data" -> "/y",
      "--query-text" -> "ASK { ?s ?p ?o }"))
      .contains("exactly one of --store"))
    assert(err(Map("--store" -> "/x")).contains("exactly one of --query"))
    assert(err(Map("--store" -> "/x", "--query-text" -> titleQ))
      .contains("--out"))
    assert(err(Map("--store" -> "/x", "--query-text" -> titleQ,
      "--out" -> "/o", "--format" -> "ntriples"))
      .contains("--format for SELECT"))
    assert(err(Map("--store" -> "/x", "--query-text" -> titleQ,
      "--out" -> "/o", "--data-format" -> "parquet"))
      .contains("--data-format applies to --data"))
  }
}

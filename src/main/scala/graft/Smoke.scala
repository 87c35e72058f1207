package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core._
import graft.engine.{Bgp, RdfIO, Terms}

/** End-to-end smoke: drives the public API through a real local Spark
  * session — NT parse (distributed), skolemize, literal canonicalization,
  * BGP query, sorted N-Triples emission. Run:
  *   sbt "runMain graft.Smoke"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    // 1. distributed N-Triples decode from raw lines
    val nt = Seq(
      """<http://ex.org/alice> <http://xmlns.com/foaf/0.1/knows> <http://ex.org/bob> .""",
      """<http://ex.org/alice> <http://xmlns.com/foaf/0.1/name> "Alice" .""",
      """<http://ex.org/bob> <http://xmlns.com/foaf/0.1/name> "Bob\nJr." .""",
      """<http://ex.org/bob> <http://ex.org/age> "042"^^<http://www.w3.org/2001/XMLSchema#integer> .""",
      """<http://ex.org/bob> <http://ex.org/score> "12.340"^^<http://www.w3.org/2001/XMLSchema#double> .""",
      """_:doc1 <http://xmlns.com/foaf/0.1/maker> <http://ex.org/alice> .""",
      """# a comment line""",
      """"""
    )
    val triples = RdfIO.parseLines(spark.createDataset(nt))
    println(s"parsed: ${triples.count()} triples")

    // 2. skolemize bnodes (deterministic salted hash) + canonicalize literals
    val processed = triples
      .map(t => Skolem.skolemizeTriple(t, "http://ex.org/page1"))
      .map(t => t.copy(o = Xsd.canonicalTerm(t.o)))

    // 3. BGP query: who knows whom, with names
    import Bgp.dsl._
    val foafKnows = iri("http://xmlns.com/foaf/0.1/knows")
    val foafName = iri("http://xmlns.com/foaf/0.1/name")
    val q = Bgp.Pattern(Seq(
      pat(v("a"), foafKnows, v("b")),
      pat(v("a"), foafName, v("aname")),
      pat(v("b"), foafName, v("bname"))))
    val sol = Bgp.executeValues(spark, processed.toDF(), q)
    println("bgp solutions:")
    sol.orderBy("a").collect().foreach(r => println("  " + r.mkString(" | ")))

    // 4. canonical sorted N-Triples out
    println("sorted canonical N-Triples:")
    RdfIO.toNtLines(processed.toDF(), sorted = true)
      .as[String].collect().foreach(l => println("  " + l))

    // 5. strict vs permissive decode of a malformed line
    val bad = spark.createDataset(Seq("<http://ex.org/only-subject> ."))
    val permissiveCount = bad.mapPartitions(_.flatMap { l =>
      try NTriples.parseTripleLine(l) catch { case _: Exception => None }
    }).count()
    println(s"permissive parse of malformed line -> $permissiveCount triples")
    val strictFailed =
      try { RdfIO.parseLines(bad).count(); false }
      catch { case _: Exception => true }
    println(s"strict parse of malformed line raised: $strictFailed")

    // 6. IRI resolution + percent normalization through the public API
    println("resolve('../g', 'http://a/b/c/d;p?q') = " + Iri.resolve("../g", "http://a/b/c/d;p?q"))
    println("pctnorm('http://ex.com/%7euser/%41') = " + Iri.normalizePercentEncoding("http://ex.com/%7euser/%41"))

    spark.stop()
  }
}

package graft.engine

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.engine.Bgp.dsl._

/** Spark-side API surface: format-detecting read/write, BGP path sugar,
  * per-subject update. */
class EngineApiSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private val ex = "http://e/"

  test("readGraph detects format by extension and reads all four formats") {
    val dir = Files.createTempDirectory("graft_io").toString
    val nt = s"$dir/g.nt"
    Files.write(java.nio.file.Paths.get(nt),
      s"<${ex}s> <${ex}p> \"x\" .\n<${ex}s> <${ex}q> <${ex}o> .\n".getBytes)
    val ttl = s"$dir/g.ttl"
    Files.write(java.nio.file.Paths.get(ttl),
      s"@prefix : <$ex> .\n:s :p \"x\" ; :q :o .\n".getBytes)
    val nq = s"$dir/g.nq"
    Files.write(java.nio.file.Paths.get(nq),
      s"<${ex}s> <${ex}p> \"x\" <${ex}g1> .\n".getBytes)
    val trig = s"$dir/g.trig"
    Files.write(java.nio.file.Paths.get(trig),
      s"@prefix : <$ex> .\n:g1 { :s :p \"x\" . }\n".getBytes)

    assert(RdfIO.readGraph(spark, nt).count() == 2)
    val fromTtl = RdfIO.readGraph(spark, ttl)
    assert(fromTtl.count() == 2)
    assert(fromTtl.filter(col("g").isNotNull).count() == 0)
    assert(RdfIO.readGraph(spark, nq).filter(col("g")("value") === s"${ex}g1").count() == 1)
    assert(RdfIO.readGraph(spark, trig).filter(col("g")("value") === s"${ex}g1").count() == 1)
    // explicit format name overrides extension
    assert(RdfIO.readGraph(spark, nt, Some("ntriples")).count() == 2)
    assertThrows[IllegalArgumentException](RdfIO.readGraph(spark, s"$dir/g.unknown"))
    // detection helpers (serialization.ex:73-119)
    assert(RdfIO.formatByMediaType("text/turtle").map(_.name).contains("turtle"))
    assert(RdfIO.formatByExtension(".nq").map(_.name).contains("nquads"))
    assert(RdfIO.formatByName("trig").isDefined)
    // uppercase extensions detect; a typo'd EXPLICIT name errors instead
    // of silently falling back to extension detection
    assert(RdfIO.formatByExtension(".TTL").map(_.name).contains("turtle"))
    val e = intercept[IllegalArgumentException] {
      RdfIO.readGraph(spark, nt, Some("turtl"))
    }
    assert(e.getMessage.contains("unknown RDF serialization format"))
  }

  test("writeGraph round-trips through ntriples/nquads/turtle writers") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_io_w").toString
    val quads = Seq(
      Quad(Term.iri(ex + "s"), Term.iri(ex + "p"), Term.str("x"), null),
      Quad(Term.iri(ex + "s"), Term.iri(ex + "q"), Term.iri(ex + "o"), Term.iri(ex + "g1"))
    ).toDF()
    RdfIO.writeGraph(quads, s"$dir/out_nq", "nquads")
    assert(RdfIO.readGraph(spark, s"$dir/out_nq/*.txt", Some("nquads")).count() == 2)
    RdfIO.writeGraph(quads, s"$dir/out_nt", "ntriples")
    assert(RdfIO.readGraph(spark, s"$dir/out_nt/*.txt", Some("ntriples")).count() == 2)
    RdfIO.writeGraph(quads, s"$dir/out_ttl", "turtle", Map("" -> ex))
    assert(RdfIO.readGraph(spark, s"$dir/out_ttl/*.txt", Some("turtle")).count() == 2)
    // trig: the quad-level whole-document writer; graph term survives
    RdfIO.writeGraph(quads, s"$dir/out_trig", "trig", Map("" -> ex))
    val backTrig = RdfIO.readGraph(spark, s"$dir/out_trig/*.txt", Some("trig"))
    assert(backTrig.count() == 2)
    assert(backTrig.filter(col("g").isNotNull).count() == 1)
  }

  test("Bgp.path chains patterns through hidden variables (query.ex path/2)") {
    import spark.implicits._
    val triples = Seq(
      Triple(Term.iri(ex + "s"), Term.iri(ex + "p"), Term.iri(ex + "m")),
      Triple(Term.iri(ex + "m"), Term.iri(ex + "label"), Term.str("hit")),
      Triple(Term.iri(ex + "other"), Term.iri(ex + "label"), Term.str("miss"))).toDF()
    val q = Bgp.path(Seq(iri(ex + "s"), iri(ex + "p"), iri(ex + "label"), v("name")))
    val r = Bgp.executeValues(spark, triples, q)
    assert(r.columns.toSeq == Seq("name")) // hidden _path vars dropped
    assert(r.collect().map(_.getString(0)).toSeq == Seq("hit"))
  }

  test("updateSubject transforms exactly one description (graph.ex update/4)") {
    import spark.implicits._
    val g = Seq(
      Triple(Term.iri(ex + "a"), Term.iri(ex + "p"), Term.str("1")),
      Triple(Term.iri(ex + "b"), Term.iri(ex + "p"), Term.str("2"))).toDF()
    val out = Graphs.updateSubject(g, Term.iri(ex + "a"),
      desc => desc.select(col("s"), col("p"),
        struct(col("o.kind").as("kind"), upper(col("o.value")).as("value"),
          col("o.datatype").as("datatype"), col("o.lang").as("lang")).as("o")))
    val vals = out.collect().map(r => r.getStruct(0).getString(1) -> r.getStruct(2).getString(1)).toMap
    assert(vals(ex + "b") == "2") // untouched
  }
}

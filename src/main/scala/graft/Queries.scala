package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Vocab
import graft.engine.{Bgp, Terms}
import graft.ops.{Dedup, Multimodal, Sampling, Similarity, TextOps}
import graft.pipeline.WebKg
import graft.sparql.Sparql

/** The oracle-checked query registry: every operator claimed in SURVEY.md §2
  * appears here as a Spark implementation plus (where SQL-expressible) an
  * equivalent DuckDB oracle over the same parquet tables. Column names are
  * aligned pairwise — the driver compares by sorted column name + value
  * hash. Double-typed aggregates are rounded identically on both sides to
  * absorb summation-order FP noise.
  */
object Queries {

  final case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private val xsdInt = Vocab.xsdInteger

  /** Shared input of the rdf_bgp_optional/union/minus/exists quartet: two
    * BGP solution frames over one synthesized triple table — `base` binds
    * ?doc for every English document, `opt` binds (?doc, ?t) only for EVEN
    * doc_ids (the only docs given a title triple), so each algebra operator
    * has both matching and non-matching base solutions to act on. */
  private def algebraSolutions(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val docs = t(s, d, "documents")
    val sCol = Terms.iri(concat(lit(WebKg.docNs), col("doc_id")))
    val titleP = WebKg.vocab + "title"
    val triples =
      docs.select(sCol.as("s"), Terms.iri(lit(WebKg.pLang)).as("p"),
          Terms.strLit(col("lang")).as("o"))
        .unionAll(docs.filter(col("doc_id") % 2 === 0)
          .select(sCol.as("s"), Terms.iri(lit(titleP)).as("p"),
            Terms.strLit(concat(lit("T"), col("doc_id"))).as("o")))
    import Bgp.dsl._
    val base = Bgp.execute(s, triples,
      Bgp.Pattern(Seq(pat(v("doc"), iri(WebKg.pLang), lit("en")))))
    val opt = Bgp.execute(s, triples,
      Bgp.Pattern(Seq(pat(v("doc"), iri(titleP), v("t")))))
    (base, opt)
  }

  /** The rdf_bgp_idspace body, parameterized on the decode mode so
    * [[graft.Explain]] can dump the non-materializing plan shape
    * (production uses the two-phase checkpointed decode, whose registry
    * frame starts at an ExistingRDD stub). */
  private[graft] def idspaceBgp(s: SparkSession, d: String,
                                materialize: Boolean): DataFrame = {
    val docs = t(s, d, "documents")
    val sCol = concat(lit(WebKg.docNs), col("doc_id"))
    val flat =
      docs.select(sCol.as("s"), lit(WebKg.pLang).as("p"), col("lang").as("o"))
        .unionAll(docs.select(sCol.as("s"),
          lit(WebKg.vocab + "source").as("p"), col("source").as("o")))
        .unionAll(docs.select(sCol.as("s"),
          lit(WebKg.vocab + "nchars").as("p"), col("n_chars").cast("string").as("o")))
    import graft.pipeline.Dict
    import Dict.{FConst, FPattern, FVar}
    Dict.bgpEncoded(Dict.encodeFlat(flat), Dict.termDictionary(flat),
      Seq(
        FPattern(FVar("doc"), FConst(WebKg.pLang), FConst("en")),
        FPattern(FVar("doc"), FConst(WebKg.vocab + "source"), FConst("src7")),
        FPattern(FVar("doc"), FConst(WebKg.vocab + "nchars"), FVar("n"))),
      project = Seq("doc", "n"), materialize = materialize)
  }

  /** Shared triple table of the sparql_* family — one deterministic fact
    * set per document: lang / source / nchars (xsd:integer) for every doc,
    * a title only for EVEN doc_ids (gives OPTIONAL/EXISTS both outcomes),
    * and next-chain edges for doc_id % 10 < 4 (the rdf_bgp_closure
    * geometry, so paths have multi-hop chains to walk). */
  private def sparqlDocTriples(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val sCol = Terms.iri(concat(lit(WebKg.docNs), col("doc_id")))
    def p(iri: String) = Terms.iri(lit(iri))
    docs.select(sCol.as("s"), p(WebKg.pLang).as("p"),
        Terms.strLit(col("lang")).as("o"))
      .unionAll(docs.select(sCol.as("s"), p(WebKg.vocab + "source").as("p"),
        Terms.strLit(col("source")).as("o")))
      .unionAll(docs.select(sCol.as("s"), p(WebKg.vocab + "nchars").as("p"),
        Terms.typedLit(col("n_chars").cast("string"), xsdInt).as("o")))
      .unionAll(docs.filter(col("doc_id") % 2 === 0)
        .select(sCol.as("s"), p(WebKg.pTitle).as("p"),
          Terms.strLit(concat(lit("T"), col("doc_id"))).as("o")))
      .unionAll(docs.filter(col("doc_id") % 10 < 4)
        .select(sCol.as("s"), p(WebKg.vocab + "next").as("p"),
          Terms.iri(concat(lit(WebKg.docNs), col("doc_id") + 1)).as("o")))
  }

  /** Quad variant for the FROM / FROM NAMED dataset clauses (§13.2): the
    * document facts spread over named graphs, plus poison rows that leak
    * into the result ONLY if dataset scoping is broken — the frame's own
    * default graph tags EVERY doc as "en" (leaking it into the FROM-merged
    * default graph inflates the match set) and graph g/extra carries
    * out-of-range nchars (ignoring the FROM NAMED restriction does too). */
  private def sparqlDocQuads(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val sCol = Terms.iri(concat(lit(WebKg.docNs), col("doc_id")))
    def p(iri: String) = Terms.iri(lit(iri))
    def g(name: String) = Terms.iri(lit("http://graft.dev/g/" + name))
    docs.select(sCol.as("s"), p(WebKg.pLang).as("p"),
        Terms.strLit(col("lang")).as("o"), g("lang").as("g"))
      .unionAll(docs.select(sCol.as("s"), p(WebKg.vocab + "nchars").as("p"),
        Terms.typedLit(col("n_chars").cast("string"), xsdInt).as("o"),
        g("meta").as("g")))
      .unionAll(docs.select(sCol.as("s"), p(WebKg.vocab + "nchars").as("p"),
        Terms.typedLit(lit("999999999"), xsdInt).as("o"), g("extra").as("g")))
      .unionAll(docs.select(sCol.as("s"), p(WebKg.pLang).as("p"),
        Terms.strLit(lit("en")).as("o"),
        lit(null).cast(Terms.termSchema).as("g")))
  }

  private val sparqlPrefix = s"PREFIX v: <${WebKg.vocab}>\n"

  // shared by kg_entity_link_fuzzy (broadcast dictionary) and
  // kg_entity_link_big (shuffled big-dictionary path): identical semantics,
  // different physical distribution — one oracle. Mirrors the Spark plan's
  // two scale invariants exactly: the fuzzy machinery runs over DISTINCT
  // residual tokens (vocab CTE), and (band, sig) buckets larger than 64
  // rows on either side are dropped before the candidate join (the
  // deterministic window-count cap — same rows on both engines).
  private val fuzzyLinkSql: String =
    """WITH dict(surface, entity) AS (VALUES
      |  ('customer','http://graft.dev/entity/customer'),
      |  ('part','http://graft.dev/entity/part'),
      |  ('order','http://graft.dev/entity/order'),
      |  ('supplier','http://graft.dev/entity/supplier'),
      |  ('spark','http://graft.dev/entity/spark'),
      |  ('vector','http://graft.dev/entity/vector')),
      |tok AS (SELECT DISTINCT doc_id, w FROM
      |  (SELECT doc_id, unnest(string_split_regex(text,'\s+')) AS w FROM documents)
      |  WHERE length(w) >= 3),
      |exact AS (SELECT t.doc_id, t.w, d.entity, CAST(1 AS DOUBLE) AS jac
      |  FROM tok t JOIN dict d ON t.w = d.surface),
      |tokr AS (SELECT t.doc_id, t.w FROM tok t WHERE NOT EXISTS
      |  (SELECT 1 FROM dict d WHERE d.surface = t.w)),
      |vocab AS (SELECT DISTINCT w FROM tokr),
      |sh AS (SELECT w, unnest(list_distinct(list_transform(
      |  range(1, length(w)-1), i -> substr(w, i, 3)))) AS g FROM vocab),
      |mh AS (SELECT w,
      |  min(md5('0:'||g)) AS s0, min(md5('1:'||g)) AS s1,
      |  min(md5('2:'||g)) AS s2, min(md5('3:'||g)) AS s3 FROM sh GROUP BY 1),
      |mb0 AS (SELECT w, 0 AS band, md5(s0||s1) AS sig FROM mh
      |  UNION ALL SELECT w, 1, md5(s2||s3) FROM mh),
      |mb AS (SELECT w, band, sig FROM
      |  (SELECT mb0.*, count(*) OVER (PARTITION BY band, sig) AS bn FROM mb0)
      |  WHERE bn <= 64),
      |dsh AS (SELECT surface, entity, unnest(list_distinct(list_transform(
      |  range(1, length(surface)-1), i -> substr(surface, i, 3)))) AS g FROM dict),
      |dmh AS (SELECT surface, entity,
      |  min(md5('0:'||g)) AS s0, min(md5('1:'||g)) AS s1,
      |  min(md5('2:'||g)) AS s2, min(md5('3:'||g)) AS s3 FROM dsh GROUP BY 1,2),
      |db0 AS (SELECT surface, entity, 0 AS band, md5(s0||s1) AS sig FROM dmh
      |  UNION ALL SELECT surface, entity, 1, md5(s2||s3) FROM dmh),
      |db AS (SELECT surface, entity, band, sig FROM
      |  (SELECT db0.*, count(*) OVER (PARTITION BY band, sig) AS bn FROM db0)
      |  WHERE bn <= 64),
      |cand AS (SELECT DISTINCT m.w, d.surface, d.entity
      |  FROM mb m JOIN db d ON m.band=d.band AND m.sig=d.sig),
      |wn AS (SELECT w, count(*) AS na FROM sh GROUP BY 1),
      |dn AS (SELECT surface, count(*) AS nb FROM dsh GROUP BY 1),
      |inter AS (SELECT c.w, c.surface, c.entity, count(*) AS i
      |  FROM cand c JOIN sh a ON a.w=c.w
      |  JOIN dsh b ON b.surface=c.surface AND b.g=a.g GROUP BY 1,2,3),
      |scored AS (SELECT i.w, i.entity,
      |    CAST(i.i AS DOUBLE) / (wn.na + dn.nb - i.i) AS jac
      |  FROM inter i JOIN wn ON i.w=wn.w
      |  JOIN dn ON i.surface=dn.surface
      |  WHERE CAST(i.i AS DOUBLE) / (wn.na + dn.nb - i.i) >= 0.5),
      |fres AS (SELECT w, entity, jac FROM
      |  (SELECT scored.*, row_number() OVER (PARTITION BY w
      |     ORDER BY jac DESC, entity) AS rn FROM scored) WHERE rn = 1),
      |resolved AS (SELECT doc_id, w, entity, jac FROM exact
      |  UNION ALL SELECT t.doc_id, f.w, f.entity, f.jac
      |  FROM tokr t JOIN fres f ON t.w = f.w)
      |SELECT 'http://graft.dev/doc/'||doc_id AS s,
      |  'http://graft.dev/vocab#mentions' AS p, entity AS o,
      |  count(DISTINCT w) AS n_mentions, round(max(jac), 6) AS top_jac
      |FROM resolved GROUP BY 1,2,3""".stripMargin

  val all: Seq[(String, Q)] = Seq(

    // ----------------------------------------------------------- relational
    // aggregation with partial (map-side) combine: SURVEY §2.4
    "q1_agg" -> Q(
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("n")),
      Some("""SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
             |round(sum(l_extendedprice),2) AS sum_price, round(avg(l_discount),6) AS avg_disc,
             |count(*) AS n FROM lineitem GROUP BY 1,2""".stripMargin)),

    // broadcast dimension joins: SURVEY §2.3
    "q2_join_agg" -> Q(
      (s, d) => {
        val o = t(s, d, "orders"); val c = t(s, d, "customer"); val n = t(s, d, "nation")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
      },
      Some("""SELECT n_name, count(*) AS n_orders, round(sum(o_totalprice),2) AS revenue
             |FROM orders JOIN customer ON o_custkey=c_custkey
             |JOIN nation ON c_nationkey=n_nationkey GROUP BY 1""".stripMargin)),

    // left-semi join (include? / EXISTS semantics): SURVEY §2.2
    "q3_semijoin" -> Q(
      (s, d) => {
        val li = t(s, d, "lineitem")
        val p = t(s, d, "part").filter(col("p_size") > 40)
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "left_semi")
          .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      },
      Some("""SELECT l_returnflag, count(*) AS n FROM lineitem
             |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
             |GROUP BY 1""".stripMargin)),

    // first event per key. The oracle stays the window formulation
    // (row_number = 1); the Spark plan computes the identical row as a
    // MIN over the (shipdate, orderkey, linenumber) struct — lexicographic
    // struct comparison IS the window's ORDER BY, and min is a hash
    // aggregation with map-side partial combine, so the exchange carries
    // one row per supplier instead of sorting every lineitem row inside
    // its partition (guide §2.3 "aggregate before you shuffle"; plan:
    // Exchange+Sort+Window -> partial HashAggregate+Exchange+HashAggregate)
    "q4_window" -> Q(
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_suppkey")
        .agg(min(struct(col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"))).as("w"))
        .select(col("l_suppkey"), col("w.l_orderkey").as("l_orderkey"),
          col("w.l_linenumber").as("l_linenumber"),
          col("w.l_shipdate").as("l_shipdate")),
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate FROM (
             |  SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
             |    row_number() OVER (PARTITION BY l_suppkey
             |      ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
             |  FROM lineitem) WHERE rn = 1""".stripMargin)),

    // top-k with deterministic tie-break: SURVEY §2.6
    "q5_topk" -> Q(
      (s, d) => t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice").limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // set intersection: SURVEY §2.5
    "q6_intersect" -> Q(
      (s, d) => t(s, d, "orders").select(col("o_custkey").as("custkey"))
        .intersect(t(s, d, "customer").filter(col("c_nationkey") < 5)
          .select(col("c_custkey").as("custkey"))),
      Some("""SELECT o_custkey AS custkey FROM orders
             |INTERSECT
             |SELECT c_custkey AS custkey FROM customer WHERE c_nationkey < 5""".stripMargin)),

    // anti join (delete/except semantics): SURVEY §2.5
    "q7_antijoin" -> Q(
      (s, d) => {
        val c = t(s, d, "customer")
        val o = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey NOT IN
             |  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin)),

    // event-time bucketed aggregation (batch face of the streaming path)
    "q8_events_agg" -> Q(
      (s, d) => t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("sv")),
      Some("""SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n,
             |round(sum(value),3) AS sv FROM events GROUP BY 1,2""".stripMargin)),

    // salted shuffle join on a SKEWED key (events has a handful of hot
    // event_types): the fact side is salted, the dimension replicated
    // x8, so one hot key spreads over 8 reduce partitions — the plan-level
    // skew fix the north star's "salted, skew-aware" tables call for.
    // Forced shuffle-hash join (no broadcast) so the salting is what is
    // actually exercised; results identical to the plain join.
    "q9_skew_join" -> Q(
      (s, d) => {
        val ev = t(s, d, "events")
        val dim = ev.select(col("event_type")).distinct()
          .withColumn("w", length(col("event_type")))
        graft.ops.Skew.saltedJoin(ev, dim, "event_type", 8)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), round(sum(col("value") * col("w")), 3).as("sv"))
      },
      Some("""WITH dim AS (SELECT DISTINCT event_type, length(event_type) AS w FROM events)
             |SELECT e.event_type, count(*) AS n, round(sum(e.value * d.w), 3) AS sv
             |FROM events e JOIN dim d ON e.event_type = d.event_type
             |GROUP BY 1""".stripMargin)),

    // Structured Streaming face of q8: file-source stream -> watermarked
    // 1-hour windows, run to completion on the static input; the window
    // start equals date_trunc('hour') so the batch SQL is the oracle
    "stream_events_window" -> Q(
      (s, d) => {
        // file-stream sources need a DIRECTORY of files: stage the table
        val dir = s"/tmp/graft_stream_events_${math.abs(d.hashCode)}"
        val events = t(s, d, "events")
        events.write.mode("overwrite").parquet(dir)
        val stream = graft.engine.Streaming.windowedEventCounts(
          s.readStream.schema(events.schema).parquet(dir))
        graft.engine.Streaming.runToCompletion(stream,
          s"stream_events_${math.abs(d.hashCode)}", outputMode = "complete")
      },
      Some("""SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n,
             |round(sum(value),3) AS sv FROM events GROUP BY 1,2""".stripMargin)),

    // INCREMENTAL BGP: lang annotations ARRIVE as a stream and join the
    // static source triples per micro-batch (stream-static equi-join;
    // each arriving triple emits its new solutions exactly once)
    "stream_bgp_incr" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val sCol = Terms.iri(concat(lit(WebKg.docNs), col("doc_id")))
        def p(iri: String) = Terms.iri(lit(iri))
        val static = docs.select(sCol.as("s"),
          p(WebKg.vocab + "source").as("p"), Terms.strLit(col("source")).as("o"))
        val dir = s"/tmp/graft_stream_bgp_${math.abs(d.hashCode)}"
        docs.select(sCol.as("s"), p(WebKg.pLang).as("p"),
            Terms.strLit(col("lang")).as("o"))
          .write.mode("overwrite").parquet(dir)
        val stream = s.readStream
          .schema(s.read.parquet(dir).schema).parquet(dir)
        import Bgp.dsl._
        val q = Bgp.Pattern(Seq(
          pat(v("doc"), iri(WebKg.pLang), v("lang")), // streamed
          pat(v("doc"), iri(WebKg.vocab + "source"), lit("src3"))))
        val inc = Bgp.executeIncremental(s, static, stream, q, streamedIdx = 0)
        graft.engine.Streaming.runToCompletion(inc,
          s"stream_bgp_${math.abs(d.hashCode)}", outputMode = "append")
          .select(col("doc")("value").as("doc"), col("lang")("value").as("lang"))
      },
      Some("""SELECT 'http://graft.dev/doc/'||doc_id AS doc, lang
             |FROM documents WHERE source='src3'""".stripMargin)),

    // -------------------------------------------------------- dedup family
    "dedup_exact" -> Q(
      (s, d) => Dedup.exact(t(s, d, "documents")),
      Some("""SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keeper
             |FROM documents GROUP BY 1""".stripMargin)),

    // STREAMING exact dedup: watermarked dropDuplicates over a re-crawled
    // corpus (10% duplicate rows injected), run to completion on the static
    // input. Output = the distinct content hashes that survived — identical
    // regardless of which duplicate the state store kept first, so the
    // batch SQL is an exact oracle.
    "stream_dedup_exact" -> Q(
      (s, d) => {
        val dir = s"/tmp/graft_stream_dedup_${math.abs(d.hashCode)}"
        val base = t(s, d, "documents").select(col("doc_id"), col("text"),
          expr("TIMESTAMP '2025-01-01 00:00:00' + make_interval(0,0,0,0,0,0,doc_id)")
            .as("ts"))
        val dups = base.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text"),
            col("ts") + expr("INTERVAL 1 HOUR"))
        base.unionAll(dups).write.mode("overwrite").parquet(dir)
        val schema = s.read.parquet(dir).schema
        val stream = graft.engine.Streaming.streamingExactDedup(
          s.readStream.schema(schema).parquet(dir))
        graft.engine.Streaming.runToCompletion(stream,
          s"stream_dedup_${math.abs(d.hashCode)}", outputMode = "append")
          .select("h")
      },
      Some("SELECT DISTINCT md5(text) AS h FROM documents")),

    "dedup_minhash_lsh" -> Q(
      (s, d) => Dedup.minhashLshCandidates(t(s, d, "documents")),
      Some(lshCandSql +
        "SELECT d1 AS doc_id, count(*) AS n_cand FROM cand GROUP BY 1")),

    // STREAMING stateful LSH near-dup: one flatMapGroupsWithState keyed by
    // LSH bucket, emitting candidate pairs as docs arrive. On a static
    // corpus (no bucket over the cap at this SF — verified) the pair set
    // equals the batch plan's, so dedup_minhash_lsh's oracle applies.
    // Parity holds through sf0.01 (the driver's gate); at sf0.1 some
    // buckets exceed stateCap and the two diverge BY DESIGN (batch
    // switches an oversized bucket to linear star pairs, streaming cannot
    // retract already-emitted pairs — engine/Streaming.scala scaladoc).
    "stream_dedup_lsh" -> Q(
      (s, d) => {
        val dir = s"/tmp/graft_stream_lsh_${math.abs(d.hashCode)}"
        t(s, d, "documents")
          .select(col("doc_id"), col("source"), col("text"),
            expr("TIMESTAMP '2025-01-01 00:00:00' + make_interval(0,0,0,0,0,0,doc_id)")
              .as("ts"))
          .write.mode("overwrite").parquet(dir)
        val schema = s.read.parquet(dir).schema
        val stream = graft.engine.Streaming.streamingLshCandidatePairs(
          s.readStream.schema(schema).parquet(dir))
        graft.engine.Streaming.runToCompletion(stream.toDF(),
          s"stream_lsh_${math.abs(d.hashCode)}", outputMode = "append")
          .distinct()
          .groupBy(col("d1").as("doc_id")).agg(count(lit(1)).as("n_cand"))
      },
      Some(lshCandSql +
        "SELECT d1 AS doc_id, count(*) AS n_cand FROM cand GROUP BY 1")),

    // two-stage near-dup: LSH blocking -> exact Jaccard verify over the
    // candidate pairs ONLY (the raw token-token join is quadratic per
    // common token at corpus scale)
    "dedup_ngram_jaccard" -> Q(
      (s, d) => Dedup.ngramJaccardNearDups(t(s, d, "documents")),
      Some(ngramJacSql +
        """SELECT doc_id, count(*) AS n_near FROM
          |  (SELECT d1 AS doc_id FROM jac UNION ALL SELECT d2 FROM jac)
          |GROUP BY 1""".stripMargin)),

    // CLUSTER RESOLUTION over the VERIFIED near-dup pair graph:
    // near-duplication is transitive in practice, so the actionable dedup
    // output is one cluster id + keep/drop per doc (pointer-doubled
    // connected components over block->verify pairs — raw LSH candidates
    // would let one false-positive bucket edge merge whole clusters —
    // min-id representative). Oracle: the identical verified-pair CTE + a
    // recursive reachability closure (cluster = min reachable doc_id;
    // pair-free docs are singletons via the base case)
    "dedup_clusters" -> Q(
      (s, d) => Dedup.nearDupClusters(t(s, d, "documents")),
      Some(ngramJacSql.replaceFirst("WITH ", "WITH RECURSIVE ") +
        """, edges AS (SELECT d1 AS a, d2 AS b FROM jac
          |  UNION ALL SELECT d2, d1 FROM jac),
          |reach(id, r) AS (
          |  SELECT doc_id, doc_id FROM documents
          |  UNION
          |  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a)
          |SELECT id AS doc_id, min(r) AS cluster,
          |  CAST(min(r) = id AS INTEGER) AS keep
          |FROM reach GROUP BY id""".stripMargin)),

    "dedup_simhash" -> Q(
      (s, d) => Dedup.simhash16(t(s, d, "documents")),
      Some {
        val bitSums = (0 until 16).map(j =>
          s"sum(CASE WHEN substr(md5(w),${j + 1},1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS b$j")
          .mkString(", ")
        val bits = (0 until 16).map(j => s"(CASE WHEN b$j > 0 THEN '1' ELSE '0' END)")
          .mkString("||")
        s"""WITH tok AS (SELECT doc_id,
           |    unnest(list_distinct(string_split_regex(text,'\\s+'))) AS w FROM documents),
           |sums AS (SELECT doc_id, $bitSums FROM tok GROUP BY 1)
           |SELECT doc_id, $bits AS simhash FROM sums""".stripMargin
      }),

    // ------------------------------------------------------- text analysis
    "text_tokens" -> Q(
      (s, d) => TextOps.tokenCounts(t(s, d, "documents")),
      // outer CAST: DuckDB's list_sum returns HUGEINT (int128) — the
      // driver's value hash is type-sensitive, Spark emits BIGINT
      Some("""SELECT doc_id, len(string_split_regex(text,'\s+')) AS n_tokens,
             |length(text) AS n_chars,
             |CAST(list_sum(list_transform(string_split_regex(text,'\s+'),
             |  w -> CAST(ceil(length(w)/4.0) AS BIGINT))) AS BIGINT) AS n_subwords
             |FROM documents""".stripMargin)),

    "text_quality" -> Q(
      (s, d) => TextOps.qualityScores(t(s, d, "documents")),
      Some("""SELECT doc_id, len(string_split_regex(text,'\s+')) AS n_tokens,
             |round(len(list_filter(string_split_regex(text,'\s+'),
             |  w -> w='the' OR w='a')) * 1.0 / len(string_split_regex(text,'\s+')), 6)
             |  AS stopword_ratio,
             |round(length(regexp_replace(text, '\s', '', 'g'))
             |  * 1.0 / len(string_split_regex(text,'\s+')), 6) AS avg_word_len
             |FROM documents""".stripMargin)),

    "text_langid" -> Q(
      (s, d) => TextOps.langId(t(s, d, "documents")),
      Some("""WITH sc AS (SELECT doc_id,
             |  len(list_filter(string_split_regex(text,'\s+'), w -> w='the' OR w='a')) AS en,
             |  len(list_filter(string_split_regex(text,'\s+'), w -> w='le' OR w='la')) AS fr,
             |  len(list_filter(string_split_regex(text,'\s+'), w -> w='der' OR w='die')) AS de,
             |  len(list_filter(string_split_regex(text,'\s+'), w -> w='el' OR w='los')) AS es
             |  FROM documents)
             |SELECT doc_id, CASE WHEN en>=fr AND en>=de AND en>=es THEN 'en'
             |  WHEN fr>=de AND fr>=es THEN 'fr' WHEN de>=es THEN 'de'
             |  ELSE 'es' END AS pred_lang FROM sc""".stripMargin)),

    // the COMPOSED curation pipeline over a re-crawled corpus: exact dedup
    // (collapses the injected duplicate crawls — the oracle's counts only
    // match if it does) -> langid -> quality gates -> per-language stats
    "text_curation" -> Q(
      (s, d) => TextOps.curate(
          WebKg.synthesizeWebPages(t(s, d, "documents"), withDuplicates = true))
        .groupBy(col("pred_lang"), floor(col("n_tokens") / 20).as("len_bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens")),
      Some(kgPagesSql +
        """, ded AS (SELECT min(url) AS url, any_value(text) AS text
          |  FROM pages GROUP BY md5(text)),
          |sc AS (SELECT url, len(string_split_regex(text,'\s+')) AS n_tokens,
          |  len(list_filter(string_split_regex(text,'\s+'), w -> w='the' OR w='a'))
          |    * 1.0 / len(string_split_regex(text,'\s+')) AS sw,
          |  len(list_filter(string_split_regex(text,'\s+'), w -> w='the' OR w='a')) AS en,
          |  len(list_filter(string_split_regex(text,'\s+'), w -> w='le' OR w='la')) AS fr,
          |  len(list_filter(string_split_regex(text,'\s+'), w -> w='der' OR w='die')) AS de,
          |  len(list_filter(string_split_regex(text,'\s+'), w -> w='el' OR w='los')) AS es
          |  FROM ded)
          |SELECT CASE WHEN en>=fr AND en>=de AND en>=es THEN 'en'
          |  WHEN fr>=de AND fr>=es THEN 'fr' WHEN de>=es THEN 'de'
          |  ELSE 'es' END AS pred_lang,
          |CAST(n_tokens // 20 AS BIGINT) AS len_bucket,
          |count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
          |FROM sc WHERE n_tokens >= 20 AND sw <= 0.2 GROUP BY 1, 2""".stripMargin)),

    // Gopher-style repetition removal signals: duplicate word-2-gram and
    // duplicate-token fractions per document
    "text_repetition" -> Q(
      (s, d) => TextOps.repetitionSignals(t(s, d, "documents")),
      Some("""WITH tt AS (SELECT doc_id,
             |  string_split_regex(text,'\s+') AS t FROM documents),
             |b AS (SELECT doc_id, t,
             |  list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS bg
             |  FROM tt)
             |SELECT doc_id,
             |round(CASE WHEN len(bg) > 0 THEN
             |  (len(bg) - len(list_distinct(bg))) * 1.0 / len(bg)
             |  ELSE 0.0 END, 6) AS dup_bigram_frac,
             |round((len(t) - len(list_distinct(t))) * 1.0 / len(t), 6)
             |  AS dup_token_frac
             |FROM b""".stripMargin)),

    // deterministic hash-based train/val/test split (no RNG: stable under
    // re-runs, retries, and corpus growth)
    "sample_split" -> Q(
      (s, d) => Sampling.hashSplit(t(s, d, "documents"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)),
      Some("""SELECT doc_id, CASE WHEN u < 0.8 THEN 'train'
             |  WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
             |FROM (SELECT doc_id,
             |  CAST('0x'||substr(md5('graft-split-v1:'||doc_id),1,15) AS BIGINT)
             |    / 1152921504606846976.0 AS u
             |  FROM documents)""".stripMargin)),

    // token-budget shard packing: greedy sequential semantics computed as
    // a distributed prefix sum (range partitions + per-partition window +
    // broadcast offsets)
    "sample_shards" -> Q(
      (s, d) => Sampling.packShards(t(s, d, "documents"), budgetTokens = 2000),
      Some("""WITH t AS (SELECT doc_id,
             |  len(string_split_regex(text,'\s+')) AS n_tokens FROM documents),
             |c AS (SELECT doc_id, n_tokens, sum(n_tokens) OVER
             |  (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |  AS cum FROM t)
             |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CAST((cum - n_tokens) // 2000 AS BIGINT) AS shard FROM c""".stripMargin)),

    // deterministic stratified sample: exactly min(n, |stratum|) docs per
    // language in hash-uniform order — the rank filter compiles to
    // WindowGroupLimit (per-partition group limit BEFORE the exchange),
    // so a dominant stratum never sorts in one task
    "sample_stratified" -> Q(
      (s, d) => Sampling.stratifiedSample(t(s, d, "documents"), "lang", 20),
      Some("""SELECT lang, doc_id, CAST(pick_rank AS INTEGER) AS pick_rank FROM (
             |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
             |    ORDER BY md5('graft-strat-v1:'||CAST(doc_id AS VARCHAR)), doc_id)
             |    AS pick_rank
             |  FROM documents) WHERE pick_rank <= 20""".stripMargin)),

    // CCNet-style LM quality scoring: per-token NLL under a Laplace-
    // smoothed unigram LM trained on the doc_id%13==0 reference slice;
    // per-token cost quantized to integer micro-nats so the per-doc sum is
    // order-independent and engine-exact (see TextOps.lmScore)
    "text_lm_score" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        TextOps.lmScore(docs, docs.filter(col("doc_id") % 13 === 0), maxNll = 3.45)
      },
      Some("""WITH ref AS (SELECT unnest(string_split_regex(text,'\s+')) AS w
             |  FROM documents WHERE doc_id % 13 = 0),
             |cnt AS (SELECT w, count(*) AS c FROM ref GROUP BY 1),
             |tot AS (SELECT sum(c) + count(*) AS denom FROM cnt),
             |tok AS (SELECT doc_id, unnest(string_split_regex(text,'\s+')) AS w
             |  FROM documents),
             |cost AS (SELECT doc_id,
             |    CAST(round(ln((SELECT denom FROM tot) * 1.0
             |      / (COALESCE(c, 0) + 1)) * 1e6, 0) AS BIGINT) AS sc
             |  FROM tok LEFT JOIN cnt USING (w))
             |SELECT doc_id, count(*) AS n_tokens,
             |  round(CAST(sum(sc) AS DOUBLE) / 1e6 / count(*), 6) AS nll_per_token,
             |  round(CAST(sum(sc) AS DOUBLE) / 1e6 / count(*), 6) <= 3.45 AS keep
             |FROM cost GROUP BY 1""".stripMargin)),

    // temperature-based domain resampling (τ=2 ⇒ α=0.5): keep all of the
    // rarest source, downsample dominant ones at rate sqrt(n_min/n_d);
    // sqrt is correctly rounded under IEEE 754 so the keep decision is
    // bit-identical across engines (see Sampling.temperatureResample)
    "sample_temperature" -> Q(
      (s, d) => Sampling.temperatureResample(t(s, d, "documents"), "lang"),
      Some("""WITH c AS (SELECT lang AS domain, count(*) AS n
             |  FROM documents GROUP BY 1),
             |r AS (SELECT domain,
             |  sqrt((SELECT min(n) FROM c) * 1.0 / n) AS rate FROM c)
             |SELECT d.doc_id, d.lang AS domain, round(r.rate, 6) AS keep_rate
             |FROM documents d JOIN r ON d.lang = r.domain
             |WHERE CAST('0x'||substr(md5('graft-temp-v1:'||d.doc_id),1,15) AS BIGINT)
             |  / 1152921504606846976.0 < r.rate""".stripMargin)),

    // benchmark decontamination: docs sharing any word 3-gram with the
    // "benchmark" slice (doc_id % 97 == 0) get flagged; benchmark side
    // broadcast, corpus side one explode + broadcast join
    "text_decontaminate" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        TextOps.decontaminate(docs, docs.filter(col("doc_id") % 97 === 0), 3)
      },
      Some(decontaminateOracleSql)),

    // Bloom-prefiltered decontamination: same contract as
    // text_decontaminate (the oracle SQL is IDENTICAL — the Bloom pass is
    // a prefilter, the exact verify join removes its false positives), but
    // the benchmark set ships as a ~bytes-per-key Bloom filter instead of
    // an exact broadcast set — the variant for benchmark suites too big to
    // broadcast. fpp=0.5 ON PURPOSE: a deliberately weak filter at sf0.01
    // forces real false positives through the verify join, so this row
    // also oracle-checks the FP-elimination path, not just the happy path
    "text_decontam_bloom" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        TextOps.decontaminateBloom(docs, docs.filter(col("doc_id") % 97 === 0),
          3, fpp = 0.5)
      },
      Some(decontaminateOracleSql)),

    // vocabulary building: global top-k tokens (occurrences + doc
    // frequency), distributed top-k with a lexicographic k-boundary tie
    "text_vocab" -> Q(
      (s, d) => TextOps.topTokens(t(s, d, "documents"), 100),
      Some("""WITH tokall AS (SELECT doc_id,
             |  unnest(string_split_regex(text,'\s+')) AS w FROM documents)
             |SELECT w, count(*) AS n, count(DISTINCT doc_id) AS df
             |FROM tokall GROUP BY 1 ORDER BY n DESC, w LIMIT 100""".stripMargin)),

    // corpus-wide line-level exact dedup (C4-style boilerplate removal):
    // every doc gains a shared footer + a per-source nav line; dedup keeps
    // each boilerplate line only at its first corpus occurrence and
    // rebuilds the texts byte-exactly
    "text_line_dedup" -> Q(
      (s, d) => TextOps.lineDedup(t(s, d, "documents").select(col("doc_id"),
        concat_ws("\n", col("text"),
          lit("=== standard web footer: all rights reserved ==="),
          concat(lit("navigation menu for "), col("source"))).as("text"))),
      Some("""WITH d AS (SELECT doc_id, text || chr(10) ||
             |  '=== standard web footer: all rights reserved ===' || chr(10) ||
             |  'navigation menu for ' || source AS text FROM documents),
             |l AS (SELECT doc_id, unnest(list_transform(string_split(text, chr(10)),
             |  (x, i) -> {'idx': i, 'line': x})) AS s FROM d),
             |f AS (SELECT doc_id, s.idx AS idx, s.line AS line,
             |  row_number() OVER (PARTITION BY md5(s.line) ORDER BY doc_id, s.idx) AS rn
             |  FROM l),
             |k AS (SELECT * FROM f WHERE rn = 1 OR length(line) < 10)
             |SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS text,
             |  count(*) AS n_kept FROM k GROUP BY 1""".stripMargin)),

    // C4-style per-line RULE filter (terminal punctuation + min words +
    // boilerplate markers) — the heuristic cleaner C4 runs BEFORE
    // corpus-wide line dedup. Injected lines exercise every rule: a real
    // sentence (kept), a 1-word menu line (dropped: words+punct), a
    // javascript notice on doc_id%3 (dropped: marker), lorem ipsum on
    // doc_id%5 (dropped: marker), and doc_id%11 docs made of ONLY bad
    // lines (keep=false with empty text, not dropped from the output).
    // Pure per-document projection — no shuffle; the oracle mirrors the
    // rule set over the identical injected corpus (its array_to_string
    // over an EMPTY kept list is NULL in DuckDB where Spark's concat_ws
    // is '' — coalesced to align; and no `--` comments in oracle SQL:
    // oracleSql flattens newlines, which would turn the rest of the
    // statement into the comment).
    "text_c4_filter" -> Q(
      (s, d) => {
        val injected = when(col("doc_id") % 11 === 0,
          lit("menu\n{ cookie banner }\nshort"))
          .otherwise(concat_ws("\n",
            concat(col("text"), lit(".")),
            lit("menu"),
            when(col("doc_id") % 3 === 0,
              lit("Enable javascript to view this page."))
              .otherwise(lit("A perfectly ordinary sentence with many words.")),
            when(col("doc_id") % 5 === 0, lit("Lorem Ipsum dolor sit amet."))
              .otherwise(lit("Another ordinary line of real content here."))))
        TextOps.c4LineFilter(
          t(s, d, "documents").select(col("doc_id"), injected.as("text")))
      },
      Some("""WITH d AS (SELECT doc_id,
             |    CASE WHEN doc_id % 11 = 0
             |      THEN 'menu' || chr(10) || '{ cookie banner }' || chr(10) || 'short'
             |      ELSE text || '.' || chr(10) || 'menu' || chr(10) ||
             |        (CASE WHEN doc_id % 3 = 0 THEN 'Enable javascript to view this page.'
             |              ELSE 'A perfectly ordinary sentence with many words.' END)
             |        || chr(10) ||
             |        (CASE WHEN doc_id % 5 = 0 THEN 'Lorem Ipsum dolor sit amet.'
             |              ELSE 'Another ordinary line of real content here.' END)
             |    END AS text FROM documents),
             |s AS (SELECT doc_id,
             |    list_filter(string_split(text, chr(10)), l ->
             |      regexp_matches(l, '[.!?"]$')
             |      AND len(string_split_regex(l, '\s+')) >= 3
             |      AND NOT contains(lower(l), 'lorem ipsum')
             |      AND NOT contains(lower(l), 'javascript')
             |      AND NOT contains(l, '{')) AS kept,
             |    len(string_split(text, chr(10))) AS n_lines
             |  FROM d)
             |SELECT doc_id,
             |  coalesce(array_to_string(kept, chr(10)), '') AS text,
             |  CAST(len(kept) AS BIGINT) AS n_kept,
             |  CAST(n_lines - len(kept) AS BIGINT) AS n_dropped,
             |  len(kept) >= 1 AS keep
             |FROM s""".stripMargin)),

    // SUBSTRING-level duplicated-content stats (block-hash variant of
    // suffix-array substring dedup): every 7th doc gains a shared PREFIX
    // passage — a prefix, not a suffix, because block boundaries are
    // absolute text positions, so only position-aligned copies share
    // block hashes (the documented boundary sensitivity of the block
    // method). Those docs report the aligned duplicated blocks; the rest
    // report whatever natural block collisions the corpus has.
    "text_substring_dedup" -> Q(
      (s, d) => TextOps.substringDupStats(
        t(s, d, "documents").select(col("doc_id"),
          when(col("doc_id") % 7 === 0,
            concat(lit(TextOps.testPassage), col("text")))
            .otherwise(col("text")).as("text"))),
      Some(s"""WITH d AS (SELECT doc_id,
             |  CASE WHEN doc_id % 7 = 0 THEN '${TextOps.testPassage}' || text
             |       ELSE text END AS text FROM documents),
             |b AS (SELECT doc_id,
             |    md5(substr(text, CAST(1 + 64*i AS INT), 64)) AS h FROM
             |  (SELECT doc_id, text,
             |     unnest(range(CAST(floor(length(text)/64) AS BIGINT))) AS i
             |   FROM d)),
             |c AS (SELECT h, count(*) AS c FROM b GROUP BY 1),
             |p AS (SELECT doc_id, count(*) AS n_blocks,
             |    CAST(sum(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS dup_blocks
             |  FROM b JOIN c USING (h) GROUP BY 1),
             |r AS (SELECT d.doc_id,
             |    coalesce(p.n_blocks, 0) AS n_blocks,
             |    coalesce(p.dup_blocks, 0) AS dup_blocks,
             |    round(CASE WHEN coalesce(p.n_blocks, 0) = 0 THEN 0.0
             |      ELSE coalesce(p.dup_blocks, 0) / CAST(p.n_blocks AS DOUBLE)
             |      END, 6) AS dup_frac
             |  FROM d LEFT JOIN p USING (doc_id))
             |SELECT doc_id, n_blocks, dup_blocks, dup_frac,
             |  dup_frac < 0.5 AS keep FROM r""".stripMargin)),

    // PII redaction (emails + phone-like numbers -> typed placeholders,
    // with per-doc audit counts): PII injected deterministically since
    // the synthetic corpus has none; the oracle shares the EXACT pattern
    // strings with the implementation (TextOps.emailPattern/phonePattern)
    "text_pii_redact" -> Q(
      (s, d) => TextOps.redactPii(t(s, d, "documents").select(col("doc_id"),
        when(col("doc_id") % 4 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com")))
          .when(col("doc_id") % 4 === 1,
            concat(col("text"), lit(" call +1 555 123 4567")))
          .otherwise(col("text")).as("text"))),
      Some(s"""WITH d AS (SELECT doc_id,
             |  CASE WHEN doc_id % 4 = 0 THEN text || ' contact user' || doc_id || '@example.com'
             |       WHEN doc_id % 4 = 1 THEN text || ' call +1 555 123 4567'
             |       ELSE text END AS text FROM documents),
             |e AS (SELECT doc_id, text,
             |  regexp_replace(text, '${TextOps.emailPattern}', '<EMAIL>', 'g') AS et
             |  FROM d)
             |SELECT doc_id,
             |  regexp_replace(et, '${TextOps.phonePattern}', '<PHONE>', 'g') AS text,
             |  CAST(len(regexp_extract_all(text, '${TextOps.emailPattern}')) AS INT) AS n_emails,
             |  CAST(len(regexp_extract_all(et, '${TextOps.phonePattern}')) AS INT) AS n_phones
             |FROM e""".stripMargin)),

    "text_fingerprint" -> Q(
      (s, d) => TextOps.fingerprints(t(s, d, "documents")),
      Some("""SELECT doc_id, md5(array_to_string(list_sort(list_distinct(
             |string_split_regex(text,'\s+'))),' ')) AS fp FROM documents""".stripMargin)),

    // -------------------------------------------------- similarity search
    "embed_cosine_topk" -> Q(
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5), 3)
      },
      Some("""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
             |  FROM embeddings WHERE vec_id < 5),
             |c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |sc AS (SELECT qid, vec_id,
             |  round(list_dot_product(qe, e) /
             |    (sqrt(list_dot_product(qe,qe)) * sqrt(list_dot_product(e,e))), 4) AS cos
             |  FROM q, c WHERE qid <> vec_id),
             |r AS (SELECT qid, vec_id, cos,
             |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn FROM sc)
             |SELECT qid, vec_id, cos FROM r WHERE rn <= 3""".stripMargin)),

    // embedding-cosine NEAR-DUP dedup. The synthetic embeddings are
    // near-orthogonal (max pairwise cosine ~0.51), so duplicate rows are
    // INJECTED deterministically (10% re-embedded copies) — the embedding
    // face of the re-crawl corpus. Exact brute-force variant is the
    // correctness baseline (quadratic; verification scale only).
    "dedup_embed_cosine" -> Q(
      (s, d) => {
        val pairs = Similarity.cosineNearDupPairs(embDupCorpus(t(s, d, "embeddings")), 0.95)
        pairs.select(col("d1").as("vec_id")).unionAll(pairs.select(col("d2").as("vec_id")))
          .groupBy("vec_id").agg(count(lit(1)).as("n_near"))
      },
      Some(embDupSql +
        """SELECT vec_id, count(*) AS n_near FROM
          |  (SELECT d1 AS vec_id FROM p WHERE cos >= 0.95
          |   UNION ALL SELECT d2 FROM p WHERE cos >= 0.95) GROUP BY 1""".stripMargin)),

    // the SCALE path: LSH sign-bit blocking + Hamming-1 multiprobe, exact
    // cosine verify on blocked candidates only. Fully oracled here because
    // injected duplicates are identical vectors (identical projections ->
    // same bucket, recall 1.0 on this corpus); recall on merely-NEAR
    // vectors is the approximate trade, asserted in SimilaritySpec.
    "dedup_embed_lsh" -> Q(
      (s, d) => {
        val pairs = Similarity.lshNearDupPairs(embDupCorpus(t(s, d, "embeddings")), 0.95)
        pairs.select(col("d1").as("vec_id")).unionAll(pairs.select(col("d2").as("vec_id")))
          .groupBy("vec_id").agg(count(lit(1)).as("n_near"))
      },
      Some(embDupSql +
        """SELECT vec_id, count(*) AS n_near FROM
          |  (SELECT d1 AS vec_id FROM p WHERE cos >= 0.95
          |   UNION ALL SELECT d2 FROM p WHERE cos >= 0.95) GROUP BY 1""".stripMargin)),

    // approximate variant, FULLY oracled: the sign-bit bucket function is
    // deterministic integer/double arithmetic, so DuckDB recomputes the
    // identical buckets + Hamming-1 probe set and the exact same top-k —
    // the oracle IS the approximation, not a recall bound
    "embed_lsh_ann" -> Q(
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.lshBucketedTopK(e, e.filter(col("vec_id") < 5), 3, probeHamming = 1)
      },
      Some {
        // mirror of Similarity.lshBucket(nPlanes=8): plane weight
        // pmod(i*31 + k*17+7, 13) - 6, sequential-fold double sums
        def proj(k: Int) =
          s"list_sum(list_transform(range(1, len(e)+1), i -> " +
            s"e[i] * ((((i-1)*31 + ${k * 17 + 7}) % 13) - 6)::DOUBLE))"
        val bucket = (0 until 8)
          .map(k => s"(CASE WHEN ${proj(k)} > 0 THEN ${1 << k} ELSE 0 END)")
          .mkString(" + ")
        val probes = (Seq("b0") ++ (0 until 8).map(i => s"xor(b0, ${1 << i})"))
          .mkString(", ")
        s"""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |cb AS (SELECT vec_id, e, $bucket AS b0 FROM c),
           |q AS (SELECT vec_id AS qid, e AS qe, unnest([$probes]) AS bucket
           |  FROM cb WHERE vec_id < 5),
           |sc AS (SELECT qid, c2.vec_id,
           |  round(list_dot_product(qe, c2.e) /
           |    (sqrt(list_dot_product(qe,qe)) * sqrt(list_dot_product(c2.e,c2.e))), 4) AS cos
           |  FROM q JOIN cb c2 ON c2.b0 = q.bucket WHERE qid <> c2.vec_id),
           |r AS (SELECT qid, vec_id, cos,
           |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn FROM sc)
           |SELECT qid, vec_id, cos FROM r WHERE rn <= 3""".stripMargin
      }),

    // IVF variant, FULLY oracled the same way: deterministic centroid
    // seeding (8 smallest vec_ids) makes cell assignment + nProbe=2 probe
    // + final top-3 all recomputable in SQL
    "embed_ivf_ann" -> Q(
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.ivfTopK(e, e.filter(col("vec_id") < 5), 3, nLists = 8, nProbe = 2)
      },
      Some("""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, e AS ce
             |  FROM (SELECT * FROM c ORDER BY vec_id LIMIT 8)),
             |ac AS (SELECT c.vec_id, c.e, cents.cell,
             |  round(list_dot_product(c.e, cents.ce) /
             |    (sqrt(list_dot_product(c.e,c.e)) * sqrt(list_dot_product(cents.ce,cents.ce))), 6) AS cs
             |  FROM c, cents),
             |assigned AS (SELECT vec_id, e, cell FROM
             |  (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
             |   FROM ac) WHERE rn = 1),
             |probed AS (SELECT qid, qe, cell FROM
             |  (SELECT vec_id AS qid, e AS qe, cell,
             |     row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
             |   FROM ac WHERE vec_id < 5) WHERE rn <= 2),
             |sc AS (SELECT qid, a.vec_id,
             |  round(list_dot_product(qe, a.e) /
             |    (sqrt(list_dot_product(qe,qe)) * sqrt(list_dot_product(a.e,a.e))), 4) AS cos
             |  FROM assigned a JOIN probed p USING (cell) WHERE qid <> a.vec_id),
             |r AS (SELECT qid, vec_id, cos,
             |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn FROM sc)
             |SELECT qid, vec_id, cos FROM r WHERE rn <= 3""".stripMargin)),

    // ------------------------------------------------------- multimodal
    "multimodal_meta" -> Q(
      (s, d) => Multimodal.describe(Multimodal.synthesize(t(s, d, "documents"))),
      Some("""SELECT doc_id AS media_id,
             |CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio'
             |ELSE 'video' END AS kind,
             |octet_length(encode(text)) AS n_bytes, sha256(text) AS sig
             |FROM documents""".stripMargin)),

    // REAL image decode (JDK ImageIO, no stub): image rows are actual
    // generated PNGs; the pipeline header-decodes every payload and the
    // oracle checks the TRUE dimensions against the synthesis formula
    "multimodal_imgdecode" -> Q(
      (s, d) => Multimodal.decodeImageMeta(
        Multimodal.synthesizeImages(t(s, d, "documents"))),
      Some("""SELECT doc_id AS media_id,
             |CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio'
             |ELSE 'video' END AS kind,
             |CAST(CASE WHEN doc_id % 3 = 0 THEN (doc_id % 16)*8+16 ELSE -1 END AS INT) AS width,
             |CAST(CASE WHEN doc_id % 3 = 0 THEN (doc_id % 9)*8+16 ELSE -1 END AS INT) AS height
             |FROM documents""".stripMargin)),

    // stub feature extraction: the deterministic stub's arithmetic IS
    // SQL-expressible — feature[0] is the float32 sum of payload bytes at
    // positions = 0 mod 8, each /255, so feature[0]*255 rounds exactly back
    // to the integer byte sum (float32 error << 0.5), which DuckDB computes
    // over the ASCII payload with ord()
    "multimodal_features" -> Q(
      (s, d) => Multimodal.extractFeatures(Multimodal.synthesize(t(s, d, "documents")))
        .select(col("media_id"), col("kind"), col("n_bytes"),
          round(element_at(col("feature"), 1) * 255).cast("long").as("b0_sum")),
      Some("""SELECT doc_id AS media_id,
             |CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio'
             |ELSE 'video' END AS kind,
             |octet_length(encode(text)) AS n_bytes,
             |COALESCE(CAST(list_sum(list_transform(range(1, length(text)+1, 8),
             |  i -> ord(substr(text, i, 1)))) AS BIGINT), 0) AS b0_sum
             |FROM documents""".stripMargin)),

    // resize bookkeeping: geometry + bounded payload size as pure Columns
    "multimodal_resize" -> Q(
      (s, d) => Multimodal.resize(Multimodal.synthesize(t(s, d, "documents")), 128, 128),
      Some("""SELECT doc_id AS media_id,
             |CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio'
             |ELSE 'video' END AS kind,
             |128 AS width, 128 AS height,
             |least(octet_length(encode(text)), 2048) AS out_bytes
             |FROM documents""".stripMargin)),

    // frame sampling: one row per sampled timestamp per video payload —
    // the explode contract a real decoder emits frames under
    "multimodal_frames" -> Q(
      (s, d) => Multimodal.frameSample(Multimodal.synthesize(t(s, d, "documents")), 5000L),
      Some("""SELECT doc_id AS media_id, ts_ms,
             |md5(text || '@' || CAST(ts_ms AS VARCHAR)) AS frame_sig
             |FROM documents,
             |  LATERAL (SELECT unnest(generate_series(0, n_chars * 10, 5000)) AS ts_ms)
             |WHERE doc_id % 3 = 2""".stripMargin)),

    // ----------------------------------------------------- RDF engine path
    "rdf_extract" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val sCol = concat(lit(WebKg.docNs), col("doc_id"))
        docs.select(sCol.as("s"), lit(WebKg.pType).as("p"), lit(WebKg.vocab + "Document").as("o"))
          .unionAll(docs.select(sCol.as("s"), lit(WebKg.pLang).as("p"), col("lang").as("o")))
          .unionAll(docs.select(sCol.as("s"), lit(WebKg.vocab + "source").as("p"), col("source").as("o")))
          .unionAll(docs.select(sCol.as("s"), lit(WebKg.vocab + "nchars").as("p"),
            col("n_chars").cast("string").as("o")))
      },
      Some("""SELECT 'http://graft.dev/doc/'||doc_id AS s,
             |  'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
             |  'http://graft.dev/vocab#Document' AS o FROM documents
             |UNION ALL SELECT 'http://graft.dev/doc/'||doc_id,
             |  'http://graft.dev/vocab#lang', lang FROM documents
             |UNION ALL SELECT 'http://graft.dev/doc/'||doc_id,
             |  'http://graft.dev/vocab#source', source FROM documents
             |UNION ALL SELECT 'http://graft.dev/doc/'||doc_id,
             |  'http://graft.dev/vocab#nchars', CAST(n_chars AS VARCHAR) FROM documents""".stripMargin)),

    // BGP join chain through the compiler, verified against plain SQL
    "rdf_bgp" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val sCol = Terms.iri(concat(lit(WebKg.docNs), col("doc_id")))
        def p(iri: String) = Terms.iri(lit(iri))
        val triples =
          docs.select(sCol.as("s"), p(WebKg.pLang).as("p"), Terms.strLit(col("lang")).as("o"))
            .unionAll(docs.select(sCol.as("s"), p(WebKg.vocab + "source").as("p"),
              Terms.strLit(col("source")).as("o")))
            .unionAll(docs.select(sCol.as("s"), p(WebKg.vocab + "nchars").as("p"),
              Terms.typedLit(col("n_chars").cast("string"), xsdInt).as("o")))
        import Bgp.dsl._
        val q = Bgp.Pattern(Seq(
          pat(v("doc"), iri(WebKg.pLang), lit("en")),
          pat(v("doc"), iri(WebKg.vocab + "source"), lit("src7")),
          pat(v("doc"), iri(WebKg.vocab + "nchars"), v("n"))))
        Bgp.executeValues(s, triples, q)
      },
      Some("""SELECT 'http://graft.dev/doc/'||doc_id AS doc, CAST(n_chars AS VARCHAR) AS n
             |FROM documents WHERE lang='en' AND source='src7'""".stripMargin)),

    // the SAME BGP as rdf_bgp executed ENTIRELY in id space over the
    // dictionary-encoded layout (Dict.bgpEncoded): bound positions become
    // driver-computed 16-byte id filters, the join chain shuffles only
    // fixed-width ids, and ONLY the two projected vars pay a dictionary
    // decode join at the plan edge (RDF-3X late materialization). Output
    // equality with the plain-SQL oracle proves encode -> id-space join ->
    // late decode is lossless.
    "rdf_bgp_idspace" -> Q(
      (s, d) => idspaceBgp(s, d, materialize = true),
      Some("""SELECT 'http://graft.dev/doc/'||doc_id AS doc, CAST(n_chars AS VARCHAR) AS n
             |FROM documents WHERE lang='en' AND source='src7'""".stripMargin)),

    // --- SPARQL solution algebra over BGP results (Bgp.optional/union/
    // minus/exists/closure — the group-pattern layer the reference keeps in
    // its separate SPARQL engine). All four share one triple construction:
    // every doc gets a lang triple; only EVEN doc_ids get a title triple.
    "rdf_bgp_optional" -> Q(
      (s, d) => {
        val (base, opt) = algebraSolutions(s, d)
        Bgp.values(Bgp.optional(base, opt))
      },
      Some("""SELECT 'http://graft.dev/doc/'||doc_id AS doc,
             |CASE WHEN doc_id % 2 = 0 THEN 'T'||doc_id END AS t
             |FROM documents WHERE lang='en'""".stripMargin)),

    "rdf_bgp_union" -> Q(
      (s, d) => {
        val (base, opt) = algebraSolutions(s, d)
        Bgp.values(Bgp.union(base, opt))
      },
      Some("""SELECT 'http://graft.dev/doc/'||doc_id AS doc,
             |CAST(NULL AS VARCHAR) AS t FROM documents WHERE lang='en'
             |UNION ALL SELECT 'http://graft.dev/doc/'||doc_id, 'T'||doc_id
             |FROM documents WHERE doc_id % 2 = 0""".stripMargin)),

    "rdf_bgp_minus" -> Q(
      (s, d) => {
        val (base, opt) = algebraSolutions(s, d)
        Bgp.values(Bgp.minus(base, opt))
      },
      Some("""SELECT 'http://graft.dev/doc/'||doc_id AS doc
             |FROM documents WHERE lang='en' AND doc_id % 2 <> 0""".stripMargin)),

    "rdf_bgp_exists" -> Q(
      (s, d) => {
        val (base, opt) = algebraSolutions(s, d)
        Bgp.values(Bgp.exists(base, opt))
      },
      Some("""SELECT 'http://graft.dev/doc/'||doc_id AS doc
             |FROM documents WHERE lang='en' AND doc_id % 2 = 0""".stripMargin)),

    // GRAPH ?g quad pattern: per-source named graphs (the per-document
    // named-graph layout of a web KG); both patterns must match INSIDE one
    // graph, so the oracle is a self-join on the graph key — cross-graph
    // (en, de) pairs must NOT appear
    "rdf_bgp_graph" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val quads = docs.select(
          Terms.iri(concat(lit("http://graft.dev/graph/"), col("source"))).as("g"),
          Terms.iri(concat(lit(WebKg.docNs), col("doc_id"))).as("s"),
          Terms.iri(lit(WebKg.pLang)).as("p"),
          Terms.strLit(col("lang")).as("o"))
        import Bgp.dsl._
        val q = Bgp.Pattern(Seq(
          pat(v("a"), iri(WebKg.pLang), lit("en")),
          pat(v("b"), iri(WebKg.pLang), lit("de"))))
        Bgp.values(Bgp.executeGraph(s, quads, v("gr"), q))
      },
      Some("""SELECT 'http://graft.dev/graph/'||d1.source AS gr,
             |'http://graft.dev/doc/'||d1.doc_id AS a,
             |'http://graft.dev/doc/'||d2.doc_id AS b
             |FROM documents d1 JOIN documents d2 ON d1.source = d2.source
             |WHERE d1.lang = 'en' AND d2.lang = 'de'""".stripMargin)),

    // transitive property path p+ (path-doubled closure): chain edges
    // doc i -> doc i+1 for doc_id % 10 < 4 (a 4-hop chain per decade);
    // the oracle recomputes the closure with a recursive CTE
    "rdf_bgp_closure" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val nextP = WebKg.vocab + "next"
        val edges = docs.filter(col("doc_id") % 10 < 4)
          .select(Terms.iri(concat(lit(WebKg.docNs), col("doc_id"))).as("s"),
            Terms.iri(lit(nextP)).as("p"),
            Terms.iri(concat(lit(WebKg.docNs), col("doc_id") + 1)).as("o"))
        Bgp.values(Bgp.closure(edges, graft.core.Term.iri(nextP),
          sVar = "src", oVar = "dst"))
      },
      Some("""WITH RECURSIVE e AS (
             |  SELECT doc_id AS a, doc_id + 1 AS b FROM documents
             |  WHERE doc_id % 10 < 4),
             |cl AS (
             |  SELECT a, b FROM e
             |  UNION
             |  SELECT cl.a, e.b FROM cl JOIN e ON cl.b = e.a)
             |SELECT 'http://graft.dev/doc/'||a AS src,
             |'http://graft.dev/doc/'||b AS dst FROM cl""".stripMargin)),

    // --- SPARQL text frontend (graft.sparql): full query strings parsed,
    // compiled onto the solution algebra + Column expressions, and checked
    // against plain-SQL oracles over the same shared triple construction
    // (sparqlDocTriples). Each query exercises a distinct algebra shape.
    "sparql_select" -> Q(
      (s, d) => Sparql.selectValues(s, sparqlDocTriples(s, d), sparqlPrefix +
        """SELECT ?doc ?n WHERE {
          |  ?doc v:lang "en" ; v:source "src7" ; v:nchars ?n
          |  FILTER(?n > 300)
          |}""".stripMargin),
      Some("""SELECT 'http://graft.dev/doc/'||doc_id AS doc,
             |  CAST(n_chars AS VARCHAR) AS n FROM documents
             |WHERE lang='en' AND source='src7' AND n_chars > 300""".stripMargin)),

    "sparql_agg" -> Q(
      (s, d) => Sparql.selectValues(s, sparqlDocTriples(s, d), sparqlPrefix +
        """SELECT ?lang (COUNT(*) AS ?n) (SUM(?c) AS ?chars) (MIN(?c) AS ?lo)
          |WHERE { ?d v:lang ?lang ; v:nchars ?c }
          |GROUP BY ?lang HAVING(COUNT(*) > 10)""".stripMargin),
      Some("""SELECT lang, CAST(count(*) AS VARCHAR) AS n,
             |  CAST(sum(n_chars) AS VARCHAR) AS chars,
             |  CAST(min(n_chars) AS VARCHAR) AS lo
             |FROM documents GROUP BY lang HAVING count(*) > 10""".stripMargin)),

    "sparql_optional_bind" -> Q(
      (s, d) => Sparql.selectValues(s, sparqlDocTriples(s, d), sparqlPrefix +
        """SELECT ?doc ?label WHERE {
          |  ?doc v:lang "en" OPTIONAL { ?doc v:title ?t }
          |  BIND(COALESCE(?t, "untitled") AS ?label)
          |}""".stripMargin),
      Some("""SELECT 'http://graft.dev/doc/'||doc_id AS doc,
             |  CASE WHEN doc_id % 2 = 0 THEN 'T'||doc_id ELSE 'untitled' END AS label
             |FROM documents WHERE lang='en'""".stripMargin)),

    "sparql_path_seq" -> Q(
      (s, d) => Sparql.selectValues(s, sparqlDocTriples(s, d), sparqlPrefix +
        "SELECT ?src ?dst WHERE { ?src v:next/v:next ?dst }"),
      Some("""WITH e AS (SELECT doc_id AS a, doc_id + 1 AS b FROM documents
             |  WHERE doc_id % 10 < 4)
             |SELECT 'http://graft.dev/doc/'||e1.a AS src,
             |  'http://graft.dev/doc/'||e2.b AS dst
             |FROM e e1 JOIN e e2 ON e1.b = e2.a""".stripMargin)),

    "sparql_not_exists" -> Q(
      (s, d) => Sparql.selectValues(s, sparqlDocTriples(s, d), sparqlPrefix +
        """SELECT ?doc WHERE {
          |  ?doc v:lang "en" FILTER NOT EXISTS { ?doc v:title ?t }
          |}""".stripMargin),
      Some("""SELECT 'http://graft.dev/doc/'||doc_id AS doc FROM documents
             |WHERE lang='en' AND doc_id % 2 = 1""".stripMargin)),

    "sparql_values_filter" -> Q(
      (s, d) => Sparql.selectValues(s, sparqlDocTriples(s, d), sparqlPrefix +
        """SELECT ?doc ?src WHERE {
          |  ?doc v:source ?src ; v:nchars ?n .
          |  VALUES ?src { "src1" "src3" }
          |  FILTER(STRSTARTS(STR(?doc), "http://graft.dev/doc/1") && ?n > 100)
          |}""".stripMargin),
      Some("""SELECT 'http://graft.dev/doc/'||doc_id AS doc, source AS src
             |FROM documents WHERE source IN ('src1','src3')
             |  AND CAST(doc_id AS VARCHAR) LIKE '1%' AND n_chars > 100""".stripMargin)),

    "sparql_topk" -> Q(
      (s, d) => Sparql.selectValues(s, sparqlDocTriples(s, d), sparqlPrefix +
        """SELECT ?doc ?n WHERE { ?doc v:nchars ?n ; v:lang "en" }
          |ORDER BY DESC(?n) ?doc LIMIT 50""".stripMargin),
      Some("""SELECT 'http://graft.dev/doc/'||doc_id AS doc,
             |  CAST(n_chars AS VARCHAR) AS n FROM documents WHERE lang='en'
             |ORDER BY n_chars DESC, 'http://graft.dev/doc/'||doc_id LIMIT 50""".stripMargin)),

    "sparql_subselect" -> Q(
      (s, d) => Sparql.selectValues(s, sparqlDocTriples(s, d), sparqlPrefix +
        """SELECT ?doc ?cnt WHERE {
          |  ?doc v:lang "en" ; v:source ?src .
          |  { SELECT ?src (COUNT(*) AS ?cnt) WHERE { ?d v:source ?src } GROUP BY ?src }
          |}""".stripMargin),
      Some("""SELECT 'http://graft.dev/doc/'||d.doc_id AS doc,
             |  CAST(c.n AS VARCHAR) AS cnt
             |FROM documents d
             |JOIN (SELECT source, count(*) AS n FROM documents GROUP BY source) c
             |  ON d.source = c.source WHERE d.lang='en'""".stripMargin)),

    // CONSTRUCT: the produced graph, aggregated per predicate so the result
    // is compact and SQL-checkable (same verification shape as
    // rdf_turtle_roundtrip)
    "sparql_construct" -> Q(
      (s, d) => {
        val g = Sparql.query(s, sparqlDocTriples(s, d), sparqlPrefix +
          """CONSTRUCT { ?doc v:label ?t . ?doc a v:Doc }
            |WHERE { ?doc v:title ?t ; v:lang "en" }""".stripMargin)
        g.groupBy(col("p")("value").as("p"))
          .agg(count(lit(1)).as("n"), countDistinct(col("o")("value")).as("n_obj"))
      },
      Some("""SELECT 'http://graft.dev/vocab#label' AS p, count(*) AS n,
             |  count(DISTINCT doc_id) AS n_obj
             |FROM documents WHERE lang='en' AND doc_id % 2 = 0
             |UNION ALL
             |SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', count(*), 1
             |FROM documents WHERE lang='en' AND doc_id % 2 = 0""".stripMargin)),

    // SPARQL UPDATE: a DELETE/INSERT rewrite applied functionally, result
    // verified per predicate (the update's effect is exactly one predicate
    // swapped on the English documents)
    "sparql_update" -> Q(
      (s, d) => {
        val updated = Sparql.update(s, sparqlDocTriples(s, d), sparqlPrefix +
          """DELETE { ?d v:lang "en" }
            |INSERT { ?d v:english true }
            |WHERE { ?d v:lang "en" }""".stripMargin)
        updated.groupBy(col("p")("value").as("p")).agg(count(lit(1)).as("n"))
      },
      Some("""SELECT 'http://graft.dev/vocab#lang' AS p, count(*) AS n
             |  FROM documents WHERE lang<>'en'
             |UNION ALL SELECT 'http://graft.dev/vocab#english', count(*)
             |  FROM documents WHERE lang='en'
             |UNION ALL SELECT 'http://graft.dev/vocab#source', count(*) FROM documents
             |UNION ALL SELECT 'http://graft.dev/vocab#nchars', count(*) FROM documents
             |UNION ALL SELECT 'http://graft.dev/vocab#title', count(*)
             |  FROM documents WHERE doc_id % 2 = 0
             |UNION ALL SELECT 'http://graft.dev/vocab#next', count(*)
             |  FROM documents WHERE doc_id % 10 < 4""".stripMargin)),

    // FROM / FROM NAMED dataset assembly (§13.2) over a QUAD frame: the
    // default graph becomes exactly the FROM graphs' merge and GRAPH ?g
    // sees exactly the FROM NAMED graphs. The quad construction plants
    // poison rows in the frame's own default graph and in an unlisted
    // named graph, so any scoping leak changes the row set and fails the
    // oracle (see sparqlDocQuads).
    "sparql_from_named" -> Q(
      (s, d) => Sparql.selectValues(s, sparqlDocQuads(s, d), sparqlPrefix +
        """SELECT ?doc ?n
          |FROM <http://graft.dev/g/lang>
          |FROM NAMED <http://graft.dev/g/meta>
          |WHERE {
          |  ?doc v:lang "en" .
          |  GRAPH ?g { ?doc v:nchars ?n }
          |  FILTER(?n > 250)
          |}""".stripMargin),
      Some("""SELECT 'http://graft.dev/doc/'||doc_id AS doc,
             |  CAST(n_chars AS VARCHAR) AS n FROM documents
             |WHERE lang='en' AND n_chars > 250""".stripMargin)),

    // DESCRIBE (§16.4, subject-based CBD like the reference's
    // Graph.description): every statement about each matched node,
    // verified per predicate — the oracle rebuilds the same statement
    // multiset from the documents table's known predicate rules
    "sparql_describe" -> Q(
      (s, d) => {
        val g = Sparql.query(s, sparqlDocTriples(s, d), sparqlPrefix +
          """DESCRIBE ?doc
            |WHERE { ?doc v:lang "fr" ; v:nchars ?n FILTER(?n > 300) }""".stripMargin)
        g.groupBy(col("p")("value").as("p"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("s")("value")).as("n_docs"))
      },
      Some("""WITH m AS (SELECT doc_id FROM documents
             |            WHERE lang='fr' AND n_chars > 300),
             |tr AS (
             |  SELECT 'http://graft.dev/vocab#lang' AS p, doc_id FROM m
             |  UNION ALL SELECT 'http://graft.dev/vocab#source', doc_id FROM m
             |  UNION ALL SELECT 'http://graft.dev/vocab#nchars', doc_id FROM m
             |  UNION ALL SELECT 'http://graft.dev/vocab#title', doc_id FROM m
             |    WHERE doc_id % 2 = 0
             |  UNION ALL SELECT 'http://graft.dev/vocab#next', doc_id FROM m
             |    WHERE doc_id % 10 < 4)
             |SELECT p, count(*) AS n, count(DISTINCT doc_id) AS n_docs
             |FROM tr GROUP BY p""".stripMargin)),

    // ASK (§16.3): existence probes as one-row boolean frames — a
    // satisfiable pattern and an unsatisfiable one, labeled and unioned
    // so BOTH polarities hash against the oracle's EXISTS subqueries
    "sparql_ask" -> Q(
      (s, d) => {
        val data = sparqlDocTriples(s, d)
        Sparql.query(s, data, sparqlPrefix +
            """ASK { ?d v:lang "en" ; v:nchars ?n FILTER(?n > 250) }""")
          .select(lit("en_gt250").as("probe"), col("ask"))
          .unionAll(Sparql.query(s, data,
              sparqlPrefix + """ASK { ?d v:lang "zz" }""")
            .select(lit("zz_any").as("probe"), col("ask")))
      },
      Some("""SELECT 'en_gt250' AS probe,
             |  EXISTS(SELECT 1 FROM documents
             |         WHERE lang='en' AND n_chars > 250) AS ask
             |UNION ALL
             |SELECT 'zz_any',
             |  EXISTS(SELECT 1 FROM documents WHERE lang='zz')""".stripMargin)),

    // XSD bounded-integer subtypes driver-visible: facet validation, cast
    // into a bounded target, and EBV, all through the Scala datatype kernel
    // (UDFs on purpose — the query verifies the kernel's semantics against
    // plain SQL range checks; the hot extraction path never runs these)
    "rdf_xsd_bounded" -> Q(
      (s, d) => {
        import graft.core.{Term, Vocab, Xsd, XsdOps}
        val xsdShort = Vocab.xsd + "short"
        val xsdUInt = Vocab.xsd + "unsignedInt"
        val validShort = udf((lex: String) => Xsd.valid(lex, xsdShort))
        val castUInt = udf((lex: String) =>
          XsdOps.cast(Term.typedLit(lex, Vocab.xsdInteger), xsdUInt).map(_.value).orNull)
        val ebvLong = udf((lex: String) =>
          XsdOps.ebv(Term.typedLit(lex, Vocab.xsdLong)).getOrElse(false))
        t(s, d, "documents")
          .select(col("doc_id"), (col("n_chars") * 100 - 20000).cast("string").as("lex"))
          .select(col("doc_id"), validShort(col("lex")).as("valid_short"),
            castUInt(col("lex")).as("as_unsigned_int"), ebvLong(col("lex")).as("ebv"))
      },
      Some("""SELECT doc_id, (v BETWEEN -32768 AND 32767) AS valid_short,
             |CASE WHEN v BETWEEN 0 AND 4294967295 THEN CAST(v AS VARCHAR) END
             |  AS as_unsigned_int,
             |(v <> 0) AS ebv
             |FROM (SELECT doc_id, n_chars * 100 - 20000 AS v FROM documents)""".stripMargin)),

    // Open datatype REGISTRY driver-visible: hexBinary + gYear + the
    // duration family run through Xsd.DatatypeRegistry (XsdExtra /
    // XsdDuration registrations — datatypes the reference itself lacks),
    // validation + canonical forms cross-checked against plain SQL. UDFs
    // on purpose: the query verifies the registry kernel's semantics; the
    // hot paths never run these.
    "rdf_xsd_registry" -> Q(
      (s, d) => {
        import graft.core.{Xsd, XsdDuration, XsdExtra}
        XsdExtra.register(); XsdDuration.register()
        val canonHex = udf((lex: String) =>
          Xsd.canonicalLexical(lex, XsdExtra.xsdHexBinary).orNull)
        val canonYear = udf((lex: String) =>
          Xsd.canonicalLexical(lex, XsdExtra.xsdGYear).orNull)
        val validYear = udf((lex: String) => Xsd.valid(lex, XsdExtra.xsdGYear))
        val canonDur = udf((lex: String) =>
          Xsd.canonicalLexical(lex, XsdDuration.xsdDuration).orNull)
        val canonYm = udf((lex: String) =>
          Xsd.canonicalLexical(lex, XsdDuration.xsdYearMonthDuration).orNull)
        val year = (col("doc_id") % 200 + 1900).cast("string")
        t(s, d, "documents").select(col("doc_id"),
            md5(col("text")).as("hex"),
            concat(year,
              when(col("doc_id") % 3 === 0, lit(""))
                .when(col("doc_id") % 3 === 1, lit("Z"))
                .otherwise(lit("+00:00"))).as("gy"),
            // 5 digits with a leading zero: invalid per XML Schema
            concat(lit("0"), year).as("gybad"),
            // a raw seconds count / months count to normalize
            concat(lit("PT"), col("n_chars").cast("string"), lit("S")).as("dur"),
            concat(lit("P"), (col("doc_id") % 40).cast("string"), lit("M")).as("ym"))
          .select(col("doc_id"),
            canonHex(col("hex")).as("hex_canon"),
            canonYear(col("gy")).as("gyear_canon"),
            validYear(col("gy")).as("gyear_valid"),
            validYear(col("gybad")).as("bad_valid"),
            canonDur(col("dur")).as("dur_canon"),
            canonYm(col("ym")).as("ym_canon"))
      },
      Some("""SELECT doc_id, upper(md5(text)) AS hex_canon,
             |CAST(1900 + doc_id % 200 AS VARCHAR) ||
             |  (CASE WHEN doc_id % 3 = 0 THEN '' ELSE 'Z' END) AS gyear_canon,
             |TRUE AS gyear_valid, FALSE AS bad_valid,
             |CASE WHEN n_chars = 0 THEN 'PT0S' ELSE 'P' ||
             |  (CASE WHEN n_chars // 86400 > 0
             |     THEN CAST(n_chars // 86400 AS VARCHAR) || 'D' ELSE '' END) ||
             |  (CASE WHEN n_chars % 86400 > 0 THEN 'T' ||
             |    (CASE WHEN (n_chars % 86400) // 3600 > 0
             |       THEN CAST((n_chars % 86400) // 3600 AS VARCHAR) || 'H' ELSE '' END) ||
             |    (CASE WHEN (n_chars % 3600) // 60 > 0
             |       THEN CAST((n_chars % 3600) // 60 AS VARCHAR) || 'M' ELSE '' END) ||
             |    (CASE WHEN n_chars % 60 > 0
             |       THEN CAST(n_chars % 60 AS VARCHAR) || 'S' ELSE '' END)
             |   ELSE '' END) END AS dur_canon,
             |CASE WHEN doc_id % 40 = 0 THEN 'P0M' ELSE 'P' ||
             |  (CASE WHEN (doc_id % 40) // 12 > 0
             |     THEN CAST((doc_id % 40) // 12 AS VARCHAR) || 'Y' ELSE '' END) ||
             |  (CASE WHEN (doc_id % 40) % 12 > 0
             |     THEN CAST((doc_id % 40) % 12 AS VARCHAR) || 'M' ELSE '' END)
             |  END AS ym_canon
             |FROM documents""".stripMargin)),

    // Remaining XSD tree leaves (gMonthDay/gDay/gMonth + the
    // normalizedString token/language/NMTOKEN/Name/NCName family —
    // datatypes the REFERENCE leaves unimplemented, xsd/datatype.ex:34-56):
    // lexicals constructed deterministically from doc_id on both sides, so
    // the oracle recomputes the identical canonical forms and validity
    // flags. Same disclosed kernel-verification UDF pattern as
    // rdf_xsd_registry — off the hot path by design.
    "rdf_xsd_gfamily" -> Q(
      (s, d) => {
        import graft.core.{Xsd, XsdExtra}
        XsdExtra.register()
        val canonMd = udf((lex: String) =>
          Xsd.canonicalLexical(lex, XsdExtra.xsdGMonthDay).orNull)
        val canonGd = udf((lex: String) =>
          Xsd.canonicalLexical(lex, XsdExtra.xsdGDay).orNull)
        val canonGm = udf((lex: String) =>
          Xsd.canonicalLexical(lex, XsdExtra.xsdGMonth).orNull)
        val validTok = udf((lex: String) => Xsd.valid(lex, XsdExtra.xsdToken))
        val validLang = udf((lex: String) => Xsd.valid(lex, XsdExtra.xsdLanguage))
        val validNm = udf((lex: String) => Xsd.valid(lex, XsdExtra.xsdNmtoken))
        val validName = udf((lex: String) => Xsd.valid(lex, XsdExtra.xsdName))
        val validNc = udf((lex: String) => Xsd.valid(lex, XsdExtra.xsdNcName))
        val mm = lpad((col("doc_id") % 12 + 1).cast("string"), 2, "0")
        val dd = lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0")
        val tz = when(col("doc_id") % 3 === 0, lit(""))
          .when(col("doc_id") % 3 === 1, lit("Z")).otherwise(lit("+00:00"))
        val tok = when(col("doc_id") % 4 === 0, lit("a b"))
          .when(col("doc_id") % 4 === 1, lit(" a"))
          .when(col("doc_id") % 4 === 2, lit("a  b"))
          .otherwise(lit("a\tb"))
        val nm = when(col("doc_id") % 4 === 0, lit("1.0-beta"))
          .when(col("doc_id") % 4 === 1, lit("a b"))
          .when(col("doc_id") % 4 === 2, lit("_x:y"))
          .otherwise(lit("abc"))
        t(s, d, "documents")
          .select(col("doc_id"),
            concat(lit("--"), mm, lit("-"), dd, tz).as("md"),
            concat(lit("---"), dd, tz).as("gd"),
            concat(lit("--"), mm, tz).as("gm"),
            tok.as("tok"), col("lang"), nm.as("nm"))
          .select(col("doc_id"),
            canonMd(col("md")).as("md_canon"),
            canonGd(col("gd")).as("gday_canon"),
            canonGm(col("gm")).as("gmonth_canon"),
            validTok(col("tok")).as("tok_valid"),
            validLang(col("lang")).as("lang_valid"),
            validNm(col("nm")).as("nm_valid"),
            validName(col("nm")).as("name_valid"),
            validNc(col("nm")).as("nc_valid"))
      },
      Some("""SELECT doc_id,
             |'--' || lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') || '-' ||
             |  lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') ||
             |  (CASE WHEN doc_id % 3 = 0 THEN '' ELSE 'Z' END) AS md_canon,
             |'---' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') ||
             |  (CASE WHEN doc_id % 3 = 0 THEN '' ELSE 'Z' END) AS gday_canon,
             |'--' || lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') ||
             |  (CASE WHEN doc_id % 3 = 0 THEN '' ELSE 'Z' END) AS gmonth_canon,
             |(doc_id % 4 = 0) AS tok_valid,
             |regexp_matches(lang, '^[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*$') AS lang_valid,
             |(doc_id % 4 != 1) AS nm_valid,
             |(doc_id % 4 = 2 OR doc_id % 4 = 3) AS name_valid,
             |(doc_id % 4 = 3) AS nc_valid
             |FROM documents""".stripMargin)),

    // RFC 4122 name-based UUIDv3 resource generation (the reference's
    // IRI.UUID.Generator value-based mode, urn/default/hex formats) as a
    // pure Column expression: md5 over namespace-bytes ++ name with the
    // version/variant nibbles spliced in — the namespace is 16 ASCII bytes
    // so DuckDB can reproduce the identical digest over VARCHAR concat
    "rdf_uuid" -> Q(
      (s, d) => {
        val ns = "graft-kg-ns-0001".getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val url = concat(lit("https://"), col("source"),
          lit(".example.org/doc/"), col("doc_id"))
        val hex = Terms.uuidV3Hex(ns, url)
        t(s, d, "documents").select(col("doc_id"),
          hex.as("id_hex"),
          Terms.uuidDashed(hex).as("id"),
          concat(lit("urn:uuid:"), Terms.uuidDashed(hex)).as("id_urn"))
      },
      Some("""WITH h AS (SELECT doc_id,
             |  md5('graft-kg-ns-0001' ||
             |      'https://'||source||'.example.org/doc/'||doc_id) AS x
             |  FROM documents),
             |u AS (SELECT doc_id, substr(x,1,12)||'3'||substr(x,14,3)||
             |  lower(to_hex(CAST(('0x'||substr(x,17,1))::VARCHAR AS UBIGINT) % 4 + 8))||
             |  substr(x,18,15) AS id_hex FROM h),
             |f AS (SELECT doc_id, id_hex,
             |  substr(id_hex,1,8)||'-'||substr(id_hex,9,4)||'-'||substr(id_hex,13,4)
             |  ||'-'||substr(id_hex,17,4)||'-'||substr(id_hex,21,12) AS id FROM u)
             |SELECT doc_id, id_hex, id, 'urn:uuid:'||id AS id_urn FROM f""".stripMargin)),

    // RDF-star end-to-end: annotation triples built as Column expressions
    // (quoted-triple terms in subject position), then a BGP with a nested
    // quoted pattern that destructures and unifies the inner variables
    "rdf_star_bgp" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val sCol = Terms.iri(concat(lit(WebKg.docNs), col("doc_id")))
        def p(iri: String) = Terms.iri(lit(iri))
        val langLit = Terms.strLit(col("lang"))
        val base = docs.select(sCol.as("s"), p(WebKg.pLang).as("p"), langLit.as("o"))
        val src = docs.select(sCol.as("s"), p(WebKg.vocab + "source").as("p"),
          Terms.strLit(col("source")).as("o"))
        // annotation: << doc :lang lang >> :confidence n_chars
        val ann = docs.select(
          Terms.quoted(sCol, p(WebKg.pLang), langLit).as("s"),
          p(WebKg.vocab + "confidence").as("p"),
          Terms.typedLit(col("n_chars").cast("string"), xsdInt).as("o"))
        val triples = base.unionAll(src).unionAll(ann)
        import Bgp.dsl._
        val q = Bgp.Pattern(Seq(
          pat(v("doc"), iri(WebKg.vocab + "source"), lit("src3")),
          pat(qt(v("doc"), iri(WebKg.pLang), v("lang")),
            iri(WebKg.vocab + "confidence"), v("n"))))
        Bgp.executeValues(s, triples, q)
      },
      Some("""SELECT 'http://graft.dev/doc/'||doc_id AS doc, lang,
             |CAST(n_chars AS VARCHAR) AS n FROM documents
             |WHERE source='src3'""".stripMargin)),

    // N-Triples byte-form serialization (engine Column path vs SQL concat)
    "rdf_ntriples" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val sCol = Terms.iri(concat(lit(WebKg.docNs), col("doc_id")))
        def p(iri: String) = Terms.iri(lit(iri))
        val triples =
          docs.select(sCol.as("s"), p(WebKg.pLang).as("p"),
              Terms.langLit(col("source"), col("lang")).as("o"))
            .unionAll(docs.select(sCol.as("s"), p(WebKg.vocab + "nchars").as("p"),
              Terms.typedLit(col("n_chars").cast("string"), xsdInt).as("o")))
        triples.select(Terms.tripleLine(col("s"), col("p"), col("o")).as("line"))
      },
      Some("""SELECT '<http://graft.dev/doc/'||doc_id||'> <http://graft.dev/vocab#lang> "'
             |||source||'"@'||lang||' .' AS line FROM documents
             |UNION ALL
             |SELECT '<http://graft.dev/doc/'||doc_id||
             |'> <http://graft.dev/vocab#nchars> "'||n_chars||
             |'"^^<http://www.w3.org/2001/XMLSchema#integer> .' FROM documents""".stripMargin)),

    // deterministic salted skolemization, cross-engine identical; pure
    // Column md5 path (codegen'd) — Skolem.label is the Scala-API twin
    "rdf_skolem" -> Q(
      (s, d) => t(s, d, "documents").select(col("doc_id"),
        Terms.skolemLabel(concat(lit(WebKg.docNs), col("doc_id")), lit("author"))
          .as("skolem")),
      Some("""SELECT doc_id, 'sk'||md5('graft-skolem-v1:http://graft.dev/doc/'
             |||doc_id||':author') AS skolem FROM documents""".stripMargin)),

    // graph set ops (union/intersect/except: SURVEY §2.5) over triple sets
    "graph_setops" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        def g(f: DataFrame => DataFrame) = f(docs).select(
          concat(lit(WebKg.docNs), col("doc_id")).as("s"),
          lit(WebKg.pLang).as("p"), col("lang").as("o"))
        val g1 = g(_.filter(col("lang") === "en"))
        val g2 = g(_.filter(col("source").isin("src0", "src1", "src2", "src3", "src4")))
        g1.intersect(g2).select(lit("inter").as("op"), col("s"))
          .unionAll(g1.except(g2).select(lit("except").as("op"), col("s")))
          .groupBy("op").agg(count(lit(1)).as("n"))
      },
      Some("""WITH g1 AS (SELECT 'http://graft.dev/doc/'||doc_id AS s FROM documents WHERE lang='en'),
             |g2 AS (SELECT 'http://graft.dev/doc/'||doc_id AS s FROM documents
             |  WHERE source IN ('src0','src1','src2','src3','src4'))
             |SELECT 'inter' AS op, count(*) AS n FROM (SELECT s FROM g1 INTERSECT SELECT s FROM g2)
             |UNION ALL
             |SELECT 'except', count(*) FROM (SELECT s FROM g1 EXCEPT SELECT s FROM g2)""".stripMargin)),

    // BFS reachability (SURVEY §2.8) vs recursive-CTE oracle
    "graph_reach" -> Q(
      (s, d) => WebKg.reachable(WebKg.docEdges(t(s, d, "documents")), 1L, 4),
      Some("""WITH RECURSIVE n AS (SELECT count(*) AS c FROM documents),
             |e AS (SELECT doc_id AS src, (doc_id*2) % (SELECT c FROM n) AS dst FROM documents
             |  UNION ALL SELECT doc_id, (doc_id*3+1) % (SELECT c FROM n) FROM documents),
             |r(node, depth) AS (SELECT CAST(1 AS BIGINT), 0
             |  UNION ALL SELECT e.dst, r.depth+1 FROM r JOIN e ON e.src=r.node WHERE r.depth < 4)
             |SELECT node, min(depth) AS depth FROM r GROUP BY 1""".stripMargin)),

    // Fixed-point integer PageRank over the deterministic doc link graph:
    // 3 iterations, damping as exact 85/100 integer ops, so Spark's
    // iterative cached-edge plan hashes bit-identical against the oracle's
    // chained CTEs (double-valued PR is order-dependent and un-oracle-able)
    "graph_pagerank" -> Q(
      (s, d) => WebKg.pageRank(WebKg.docEdges(t(s, d, "documents")), iterations = 3),
      Some {
        val S = "1000000000000"
        val sb = new StringBuilder
        sb.append(
          """WITH nn AS (SELECT count(*) AS c FROM documents),
            |e AS (SELECT doc_id AS src, (doc_id*2) % (SELECT c FROM nn) AS dst FROM documents
            |  UNION ALL SELECT doc_id, (doc_id*3+1) % (SELECT c FROM nn) FROM documents),
            |nodes AS (SELECT DISTINCT node FROM
            |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
            |nc AS (SELECT count(*) AS n FROM nodes),
            |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
            |pr0 AS (SELECT node, """.stripMargin + S +
            " // (SELECT n FROM nc) AS r FROM nodes)")
        for (i <- 1 to 3) {
          sb.append(
            s""", m$i AS (SELECT e.dst AS node, sum(p.r // d.deg) AS mass FROM e
               |  JOIN pr${i - 1} p ON e.src = p.node JOIN deg d ON d.src = e.src
               |  GROUP BY 1),
               |pr$i AS (SELECT nodes.node,
               |  (15 * $S) // (100 * (SELECT n FROM nc)) +
               |  (85 * COALESCE(m$i.mass, 0)) // 100 AS r
               |  FROM nodes LEFT JOIN m$i ON nodes.node = m$i.node)""".stripMargin)
        }
        sb.append(" SELECT node, CAST(r AS BIGINT) AS rank_fp FROM pr3")
        sb.toString
      }),

    // Diff ALGEBRA end-to-end (diff.ex union/invert/apply): diff two graph
    // versions, apply the diff back, and report the applied statements and
    // both diff sides — the oracle recomputes all three in SQL set algebra
    "kg_diff_apply" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        def g(o: org.apache.spark.sql.Column) = docs.select(
          concat(lit(WebKg.docNs), col("doc_id")).as("s"),
          lit(WebKg.pLang).as("p"), o.as("o"))
        val before = g(col("lang"))
        val after = g(when(col("doc_id") % 5 === 0, lit("xx")).otherwise(col("lang")))
        val diff = graft.engine.Diff.compute(before, after)
        diff.applyTo(before).select(lit("applied").as("part"), col("o"))
          .unionAll(diff.additions.select(lit("add").as("part"), col("o")))
          .unionAll(diff.deletions.select(lit("del").as("part"), col("o")))
          .groupBy("part", "o").agg(count(lit(1)).as("n"))
      },
      Some("""WITH before AS (SELECT 'http://graft.dev/doc/'||doc_id AS s, lang AS o
             |  FROM documents),
             |after AS (SELECT 'http://graft.dev/doc/'||doc_id AS s,
             |  CASE WHEN doc_id % 5 = 0 THEN 'xx' ELSE lang END AS o FROM documents)
             |SELECT 'applied' AS part, o, count(*) AS n FROM after GROUP BY 1,2
             |UNION ALL SELECT 'add', o, count(*) FROM
             |  (SELECT s, o FROM after EXCEPT SELECT s, o FROM before) GROUP BY 1,2
             |UNION ALL SELECT 'del', o, count(*) FROM
             |  (SELECT s, o FROM before EXCEPT SELECT s, o FROM after) GROUP BY 1,2""".stripMargin)),

    // graph-wide per-subject update (update_all_descriptions): every
    // subject's description gains a statement-count triple, computed
    // inside the distributed flatMapGroups
    "graph_update_all" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val sCol = Terms.iri(concat(lit(WebKg.docNs), col("doc_id")))
        def p(iri: String) = Terms.iri(lit(iri))
        val triples =
          docs.select(sCol.as("s"), p(WebKg.pLang).as("p"), Terms.strLit(col("lang")).as("o"))
            .unionAll(docs.select(sCol.as("s"), p(WebKg.vocab + "nchars").as("p"),
              Terms.typedLit(col("n_chars").cast("string"), xsdInt).as("o")))
        val nstatP = WebKg.vocab + "nstat" // local: keep the closure slim
        val updated = graft.engine.Graphs.updateAllDescriptions(triples,
          (subj, desc) => desc :+ graft.core.Triple(subj,
            graft.core.Term.iri(nstatP), graft.core.Term.int(desc.size.toLong)))
        updated.groupBy(col("p")("value").as("p"))
          .agg(count(lit(1)).as("n"), countDistinct(col("o")("value")).as("n_obj"))
      },
      Some("""SELECT 'http://graft.dev/vocab#lang' AS p, count(*) AS n,
             |  count(DISTINCT lang) AS n_obj FROM documents
             |UNION ALL SELECT 'http://graft.dev/vocab#nchars', count(*),
             |  count(DISTINCT n_chars) FROM documents
             |UNION ALL SELECT 'http://graft.dev/vocab#nstat', count(*), 1
             |  FROM documents""".stripMargin)),

    // URL canonicalization for dedup keying: five deterministic variant
    // families (identical re-crawl, uppercased scheme+host, explicit
    // default port, fragment, tracking-only query) injected per doc_id%5
    // over the canonical url; normalization must collapse every pair to
    // one key. Oracle applies the byte-identical RE2 regex chain.
    "kg_url_normalize" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val canonical = concat(lit("https://"), col("source"),
          lit(".example.org/doc/"), col("doc_id"))
        val variant = when(col("doc_id") % 5 === 0, canonical)
          .when(col("doc_id") % 5 === 1,
            concat(lit("HTTPS://"), upper(col("source")),
              lit(".EXAMPLE.ORG/doc/"), col("doc_id")))
          .when(col("doc_id") % 5 === 2,
            concat(lit("https://"), col("source"),
              lit(".example.org:443/doc/"), col("doc_id")))
          .when(col("doc_id") % 5 === 3, concat(canonical, lit("#sec-2")))
          .otherwise(concat(canonical, lit("?utm_campaign=x&gclid=g1")))
        val raw = docs.select(canonical.as("url"))
          .unionAll(docs.select(variant.as("url")))
        raw.select(WebKg.normalizeUrl(col("url")).as("url_norm"), col("url"))
          .groupBy("url_norm")
          .agg(count(lit(1)).as("n_raw"),
            countDistinct(col("url")).as("n_distinct_raw"))
      },
      Some("""WITH raw AS (
             |  SELECT 'https://'||source||'.example.org/doc/'||doc_id AS url FROM documents
             |  UNION ALL
             |  SELECT CASE doc_id % 5
             |    WHEN 0 THEN 'https://'||source||'.example.org/doc/'||doc_id
             |    WHEN 1 THEN 'HTTPS://'||upper(source)||'.EXAMPLE.ORG/doc/'||doc_id
             |    WHEN 2 THEN 'https://'||source||'.example.org:443/doc/'||doc_id
             |    WHEN 3 THEN 'https://'||source||'.example.org/doc/'||doc_id||'#sec-2'
             |    ELSE 'https://'||source||'.example.org/doc/'||doc_id||'?utm_campaign=x&gclid=g1'
             |  END FROM documents),
             |nf AS (SELECT url, regexp_replace(url, '#.*', '') AS u0 FROM raw),
             |lo AS (SELECT url, u0,
             |    regexp_extract(u0, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) AS scheme,
             |    lower(regexp_extract(u0, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://' ||
             |    regexp_extract(u0, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*@)', 1) ||
             |    lower(regexp_extract(u0, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/?#@]*)', 1)) ||
             |    regexp_replace(u0, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS u1 FROM nf),
             |np AS (SELECT url, scheme, regexp_replace(regexp_replace(u1,
             |    '^(http://(?:[^/?#]*@)?[^/?#:]*):80([/?]|$)', '\1\2'),
             |    '^(https://(?:[^/?#]*@)?[^/?#:]*):443([/?]|$)', '\1\2') AS u2 FROM lo),
             |nt AS (SELECT url, scheme, regexp_replace(u2, '\?.*', '') ||
             |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             |      regexp_extract(u2, '(\?.*)', 1),
             |    '([?&])(utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&#]*', '\1', 'g'),
             |    '&&+', '&', 'g'), '^\?&+', '?'), '[?&]+$', '') AS u3 FROM np)
             |SELECT CASE WHEN scheme = '' THEN url ELSE u3 END AS url_norm,
             |  count(*) AS n_raw, count(DISTINCT url) AS n_distinct_raw
             |FROM nt GROUP BY 1""".stripMargin)),

    // re-crawl snapshot selection: two crawl generations (docs % 3 == 0
    // re-crawled a day later with updated content); latestSnapshot keeps
    // exactly the newest version of every url
    "kg_latest_crawl" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        def gen(tsOffsetDays: Int, txt: org.apache.spark.sql.Column,
                flt: org.apache.spark.sql.Column) =
          docs.filter(flt).select(
            concat(lit("https://"), col("source"), lit(".example.org/doc/"),
              col("doc_id")).as("url"),
            expr(s"TIMESTAMP '2025-01-01 00:00:00' + make_interval(0,0,0,$tsOffsetDays,0,0,doc_id)")
              .as("warc_ts"),
            txt.cast("binary").as("html"), txt.as("text"), col("lang"))
        val v1 = gen(0, col("text"), lit(true))
        val v2 = gen(1, concat(col("text"), lit(" updated")), col("doc_id") % 3 === 0)
        WebKg.latestSnapshot(v1.unionAll(v2))
          .select(col("url"), md5(col("text")).as("h"))
      },
      Some("""SELECT 'https://'||source||'.example.org/doc/'||doc_id AS url,
             |  md5(CASE WHEN doc_id % 3 = 0 THEN text || ' updated' ELSE text END) AS h
             |FROM documents""".stripMargin)),

    // DOMAIN-level curation stats (RefinedWeb/Dolma-style host
    // reputation): pages aggregated by host into re-crawl dup rate +
    // quality proxies + keep flag. The Spark side derives the title
    // signal by PARSING the html (extractedTitle); the oracle derives it
    // from the generative rule (doc_id % 10 = 9 pages are title-less) —
    // agreement re-proves the extraction path inside an aggregation query
    "kg_domain_stats" -> Q(
      (s, d) => WebKg.domainStats(
        WebKg.synthesizeWebPages(t(s, d, "documents"), withDuplicates = true)),
      Some("""WITH pages0 AS (SELECT doc_id, text, source,
             |  'https://'||source||'.example.org/doc/'||doc_id AS url
             |  FROM documents),
             |pages AS (SELECT * FROM pages0 UNION ALL
             |  SELECT * FROM pages0 WHERE doc_id % 10 = 0),
             |s AS (SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS domain,
             |    md5(text) AS h,
             |    len(string_split_regex(text, '\s+')) AS n_tokens,
             |    CASE WHEN doc_id % 10 = 9 THEN 1 ELSE 0 END AS notitle
             |  FROM pages),
             |a AS (SELECT domain, count(*) AS n_pages,
             |    count(DISTINCT h) AS n_unique,
             |    round(avg(n_tokens), 6) AS avg_tokens,
             |    round(avg(notitle), 6) AS notitle_rate
             |  FROM s GROUP BY 1)
             |SELECT domain, n_pages, n_unique,
             |  round(1.0 - n_unique / CAST(n_pages AS DOUBLE), 6) AS dup_rate,
             |  avg_tokens, notitle_rate,
             |  (round(1.0 - n_unique / CAST(n_pages AS DOUBLE), 6) <= 0.25
             |   AND avg_tokens >= 5.0 AND notitle_rate <= 0.5) AS keep
             |FROM a""".stripMargin)),

    // quad-level graph-keyed mutations end-to-end (dataset.ex put_graph /
    // delete_graph / update_all_graphs): replace one named graph
    // wholesale, drop another plus the default graph, then add a
    // per-graph statement-count triple inside the distributed
    // updateAllGraphs — aggregated per (graph, predicate) for the oracle
    "graph_put_graph" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val sCol = Terms.iri(concat(lit(WebKg.docNs), col("doc_id")))
        val gCol = Terms.iri(concat(lit("http://graft.dev/graph/"), col("source")))
        val quads = docs.select(sCol.as("s"),
            Terms.iri(lit(WebKg.pLang)).as("p"),
            Terms.strLit(col("lang")).as("o"), gCol.as("g"))
          .unionAll(docs.select(sCol.as("s"),
            Terms.iri(lit(WebKg.vocab + "nchars")).as("p"),
            Terms.typedLit(col("n_chars").cast("string"), xsdInt).as("o"),
            lit(null).cast(Terms.termSchema).as("g")))
        val replacement = docs.filter(col("source") === "src0")
          .select(sCol.as("s"), Terms.iri(lit(WebKg.pLang)).as("p"),
            Terms.strLit(lit("zz")).as("o"), gCol.as("g"))
        val afterPut = graft.engine.Graphs.putGraph(quads, replacement)
        val afterDel = graft.engine.Graphs.deleteGraph(afterPut,
          Seq(graft.core.Term.iri("http://graft.dev/graph/src1"), null))
        val nstatP = WebKg.vocab + "nstat"
        val updated = graft.engine.Graphs.updateAllGraphs(afterDel,
          (name, triples) => triples :+ graft.core.Triple(name,
            graft.core.Term.iri(nstatP), graft.core.Term.int(triples.size.toLong)))
        updated.groupBy(col("g")("value").as("g"), col("p")("value").as("p"))
          .agg(count(lit(1)).as("n"), countDistinct(col("o")("value")).as("n_obj"))
      },
      Some("""SELECT 'http://graft.dev/graph/'||source AS g,
             |  'http://graft.dev/vocab#lang' AS p, count(*) AS n,
             |  count(DISTINCT CASE WHEN source='src0' THEN 'zz' ELSE lang END) AS n_obj
             |FROM documents WHERE source <> 'src1' GROUP BY 1
             |UNION ALL
             |SELECT 'http://graft.dev/graph/'||source,
             |  'http://graft.dev/vocab#nstat', CAST(1 AS BIGINT), CAST(1 AS BIGINT)
             |FROM documents WHERE source <> 'src1' GROUP BY 1""".stripMargin)),

    // reachability with a CUSTOM follow function (object, predicate, depth)
    // -> the typed-filter path, cross-checked against a depth-bounded
    // recursive CTE: visited = nodes within 3 hops, result = the FULL
    // descriptions (all outgoing edges) of visited nodes
    "graph_reach_follow" -> Q(
      (s, d) => {
        val docs = t(s, d, "documents")
        val edges = WebKg.docEdges(docs).dropDuplicates()
        val g = edges.select(
          Terms.iri(concat(lit(WebKg.docNs), col("src"))).as("s"),
          Terms.iri(lit(WebKg.pLink)).as("p"),
          Terms.iri(concat(lit(WebKg.docNs), col("dst"))).as("o"))
        val out = graft.engine.Graphs.reachable(g,
          graft.core.Term.iri(WebKg.docNs + "1"),
          follow = graft.engine.Graphs.Follow.Custom((_, _, depth) => depth <= 3))
        out.groupBy(col("s")("value").as("s")).agg(count(lit(1)).as("n"))
      },
      Some("""WITH RECURSIVE nn AS (SELECT count(*) AS c FROM documents),
             |e AS (SELECT DISTINCT src, dst FROM (
             |  SELECT doc_id AS src, (doc_id*2) % (SELECT c FROM nn) AS dst FROM documents
             |  UNION ALL SELECT doc_id, (doc_id*3+1) % (SELECT c FROM nn) FROM documents)),
             |r(node, depth) AS (SELECT CAST(1 AS BIGINT), 0
             |  UNION ALL SELECT e.dst, r.depth+1 FROM r JOIN e ON e.src = r.node
             |  WHERE r.depth < 3),
             |v AS (SELECT DISTINCT node FROM r)
             |SELECT 'http://graft.dev/doc/'||e.src AS s, count(*) AS n
             |FROM e JOIN v ON e.src = v.node GROUP BY 1""".stripMargin)),

    // --------------------------------------------- the KG pipeline itself
    // full extraction over synthesized web pages, flat oracle projection
    "kg_extract" -> Q(
      (s, d) => WebKg.extractFlat(WebKg.synthesizeWebPages(t(s, d, "documents"))),
      Some(kgPagesSql +
        """SELECT url AS s, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
          |  'http://graft.dev/vocab#WebPage' AS o FROM pages
          |UNION ALL SELECT url, 'http://graft.dev/vocab#title', 'Doc '||doc_id
          |  FROM pages WHERE doc_id % 10 <> 9
          |UNION ALL SELECT url, 'http://graft.dev/vocab#lang', lang FROM pages
          |UNION ALL SELECT url, 'http://graft.dev/vocab#links',
          |  'https://'||source||'.example.org/doc/'||((doc_id*7+1)%100000) FROM pages
          |UNION ALL SELECT url, 'http://graft.dev/vocab#created',
          |  strftime(warc_ts, '%Y-%m-%dT%H:%M:%SZ') FROM pages
          |UNION ALL SELECT url, 'http://graft.dev/vocab#textSha', md5(text) FROM pages""".stripMargin)),

    // extraction + set-semantic dedup over a duplicated (re-crawled) corpus
    "kg_dedup" -> Q(
      (s, d) => WebKg.dedupTriples(
        WebKg.extractFlat(WebKg.synthesizeWebPages(t(s, d, "documents"), withDuplicates = true)))
        .groupBy("p").agg(count(lit(1)).as("n"), countDistinct(col("s")).as("n_subjects")),
      Some(kgPagesSql +
        """, tr AS (
          |SELECT url AS s, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
          |  'http://graft.dev/vocab#WebPage' AS o FROM pages
          |UNION ALL SELECT url, 'http://graft.dev/vocab#title', 'Doc '||doc_id
          |  FROM pages WHERE doc_id % 10 <> 9
          |UNION ALL SELECT url, 'http://graft.dev/vocab#lang', lang FROM pages
          |UNION ALL SELECT url, 'http://graft.dev/vocab#links',
          |  'https://'||source||'.example.org/doc/'||((doc_id*7+1)%100000) FROM pages
          |UNION ALL SELECT url, 'http://graft.dev/vocab#created',
          |  strftime(warc_ts, '%Y-%m-%dT%H:%M:%SZ') FROM pages
          |UNION ALL SELECT url, 'http://graft.dev/vocab#textSha', md5(text) FROM pages)
          |SELECT p, count(*) AS n, count(DISTINCT s) AS n_subjects
          |FROM (SELECT DISTINCT s, p, o FROM tr) GROUP BY 1""".stripMargin)),

    // term-dictionary encoding (pipeline.Dict): per-predicate stats
    // computed entirely in ID SPACE and joined back through the dictionary
    // for display — proves the content-hash id derivation (truncated
    // SHA-256 -> 16-byte binary), the shuffle-free encode projection, and
    // the dictionary join cross-engine (DuckDB recomputes the identical
    // ids from the terms)
    "kg_dict_encode" -> Q(
      (s, d) => {
        val flat = WebKg.extractFlat(WebKg.synthesizeWebPages(t(s, d, "documents")))
        val enc = graft.pipeline.Dict.encodeFlat(flat)
        enc.groupBy("p_id")
          .agg(count(lit(1)).as("n"), countDistinct(col("s_id")).as("n_subjects"))
          .join(graft.pipeline.Dict.termDictionary(flat), col("p_id") === col("id"))
          .select(col("term").as("p"), lower(hex(col("p_id"))).as("p_id_hex"),
            col("n"), col("n_subjects"))
      },
      Some(kgPagesSql +
        """, tr AS (
          |SELECT url AS s, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
          |  'http://graft.dev/vocab#WebPage' AS o FROM pages
          |UNION ALL SELECT url, 'http://graft.dev/vocab#title', 'Doc '||doc_id
          |  FROM pages WHERE doc_id % 10 <> 9
          |UNION ALL SELECT url, 'http://graft.dev/vocab#lang', lang FROM pages
          |UNION ALL SELECT url, 'http://graft.dev/vocab#links',
          |  'https://'||source||'.example.org/doc/'||((doc_id*7+1)%100000) FROM pages
          |UNION ALL SELECT url, 'http://graft.dev/vocab#created',
          |  strftime(warc_ts, '%Y-%m-%dT%H:%M:%SZ') FROM pages
          |UNION ALL SELECT url, 'http://graft.dev/vocab#textSha', md5(text) FROM pages)
          |SELECT p, substr(sha256(p),1,32) AS p_id_hex, count(*) AS n,
          |  count(DISTINCT substr(sha256(s),1,32)) AS n_subjects
          |FROM tr GROUP BY 1,2""".stripMargin)),

    // encode -> dictionary-join decode round trip: the decoded corpus is
    // byte-identical to the source triples (grouped projection so the
    // oracle stays aggregate-scale)
    "kg_dict_roundtrip" -> Q(
      (s, d) => {
        val flat = WebKg.extractFlat(WebKg.synthesizeWebPages(t(s, d, "documents")))
        graft.pipeline.Dict
          .decodeFlat(graft.pipeline.Dict.encodeFlat(flat),
            graft.pipeline.Dict.termDictionary(flat))
          .groupBy("p").agg(count(lit(1)).as("n"),
            countDistinct(col("s")).as("n_subjects"),
            countDistinct(col("o")).as("n_objects"))
      },
      Some(kgPagesSql +
        """, tr AS (
          |SELECT url AS s, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
          |  'http://graft.dev/vocab#WebPage' AS o FROM pages
          |UNION ALL SELECT url, 'http://graft.dev/vocab#title', 'Doc '||doc_id
          |  FROM pages WHERE doc_id % 10 <> 9
          |UNION ALL SELECT url, 'http://graft.dev/vocab#lang', lang FROM pages
          |UNION ALL SELECT url, 'http://graft.dev/vocab#links',
          |  'https://'||source||'.example.org/doc/'||((doc_id*7+1)%100000) FROM pages
          |UNION ALL SELECT url, 'http://graft.dev/vocab#created',
          |  strftime(warc_ts, '%Y-%m-%dT%H:%M:%SZ') FROM pages
          |UNION ALL SELECT url, 'http://graft.dev/vocab#textSha', md5(text) FROM pages)
          |SELECT p, count(*) AS n, count(DISTINCT s) AS n_subjects,
          |  count(DISTINCT o) AS n_objects FROM tr GROUP BY 1""".stripMargin)),

    // per-url byte-identity of extracted text (the BASELINE.json invariant)
    "kg_text_identity" -> Q(
      (s, d) => {
        val pages = WebKg.synthesizeWebPages(t(s, d, "documents"))
        pages.select(
          sum(when(WebKg.extractedText === col("text"), 1L).otherwise(0L)).as("n_identical"),
          count(lit(1)).as("n_pages"))
      },
      Some("SELECT count(*) AS n_identical, count(*) AS n_pages FROM documents")),

    // distributed Turtle decode: per-document parse inside mapPartitions,
    // counts cross-checked against plain SQL
    "rdf_turtle_decode" -> Q(
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents").select(
          concat(lit(WebKg.docNs), col("doc_id")).as("id"),
          concat(lit("@prefix g: <http://graft.dev/vocab#> .\n<> g:lang \""),
            col("lang"), lit("\" ; g:nchars "), col("n_chars"),
            lit(" ; g:src \""), col("source"), lit("\" .")).as("ttl"))
          .as[(String, String)]
        graft.engine.Graphs.parseTurtleDocs(docs)
          .groupBy(col("p")("value").as("p"))
          .agg(count(lit(1)).as("n"), countDistinct(col("o")("value")).as("n_obj"))
      },
      Some("""SELECT 'http://graft.dev/vocab#lang' AS p, count(*) AS n,
             |  count(DISTINCT lang) AS n_obj FROM documents
             |UNION ALL SELECT 'http://graft.dev/vocab#nchars', count(*),
             |  count(DISTINCT n_chars) FROM documents
             |UNION ALL SELECT 'http://graft.dev/vocab#src', count(*),
             |  count(DISTINCT source) FROM documents""".stripMargin)),

    // per-group RDFC-1.0 canonicalization, FULLY oracled on its
    // SQL-predictable projection: the canonical label SET per document
    // (prefix-c14n0/1 — the per-doc prefix is md5(doc).take(16), and a
    // 2-bnode graph always yields exactly those two labels even though
    // WHICH bnode gets which is hash-order-dependent), plus the non-bnode
    // statement parts byte-exact (predicates, literal objects, count).
    // WHICH label lands on which bnode stays covered by the determinism
    // assertions in GraphsSpec + the full rdf-canon W3C suite.
    "rdf_canonicalize" -> Q(
      (s, d) => {
        import graft.core.TermKind
        val docs = t(s, d, "documents")
        val quads = docs.select(col("doc_id").cast("string").as("doc"),
            Terms.bnode(concat(lit("a"), col("doc_id"))).as("s"),
            Terms.iri(lit(WebKg.vocab + "lang")).as("p"),
            Terms.strLit(col("lang")).as("o"))
          .unionAll(docs.select(col("doc_id").cast("string").as("doc"),
            Terms.bnode(concat(lit("a"), col("doc_id"))).as("s"),
            Terms.iri(lit(WebKg.vocab + "knows")).as("p"),
            Terms.bnode(concat(lit("b"), col("doc_id"))).as("o")))
        graft.engine.Graphs.canonicalizePerGroup(quads, "doc")
          .groupBy(col("doc"))
          .agg(
            concat_ws(",", sort_array(array_union(
              collect_set(when(col("s")("kind") === lit(TermKind.BNODE),
                col("s")("value"))),
              collect_set(when(col("o")("kind") === lit(TermKind.BNODE),
                col("o")("value")))))).as("labels"),
            count(lit(1)).as("n"),
            max(when(col("o")("kind") === lit(TermKind.LITERAL),
              col("o")("value"))).as("lang"),
            concat_ws(",", sort_array(collect_set(col("p")("value")))).as("preds"))
      },
      Some("""SELECT CAST(doc_id AS VARCHAR) AS doc,
             |  substr(md5(CAST(doc_id AS VARCHAR)),1,16) || '-c14n0,' ||
             |  substr(md5(CAST(doc_id AS VARCHAR)),1,16) || '-c14n1' AS labels,
             |  CAST(2 AS BIGINT) AS n, lang,
             |  'http://graft.dev/vocab#knows,http://graft.dev/vocab#lang' AS preds
             |FROM documents""".stripMargin)),

    // WHOLE-DATASET RDFC (canonicalize/2, canonicalization.ex:50-52) where
    // bnodes are NOT pre-partitioned by document: each doc's bnode links to
    // a HUB bnode shared by its residue class (doc_id % 50), so components
    // span ~1/50th of the corpus and cross every document boundary. The
    // oracle recomputes the component structure in SQL: component id = min
    // original label ('a'||doc_id sorts under 'h'||k), label set =
    // md5(comp).take(16)-c14n{0..ndocs}, plus byte-exact non-bnode parts.
    // WHICH label lands on which bnode is covered by determinism/
    // isomorphism assertions in GraphsSpec + the rdf-canon W3C suite.
    // Per-doc literals are doc_id (all distinct) so no two bnodes in a
    // component are automorphic — RDFC's permutation search stays linear.
    "rdf_canonicalize_ds" -> Q(
      (s, d) => {
        import graft.core.TermKind
        val docs = t(s, d, "documents")
        val aB = Terms.bnode(concat(lit("a"), col("doc_id")))
        val triples = docs.select(
            aB.as("s"),
            Terms.iri(lit(WebKg.vocab + "docid")).as("p"),
            Terms.strLit(col("doc_id").cast("string")).as("o"))
          .unionAll(docs.select(
            aB.as("s"),
            Terms.iri(lit(WebKg.vocab + "memberOf")).as("p"),
            Terms.bnode(concat(lit("h"), pmod(col("doc_id"), lit(50)))).as("o")))
        graft.engine.Graphs.canonicalizeDataset(triples)
          .groupBy(split(col("s")("value"), "-").getItem(0).as("pfx"))
          .agg(
            concat_ws(",", sort_array(array_union(
              collect_set(col("s")("value")),
              collect_set(when(col("o")("kind") === lit(TermKind.BNODE),
                col("o")("value")))))).as("labels"),
            count(lit(1)).as("n"),
            max(when(col("o")("kind") === lit(TermKind.LITERAL),
              col("o")("value"))).as("max_id"),
            concat_ws(",", sort_array(collect_set(col("p")("value")))).as("preds"))
      },
      Some("""WITH comp AS (
             |  SELECT doc_id % 50 AS k,
             |    min('a' || CAST(doc_id AS VARCHAR)) AS minlab,
             |    count(*) AS ndocs,
             |    max(CAST(doc_id AS VARCHAR)) AS maxid
             |  FROM documents GROUP BY 1)
             |SELECT substr(md5(minlab),1,16) AS pfx,
             |  array_to_string(list_sort(list_transform(
             |    range(0, CAST(ndocs+1 AS INT)),
             |    i -> substr(md5(minlab),1,16) || '-c14n' || i)), ',') AS labels,
             |  CAST(2*ndocs AS BIGINT) AS n,
             |  maxid AS max_id,
             |  'http://graft.dev/vocab#docid,http://graft.dev/vocab#memberOf' AS preds
             |FROM comp""".stripMargin)),

    // SPARQL-ish total order over typed literal terms: rank by the
    // engine's sortable term key == numeric order in plain SQL. Scale-safe
    // plan: distributed top-k (TakeOrderedAndProject) on the Column-encoded
    // key, then row_number over only the k survivors — no global
    // single-task window, no UDF. Key parity with XsdOps.sortKey is
    // asserted in XsdOpsSpec.
    "rdf_order" -> Q(
      (s, d) => {
        val key = Terms.intSortKey(col("o_orderkey").cast("string"))
        val top = t(s, d, "orders").select(col("o_orderkey"), key.as("k"))
          .orderBy(col("k"), col("o_orderkey")).limit(100)
        val w = Window.orderBy(col("k"), col("o_orderkey"))
        top.withColumn("rank", row_number().over(w)).select("o_orderkey", "rank")
      },
      Some("""SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) AS rank
             |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin)),

    // distributed per-document Turtle serialization (encode inside
    // mapGroups), re-parsed and counted — round-trip through both codecs
    "rdf_turtle_roundtrip" -> Q(
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val triples = docs.select(col("doc_id").cast("string").as("doc"),
            Terms.iri(concat(lit(WebKg.docNs), col("doc_id"))).as("s"),
            Terms.iri(lit(WebKg.pLang)).as("p"), Terms.strLit(col("lang")).as("o"))
          .unionAll(docs.select(col("doc_id").cast("string").as("doc"),
            Terms.iri(concat(lit(WebKg.docNs), col("doc_id"))).as("s"),
            Terms.iri(lit(WebKg.vocab + "nchars")).as("p"),
            Terms.typedLit(col("n_chars").cast("string"), xsdInt).as("o")))
        val ttl = graft.engine.Graphs.toTurtlePerGroup(triples, "doc",
          Map("g" -> WebKg.vocab))
        // decode what we encoded, per document, and count by predicate
        graft.engine.Graphs.parseTurtleDocs(ttl.as[(String, String)])
          .groupBy(col("p")("value").as("p"))
          .agg(count(lit(1)).as("n"), countDistinct(col("o")("value")).as("n_obj"))
      },
      Some("""SELECT 'http://graft.dev/vocab#lang' AS p, count(*) AS n,
             |  count(DISTINCT lang) AS n_obj FROM documents
             |UNION ALL SELECT 'http://graft.dev/vocab#nchars', count(*),
             |  count(DISTINCT n_chars) FROM documents""".stripMargin)),

    // bucketed materialization with per-partition lineage + resume; bucket
    // ids are md5-derived so DuckDB reproduces the exact layout
    "kg_materialize" -> Q(
      (s, d) => {
        val root = s"/tmp/graft_materialize_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
        val triples = WebKg.extractFlat(WebKg.synthesizeWebPages(t(s, d, "documents")))
        graft.pipeline.Materialize.materialize(triples, root, 16, "verify")
          .orderBy("bucket")
          .drop("num_buckets") // constant store metadata, not per-bucket stats
      },
      Some(kgPagesSql +
        """, tr AS (
          |SELECT url AS s FROM pages
          |UNION ALL SELECT url FROM pages WHERE doc_id % 10 <> 9
          |UNION ALL SELECT url FROM pages
          |UNION ALL SELECT url FROM pages
          |UNION ALL SELECT url FROM pages
          |UNION ALL SELECT url FROM pages)
          |SELECT CAST(CAST('0x'||substr(md5(s),1,15) AS BIGINT) % 16 AS INT) AS bucket,
          |count(*) AS n_triples, count(DISTINCT s) AS n_subjects,
          |'verify' AS batch_id
          |FROM tr GROUP BY 1""".stripMargin)),

    // point lookup against the bucketed store: the bucket id is computed
    // driver-side so the filter prunes to ONE bucket directory (the S->P->O
    // index as storage layout); oracle recomputes the same subject's rows
    "kg_lookup" -> Q(
      (s, d) => {
        val root = s"/tmp/graft_lookup_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
        val docs = t(s, d, "documents")
        val triples = WebKg.extractFlat(WebKg.synthesizeWebPages(docs))
        graft.pipeline.Materialize.materialize(triples, root, 16, "verify")
        // doc 3's url (tiny driver-side lookup to build the point key)
        val src = docs.filter(col("doc_id") === 3).select("source").head.getString(0)
        val subject = s"https://$src.example.org/doc/3"
        graft.pipeline.Materialize.lookupSubject(s, root, subject, 16)
          .select("s", "p", "o")
      },
      Some(kgPagesSql +
        """, tr AS (
          |SELECT url AS s, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
          |  'http://graft.dev/vocab#WebPage' AS o FROM pages
          |UNION ALL SELECT url, 'http://graft.dev/vocab#title', 'Doc '||doc_id
          |  FROM pages WHERE doc_id % 10 <> 9
          |UNION ALL SELECT url, 'http://graft.dev/vocab#lang', lang FROM pages
          |UNION ALL SELECT url, 'http://graft.dev/vocab#links',
          |  'https://'||source||'.example.org/doc/'||((doc_id*7+1)%100000) FROM pages
          |UNION ALL SELECT url, 'http://graft.dev/vocab#created',
          |  strftime(warc_ts, '%Y-%m-%dT%H:%M:%SZ') FROM pages
          |UNION ALL SELECT url, 'http://graft.dev/vocab#textSha', md5(text) FROM pages)
          |SELECT s, p, o FROM tr
          |WHERE s = (SELECT 'https://'||source||'.example.org/doc/3'
          |           FROM documents WHERE doc_id = 3)""".stripMargin)),

    // entity linking, two-stage fuzzy: minhash blocking over character
    // 3-gram shingles -> exact-Jaccard score-and-resolve (the north star's
    // blocked candidate generation; `kg_entity_link` below is the exact-
    // match fast path)
    "kg_entity_link_fuzzy" -> Q(
      (s, d) => WebKg.entityLinkFuzzy(t(s, d, "documents"), WebKg.defaultDictionary),
      Some(fuzzyLinkSql)),

    // the SAME fuzzy linking through the BIG-dictionary path: the
    // dictionary is a DataFrame joined WITHOUT broadcast (shuffled
    // candidate + verify joins, shuffle_merge-hinted) — semantics
    // identical, so the one oracle covers both physical plans; the
    // no-BroadcastExchange-on-dict-side shape is asserted in WebKgSpec
    "kg_entity_link_big" -> Q(
      (s, d) => {
        import s.implicits._
        WebKg.entityLinkFuzzyDF(t(s, d, "documents"),
          WebKg.defaultDictionary.toDF("surface", "entity"),
          broadcastDict = false)
      },
      Some(fuzzyLinkSql)),

    // EXACT-only linking mode (PipelineMain --link-mode exact): the
    // full-corpus production tier — equi-join + min-entity resolution +
    // per-(doc, entity) mention counts, none of the fuzzy machinery.
    // Exercised through the big-dict (shuffled) distribution so both
    // plan shapes of the mode stay covered.
    "kg_entity_link_exact" -> Q(
      (s, d) => {
        import s.implicits._
        WebKg.entityLinkExactDF(t(s, d, "documents"),
          WebKg.defaultDictionary.toDF("surface", "entity"),
          broadcastDict = false)
      },
      Some("""WITH dict(surface, entity) AS (VALUES
             |  ('customer','http://graft.dev/entity/customer'),
             |  ('part','http://graft.dev/entity/part'),
             |  ('order','http://graft.dev/entity/order'),
             |  ('supplier','http://graft.dev/entity/supplier'),
             |  ('spark','http://graft.dev/entity/spark'),
             |  ('vector','http://graft.dev/entity/vector')),
             |tok AS (SELECT DISTINCT doc_id, w FROM
             |  (SELECT doc_id, unnest(string_split_regex(text,'\s+')) AS w FROM documents)
             |  WHERE length(w) >= 3),
             |resolved AS (SELECT t.doc_id, t.w, min(d.entity) AS entity
             |  FROM tok t JOIN dict d ON t.w = d.surface GROUP BY 1, 2)
             |SELECT 'http://graft.dev/doc/'||doc_id AS s,
             |  'http://graft.dev/vocab#mentions' AS p, entity AS o,
             |  count(w) AS n_mentions, CAST(1 AS DOUBLE) AS top_jac
             |FROM resolved GROUP BY 1, 2, 3""".stripMargin)),

    // entity linking: mention detection + broadcast-join resolve
    "kg_entity_link" -> Q(
      (s, d) => WebKg.entityLink(t(s, d, "documents"), WebKg.defaultDictionary),
      Some("""WITH dict(surface, entity) AS (VALUES
             |  ('customer','http://graft.dev/entity/customer'),
             |  ('part','http://graft.dev/entity/part'),
             |  ('order','http://graft.dev/entity/order'),
             |  ('supplier','http://graft.dev/entity/supplier'),
             |  ('spark','http://graft.dev/entity/spark'),
             |  ('vector','http://graft.dev/entity/vector')),
             |tok AS (SELECT doc_id, unnest(string_split_regex(text,'\s+')) AS w FROM documents)
             |SELECT 'http://graft.dev/doc/'||doc_id AS s,
             |  'http://graft.dev/vocab#mentions' AS p, entity AS o,
             |  count(*) AS n_mentions
             |FROM tok JOIN dict ON w = surface GROUP BY 1,2,3""".stripMargin)))

  /** Shared DuckDB CTE chain reproducing Dedup.minhashLshPairs: distinct
    * tokens -> 8 minhashes -> 4 bands -> all pairs within buckets of <= 64,
    * star pairs (bucket-min doc_id x rest) for over-cap buckets.
    * Ends after the `cand` CTE so callers append either the count
    * projection or further verify-stage CTEs.
    *
    * The two pair branches MUST stay inside a subquery (SELECT DISTINCT
    * over UNION ALL), never a top-level UNION in the CTE body:
    * dedup_clusters prepends WITH RECURSIVE for its closure, and DuckDB
    * then treats ANY top-level set-op CTE as a recursive union —
    * measured emitting duplicate cand rows (11019 vs 4938 distinct),
    * which double-count the verify stage's intersection and admit false
    * near-dup pairs. */
  /** lshCandSql + exact-Jaccard verification: `jac` = the verified near-dup
    * pair set (threshold 0.8), the DuckDB twin of `Dedup.ngramJaccardPairs`.
    * Shared by `dedup_ngram_jaccard` and `dedup_clusters`. */
  private lazy val ngramJacSql: String = lshCandSql +
    """, sizes AS (SELECT doc_id, count(DISTINCT w) AS n FROM tok GROUP BY 1),
      |inter AS (SELECT c.d1, c.d2, count(*) AS i FROM cand c
      |  JOIN tok a ON a.doc_id = c.d1
      |  JOIN tok b ON b.doc_id = c.d2 AND b.w = a.w
      |  GROUP BY 1,2),
      |jac AS (SELECT i.d1, i.d2 FROM inter i
      |  JOIN sizes s1 ON i.d1 = s1.doc_id JOIN sizes s2 ON i.d2 = s2.doc_id
      |  WHERE i.i * 1.0 / (s1.n + s2.n - i.i) >= 0.8)
      |""".stripMargin

  private lazy val lshCandSql: String =
    """WITH tok AS (SELECT doc_id, source,
      |    unnest(list_distinct(string_split_regex(text,'\s+'))) AS w FROM documents),
      |mh AS (SELECT doc_id, source,
      |  min(CAST('0x'||substr(md5('0:'||w),1,15) AS BIGINT)) AS s0,
      |  min(CAST('0x'||substr(md5('1:'||w),1,15) AS BIGINT)) AS s1,
      |  min(CAST('0x'||substr(md5('2:'||w),1,15) AS BIGINT)) AS s2,
      |  min(CAST('0x'||substr(md5('3:'||w),1,15) AS BIGINT)) AS s3,
      |  min(CAST('0x'||substr(md5('4:'||w),1,15) AS BIGINT)) AS s4,
      |  min(CAST('0x'||substr(md5('5:'||w),1,15) AS BIGINT)) AS s5,
      |  min(CAST('0x'||substr(md5('6:'||w),1,15) AS BIGINT)) AS s6,
      |  min(CAST('0x'||substr(md5('7:'||w),1,15) AS BIGINT)) AS s7
      |  FROM tok GROUP BY 1,2),
      |bands AS (
      |  SELECT doc_id, source, 0 AS band,
      |    md5(CAST(s0 AS VARCHAR)||'|'||CAST(s1 AS VARCHAR)) AS sig FROM mh UNION ALL
      |  SELECT doc_id, source, 1,
      |    md5(CAST(s2 AS VARCHAR)||'|'||CAST(s3 AS VARCHAR)) FROM mh UNION ALL
      |  SELECT doc_id, source, 2,
      |    md5(CAST(s4 AS VARCHAR)||'|'||CAST(s5 AS VARCHAR)) FROM mh UNION ALL
      |  SELECT doc_id, source, 3,
      |    md5(CAST(s6 AS VARCHAR)||'|'||CAST(s7 AS VARCHAR)) FROM mh),
      |stats AS (SELECT doc_id, source, band, sig,
      |    count(*) OVER (PARTITION BY band, sig, source) AS bn,
      |    min(doc_id) OVER (PARTITION BY band, sig, source) AS bmin
      |  FROM bands
      |  WHERE doc_id IS NOT NULL AND source IS NOT NULL AND sig IS NOT NULL),
      |capped AS (SELECT * FROM stats WHERE bn <= 64),
      |cand AS (SELECT DISTINCT d1, d2 FROM (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2
      |  FROM capped a JOIN capped b ON a.band=b.band AND a.sig=b.sig
      |   AND a.source=b.source AND a.doc_id < b.doc_id
      |  UNION ALL
      |  SELECT bmin, doc_id FROM stats WHERE bn > 64 AND doc_id <> bmin))
      |""".stripMargin

  /** Shared DuckDB oracle for BOTH decontamination variants: the Bloom
    * variant's contract is byte-equality with the exact operator, so one
    * SQL string keeps the two oracle rows from drifting apart. */
  // def, not val: referenced from registry entries declared ABOVE this
  // point — a val would still be null during the object's initialization
  private def decontaminateOracleSql: String =
    """WITH ng AS (SELECT doc_id, unnest(list_distinct(
      |    list_transform(range(1, len(t)-1), i -> t[i]||' '||t[i+1]||' '||t[i+2]))) AS ng
      |  FROM (SELECT doc_id, string_split_regex(text,'\s+') AS t FROM documents)),
      |bench AS (SELECT DISTINCT ng FROM ng WHERE doc_id % 97 = 0),
      |ov AS (SELECT n.doc_id, count(*) AS n_overlap
      |  FROM ng n JOIN bench b ON n.ng = b.ng GROUP BY 1)
      |SELECT d.doc_id, COALESCE(ov.n_overlap, 0) AS n_overlap,
      |  COALESCE(ov.n_overlap, 0) > 0 AS contaminated
      |FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id""".stripMargin

  /** Embedding corpus with 10% injected duplicate rows (deterministic:
    * vec_id % 10 == 0 re-appears as vec_id + 100000). */
  private[graft] def embDupCorpus(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("embedding"))
      .unionAll(e.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))

  /** DuckDB twin of embDupCorpus + exact pairwise cosine CTE. */
  private lazy val embDupSql: String =
    """WITH e AS (SELECT vec_id, embedding FROM embeddings
      |  UNION ALL SELECT vec_id + 100000, embedding FROM embeddings
      |  WHERE vec_id % 10 = 0),
      |p AS (SELECT a.vec_id AS d1, b.vec_id AS d2,
      |  round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
      |    (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
      |     sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS cos
      |  FROM e a, e b WHERE a.vec_id < b.vec_id)
      |""".stripMargin

  /** Shared DuckDB CTE reproducing synthesizeWebPages (no duplicates). */
  private lazy val kgPagesSql: String =
    """WITH pages AS (SELECT doc_id, text, lang, source,
      |  'https://'||source||'.example.org/doc/'||doc_id AS url,
      |  TIMESTAMP '2025-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND AS warc_ts
      |  FROM documents)
      |""".stripMargin

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, q) => n -> q.fn }.toMap

  lazy val oracleSql: Map[String, String] =
    all.collect { case (n, Q(_, Some(sql))) => n -> sql.replace('\n', ' ') }.toMap
}

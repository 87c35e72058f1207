package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphAlgosSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    GraphAlgos.connectedComponents(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain, star, cycle, and disjoint components resolve to the min id") {
    // chain 1-2-3-4-5 | star 10-{11,12,13} | cycle 20-21-22-20 | pair 30-31
    val got = cc(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L,
      10L -> 11L, 10L -> 12L, 10L -> 13L,
      20L -> 21L, 21L -> 22L, 22L -> 20L,
      30L -> 31L))
    assert((1L to 5L).forall(got(_) == 1L), got)
    assert((10L to 13L).forall(got(_) == 10L), got)
    assert((20L to 22L).forall(got(_) == 20L), got)
    assert(got(30L) == 30L && got(31L) == 30L)
    assert(got.size == 14) // every vertex appearing in an edge, nothing else
  }

  test("direction, duplicate edges, and self-loops do not matter") {
    val got = cc(Seq(5L -> 1L, 1L -> 5L, 5L -> 1L, 7L -> 7L, 5L -> 9L))
    assert(got(1L) == 1L && got(5L) == 1L && got(9L) == 1L)
    assert(got(7L) == 7L) // self-loop = isolated vertex with an edge row
  }

  test("non-integral ids are rejected at plan build, never silently dropped") {
    import spark.implicits._
    val strEdges = Seq(("u1", "u2")).toDF("a", "b")
    val e = intercept[IllegalArgumentException](
      GraphAlgos.connectedComponents(strEdges))
    assert(e.getMessage.contains("integral"))
    val strDocs = Seq(("url-a", "s", "text here")).toDF("doc_id", "source", "text")
    val e2 = intercept[IllegalArgumentException](Dedup.nearDupClusters(strDocs))
    assert(e2.getMessage.contains("integral"))
    val e3 = intercept[IllegalArgumentException](Dedup.nearDupDropIds(strDocs))
    assert(e3.getMessage.contains("integral"))
  }

  test("long chain converges within the pointer-doubled round budget") {
    // diameter 300 chain: plain propagation needs 300 rounds; pointer
    // doubling must land it well inside maxIter=20 (2^20 >> 300)
    val chain = (0L until 300L).map(i => i -> (i + 1))
    val got = cc(chain)
    assert((0L to 300L).forall(got(_) == 0L))
  }

  test("nearDupClusters: transitive chains collapse, singletons survive") {
    import spark.implicits._
    // three near-identical docs (A~B~C chain through shared shingles), one
    // exact-ish pair, and unrelated singleton docs
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, "s1", base + " one"),
      (2L, "s1", base + " two"),
      (3L, "s1", base + " three"),
      (50L, "s1", "totally different words here nothing shared qq ww ee rr tt"),
      (51L, "s1", "totally different words here nothing shared qq ww ee rr uu"),
      (90L, "s1", "lone wolf document unique vocabulary entirely"),
      (91L, "s1", "another unrelated text with its own tokens completely")
    ).toDF("doc_id", "source", "text")
    val got = Dedup.nearDupClusters(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    val byId = got.map(r => r._1 -> r).toMap
    // every input doc gets exactly one row
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 50L, 51L, 90L, 91L))
    // the near-dup family is ONE cluster rooted at the min id, keep only 1
    assert(Seq(1L, 2L, 3L).map(byId(_)._2).distinct == Seq(1L))
    assert(Seq(1L, 2L, 3L).map(byId(_)._3) == Seq(1, 0, 0))
    // the pair clusters at 50, singletons keep themselves
    assert(byId(50L)._2 == byId(51L)._2)
    assert(byId(90L) == ((90L, 90L, 1)) && byId(91L) == ((91L, 91L, 1)))
    // exactly one keeper per cluster
    val keepers = got.groupBy(_._2).map { case (_, rs) => rs.count(_._3 == 1) }
    assert(keepers.forall(_ == 1))
  }

  test("nearDupClusters keep=1 rows equal one representative per component") {
    import spark.implicits._
    val docs = (0L until 40L).map { i =>
      // 4 dup groups of 5 (ids 0-4, 5-9, ...): 12 shared tokens + 1 group
      // token + 1 member token -> within-group Jaccard 12/14 = 0.857 (>=
      // 0.8, verified near-dup), cross-group 11/15 = 0.73 (< 0.8, the
      // verify stage rejects any LSH candidate) — plus 20 unique docs
      val text = if (i < 20)
        s"group${i / 5} common words alpha beta gamma delta epsilon zeta " +
          s"eta theta iota member$i"
      else s"unique document number $i with disjoint vocabulary ${i * 7}"
      (i, "s", text)
    }.toDF("doc_id", "source", "text")
    val res = Dedup.nearDupClusters(docs)
    assert(res.count() == 40)
    val kept = res.filter(col("keep") === 1).count()
    val clusters = res.select("cluster").distinct().count()
    assert(kept == clusters)
    assert(clusters == 24, s"4 groups + 20 singletons, got $clusters")
    // nearDupDropIds is exactly the complement of the keepers — and EAGER:
    // after it returns, the only persisted storage left in the session is
    // the returned drop set's own checkpoint (the pair and component
    // checkpoints behind it were released inside the call). Collect the
    // expectation BEFORE the census sweep: `res` is itself backed by a
    // checkpoint the sweep destroys.
    val expectDropped = res.filter(col("keep") === 0)
      .collect().map(_.getLong(0)).toSet
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val drop = Dedup.nearDupDropIds(docs)
    assert(spark.sparkContext.getPersistentRDDs.size == 1,
      spark.sparkContext.getPersistentRDDs.values.map(_.name).toSeq.toString)
    val dropped = drop.collect().map(_.getLong(0)).toSet
    assert(dropped == expectDropped)
    assert(dropped.size == 16) // 4 per group
    GraphAlgos.releaseLocalCheckpoint(drop)
  }

  test("over-cap LSH buckets emit star pairs: dense clusters still dedup") {
    import spark.implicits._
    // 10 byte-identical docs: one signature, every band bucket holds all
    // 10 rows. With bucketCap = 4 the all-pairs join is skipped, but the
    // star branch (bucket-min id x rest) must still connect the cluster —
    // the pre-fix behavior dropped the bucket wholesale and exempted
    // exactly the largest duplicate clusters from dedup.
    val docs = (0L until 10L)
      .map(i => (i, "s", "mirror farm page body identical everywhere"))
      .toDF("doc_id", "source", "text")
    val pairs = Dedup.minhashLshPairs(docs, bucketCap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (1L until 10L).map(i => (0L, i)).toSet,
      s"expected the min-id star, got $pairs")
    // end-to-end through verify + components: keep one, drop nine.
    // (nearDupClusters uses the default cap of 64, so build the dense
    // cluster large enough to overflow it.)
    val dense = (0L until 70L)
      .map(i => (i, "s", "mirror farm page body identical everywhere"))
      .toDF("doc_id", "source", "text")
    val res = Dedup.nearDupClusters(dense)
    assert(res.filter(col("keep") === 1).collect()
      .map(_.getLong(0)).toSeq == Seq(0L))
    assert(Dedup.nearDupDropIds(dense).count() == 69L)
  }
}

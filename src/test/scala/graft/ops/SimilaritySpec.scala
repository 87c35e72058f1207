package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  /** Deterministic synthetic embeddings: 200 vectors in 16 dims. */
  private def embeddings = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (0L until 200L).map { id =>
      (id, Array.fill(16)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
  }

  private def topKSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("bruteForceTopK returns k exact neighbors per query") {
    val e = embeddings
    val r = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 4), 5)
    val byQ = topKSet(r)
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L))
    assert(byQ.values.forall(_.size == 5))
  }

  test("multi-probe LSH recall >= single-probe recall vs exact top-k") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 16)
    // 4 planes -> 16 buckets over 200 vectors: realistic bucket occupancy
    // for a recall comparison at this corpus size
    val exact = topKSet(Similarity.bruteForceTopK(e, q, 5))
    val single = topKSet(Similarity.lshBucketedTopK(e, q, 5, nPlanes = 4, probeHamming = 0))
    val multi = topKSet(Similarity.lshBucketedTopK(e, q, 5, nPlanes = 4, probeHamming = 1))
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val hits = exact.map { case (qid, truth) =>
        approx.getOrElse(qid, Set.empty).count(truth) }.sum
      hits.toDouble / exact.values.map(_.size).sum
    }
    val rs = recall(single); val rm = recall(multi)
    assert(rm >= rs, s"multi-probe recall $rm < single-probe $rs")
    assert(rm > 0.3, s"multi-probe recall unexpectedly low: $rm")
  }

  test("IVF top-k: more probes -> recall monotone, beats floor") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 16)
    val exact = topKSet(Similarity.bruteForceTopK(e, q, 5))
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val hits = exact.map { case (qid, truth) =>
        approx.getOrElse(qid, Set.empty).count(truth) }.sum
      hits.toDouble / exact.values.map(_.size).sum
    }
    val r1 = recall(topKSet(Similarity.ivfTopK(e, q, 5, nLists = 8, nProbe = 1)))
    val r3 = recall(topKSet(Similarity.ivfTopK(e, q, 5, nLists = 8, nProbe = 3)))
    assert(r3 >= r1, s"nProbe=3 recall $r3 < nProbe=1 recall $r1")
    assert(r3 > 0.3, s"IVF recall unexpectedly low: $r3")
  }

  test("embedding near-dup: LSH-blocked pairs vs exact, perturbed corpus") {
    import spark.implicits._
    // 60 base vectors + 20 small perturbations of the first 20: the true
    // near-dups are NOT byte-identical, so bucket signatures can differ —
    // the genuine recall/cost trade of the blocked path
    val rnd = new scala.util.Random(7)
    val base = (0 until 60).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val perturbed = base.take(20).map { case (id, v) =>
      (id + 1000L, v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f))
    }
    val e = (base ++ perturbed).toDF("vec_id", "embedding")
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Similarity.cosineNearDupPairs(e, 0.95))
    assert(exact.size >= 18, s"expected ~20 true near-dup pairs, got ${exact.size}")
    val blocked = pairSet(Similarity.lshNearDupPairs(e, 0.95, nPlanes = 6, probeHamming = 1))
    // precision is 1.0 by construction (every candidate is exact-verified)
    assert(blocked.subsetOf(exact), "blocked pairs must be exact-verified")
    val recall = blocked.size.toDouble / exact.size
    assert(recall >= 0.7, s"multi-probe blocked recall too low: $recall")
  }
}

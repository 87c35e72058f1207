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
}

package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, ("w " * (i % 40 + 1)).trim))
      .toDF("doc_id", "text")
  }

  test("hashSplit: deterministic, complete, near the requested fractions") {
    val d = docs(2000)
    val s1 = Sampling.hashSplit(d, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = Sampling.hashSplit(d, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 == s2)                       // reproducible
    assert(s1.size == 2000)                // total
    val frac = s1.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05, frac)
    assert(math.abs(frac("val") - 0.1) < 0.03, frac)
    assert(math.abs(frac("test") - 0.1) < 0.03, frac)
    // stability under corpus growth: labels of existing docs unchanged
    val bigger = Sampling.hashSplit(docs(4000),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1.forall { case (id, l) => bigger(id) == l })
  }

  test("null inputs: null doc_id gets a null split; null text packs as 0 tokens; " +
      "non-integral ids rejected") {
    import spark.implicits._
    val d = Seq(Some(1L), Some(2L), None)
      .map(id => (id.map(java.lang.Long.valueOf).orNull, "w w"))
      .toDF("doc_id", "text")
    val split = Sampling.hashSplit(d, Seq("train" -> 0.9, "test" -> 0.1))
      .collect().map(r => (Option(r.get(0)), Option(r.getString(1))))
    // the unattributable doc lands in NO split, never in the last label
    assert(split.count(_._1.isEmpty) == 1)
    assert(split.filter(_._1.isEmpty).forall(_._2.isEmpty))
    assert(split.filter(_._1.isDefined).forall(_._2.isDefined))

    val nullText = Seq((0L, "a b c"), (1L, null), (2L, "d e"))
      .toDF("doc_id", "text")
    val packed = Sampling.packShards(nullText, budgetTokens = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1 is an empty (0-token) doc, present with a valid shard id, and
    // doc 2's prefix sum is unaffected by it
    assert(packed(1L) == (0L, 0L), packed)
    assert(packed(0L) == (3L, 0L) && packed(2L) == (2L, 0L), packed)

    val strIds = Seq(("a", "t"), ("b", "t")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Sampling.packShards(strIds, budgetTokens = 4)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("packShards equals the sequential greedy packing") {
    val d = docs(500)
    val got = Sampling.packShards(d, budgetTokens = 100).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // sequential reference: exclusive cumulative sum div budget
    var cum = 0L
    val expected = got.map { case (id, n, _) =>
      val shard = cum / 100; cum += n; (id, n, shard)
    }
    assert(got.toSeq == expected.toSeq)
    // shards are contiguous ranges of doc_ids and none (except possibly
    // by one overflowing doc) exceeds the budget grossly
    val byShard = got.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    assert(byShard.values.forall(_ <= 100 + 40)) // budget + max doc size
    // parallel plan: the cumsum window is partitioned (not one global task)
    val plan = Sampling.packShards(d, 100).queryExecution.executedPlan.toString
    assert(!plan.contains("Window [") || plan.contains("windowspecdefinition(__pid"), plan)
  }

  test("packShards: deterministic across actions, sparse ids, empty input") {
    import spark.implicits._
    // sparse, non-contiguous ids: the value-derived bucket id must yield
    // the SAME bucketing in the totals action and the final join (the
    // spark_partition_id-over-range-exchange version could diverge
    // between the two actions)
    val sparse = (0 until 400)
      .map(i => (i.toLong * 17 + (i % 7).toLong * 1000, ("tok " * (i % 25 + 1)).trim))
      .toDF("doc_id", "text").dropDuplicates("doc_id")
    def run() = Sampling.packShards(sparse, 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val a = run(); val b = run()
    assert(a.toSeq == b.toSeq) // reproducible
    var cum = 0L
    val exp = a.map { case (id, n, _) => val s = cum / 64; cum += n; (id, n, s) }
    assert(a.toSeq == exp.toSeq) // equals sequential greedy packing
    assert(Sampling.packShards(sparse.limit(0), 64).collect().isEmpty)
  }

  test("stratifiedSample: exact per-stratum counts, small strata whole, " +
    "deterministic, map-side group limit in the plan") {
    import spark.implicits._
    val d = (0 until 1000).map { i =>
      val lang = if (i < 7) "tiny" else if (i % 10 == 0) "rare" else "common"
      (i.toLong, lang)
    }.toDF("doc_id", "lang")
    val res = Sampling.stratifiedSample(d, "lang", 30)
    val counts = res.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("common") == 30 && counts("rare") == 30, counts)
    assert(counts("tiny") == 7) // stratum smaller than n survives whole
    // ranks are 1..k contiguous per stratum
    val ranks = res.collect().map(r => (r.getString(0), r.getInt(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(ranks("tiny") == (1 to 7))
    assert(ranks("common") == (1 to 30) && ranks("rare") == (1 to 30))
    // deterministic across runs
    val again = Sampling.stratifiedSample(d, "lang", 30)
    assert(res.collect().toSet == again.collect().toSet)
    // scale shape: the rank<=n filter must compile to WindowGroupLimit so
    // each partition keeps <= n rows per stratum BEFORE the exchange — a
    // dominant stratum must never sort whole in one task
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("temperatureResample: sqrt rates, rarest domain whole, deterministic") {
    import spark.implicits._
    val d = ((0 until 900).map(i => (i.toLong, "big")) ++
      (900 until 1000).map(i => (i.toLong, "small")) ++
      (1000 until 1025).map(i => (i.toLong, "tiny")))
      .toDF("doc_id", "source")
    val out = Sampling.temperatureResample(d, "source")
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2)))

    // independent reference: same md5 hash-uniform + sqrt(nmin/n) rates
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(id: Long): Double = {
      val hex = md.digest(s"graft-temp-v1:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16).toDouble / (1L << 60).toDouble
    }
    val n = Map("big" -> 900L, "small" -> 100L, "tiny" -> 25L)
    val rate = n.map { case (dom, c) => dom -> math.sqrt(25.0 / c.toDouble) }
    val expected = (0 until 1025).map(_.toLong).flatMap { id =>
      val dom = if (id < 900) "big" else if (id < 1000) "small" else "tiny"
      if (u(id) < rate(dom))
        Some((id, dom, BigDecimal(rate(dom))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      else None
    }.toSet
    assert(rows.toSet == expected)
    // rarest domain rides through whole (rate 1.0)
    assert(rows.count(_._2 == "tiny") == 25)
    // dominant domain downsampled toward sqrt: E[big] = 900/6 = 150
    val nBig = rows.count(_._2 == "big")
    assert(nBig > 100 && nBig < 200, nBig)
    // deterministic across runs
    assert(Sampling.temperatureResample(d, "source").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSet == rows.toSet)
    // scale shape: rates join BROADCAST; the only corpus exchange is the
    // domain-count aggregation
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}

package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("saltedJoin equals the plain join and avoids broadcast") {
    import spark.implicits._
    // one hot key (90% of rows) + a tail
    val fact = ((1 to 900).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k${i % 7}", i.toDouble))).toDF("k", "v")
    val dim = fact.select("k").distinct().withColumn("w", length(col("k")))

    val salted = Skew.saltedJoin(fact, dim, "k", 8)
      .groupBy("k").agg(count(lit(1)).as("n"), round(sum(col("v") * col("w")), 3).as("sv"))
    val plain = fact.join(dim, "k")
      .groupBy("k").agg(count(lit(1)).as("n"), round(sum(col("v") * col("w")), 3).as("sv"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    val plan = Skew.saltedJoin(fact, dim, "k", 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"), plan)
    // the join key is widened with the salt, so the exchange hashes on
    // (k, __salt) — the hot key's rows spread over 8 partitions
    assert(plan.contains("__salt"), plan)
  }

  test("byte-identical hot rows still spread across salts") {
    import spark.implicits._
    // 1000 IDENTICAL fact rows: a purely value-derived salt would send
    // them all to ONE salt bucket and keep the straggler
    val fact = Seq.fill(1000)(("hot", 1)).toDF("k", "v")
    val dim = Seq(("hot", "d")).toDF("k", "d")
    val joined = Skew.saltedJoin(fact, dim, "k", saltFactor = 8)
    assert(joined.count() == 1000)
    val salts = fact.withColumn("__salt",
      org.apache.spark.sql.functions.pmod(
        xxhash64(col("k"), col("v")) + monotonically_increasing_id(), lit(8)))
      .select("__salt").distinct().count()
    assert(salts > 1, s"identical rows collapsed to $salts salt(s)")
  }

  test("salt is deterministic and bounded") {
    import spark.implicits._
    val df = (1 to 50).map(i => (s"r$i", i)).toDF("a", "b")
    val s1 = df.select(Skew.saltCol(8, col("a"), col("b")).as("s")).collect().map(_.getInt(0))
    val s2 = df.select(Skew.saltCol(8, col("a"), col("b")).as("s")).collect().map(_.getInt(0))
    assert(s1.toSeq == s2.toSeq)
    assert(s1.forall(s => s >= 0 && s < 8))
    assert(s1.distinct.length > 1) // actually spreads
  }
}

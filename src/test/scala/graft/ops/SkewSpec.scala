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

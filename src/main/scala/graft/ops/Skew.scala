package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for shuffle joins on hot keys.
  *
  * AQE's skew-join split handles sort-merge joins after the fact; SALTING
  * is the plan-level version that also works for hash joins, streaming,
  * and engines without AQE — the north star calls for it explicitly
  * ("salted, skew-aware bucketed tables"). The idea: widen the join key
  * with a salt in [0, saltFactor) on the fact side and replicate the
  * dimension side saltFactor times, so one hot key's rows spread over
  * saltFactor reduce partitions instead of one straggler.
  */
object Skew {

  /** Deterministic per-row salt: hash of the given columns mod the factor
    * (xxhash64 — fast, codegen'd; determinism keeps results reproducible
    * run to run, unlike rand()-based salting). */
  def saltCol(saltFactor: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(saltFactor)).cast("int")

  /** Salted equi-join: `fact` (large, skewed on `key`) joined to `dim`
    * (small-ish, unique on `key`) on (key, salt). The dimension side is
    * exploded saltFactor-fold — at 100 TB the fact side dominates, so
    * replicating the dimension by the salt factor is the cheap side of the
    * trade. `forceShuffle` pins a shuffle hash join (the demonstration
    * case; with broadcast available you would broadcast instead — salting
    * exists for dims too big to broadcast but small enough to replicate). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFactor: Int, forceShuffle: Boolean = true): DataFrame = {
    // value hash PLUS row position: a hot key whose rows are byte-
    // identical (dup ingests, low-cardinality attributes) would all hash
    // to ONE salt and keep the straggler; the monotonic id round-robins
    // them while staying deterministic for a stable input partitioning
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*) +
        monotonically_increasing_id(), lit(saltFactor)).cast("int"))
    val explodedDim0 = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1)).cast("array<int>")))
    val explodedDim =
      if (forceShuffle) explodedDim0.hint("shuffle_hash") else explodedDim0
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for fact-fact joins at scale. AQE's skew
  * join covers most cases; explicit salting is for known-hot keys
  * (e.g. one postcode district holding a third of all transactions)
  * where the skew is visible before runtime.
  */
object Skew {

  /** Salted inner equi-join: the left (large, skewed) side gets a
    * random-but-deterministic salt in [0, saltFactor); the right side
    * is replicated `saltFactor` times. Key hotspots spread over
    * saltFactor reducers; results are identical to a plain join.
    *
    * Right-side replication multiplies its size — use for joins where
    * the right side is too big to broadcast but far smaller than the
    * skewed left (the dimension-ish middle ground).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 1)
    // deterministic salt: whole-row hash MIXED with the row's position
    // (monotonically_increasing_id is stable for deterministic input
    // splits, so retries/speculation agree) — row content alone would
    // leave byte-identical duplicate rows of a hot key all on one
    // reducer, defeating the salting entirely.
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id() +: left.columns.map(col): _*),
        lit(saltFactor)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}

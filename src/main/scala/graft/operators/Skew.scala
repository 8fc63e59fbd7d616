package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.sources.Tables

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
  /** @param uniqueCol optional left-side column whose values are
    *                   unique per row: mixed into the salt so even
    *                   byte-identical duplicate rows of a hot key
    *                   spread across reducers. Without it the salt is
    *                   the row-content hash — retry-deterministic
    *                   (positional ids like monotonically_increasing_id
    *                   are NOT stable when a shuffled input partition
    *                   is recomputed, which can duplicate/lose rows on
    *                   task retry), at the cost of identical duplicate
    *                   rows landing on one reducer. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int = 8, uniqueCol: Option[String] = None): DataFrame = {
    require(saltFactor > 1)
    val saltSource = uniqueCol match {
      case Some(u) => Seq(col(u))
      case None    => left.columns.map(col).toSeq
    }
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(saltSource: _*), lit(saltFactor)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** The salted strategy on real tables — lineitem (large, skewed
    * side) against the urgent-orders middle table — registered so the
    * driver hash-compares the salted plan against a plain DuckDB join:
    * salting must be invisible in the result at any salt factor.
    *
    * The registered SURFACE is a 64-bucket census of the join output
    * (row count, 60-bit xor of every (orderkey, linenumber) pair, exact
    * decimal price sum per bucket), not the raw rows: the xor still
    * catches a single duplicated or lost row anywhere — the property
    * salting must preserve — while the post-join work is one partial
    * (map-side-combined) aggregation and a 64-row sort. The previous
    * shape global-sorted the whole join output, and that UNBOUNDED sort
    * — nothing to do with the join — was the engine's only measured
    * >1.0 scaling exponent at sf0.1→sf1; the join itself is one
    * equi-shuffle on (key, salt) at any scale. */
  def saltedLineitemJoin(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice").cast(DecimalType(18, 2)).as("price"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    saltedJoin(l, o, "l_orderkey")
      .withColumn("h", Reconcile.xorHash60(concat_ws("|",
        col("l_orderkey").cast("string"), col("l_linenumber").cast("string"))))
      .groupBy((col("l_orderkey") % 64).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("row_xor"),
        sum("price").cast(DoubleType).as("price_sum"))
      .orderBy("bucket")
  }
}

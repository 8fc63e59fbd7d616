package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Gaps-and-islands INTERVAL MERGE — union overlapping/touching
  * intervals per key into maximal covered spans. The session window
  * (SURVEY rows 35/121) answers "points closer than a gap"; this
  * answers the complementary question for true INTERVALS — "when was
  * at least one lease/claim/session active, and for how long" — the
  * SQL-pattern workhorse behind licence coverage, on-call overlap,
  * and outage accounting.
  *
  * Plan: one key-partitioned sort window. The running
  * `max(end) OVER (... ROWS UNBOUNDED PRECEDING TO 1 PRECEDING)`
  * carries the furthest coverage seen; a start strictly past it opens
  * a new island (end-exclusive touching intervals — `start = prev
  * end` — merge, by decision: they tile the line with no gap). The
  * island id is the running sum of open flags, and the merged spans
  * fall out of one groupBy. Cost at scale: ONE shuffle on the key,
  * frames never exceed the key's own interval count, and island
  * membership is invariant to tie order (equal starts always merge).
  */
object Intervals {

  /** Generic merge: `iv` has (key, start, end) with end ≥ start.
    * Output: key, island (1-based per key, in span order),
    * island_start, island_end, n_intervals. */
  def mergeOf(iv: DataFrame, key: String, start: String, end: String): DataFrame = {
    val ord = Window.partitionBy(key).orderBy(col(start), col(end))
    val prevMax = max(col(end))
      .over(ord.rowsBetween(Window.unboundedPreceding, -1))
    iv.withColumn("_open",
        when(prevMax.isNull || col(start) > prevMax, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("_open")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(key), col("island"))
      .agg(min(col(start)).as("island_start"),
        max(col(end)).as("island_end"),
        count(lit(1)).as("n_intervals"))
  }

  /** Registered binding: each event opens a 30-minute activity
    * interval for its user; merged islands are the user's covered
    * activity spans (integer-microsecond arithmetic end to end). */
  def userActivitySpans(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").as("s"),
        (col("ts") + expr("interval 30 minutes")).as("e"))
    mergeOf(iv, key = "user_id", start = "s", end = "e")
      .orderBy("user_id", "island")
  }
}

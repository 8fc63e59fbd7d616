package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** General interval (range) join — the named sibling of the as-of
  * lookup (`AsOf.scala` documents why as-of stays a keyed join): pair
  * every probe row whose timestamp falls inside [lo, hi) of every
  * window row, with NO join key connecting them. The naive
  * formulation is a pure non-equi join — Spark plans it as a
  * BroadcastNestedLoopJoin (probe × windows work, a scale-killer the
  * moment windows stop fitting in one task's time budget).
  *
  * The bucketed rewrite is the standard fix (Databricks' range-join
  * "bin" hint, DuckDB's IEJoin literature): quantize time into
  * fixed-width buckets, explode each window into the buckets its span
  * covers (span/bucket + 1 rows — bounded by construction when window
  * lengths are bounded), map each probe row to its single bucket, and
  * equi-join on the bucket with the exact predicate as a residual
  * filter. One hash shuffle on a uniform integer key; each matching
  * pair meets in EXACTLY one bucket (the probe's), so no post-join
  * dedup is needed. Bucket width tunes the explode-factor vs
  * selectivity trade: ~the median window length is the usual choice.
  *
  * All comparisons run in integer MICROSECONDS (`unix_micros`) — the
  * precision Spark timestamps actually carry — so results are exact
  * and engine-reproducible (the DuckDB oracle compares `epoch_us`,
  * floor-truncating its nanos the same way).
  */
object RangeJoin {

  /** Bucketed interval join: rows of `probe` whose `probeTs` lies in
    * `[loCol, hiCol)` of `windows`. Column names must be disjoint. */
  def bucketed(probe: DataFrame, probeTs: String,
               windows: DataFrame, loCol: String, hiCol: String,
               bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds > 0)
    val b = bucketSeconds * 1000000L
    val p = probe.withColumn("__pb", expr(s"unix_micros($probeTs) div ${b}L"))
    val w = windows.withColumn("__wb",
      explode(expr(s"sequence(unix_micros($loCol) div ${b}L, unix_micros($hiCol) div ${b}L)")))
    p.join(w, p("__pb") === w("__wb") &&
        expr(s"unix_micros($probeTs) >= unix_micros($loCol)") &&
        expr(s"unix_micros($probeTs) < unix_micros($hiCol)"))
      .drop("__pb", "__wb")
  }

  /** Alert windows for the registered query: every 499th event opens
    * a 2-hour window starting at its timestamp — the "incident
    * window" shape (deploy freeze, outage, promo) that interval
    * analytics joins the raw stream against. */
  def alertWindows(events: DataFrame): DataFrame =
    events.filter(col("event_id") % 499 === 0)
      .select(col("event_id").as("window_id"), col("ts").as("lo"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("hi"))

  /** Registered `q_range_join`: which events fall inside which alert
    * windows (the window's own trigger event excluded) — hash-checked
    * against DuckDB's plain inequality join. */
  def eventRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    bucketed(events.select(col("event_id"), col("ts")), "ts",
        alertWindows(events), "lo", "hi")
      .filter(col("event_id") =!= col("window_id"))
      .select(col("window_id"), col("event_id"))
      .orderBy("window_id", "event_id")
  }

  /** Registered `q_range_join_auto`: the SAME question written the
    * naive way — a plain inequality join on timestamp + interval — and
    * left to [[graft.plans.RangeJoinRewrite]] to turn into the
    * bucketed equi-join inside the optimizer. Shares `q_range_join`'s
    * oracle verbatim: one truth, reached through the expert API and
    * through the planner rewrite. The spec additionally pins that this
    * plan contains no nested-loop join. */
  def eventRangeJoinNaive(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    events.select(col("event_id"), col("ts"))
      .join(alertWindows(events),
        col("ts") >= col("lo") && col("ts") < col("lo") + expr("INTERVAL 2 HOURS"))
      .filter(col("event_id") =!= col("window_id"))
      .select(col("window_id"), col("event_id"))
      .orderBy("window_id", "event_id")
  }
}

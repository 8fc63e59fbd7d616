package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Ordered-step funnel analysis over the event stream — the classic
  * conversion question (view → click → purchase: who reached each
  * step, and how fast?) the reference's analytics side motivates
  * (`Analysis/main.py` slices the same store by period/category; a
  * funnel slices it by behavioral sequence).
  *
  * Semantics: step k is reached at the EARLIEST event of its type
  * strictly after the step-(k−1) time (min-chain, the standard
  * "ordered funnel"); a user skipping a step never reaches the rest,
  * however many later-step events they have.
  *
  * Scale shape: one user-keyed aggregate per step plus user-keyed
  * joins — no window over the raw stream, no self-join on time. All
  * times are integer MICROSECONDS (`unix_micros`, = DuckDB
  * `epoch_us`), so gaps and the strict-after comparison are exact and
  * engine-reproducible at any parallelism.
  */
object Funnel {

  /** Per-user funnel over `steps` (event_type values, in order):
    * reached flags and integer-second gaps between consecutive
    * reached steps (null once the funnel is abandoned).
    *
    * `maxStepGapUs` makes the funnel WINDOWED: step k only counts
    * within that many microseconds of step k-1 ("purchase within a
    * day of click") — one residual time-bound predicate on each step
    * join, nothing else changes. An expired step abandons the rest of
    * the funnel (min-of-window ≡ min-chain when the earliest
    * strictly-after event lands inside the bound, null otherwise —
    * the INCLUSIVE bound is spec-pinned at the exact boundary). */
  def funnelOf(events: DataFrame, steps: Seq[String],
               maxStepGapUs: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(maxStepGapUs.forall(_ > 0), "the step window must be positive")
    val us = events.select(col("user_id"), col("event_type"),
      expr("unix_micros(ts)").as("us"))
    // fold: step k's table is (user_id, t_k); the next step aggregates
    // events of its type strictly after t_k, per user
    val stepTimes: Seq[DataFrame] = steps.zipWithIndex.foldLeft(Seq.empty[DataFrame]) {
      case (acc, (step, i)) =>
        val t =
          if (i == 0)
            us.filter(col("event_type") === step)
              .groupBy("user_id").agg(min(col("us")).as(s"t$i"))
          else {
            val inWindow = maxStepGapUs
              .map(g => col("us") <= col(s"t${i - 1}") + lit(g))
              .getOrElse(lit(true))
            us.filter(col("event_type") === step)
              .join(acc.last.select(col("user_id"), col(s"t${i - 1}")), "user_id")
              .filter(col("us") > col(s"t${i - 1}") && inWindow)
              .groupBy("user_id").agg(min(col("us")).as(s"t$i"))
          }
        acc :+ t
    }
    val joined = stepTimes.tail.foldLeft(stepTimes.head) { (acc, t) =>
      acc.join(t, Seq("user_id"), "left")
    }
    val flags = steps.indices.map(i =>
      when(col(s"t$i").isNotNull, 1L).otherwise(0L).as(s"reached_${steps(i)}"))
    val gaps = steps.indices.tail.map(i =>
      expr(s"(t$i - t${i - 1}) div 1000000L")
        .as(s"secs_${steps(i - 1)}_${steps(i)}"))
    joined.select((col("user_id") +: (flags ++ gaps)): _*).orderBy("user_id")
  }

  /** Registered `q_funnel`: the view → click → purchase conversion
    * per user, hash-checked against DuckDB's min-chain. */
  def eventFunnel(spark: SparkSession, dir: String): DataFrame =
    funnelOf(Tables.events(spark, dir), Seq("view", "click", "purchase"))

  /** One day in microseconds — the step window of the registered
    * windowed funnel (at the fixture's gap distribution: keeps ~40%
    * of conversions, so both converted and expired branches carry
    * real rows on either side of the boundary). */
  val windowedGapUs: Long = 86400L * 1000000L

  /** Registered `q_funnel_windowed`: the same funnel with each step
    * bound to land within a day of the previous one, hash-checked
    * against the identical min-chain + residual-bound in DuckDB. */
  def eventFunnelWindowed(spark: SparkSession, dir: String): DataFrame =
    funnelOf(Tables.events(spark, dir), Seq("view", "click", "purchase"),
      maxStepGapUs = Some(windowedGapUs))

  /** Cohort retention — the other classic behavioral slice: users
    * grouped by FIRST-ACTIVE day (the cohort), counted on each later
    * day-offset they came back. Two user-keyed aggregates (first day
    * per user, distinct user-days) + one user-keyed join + one
    * (cohort, offset)-keyed count — the output is cohorts × horizon,
    * bounded regardless of event volume, and nothing windows over the
    * raw stream. Day arithmetic via `datediff` on DATEs (integer on
    * both engines). */
  def retentionOf(events: DataFrame): DataFrame = {
    val days = events.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohorts = days.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    days.join(cohorts, "user_id")
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Registered `q_retention`: per-cohort comeback counts over the
    * event month, hash-checked against the same two-aggregate chain
    * in DuckDB. */
  def eventRetention(spark: SparkSession, dir: String): DataFrame =
    retentionOf(Tables.events(spark, dir))

  /** Event-type TRANSITION MATRIX — the first-order Markov view of
    * the stream ("after a view, what happens next, how often, and how
    * fast"): per user, each event's successor by (ts, event_id) order
    * feeds one (from, to) census. The funnel (above) asks about ONE
    * prescribed path; the matrix surfaces every observed path with
    * its empirical probability — where funnels come FROM.
    *
    * Determinism: equal-timestamp successors are tie-broken by
    * event_id on both engines; the probability is one BIGINT/BIGINT
    * division in IEEE double (exactly rounded, cross-engine bit-equal
    * — no decimal rounding mode in sight). Scale: one user-keyed
    * window (`lead`), one matrix-sized aggregate; the stream shuffles
    * once, the matrix is |event types|² rows. */
  def transitionsOf(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .withColumn("gap_us",
        (lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts")))
          .cast("long"))
      .filter(col("to_type").isNotNull)
      .withColumnRenamed("event_type", "from_type")
    val counts = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"), sum(col("gap_us")).as("total_gap_us"))
    val totals = org.apache.spark.sql.expressions.Window.partitionBy("from_type")
    counts
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(totals).cast("double"))
      .orderBy("from_type", "to_type")
  }

  /** Registered `q_transitions`. */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame =
    transitionsOf(Tables.events(spark, dir))
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.sources.Tables

/** As-of join: attach to each probe row the most recent build row at
  * or before the probe's time, per key — the "which snapshot/price was
  * current at date X" question the reference answers by querying the
  * file-log by datetime (pp_complete_download_file_log ordering).
  *
  * Spark-first note (SURVEY.md §4 preference ladder): no custom
  * SparkPlan is needed — key-equality join + time filter +
  * row_number()-over-(key, time desc) expresses the semantics, and
  * Catalyst plans it as one shuffle on the key plus a per-key sort.
  * Spark's WindowGroupLimit prunes to the top row before the final
  * window, so the intermediate never materializes all matches per
  * probe beyond the sort.
  *
  * Range-join evaluation (considered, not adopted): open-source Spark
  * has no range-join optimization or hint for non-equi predicates —
  * the RANGE_JOIN hint is a proprietary runtime feature, not in
  * Catalyst. Catalyst's own `RewriteAsOfJoin` (what pandas-on-Spark
  * `merge_asof` lowers to) rewrites to the same equality-join +
  * per-probe reduce shape used here, just with an aggregate instead
  * of a window; since WindowGroupLimit already reduces each mapper's
  * output to one row per probe BEFORE the exchange (the same partial
  * pruning a max_by partial aggregate would give), switching buys no
  * shuffle-volume reduction. The remaining expansion — the join
  * emitting every build row ≤ t before the prune — is inherent to any
  * join-based formulation; eliminating it needs a custom range-join
  * SparkPlan, which current evidence (q_asof_order ≈0.9 s at sf0.1,
  * no skewed probe keys) does not justify.
  */
object AsOf {

  /** @param probe     rows asking "latest as of my time" (keyCol, timeCol, ...)
    * @param build     rows carrying versioned values (keyCol, timeCol, ...)
    * @param keyCol    equality key (after any renames, same name both sides)
    * @param probeTime probe-side time column
    * @param buildTime build-side time column
    * @param tieBreak  build-side unique column for deterministic ties
    * @param direction `backward` (default — latest build at or before
    *                  the probe), `forward` (earliest at or after), or
    *                  `nearest` (smallest absolute distance; an exact
    *                  distance tie prefers the BACKWARD row, then the
    *                  tie-break) — the pandas merge_asof contract
    * @param toleranceSeconds maximum |build − probe| distance; a probe
    *                  with no build row inside it keeps a null match
    *                  (the left join), never a wrong one. Also the
    *                  SCALE dial for `nearest`: without it the per-key
    *                  expansion is every build row of the key; with it
    *                  a range-bucketed formulation (RangeJoin) applies
    *                  if the expansion ever dominates
    */
  def join(probe: DataFrame, build: DataFrame, keyCol: String,
           probeTime: String, buildTime: String, tieBreak: String,
           direction: String = "backward",
           toleranceSeconds: Option[Long] = None): DataFrame = {
    // synthetic probe-row id: duplicate probe rows are distinct probes
    // and must each keep their own match — windowing on the probe's
    // data columns alone would collapse them
    val p = probe.withColumn("__probe_id", monotonically_increasing_id())
    // date or timestamp both land on epoch seconds (dates at their
    // UTC midnight), so one tolerance unit serves both
    val bSec = col(buildTime).cast(TimestampType).cast(LongType)
    val pSec = col(probeTime).cast(TimestampType).cast(LongType)
    val within = toleranceSeconds
      .map(t => abs(bSec - pSec) <= t).getOrElse(lit(true))
    val (sideCond, order) = direction match {
      case "backward" => (col(buildTime) <= col(probeTime),
        Seq(col(buildTime).desc, col(tieBreak).desc))
      case "forward"  => (col(buildTime) >= col(probeTime),
        Seq(col(buildTime).asc, col(tieBreak).desc))
      case "nearest"  => (lit(true),
        Seq(abs(bSec - pSec).asc, col(buildTime).asc, col(tieBreak).desc))
      case other => throw new IllegalArgumentException(
        s"direction must be backward|forward|nearest, got $other")
    }
    val w = Window.partitionBy(col("__probe_id")).orderBy(order: _*)
    p.join(build, p(keyCol) === build(keyCol) && sideCond && within, "left")
      .drop(build(keyCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__probe_id")
  }

  /** Contract query: for every event, the customer's most recent order
    * as of the event date (events.user_id ≈ customer key). */
  def eventOrderAsOf(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), to_date(col("ts")).as("event_date"))
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey").as("user_id"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("total_price"))
    join(e, o, "user_id", "event_date", "order_date", "o_orderkey")
      .select(col("event_id"), col("user_id"), col("o_orderkey"),
        col("total_price").cast(DoubleType).as("total_price"))
      .orderBy("event_id")
  }

  private def eventOrderSides(spark: SparkSession, dir: String): (DataFrame, DataFrame) = (
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), to_date(col("ts")).as("event_date")),
    Tables.orders(spark, dir)
      .select(col("o_custkey").as("user_id"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("total_price")))

  /** Registered `q_asof_forward`: the customer's NEXT order within 90
    * days of each event — the scheduling/entitlement direction
    * ("which upcoming version applies"). */
  def eventOrderAsOfForward(spark: SparkSession, dir: String): DataFrame = {
    val (e, o) = eventOrderSides(spark, dir)
    join(e, o, "user_id", "event_date", "order_date", "o_orderkey",
        direction = "forward", toleranceSeconds = Some(90L * 86400))
      .select(col("event_id"), col("user_id"), col("o_orderkey"),
        col("total_price").cast(DoubleType).as("total_price"))
      .orderBy("event_id")
  }

  /** Registered `q_asof_nearest`: the closest order within 30 days on
    * either side; equal distances resolve backward then by order key —
    * the reconciliation direction ("which record was this event
    * probably about"). */
  def eventOrderAsOfNearest(spark: SparkSession, dir: String): DataFrame = {
    val (e, o) = eventOrderSides(spark, dir)
    join(e, o, "user_id", "event_date", "order_date", "o_orderkey",
        direction = "nearest", toleranceSeconds = Some(30L * 86400))
      .select(col("event_id"), col("user_id"), col("o_orderkey"),
        col("total_price").cast(DoubleType).as("total_price"))
      .orderBy("event_id")
  }
}

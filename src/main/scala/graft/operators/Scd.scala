package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Slowly-changing-dimension TYPE 2 history built from periodic
  * snapshots — the warehouse-side completion of the CDC family
  * (SURVEY rows 10/39): the reference applies each monthly update in
  * place and keeps only the latest state
  * (land_registry_monthly_update_database_updater.py), so "what was
  * this row worth in month N" is unanswerable there. A Type-2
  * dimension keeps every distinct state as its own row with a
  * validity interval.
  *
  * Shape: tag each snapshot with its version, union, and detect
  * change points with ONE key-partitioned window (frames are at most
  * #snapshots rows, so the window is bounded by the schedule, never
  * by data volume); `valid_to` is the `lead` of `valid_from` over the
  * surviving change points. Total cost = one shuffle on the dimension
  * key over #snapshots × |table| rows — at 100 TB the snapshots
  * themselves arrive pre-partitioned from the snapshot store, and the
  * union preserves that layout into the window exchange.
  *
  * State comparison is NULL-SAFE (`<=>`): a column transitioning
  * null→value or value→null is a change; first appearance of a key
  * (a mid-history ADD) always opens a row.
  */
object Scd {

  /** Generic builder: `snapshots(i)` is the dimension at version i
    * (ascending). Output: key, stateCols, `valid_from`/`valid_to`
    * version interval (valid_to null = open), `is_current` 'T'/'F'. */
  def type2FromSnapshots(snapshots: Seq[DataFrame], key: String,
                         stateCols: Seq[String]): DataFrame = {
    require(snapshots.nonEmpty, "need at least one snapshot")
    val tagged = snapshots.zipWithIndex.map { case (df, v) =>
      df.select((col(key) +: stateCols.map(col)) :+ lit(v.toLong).as("version"): _*)
    }.reduce(_ unionByName _)
    val w = Window.partitionBy(key).orderBy("version")
    // first-ever row for the key (lag(version) null) OR any state
    // column differing null-safely from the previous version
    val changed = stateCols
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _) || lag(col("version"), 1).over(w).isNull
    val hist = tagged.withColumn("_chg", changed)
      .filter(col("_chg"))
      .withColumnRenamed("version", "valid_from")
      .drop("_chg")
    val w2 = Window.partitionBy(key).orderBy("valid_from")
    hist
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", when(col("valid_to").isNull, "T").otherwise("F"))
  }

  /** INCREMENTAL maintenance: fold snapshot `version` into an
    * existing Type-2 history WITHOUT re-reading earlier snapshots —
    * the production regime (the batch builder above is the bootstrap /
    * oracle surface). Closed rows pass through UNTOUCHED; only the
    * open (current) slice joins the arriving snapshot — one key
    * shuffle over |current| + |snapshot| rows, never over history.
    * A key absent from the new snapshot keeps its open row (no
    * observation is not a change); a changed key closes at `version`
    * and reopens; a new key opens. Fold-equivalence to the batch
    * builder is spec-pinned. */
  def applyIncrement(history: DataFrame, snapshot: DataFrame, version: Long,
                     key: String, stateCols: Seq[String]): DataFrame = {
    val closed = history.filter(col("valid_to").isNotNull)
    val cur = history.filter(col("valid_to").isNull)
    val snap = snapshot.select((col(key) +: stateCols.map(col)): _*)
    val joined = cur.alias("c")
      .join(snap.alias("n"), col(s"c.$key") === col(s"n.$key"), "full_outer")
    val differs = stateCols
      .map(c => !(col(s"c.$c") <=> col(s"n.$c"))).reduce(_ || _)
    val bothSides = col(s"c.$key").isNotNull && col(s"n.$key").isNotNull
    // open rows that survive as-is: key unchanged, or key unobserved
    val stillOpen = joined
      .filter(col(s"n.$key").isNull || (bothSides && !differs))
      .select(cur.columns.map(c => col(s"c.$c")): _*)
    // changed keys: close the old row at `version`
    val closing = joined.filter(bothSides && differs)
      .select(cur.columns.map {
        case "valid_to"   => lit(version).as("valid_to")
        case "is_current" => lit("F").as("is_current")
        case c            => col(s"c.$c")
      }: _*)
    // changed + brand-new keys: open a row at `version`
    val opening = joined
      .filter((bothSides && differs) || col(s"c.$key").isNull)
      .select(cur.columns.map {
        case `key`        => col(s"n.$key").as(key)
        case "valid_from" => lit(version).as("valid_from")
        case "valid_to"   => lit(null).cast("long").as("valid_to")
        case "is_current" => lit("T").as("is_current")
        case c if stateCols.contains(c) => col(s"n.$c").as(c)
        case c            => col(s"c.$c")
      }: _*)
    closed.unionByName(stillOpen).unionByName(closing).unionByName(opening)
  }

  /** The registered binding: Type-2 history over the synthetic CDC
    * chain — version 0 = the base table, version 1 = after month 1's
    * change file, version 2 = after month 2's (the exact states
    * `q_cdc_replay` folds through). Internal math stays decimal;
    * price surfaces as DOUBLE (the ReferenceOps representation
    * convention). */
  private def cdcSnapshots(spark: SparkSession, dir: String): Seq[DataFrame] = {
    val base = Cdc.baseTable(spark, dir)
    val c1 = Cdc.changeSet(spark, dir).withColumnRenamed("new_price", "price")
    val c2 = Cdc.changeSet2(spark, dir).withColumnRenamed("new_price", "price")
    val s1 = CdcMerge.applyAll(base, Seq(c1), key = "o_orderkey",
      compareCols = Seq("price"))
    val s2 = CdcMerge.applyAll(base, Seq(c1, c2), key = "o_orderkey",
      compareCols = Seq("price"))
    Seq(base, s1, s2)
  }

  private def surface(h: DataFrame): DataFrame =
    h.select(col("o_orderkey"), col("valid_from").cast(LongType),
        col("valid_to").cast(LongType),
        col("price").cast(DoubleType).as("price"),
        col("is_deleted"), col("is_current"))
      .orderBy("o_orderkey", "valid_from")

  def cdcHistory(spark: SparkSession, dir: String): DataFrame = {
    val snaps = cdcSnapshots(spark, dir)
    surface(type2FromSnapshots(snaps, key = "o_orderkey",
      stateCols = Seq("price", "is_deleted")))
  }

  /** Point-in-time read — the INVERSE of the builder: reconstruct
    * the dimension exactly as it stood at `version` from the history
    * alone (`valid_from ≤ v < valid_to`, open = ∞). One partition-
    * prunable filter, no join; this is why a warehouse keeps Type-2
    * history instead of snapshots. */
  def asOf(history: DataFrame, version: Long): DataFrame =
    history.filter(col("valid_from") <= version &&
      (col("valid_to").isNull || col("valid_to") > version))

  /** Registered: the history read as of version 1 must equal the
    * month-1 snapshot itself — proven against the SAME chained-merge
    * oracle state (`s1`), one truth, derivations in both directions. */
  def cdcHistoryAsOf1(spark: SparkSession, dir: String): DataFrame = {
    val snaps = cdcSnapshots(spark, dir)
    val hist = type2FromSnapshots(snaps, key = "o_orderkey",
      stateCols = Seq("price", "is_deleted"))
    asOf(hist, 1L)
      .select(col("o_orderkey"),
        col("price").cast(DoubleType).as("price"), col("is_deleted"))
      .orderBy("o_orderkey")
  }

  /** The incremental plan under the SAME oracle: bootstrap the
    * history from versions 0-1 with the batch builder, fold version 2
    * in with [[applyIncrement]] — one truth, two maintenance plans
    * (the CDC-merge discipline applied to dimension history). */
  def cdcHistoryIncremental(spark: SparkSession, dir: String): DataFrame = {
    val snaps = cdcSnapshots(spark, dir)
    val boot = type2FromSnapshots(snaps.take(2), key = "o_orderkey",
      stateCols = Seq("price", "is_deleted"))
    surface(applyIncrement(boot, snaps(2), version = 2L,
      key = "o_orderkey", stateCols = Seq("price", "is_deleted")))
  }
}

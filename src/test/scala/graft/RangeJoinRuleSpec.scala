package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** plans.RangeJoinRewrite: the naive bounded-interval join becomes
  * the bucketed equi-join INSIDE the optimizer — same rows as the
  * nested-loop plan, no nested loop in sight. */
class RangeJoinRuleSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def executed(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def hasNestedLoop(df: DataFrame): Boolean = {
    val p = executed(df)
    p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct")
  }

  // probe instants engineered around bucket boundaries (span = 100):
  // negatives, exact lo, lo+span-1, lo+span (excluded), bucket edges
  private val probes = Seq(-250L, -101L, -100L, -1L, 0L, 1L, 99L, 100L,
    101L, 150L, 199L, 200L, 250L, 399L, 1000L)
  private val los = Seq(-200L, -100L, 0L, 100L, 300L)

  private lazy val probeDf = probes.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("pid", "t")
  private lazy val winDf = los.zipWithIndex
    .map { case (lo, i) => (100L + i, lo) }.toDF("wid", "lo")

  private def brute(span: Long): Set[(Long, Long)] = (for {
    (t, i) <- probes.zipWithIndex
    (lo, j) <- los.zipWithIndex
    if t >= lo && t < lo + span
  } yield (i.toLong, 100L + j)).toSet

  test("long-arithmetic naive interval join: no nested loop, rows equal brute force") {
    val joined = probeDf.join(winDf,
      probeDf("t") >= winDf("lo") && probeDf("t") < winDf("lo") + 100L)
    assert(!hasNestedLoop(joined), s"rule did not fire:\n${executed(joined)}")
    val got = joined.select("pid", "wid").as[(Long, Long)].collect().toSet
    assert(got === brute(100L))
  }

  test("commuted orientations rewrite too") {
    // lo <= t (commuted ge), lo + K > t (commuted lt), literal-first Add
    val joined = probeDf.join(winDf,
      winDf("lo") <= probeDf("t") && lit(100L) + winDf("lo") > probeDf("t"))
    assert(!hasNestedLoop(joined), s"rule did not fire:\n${executed(joined)}")
    val got = joined.select("pid", "wid").as[(Long, Long)].collect().toSet
    assert(got === brute(100L))
  }

  test("timestamp + day-time-interval naive join rewrites and matches the operator") {
    val events = graft.sources.Tables.events(spark, sf)
    val windows = graft.operators.RangeJoin.alertWindows(events)
    val naive = events.select(col("event_id"), col("ts")).join(windows,
        col("ts") >= col("lo") && col("ts") < col("lo") + expr("INTERVAL 2 HOURS"))
      .filter(col("event_id") =!= col("window_id"))
      .select("window_id", "event_id")
    assert(!hasNestedLoop(naive), s"rule did not fire:\n${executed(naive)}")
    val viaRule = naive.as[(Long, Long)].collect().toSet
    val viaOperator = graft.operators.RangeJoin.eventRangeJoin(spark, sf)
      .as[(Long, Long)].collect().toSet
    assert(viaRule === viaOperator)
    assert(viaRule.nonEmpty)
  }

  test("null endpoints drop, exactly like the naive join") {
    val p = Seq((1L, Some(50L)), (2L, None: Option[Long])).toDF("pid", "t")
    val w = Seq((10L, Some(0L)), (11L, None: Option[Long])).toDF("wid", "lo")
    val joined = p.join(w, p("t") >= w("lo") && p("t") < w("lo") + 100L)
    assert(!hasNestedLoop(joined))
    assert(joined.select("pid", "wid").as[(Long, Long)].collect().toSet
      === Set((1L, 10L)))
  }

  test("residual conjuncts survive the rewrite") {
    val joined = probeDf.join(winDf,
      probeDf("t") >= winDf("lo") && probeDf("t") < winDf("lo") + 100L &&
        winDf("wid") =!= 102L)
    assert(!hasNestedLoop(joined))
    val got = joined.select("pid", "wid").as[(Long, Long)].collect().toSet
    assert(got === brute(100L).filterNot(_._2 == 102L))
  }

  test("joins the rule must NOT touch are left alone") {
    // an existing cross-side equality: hash join already; plan stays equi
    val keyed = probeDf.join(winDf, probeDf("pid") === winDf("wid"))
    assert(!hasNestedLoop(keyed))
    // unbounded upper (column-to-column, no literal span): stays nested loop
    val unbounded = probeDf.join(winDf,
      probeDf("t") >= winDf("lo") && probeDf("t") < winDf("wid"))
    assert(hasNestedLoop(unbounded))
    // non-positive span: rewrite skipped, naive yields empty
    val empty = probeDf.join(winDf,
      probeDf("t") >= winDf("lo") && probeDf("t") < winDf("lo") + 0L)
    assert(empty.count() === 0L)
    // outer joins keep their semantics (rule is Inner-only)
    val outer = probeDf.join(winDf,
      probeDf("t") >= winDf("lo") && probeDf("t") < winDf("lo") + 100L, "left")
    assert(outer.count() >= probes.size)
  }

  test("the rewritten plan shuffles on the bucket, not the data volume") {
    val joined = probeDf.join(winDf,
      probeDf("t") >= winDf("lo") && probeDf("t") < winDf("lo") + 100L)
    val plan = executed(joined)
    // a real join with an equi key (shuffled hash / sort-merge / bcast hash)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
    // the generator expanded windows into their covered buckets
    assert(plan.contains("Generate") || plan.contains("explode"), plan)
  }
}

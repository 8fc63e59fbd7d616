package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Sinks, Tags}

/** TIMESTAMP AS OF time travel: newest-commit-at-or-before resolution
  * over commit-marker mtimes, refuse-don't-guess at both ends of the
  * retained range, the connector option, and the SQL spelling through
  * the graft catalog. */
class TimestampTravelSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def df(vals: Long*) = vals.map(v => (v, java.sql.Date.valueOf("2024-01-15")))
    .toDF("val", "transaction_date")

  /** Three versions with commit times planted minutes apart; returns
    * (table, t0) where version v committed at t0 − (4 − v) minutes. */
  private def timeline(): (String, Long) = {
    val tbl = graft.util.Scratch.dir("ts_travel") + "/t"
    (1 to 3).foreach(i =>
      Sinks.publishSnapshot(df(i * 10L), "transaction_date", tbl, retainVersions = 8))
    val t0 = System.currentTimeMillis()
    // plant in the PAST: later publishes in these tests commit at real
    // now, which must sort after every planted moment
    (1L to 3L).foreach(v =>
      Sinks.plantCommitTime(spark, tbl, v, t0 - (4L - v) * 60000L))
    (tbl, t0)
  }

  test("resolution: newest commit at or before the asked moment; exact hit inclusive") {
    val (tbl, t0) = timeline()
    assert(Sinks.versionAsOfTimestamp(spark, tbl, t0 - 150000L) === 1L)
    assert(Sinks.versionAsOfTimestamp(spark, tbl, t0 - 120000L) === 2L) // exact mtime
    assert(Sinks.versionAsOfTimestamp(spark, tbl, t0 + 999999999L) === 3L)
  }

  test("refuse-don't-guess: before the first commit, and before the retained window") {
    val (tbl, t0) = timeline()
    intercept[java.io.FileNotFoundException] {
      Sinks.versionAsOfTimestamp(spark, tbl, t0 - 240000L)
    }
    // prune v1..v3; a timestamp that used to resolve to v1 now refuses
    // instead of silently serving the oldest survivor
    Sinks.publishSnapshot(df(40L), "transaction_date", tbl, retainVersions = 1)
    intercept[java.io.FileNotFoundException] {
      Sinks.versionAsOfTimestamp(spark, tbl, t0 - 150000L)
    }
    intercept[java.io.FileNotFoundException] {
      Sinks.versionAsOfTimestamp(spark, graft.util.Scratch.dir("ts_none") + "/t", 0L)
    }
  }

  test("a tag pin extends timestamp resolution past retention") {
    val (tbl, t0) = timeline()
    Tags.createTag(spark, tbl, "keep", Some(1L))
    Sinks.publishSnapshot(df(40L), "transaction_date", tbl, retainVersions = 1)
    // v1 survives via the pin — and so does its commit time
    assert(Sinks.versionAsOfTimestamp(spark, tbl, t0 - 150000L) === 1L)
  }

  test("connector option: epoch millis and date forms; exclusive with versionAsOf") {
    val (tbl, t0) = timeline()
    assert(spark.read.format("graft-table")
      .option("timestampAsOf", (t0 - 90000L).toString).load(tbl)
      .select("val").as[Long].head() === 20L)
    intercept[IllegalArgumentException] {
      spark.read.format("graft-table")
        .option("timestampAsOf", (t0 - 90000L).toString)
        .option("versionAsOf", "1").load(tbl)
    }
    intercept[IllegalArgumentException] {
      spark.read.format("graft-table")
        .option("timestampAsOf", "not-a-time").load(tbl)
    }
  }

  test("SQL: TIMESTAMP AS OF through the graft catalog resolves the planted moment") {
    val (tbl, t0) = timeline()
    val asOf = new java.sql.Timestamp(t0 - 90000L).toString
    assert(spark.sql(s"SELECT val FROM graft.`$tbl` TIMESTAMP AS OF '$asOf'")
      .as[Long].head() === 20L)
    // and the live read still serves the head
    assert(spark.sql(s"SELECT val FROM graft.`$tbl`").as[Long].head() === 30L)
  }
}

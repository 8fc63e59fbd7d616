package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.scalatest.funsuite.AnyFunSuite

/** plans.MetaAggregate: whole-table count/min/max answered from the
  * committed stats manifest with NO data scan — and, just as
  * important, every refusal path falling through to the ordinary
  * (correct) read. */
class MetaAggregateSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def metadataOnly(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.isInstanceOf[LocalRelation])

  /** A store whose single version carries stats on every column:
    * k long, s string, price double, d date, s_n nullable string
    * (null on k % 3 == 0), all_n an ALL-null long. */
  private lazy val store: String = {
    val t = graft.util.Scratch.dir("metaagg_store")
    val df = spark.range(0, 100)
      .selectExpr("id AS k", "concat('v', lpad(id, 4, '0')) AS s",
        "CAST(id AS DOUBLE) * 1.5 + 10.0 AS price",
        "date_add(DATE '2024-01-01', CAST(id AS INT)) AS d",
        "CASE WHEN id % 3 = 0 THEN NULL ELSE concat('n', id) END AS s_n",
        "CAST(NULL AS BIGINT) AS all_n")
    Sinks.publishSnapshot(df, "d", t,
      statsCols = Seq("k", "s", "price", "d", "s_n", "all_n"))
    t
  }
  private def Sinks = graft.sources.Sinks

  test("whole-table aggregates are served from the manifest: one LocalRelation, no scan") {
    val df = spark.sql(
      s"""SELECT count(*) AS n, count(s_n) AS n_sn, min(k) AS min_k, max(k) AS max_k,
         |       min(s) AS min_s, max(s) AS max_s, min(price) AS min_p, max(price) AS max_p,
         |       min(d) AS min_d, max(d) AS max_d
         |FROM graft.`$store`""".stripMargin)
    assert(metadataOnly(df), df.queryExecution.optimizedPlan.treeString)
    val r = df.collect().head
    assert(r.getLong(0) == 100L)
    assert(r.getLong(1) == 66L) // 34 multiples of 3 in [0, 100) are null
    assert(r.getLong(2) == 0L && r.getLong(3) == 99L)
    assert(r.getString(4) == "v0000" && r.getString(5) == "v0099")
    assert(r.getDouble(6) == 10.0 && r.getDouble(7) == 99 * 1.5 + 10.0)
    assert(r.getDate(8).toString == "2024-01-01" && r.getDate(9).toString == "2024-04-09")
  }

  test("an all-null column decisively serves NULL min/max and exact count") {
    val df = spark.sql(
      s"SELECT count(all_n) AS n, min(all_n) AS mn, max(all_n) AS mx FROM graft.`$store`")
    assert(metadataOnly(df), df.queryExecution.optimizedPlan.treeString)
    val r = df.collect().head
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("a filter refuses the rewrite and the scan answers") {
    val df = spark.sql(s"SELECT count(*) AS n FROM graft.`$store` WHERE k >= 50")
    assert(!metadataOnly(df))
    assert(df.collect().head.getLong(0) == 50L)
  }

  test("DISTINCT refuses the rewrite") {
    val df = spark.sql(s"SELECT count(DISTINCT s) AS n FROM graft.`$store`")
    assert(!metadataOnly(df))
    assert(df.collect().head.getLong(0) == 100L)
  }

  test("a version published without stats refuses and still answers") {
    val t = graft.util.Scratch.dir("metaagg_nostats")
    Sinks.publishSnapshot(
      Seq((1L, "2024-01-05"), (2L, "2024-02-05")).toDF("k", "ds")
        .selectExpr("k", "CAST(ds AS DATE) AS d"), "d", t)
    val df = spark.sql(s"SELECT count(*) AS n, max(k) AS mx FROM graft.`$t`")
    assert(!metadataOnly(df))
    val r = df.collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
  }

  test("a chain head refuses: the manifest describes pre-merge files") {
    val t = graft.util.Scratch.dir("metaagg_chain")
    val df = spark.range(0, 20)
      .selectExpr("id AS k", "date_add(DATE '2024-01-01', CAST(id AS INT)) AS d")
    Sinks.publishSnapshot(df, "d", t, statsCols = Seq("k"))
    graft.sources.DeletionVectors.publishDeletes(
      spark, t, Seq(0L, 19L).toDF("k"), "k")
    val q = spark.sql(s"SELECT count(*) AS n, min(k) AS mn, max(k) AS mx FROM graft.`$t`")
    assert(!metadataOnly(q))
    val r = q.collect().head
    // the MERGED truth, not the stale manifest's 20/0/19
    assert(r.getLong(0) == 18L && r.getLong(1) == 1L && r.getLong(2) == 18L)
  }

  test("a pinned versionAsOf read serves from ITS version's manifest") {
    val t = graft.util.Scratch.dir("metaagg_pinned")
    def frame(n: Long) = spark.range(0, n)
      .selectExpr("id AS k", "date_add(DATE '2024-01-01', CAST(id % 28 AS INT)) AS d")
    Sinks.publishSnapshot(frame(10), "d", t, statsCols = Seq("k"))
    Sinks.publishSnapshot(frame(30), "d", t, statsCols = Seq("k"))
    val pinned = spark.read.format("graft-table").option("versionAsOf", "1")
      .load(t).agg(org.apache.spark.sql.functions.count("*").as("n"),
        org.apache.spark.sql.functions.max("k").as("mx"))
    assert(metadataOnly(pinned), pinned.queryExecution.optimizedPlan.treeString)
    val r = pinned.collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == 9L)
    val live = spark.sql(s"SELECT count(*) AS n FROM graft.`$t`")
    assert(metadataOnly(live) && live.collect().head.getLong(0) == 30L)
    // the SQL time-travel spelling binds the same pinned resolution
    val sqlPinned = spark.sql(
      s"SELECT count(*) AS n, max(k) AS mx FROM graft.`$t` VERSION AS OF 1")
    assert(metadataOnly(sqlPinned), sqlPinned.queryExecution.optimizedPlan.treeString)
    val sr = sqlPinned.collect().head
    assert(sr.getLong(0) == 10L && sr.getLong(1) == 9L)
  }

  test("multi-row-group files collect (serialized-domain merge) and aggregate exactly") {
    // small row groups force several blocks per file — the chunk-merge
    // path inside FileStats.statOf that single-block fixtures never
    // reach (it used to compare a serialized string as a runtime bound
    // and threw for numeric columns)
    val t = graft.util.Scratch.dir("metaagg_blocks")
    val df = spark.range(0, 20000).repartition(1)
      .selectExpr("id AS k", "concat('pad-', lpad(id, 12, '0'), repeat('x', 40)) AS s",
        "DATE '2024-03-01' AS d")
    Sinks.publishSnapshot(df, "d", t, statsCols = Seq("k", "s"),
      writerOptions = Map("parquet.block.size" -> "65536",
        "parquet.page.size" -> "8192"))
    val q = spark.sql(
      s"SELECT count(*) AS n, min(k) AS mn, max(k) AS mx, max(s) AS mxs FROM graft.`$t`")
    assert(metadataOnly(q), q.queryExecution.optimizedPlan.treeString)
    val r = q.collect().head
    assert(r.getLong(0) == 20000L && r.getLong(1) == 0L && r.getLong(2) == 19999L)
    assert(r.getString(3) == "pad-000000019999" + "x" * 40)
  }

  test("the registered query is metadata-only at the plan level") {
    val df = graft.sources.FileStats.metaAggregate(spark, sf)
    assert(metadataOnly(df), df.queryExecution.optimizedPlan.treeString)
    assert(df.count() == 1)
  }

  test("GROUP BY the partition column serves one manifest-summed row per month") {
    spark.read.format("graft-table").load(store).createOrReplaceTempView("mas_path")
    val sql =
      """SELECT txn_month, count(*) AS n, count(s_n) AS n_sn, min(k) AS mn, max(k) AS mx,
        |       min(s) AS mns, max(price) AS mxp, max(d) AS mxd
        |FROM mas_path %s GROUP BY txn_month""".stripMargin
    val served = spark.sql(sql.format(""))
    assert(metadataOnly(served), served.queryExecution.optimizedPlan.treeString)
    // scan truth: an always-true filter refuses the rewrite, same rows
    val scanned = spark.sql(sql.format("WHERE k >= 0"))
    assert(!metadataOnly(scanned))
    assert(served.collect().toSet == scanned.collect().toSet)
    assert(served.count() == 4) // 2024-01 .. 2024-04
  }

  test("partition-column facts are path-derived: count/min/max of txn_month serve") {
    spark.read.format("graft-table").load(store).createOrReplaceTempView("mas_path")
    val df = spark.sql(
      "SELECT count(txn_month) AS n, min(txn_month) AS mn, max(txn_month) AS mx FROM mas_path")
    assert(metadataOnly(df), df.queryExecution.optimizedPlan.treeString)
    val r = df.collect().head
    assert(r.getLong(0) == 100L && r.getString(1) == "2024-01" && r.getString(2) == "2024-04")
  }

  test("grouping by a payload column refuses: values vary inside files") {
    spark.read.format("graft-table").load(store).createOrReplaceTempView("mas_path")
    val df = spark.sql("SELECT s_n, count(*) AS n FROM mas_path GROUP BY s_n")
    assert(!metadataOnly(df))
    assert(df.collect().map(_.getLong(1)).sum == 100L)
  }

  test("a null-date default partition groups as NULL and serves exactly") {
    val t = graft.util.Scratch.dir("metaagg_nullmonth")
    val df = spark.range(0, 10)
      .selectExpr("id AS k",
        "CASE WHEN id >= 8 THEN NULL ELSE date_add(DATE '2024-06-01', CAST(id AS INT)) END AS d")
    Sinks.publishSnapshot(df, "d", t, statsCols = Seq("k", "d"))
    spark.read.format("graft-table").load(t).createOrReplaceTempView("mas_nullm")
    val q = spark.sql(
      """SELECT txn_month, count(*) AS n, count(d) AS nd, min(k) AS mn
        |FROM mas_nullm GROUP BY txn_month""".stripMargin)
    assert(metadataOnly(q), q.queryExecution.optimizedPlan.treeString)
    val rows = q.collect().map(r =>
      (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows == Set((Some("2024-06"), 8L, 8L, 0L), (None, 2L, 0L, 8L)))
    // whole-table over the same store: count(txn_month) skips the
    // default partition's rows, count(*) does not
    val w = spark.sql(
      "SELECT count(*) AS n, count(txn_month) AS nm, min(txn_month) AS mn FROM mas_nullm")
    assert(metadataOnly(w))
    val wr = w.collect().head
    assert(wr.getLong(0) == 10L && wr.getLong(1) == 8L && wr.getString(2) == "2024-06")
  }

  test("evolution renames never mis-key the manifest: live answers the new names, pinned the old") {
    val t = graft.util.Scratch.dir("metaagg_evo")
    val df = spark.range(0, 50)
      .selectExpr("id AS a", "CAST(1000 - id AS BIGINT) AS b",
        "date_add(DATE '2024-05-01', CAST(id % 7 AS INT)) AS d")
    Sinks.publishSnapshot(df, "d", t, statsCols = Seq("a", "b"))
    // shift names so a live name re-uses an OLD name for DIFFERENT
    // data: after (b→c, a→b), logical b is the old a column — serving
    // v1's manifest entry 'b' (951..1000) for it would be a mis-key
    spark.sql(s"ALTER TABLE graft.`$t` RENAME COLUMN b TO c")
    spark.sql(s"ALTER TABLE graft.`$t` RENAME COLUMN a TO b")
    val live = spark.sql(s"SELECT min(b) AS mn_b, max(b) AS mx_b, max(c) AS mx_c FROM graft.`$t`")
    val r = live.collect().head
    assert(r.getLong(0) == 0L && r.getLong(1) == 49L && r.getLong(2) == 1000L,
      "live aggregates must reflect the renamed (old-a) data, never v1's 'b' stats")
    // the pinned v1 read binds v1's OWN schema and manifest
    val pinned = spark.sql(
      s"SELECT min(a) AS mn_a, max(b) AS mx_b FROM graft.`$t` VERSION AS OF 1")
    assert(metadataOnly(pinned), pinned.queryExecution.optimizedPlan.treeString)
    val p = pinned.collect().head
    assert(p.getLong(0) == 0L && p.getLong(1) == 1000L)
  }

  test("repeat queries hit the facts cache: one manifest parse per version") {
    val t = graft.util.Scratch.dir("metaagg_cache")
    val df = spark.range(0, 40)
      .selectExpr("id AS k", "date_add(DATE '2024-07-01', CAST(id % 5 AS INT)) AS d")
    Sinks.publishSnapshot(df, "d", t, statsCols = Seq("k"))
    def q() = spark.sql(s"SELECT count(*) AS n, max(k) AS mx FROM graft.`$t`")
    assert(metadataOnly(q()))
    val afterFirst = graft.plans.MetaAggregate.parsesOf(t)
    assert(afterFirst >= 1L)
    (1 to 3).foreach { _ =>
      val r = q().collect().head
      assert(r.getLong(0) == 40L && r.getLong(1) == 39L)
    }
    assert(graft.plans.MetaAggregate.parsesOf(t) == afterFirst,
      "repeat optimizations of the same version must not re-parse the manifest")
  }

  test("the registered monthly query is metadata-only at the plan level") {
    val df = graft.sources.FileStats.metaAggregateMonthly(spark, sf)
    assert(metadataOnly(df), df.queryExecution.optimizedPlan.treeString)
    assert(df.count() >= 1)
  }
}

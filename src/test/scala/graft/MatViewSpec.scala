package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.MatViews
import graft.sources.{DeletionVectors, Sinks}

/** Materialized-view auto-rewrite ([[graft.plans.MatViewRewrite]]):
  * aggregates over a registered graft store answer from the
  * maintained view — exact grain, rollups, grain-determined filters —
  * and every unsafe shape (stale view, pinned read, non-derivable
  * aggregate, non-grain filter) leaves the plan alone. Results are
  * asserted equal between the rewritten plan and the base-table
  * truth in every case: the rewrite is an optimization, never a
  * correctness dependency. */
class MatViewSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Does the optimized plan still read the base store? After
    * GraftScanInline the store surfaces as parquet scans under its own
    * path (no graft relation survives optimization), so the detector
    * checks BOTH spellings: a graft relation (pre/post pushdown) or a
    * file scan rooted inside the store directory. */
  private def readsBase(df: DataFrame, path: String): Boolean =
    df.queryExecution.optimizedPlan.exists {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table.isInstanceOf[graft.sources.GraftTable]
      case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        s.relation.table.isInstanceOf[graft.sources.GraftTable]
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.exists(_.toString.contains(path))
          case _ => false
        }
      case _ => false
    }

  /** A store with two months of keyed rows plus a MoR delete link,
    * and its monthly (n_live, sum_price) view written as parquet. */
  private def fixture(): (String, String) = {
    val root = graft.util.Scratch.dir("mv_spec")
    val t = s"$root/t"
    val rows = (1L to 40L).map { i =>
      (i, java.sql.Date.valueOf(if (i % 2 == 0) "2024-01-15" else "2024-02-15"),
        java.math.BigDecimal.valueOf(i * 100L, 2))
    }.toDF("k", "d", "p").withColumn("p", col("p").cast("decimal(18,2)"))
    Sinks.publishSnapshot(rows, "d", t, retainVersions = 100)
    DeletionVectors.publishDeletes(spark, t,
      Seq(2L, 4L).toDF("k"), "k") // v2: live state loses two Jan rows
    val view = s"$root/view"
    spark.sql(s"SELECT * FROM graft.`$t`")
      .groupBy(trunc(col("d"), "month").as("month"))
      .agg(count(lit(1)).as("n_live"),
        sum("p").cast("decimal(18,2)").as("sum_price"))
      .coalesce(1).write.mode("overwrite").parquet(view)
    (t, view)
  }

  test("exact grain, rollup and grain filter all answer from the view") {
    val (t, view) = fixture()
    try {
      MatViews.register(spark, t, view, asOfVersion = 2L,
        groups = Seq("month" -> trunc(col("d"), "month")),
        countCol = Some("n_live"), sums = Seq("sum_price" -> col("p")))
      // exact grain
      val exact = spark.sql(s"SELECT trunc(d, 'month') AS month, COUNT(*) AS n, " +
        s"SUM(p) AS s FROM graft.`$t` GROUP BY 1 ORDER BY 1")
      assert(!readsBase(exact, t), s"exact grain must rewrite:\n${exact.queryExecution}")
      // Jan = even k (sum 420) minus the deleted 2+4; Feb = odd k (sum 400)
      assert(exact.collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getDecimal(2).doubleValue())).toSeq ==
        Seq(("2024-01-01", 18L, 414.0), ("2024-02-01", 20L, 400.0)))
      // rollup to a coarser grain (yearly) + global total
      val yearly = spark.sql(s"SELECT year(trunc(d, 'month')) AS yr, COUNT(*) AS n " +
        s"FROM graft.`$t` GROUP BY 1")
      assert(!readsBase(yearly, t), "rollup must rewrite")
      assert(yearly.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
        Seq((2024, 38L)))
      val global = spark.sql(s"SELECT COUNT(*) AS n, SUM(p) AS s FROM graft.`$t`")
      assert(!readsBase(global, t), "global aggregate must rewrite")
      assert(global.collect().map(r => (r.getLong(0),
        r.getDecimal(1).doubleValue())).toSeq == Seq((38L, 814.0)))
      // grain-determined filter commutes with the grouping
      val filtered = spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$t` " +
        s"WHERE trunc(d, 'month') = DATE'2024-02-01'")
      assert(!readsBase(filtered, t), "grain filter must rewrite")
      assert(filtered.as[Long].collect().toSeq == Seq(20L))
    } finally MatViews.unregister(t)
  }

  test("the feed maintainer keeps the rewrite armed across source commits") {
    val root = graft.util.Scratch.dir("mv_live")
    val t = s"$root/t"
    val rows = (1L to 20L).map { i =>
      (i, java.sql.Date.valueOf("2024-01-15"),
        java.math.BigDecimal.valueOf(i * 100L, 2))
    }.toDF("k", "d", "p").withColumn("p", col("p").cast("decimal(18,2)"))
    Sinks.publishSnapshot(rows, "d", t, retainVersions = 100)
    def drain(): Unit = graft.streaming.FeedView.runFeedAgg(spark, t,
      s"$root/state", s"$root/ckpt", dateCol = "d", priceCol = "p",
      availableNow = true, registerView = true).awaitTermination()
    def census() = spark.sql(s"SELECT COUNT(*) AS n, SUM(p) AS s FROM graft.`$t`")
    try {
      // caught up: the maintainer registered the fold → view-served
      drain()
      val a = census()
      assert(!readsBase(a, t), "a caught-up maintainer must arm the rewrite")
      assert(a.collect().map(r => (r.getLong(0),
        r.getDecimal(1).doubleValue())).toSeq == Seq((20L, 210.0)))
      // the source commits past the view: STALE by the version check —
      // the same query silently reads the base and stays correct
      DeletionVectors.publishDeletes(spark, t, Seq(1L).toDF("k"), "k")
      val b = census()
      assert(readsBase(b, t), "an unfolded commit must disarm the rewrite")
      assert(b.collect().map(r => (r.getLong(0),
        r.getDecimal(1).doubleValue())).toSeq == Seq((19L, 209.0)))
      // the maintainer catches up: advance re-arms the rewrite
      drain()
      val c = census()
      assert(!readsBase(c, t), "the fold must re-arm the rewrite")
      assert(c.collect().map(r => (r.getLong(0),
        r.getDecimal(1).doubleValue())).toSeq == Seq((19L, 209.0)))
    } finally MatViews.unregister(t)
  }

  test("registration through SQL: CALL register_view / unregister_view") {
    val (t, view) = fixture()
    try {
      val reg = spark.sql(s"CALL graft.system.register_view(table => '$t', " +
        s"view_path => '$view', as_of_version => 2, " +
        "groups => 'month:trunc(d, ''month'')', count_col => 'n_live', " +
        "sums => 'sum_price:p')").collect()
      assert(reg.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
        Seq((t, view, 2L)))
      val q = spark.sql(s"SELECT COUNT(*) AS n, SUM(p) AS s FROM graft.`$t`")
      assert(!readsBase(q, t), "SQL-registered view must arm the rewrite")
      assert(q.collect().map(r => (r.getLong(0),
        r.getDecimal(1).doubleValue())).toSeq == Seq((38L, 814.0)))
      spark.sql(s"CALL graft.system.unregister_view(table => '$t')")
      val back = spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$t`")
      assert(readsBase(back, t) && back.head().getLong(0) == 38L,
        "unregistering must return aggregates to the base read")
    } finally MatViews.unregister(t)
  }

  /** Fixture view extended with the per-operand non-null count column
    * (`cnt_p`) that makes `count(p)` and `avg(p)` derivable. */
  private def fixtureWithCounts(): (String, String) = {
    val (t, _) = fixture()
    val view = s"${t.stripSuffix("/t")}/view_cnt"
    spark.sql(s"SELECT * FROM graft.`$t`")
      .groupBy(trunc(col("d"), "month").as("month"))
      .agg(count(lit(1)).as("n_live"), count(col("p")).as("cnt_p"),
        sum("p").cast("decimal(18,2)").as("sum_price"))
      .coalesce(1).write.mode("overwrite").parquet(view)
    (t, view)
  }

  test("count(col) and avg derive from a counts-and-sums view, bit-exact") {
    val (t, view) = fixtureWithCounts()
    try {
      MatViews.register(spark, t, view, asOfVersion = 2L,
        groups = Seq("month" -> trunc(col("d"), "month")),
        countCol = Some("n_live"), sums = Seq("sum_price" -> col("p")),
        counts = Seq("cnt_p" -> col("p")))
      // truth from the base merged state directly (never touches the
      // catalog, so the rewrite cannot fire on the oracle side)
      def pinnedTruth(agg: String) = DeletionVectors.readMergedAt(spark, t, 2L)
        .groupBy(trunc(col("d"), "month").as("month")).agg(expr(agg).as("x"))
        .orderBy("month")
      val avgQ = spark.sql(s"SELECT trunc(d, 'month') AS month, AVG(p) AS x " +
        s"FROM graft.`$t` GROUP BY 1 ORDER BY 1")
      assert(!readsBase(avgQ, t), s"avg must rewrite:\n${avgQ.queryExecution}")
      assert(avgQ.collect().toSeq == pinnedTruth("avg(p)").collect().toSeq,
        "rewritten avg must be bit-identical to the base aggregate")
      val cntQ = spark.sql(s"SELECT trunc(d, 'month') AS month, COUNT(p) AS x " +
        s"FROM graft.`$t` GROUP BY 1 ORDER BY 1")
      assert(!readsBase(cntQ, t), "count(col) must rewrite")
      assert(cntQ.collect().toSeq == pinnedTruth("count(p)").collect().toSeq)
      // global (no GROUP BY) avg + count(col) — empty-view Sum folds
      val globalQ = spark.sql(s"SELECT AVG(p) AS a, COUNT(p) AS c FROM graft.`$t`")
      assert(!readsBase(globalQ, t), "global avg must rewrite")
      assert(globalQ.collect().toSeq ==
        DeletionVectors.readMergedAt(spark, t, 2L)
          .agg(avg("p").as("a"), count(col("p")).as("c")).collect().toSeq)
      // count(NULL) must NOT become the row count (COUNT skips nulls)
      val nullQ = spark.sql(s"SELECT COUNT(NULL) AS n FROM graft.`$t`")
      assert(nullQ.as[Long].head() == 0L, "COUNT(NULL) is 0")
      // avg of a non-registered operand refuses
      assert(readsBase(spark.sql(s"SELECT AVG(k) AS a FROM graft.`$t`"), t))
    } finally MatViews.unregister(t)
  }

  test("a registration persists in table metadata across a process boundary") {
    val (t, view) = fixture()
    try {
      MatViews.register(spark, t, view, asOfVersion = 2L,
        groups = Seq("month" -> trunc(col("d"), "month")),
        countCol = Some("n_live"), sums = Seq("sum_price" -> col("p")))
      assert(!readsBase(spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$t`"), t))
      // a fresh JVM has an empty cache — the registration must arm
      // from the table's own _views metadata alone
      MatViews.clear()
      val q = spark.sql(s"SELECT trunc(d, 'month') AS month, COUNT(*) AS n, " +
        s"SUM(p) AS s FROM graft.`$t` GROUP BY 1 ORDER BY 1")
      assert(!readsBase(q, t),
        "a persisted registration must re-arm after the cache is dropped " +
        "(the restart-crossing contract)")
      assert(q.collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getDecimal(2).doubleValue())).toSeq ==
        Seq(("2024-01-01", 18L, 414.0), ("2024-02-01", 20L, 400.0)))
      // the registration is visible through the SQL surface
      val shown = spark.sql(s"CALL graft.system.show_views(table => '$t')").collect()
      assert(shown.map(r => (r.getString(3), r.getString(4))).toSet ==
        Set(("group", "month"), ("count_star", "n_live"), ("sum", "sum_price")))
      assert(shown.forall(r => r.getString(0) == "registration" &&
        r.getString(1) == view && r.getLong(2) == 2L))
      // unregister removes the file: a fresh cache finds nothing
      MatViews.unregister(t)
      MatViews.clear()
      assert(readsBase(spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$t`"), t))
      assert(spark.sql(s"CALL graft.system.show_views(table => '$t')").isEmpty)
    } finally MatViews.unregister(t)
  }

  test("several named views arm one table; each query picks a serving grain") {
    val (t, monthly) = fixture()
    val root = t.stripSuffix("/t")
    // second registration at DAILY grain, via the NAMED DDL spelling
    val daily = s"$root/view_daily"
    try {
      MatViews.register(spark, t, monthly, asOfVersion = 2L,
        groups = Seq("month" -> trunc(col("d"), "month")),
        countCol = Some("n_live"), sums = Seq("sum_price" -> col("p")),
        name = "by_month")
      spark.sql(s"CREATE MATERIALIZED VIEW '$daily' NAMED by_day AS " +
        s"SELECT d AS day, COUNT(*) AS n FROM graft.`$t` GROUP BY 1")
      // a DAILY query only the daily view can serve
      val dq = spark.sql(s"SELECT d AS day, COUNT(*) AS n FROM graft.`$t` " +
        "GROUP BY 1 ORDER BY 1")
      assert(!readsBase(dq, t), s"daily grain must serve from by_day:\n${dq.queryExecution}")
      assert(dq.collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSeq ==
        Seq(("2024-01-15", 18L), ("2024-02-15", 20L)))
      // a MONTHLY sum only the monthly view can serve (daily has no sums)
      val mq = spark.sql(s"SELECT trunc(d, 'month') AS month, SUM(p) AS s " +
        s"FROM graft.`$t` GROUP BY 1 ORDER BY 1")
      assert(!readsBase(mq, t), "monthly sum must serve from by_month")
      assert(mq.collect().map(r => (r.getDate(0).toString,
        r.getDecimal(1).doubleValue())).toSeq ==
        Seq(("2024-01-01", 414.0), ("2024-02-01", 400.0)))
      // both registrations visible, independently droppable
      val shown = spark.sql(s"CALL graft.system.show_views(table => '$t')").collect()
      assert(shown.map(_.getString(0)).toSet == Set("by_month", "by_day"))
      spark.sql(s"DROP MATERIALIZED VIEW FOR '$t' NAMED by_day")
      val dq2 = spark.sql(s"SELECT d AS day, COUNT(*) AS n FROM graft.`$t` GROUP BY 1")
      assert(readsBase(dq2, t), "daily grain must fall back once by_day is dropped")
      assert(!readsBase(spark.sql(
        s"SELECT trunc(d, 'month') AS m, COUNT(*) AS n FROM graft.`$t` GROUP BY 1"), t),
        "by_month must survive by_day's drop")
    } finally MatViews.unregister(t)
  }

  test("min/max serve from the feed-maintained view, deletes of extremes repaired") {
    val root = graft.util.Scratch.dir("mv_minmax")
    val t = s"$root/t"
    // k=1..20, price = k*1.00 in one month; k=21..30 in a second month
    val rows = (1L to 30L).map { i =>
      (i, java.sql.Date.valueOf(if (i <= 20) "2024-01-15" else "2024-02-15"),
        java.math.BigDecimal.valueOf(i * 100L, 2))
    }.toDF("k", "d", "p").withColumn("p", col("p").cast("decimal(18,2)"))
    Sinks.publishSnapshot(rows, "d", t, retainVersions = 100)
    def drain(): Unit = graft.streaming.FeedView.runFeedAgg(spark, t,
      s"$root/state", s"$root/ckpt", dateCol = "d", priceCol = "p",
      availableNow = true, registerView = true).awaitTermination()
    def minmax() = spark.sql(s"SELECT trunc(d, 'month') AS month, " +
      s"MIN(p) AS mn, MAX(p) AS mx FROM graft.`$t` GROUP BY 1 ORDER BY 1")
    def truthAt(v: Long) = DeletionVectors.readMergedAt(spark, t, v)
      .groupBy(trunc(col("d"), "month").as("month"))
      .agg(min("p").as("mn"), max("p").as("mx")).orderBy("month")
    try {
      drain()
      val a = minmax()
      assert(!readsBase(a, t), s"min/max must rewrite:\n${a.queryExecution}")
      assert(a.collect().toSeq == truthAt(1L).collect().toSeq)
      // delete BOTH extremes of January (k=1 min holder, k=20 max
      // holder) plus a middle row — the fold must mark the group dirty
      // and recompute it from the base, not least/greatest its way past
      DeletionVectors.publishDeletes(spark, t,
        Seq(1L, 20L, 10L).toDF("k"), "k") // v2
      drain()
      val b = minmax()
      assert(!readsBase(b, t), "the fold must re-arm after the delete commit")
      assert(b.collect().toSeq == truthAt(2L).collect().toSeq,
        "deleted extremes must be repaired from the base")
      assert(b.collect().map(r => (r.getDate(0).toString,
        r.getDecimal(1).doubleValue(), r.getDecimal(2).doubleValue())).toSeq ==
        Seq(("2024-01-01", 2.0, 19.0), ("2024-02-01", 21.0, 30.0)))
      // an upsert RAISING the max (k=25 -> 99.00) folds without a
      // recompute (arrivals only improve extremes)
      DeletionVectors.publishUpsert(spark, t,
        Seq((25L, java.sql.Date.valueOf("2024-02-15"),
          new java.math.BigDecimal("99.00"))).toDF("k", "d", "p")
          .withColumn("p", col("p").cast("decimal(18,2)")),
        "k", Seq.empty[Long].toDF("k").limit(0), validate = false) // v3
      drain()
      val c = minmax()
      assert(!readsBase(c, t))
      assert(c.collect().toSeq == truthAt(3L).collect().toSeq)
      // a GLOBAL max rolls up from the monthly extremes
      val g = spark.sql(s"SELECT MAX(p) AS mx FROM graft.`$t`")
      assert(!readsBase(g, t), "global max must rewrite")
      assert(g.collect().head.getDecimal(0).doubleValue() == 99.0)
      // an unregistered extremum operand still refuses
      assert(readsBase(spark.sql(s"SELECT MAX(k) AS m FROM graft.`$t`"), t))
    } finally MatViews.unregister(t)
  }

  test("fault isolation: no registration problem may break a base query") {
    val (t, view) = fixture()
    val viewsDir = s"$t/_views"
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def write(name: String, content: String): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(viewsDir, name), true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }
    def census() = spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$t`")
    try {
      // 1) corrupt file in _views: skipped, query unbroken; a healthy
      //    sibling registration still serves
      MatViews.register(spark, t, view, asOfVersion = 2L,
        groups = Seq("month" -> trunc(col("d"), "month")),
        countCol = Some("n_live"), sums = Seq("sum_price" -> col("p")))
      write("corrupt", "not a registration at all\n garbage")
      MatViews.clear() // force re-read of every file
      val a = census()
      assert(!readsBase(a, t),
        "the healthy registration must still serve past a corrupt sibling")
      assert(a.as[Long].head() == 38L)
      // 2) FRESH registration whose binding no longer resolves (the
      //    post-evolution shape): skipped, base read, correct result
      write("registration",
        "v1\nview\t" + view + "\nversion\t2\ngroup\tmonth\ttrunc(no_such_col, 'month')\n" +
        "count_star\tn_live\n")
      MatViews.clear()
      val b = census()
      assert(readsBase(b, t), "an unresolvable fresh binding must fall back to base")
      assert(b.as[Long].head() == 38L)
      // 3) view parquet dir deleted out from under a live registration
      MatViews.unregister(t)
      MatViews.register(spark, t, view, asOfVersion = 2L,
        groups = Seq("month" -> trunc(col("d"), "month")),
        countCol = Some("n_live"), sums = Seq("sum_price" -> col("p")))
      fs.delete(new org.apache.hadoop.fs.Path(view), true)
      val c = census()
      assert(readsBase(c, t), "a deleted view dir must fall back to base")
      assert(c.as[Long].head() == 38L)
      // 4) STALE registration with an unresolvable binding: the version
      //    check fires BEFORE resolution (lazy norm), so the query never
      //    even tries to analyze the dead SQL
      write("registration",
        "v1\nview\t" + view + "\nversion\t1\ngroup\tmonth\ttrunc(no_such_col, 'month')\n" +
        "count_star\tn_live\n")
      MatViews.clear()
      val d = census()
      assert(readsBase(d, t) && d.as[Long].head() == 38L,
        "a stale registration must never need its bindings resolved")
    } finally MatViews.unregister(t)
  }

  test("several serving views: the coarsest grain (least view data) wins") {
    // 360 rows over 120 distinct days in 4 months: the daily view is
    // genuinely ~30× the monthly one, like production grains are
    val root = graft.util.Scratch.dir("mv_cost")
    val t = s"$root/t"
    val rows = (0L until 360L).map { i =>
      (i, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i % 120)),
        java.math.BigDecimal.valueOf((i + 1) * 100L, 2))
    }.toDF("k", "d", "p").withColumn("p", col("p").cast("decimal(18,2)"))
    Sinks.publishSnapshot(rows, "d", t, retainVersions = 100)
    def viewOf(path: String, grain: org.apache.spark.sql.Column, as: String): Unit =
      spark.sql(s"SELECT * FROM graft.`$t`")
        .groupBy(grain.as(as))
        .agg(count(lit(1)).as("n_live"),
          sum("p").cast("decimal(18,2)").as("sum_price"))
        .coalesce(1).write.mode("overwrite").parquet(path)
    // daily sibling named to SORT FIRST — name order would pick it;
    // cost order must pick the monthly view for a global/yearly rollup
    val daily = s"$root/view_daily"
    val monthly = s"$root/view_monthly"
    viewOf(daily, col("d"), "day")
    viewOf(monthly, trunc(col("d"), "month"), "month")
    try {
      MatViews.register(spark, t, daily, asOfVersion = 1L,
        groups = Seq("day" -> col("d")),
        countCol = Some("n_live"), sums = Seq("sum_price" -> col("p")),
        name = "aa_daily")
      MatViews.register(spark, t, monthly, asOfVersion = 1L,
        groups = Seq("month" -> trunc(col("d"), "month")),
        countCol = Some("n_live"), sums = Seq("sum_price" -> col("p")),
        name = "zz_monthly")
      // a GLOBAL aggregate is servable from both views
      val q = spark.sql(s"SELECT COUNT(*) AS n, SUM(p) AS s FROM graft.`$t`")
      assert(!readsBase(q, t), "both views fresh — the rewrite must fire")
      def scans(df: DataFrame, path: String): Boolean =
        df.queryExecution.optimizedPlan.exists {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            l.relation match {
              case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                h.location.rootPaths.exists(_.toString.contains(path))
              case _ => false
            }
          case _ => false
        }
      assert(scans(q, monthly),
        s"cost order must pick the monthly view over the name-first daily one:\n" +
        s"${q.queryExecution.optimizedPlan}")
      // sum(1..360) * 1.00 = 64980.00
      assert(q.collect().map(r => (r.getLong(0),
        r.getDecimal(1).doubleValue())).toSeq == Seq((360L, 64980.0)))
      // the daily grain is servable only by the daily view — cost
      // ordering must not break single-server dispatch
      val dq = spark.sql(s"SELECT d AS day, COUNT(*) AS n FROM graft.`$t` GROUP BY 1")
      assert(!readsBase(dq, t) && scans(dq, daily) && dq.count() == 120L)
    } finally MatViews.unregister(t)
  }

  test("same-length advance states never serve a stale cached definition") {
    val (t, view) = fixture()
    try {
      MatViews.register(spark, t, view, asOfVersion = 2L,
        groups = Seq("month" -> trunc(col("d"), "month")),
        countCol = Some("n_live"), sums = Seq("sum_price" -> col("p")))
      // v2 -> v3 serializes to the SAME natural length (fixed-width
      // digits); the persist pad must still move the (mtime, length)
      // stamp, and the padded file must round-trip through lookup
      assert(MatViews.advance(spark, t, view, asOfVersion = 3L))
      DeletionVectors.publishDeletes(spark, t, Seq(6L).toDF("k"), "k") // v3
      MatViews.clear() // force a re-parse: the padded file must round-trip
      val q = spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$t`")
      assert(!readsBase(q, t), "the advanced registration must serve at v3")
      // the view wasn't re-folded in this synthetic advance, so only
      // the plan shape is pinned here — drop before result checks
    } finally MatViews.unregister(t)
  }

  test("registration refuses a view that retains empty groups") {
    val (t, _) = fixture()
    val bad = s"${t.stripSuffix("/t")}/view_bad"
    spark.sql(s"SELECT * FROM graft.`$t`")
      .groupBy(trunc(col("d"), "month").as("month"))
      .agg(count(lit(1)).as("n_live"), sum("p").cast("decimal(18,2)").as("sum_price"))
      .unionByName(Seq((java.sql.Date.valueOf("2030-01-01"), 0L,
        new java.math.BigDecimal(0))).toDF("month", "n_live", "sum_price")
        .select(col("month"), col("n_live"), col("sum_price").cast("decimal(18,2)")))
      .coalesce(1).write.mode("overwrite").parquet(bad)
    val e = intercept[IllegalArgumentException] {
      MatViews.register(spark, t, bad, asOfVersion = 2L,
        groups = Seq("month" -> trunc(col("d"), "month")),
        countCol = Some("n_live"), sums = Seq("sum_price" -> col("p")))
    }
    assert(e.getMessage.contains("phantom rows"))
    assert(readsBase(spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$t`"), t),
      "a refused registration must leave nothing armed")
  }

  test("unsafe shapes read the base: stale view, pinned read, non-derivable bits") {
    val (t, view) = fixture()
    try {
      MatViews.register(spark, t, view, asOfVersion = 2L,
        groups = Seq("month" -> trunc(col("d"), "month")),
        countCol = Some("n_live"), sums = Seq("sum_price" -> col("p")))
      def q(sql: String): DataFrame = spark.sql(sql)
      // non-grain filter must not commute
      val f = q(s"SELECT COUNT(*) AS n FROM graft.`$t` WHERE k > 20")
      assert(readsBase(f, t) && f.as[Long].head() == 20L)
      // min/max and count(col) are not derivable from counts-and-sums
      assert(readsBase(q(s"SELECT MAX(p) AS m FROM graft.`$t`"), t))
      assert(readsBase(q(s"SELECT COUNT(p) AS n FROM graft.`$t`"), t))
      // DISTINCT refuses
      assert(readsBase(q(s"SELECT COUNT(DISTINCT p) AS n FROM graft.`$t`"), t))
      // a differently-written group expression is best-effort: no match
      assert(readsBase(q(s"SELECT year(d) AS y, COUNT(*) AS n FROM graft.`$t` GROUP BY 1"), t))
      // version-pinned reads never match the live view
      val pinned = spark.read.format("graft-table")
        .option("versionAsOf", "1").load(t)
        .groupBy(trunc(col("d"), "month")).agg(count(lit(1)).as("n"))
      assert(readsBase(pinned, t), "a pinned read must not rewrite")
      assert(pinned.select("n").as[Long].collect().sorted.toSeq == Seq(20L, 20L))
      // stale: a new commit moves the head past the view
      DeletionVectors.publishDeletes(spark, t, Seq(6L).toDF("k"), "k") // v3
      val stale = q(s"SELECT COUNT(*) AS n FROM graft.`$t`")
      assert(readsBase(stale, t), "a stale view must stop matching")
      assert(stale.as[Long].head() == 37L)
    } finally MatViews.unregister(t)
  }
}

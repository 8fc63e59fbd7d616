package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{DeletionVectors, Sinks}

/** The DSv2 WRITE surface and SQL row-level operations of the
  * snapshot store: DataFrame bootstrap/append/overwrite through
  * `format("graft-table")`, INSERT INTO / INSERT OVERWRITE / MERGE
  * INTO / UPDATE / DELETE through the path-addressed `graft` catalog,
  * branch-routed writes, and the O(changes) MoR commit shape of every
  * append and row-level operation. */
class SqlWritePathSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def df(rows: (Long, String, Double)*) =
    rows.toDF("k", "s", "p")
      .withColumn("d", to_date(lit("2024-03-15")))
      .select("k", "d", "s", "p")

  private def stateOf(t: String): Map[Long, (String, Double)] =
    spark.sql(s"SELECT k, s, p FROM graft.`$t`").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap

  test("bootstrap + append through the DataFrame writer") {
    val t = graft.util.Scratch.dir("sqlw_df") + "/t"
    // bootstrap: first publish through the provider write path
    df((1L, "a", 1.0), (2L, "b", 2.0)).write.format("graft-table")
      .option("dateCol", "d").mode("overwrite").save(t)
    assert(Sinks.currentVersion(spark, t).contains(1L))
    assert(spark.read.format("graft-table").load(t).count() == 2)
    // append: an O(batch) MoR link — version 2 is a chain commit, the
    // base version dir is untouched
    df((3L, "c", 3.0)).write.format("graft-table").mode("append").save(t)
    assert(Sinks.currentVersion(spark, t).contains(2L))
    assert(Sinks.versionMeta(spark, t, 2L).contains("dv"), "append must be a MoR link")
    val merged = DeletionVectors.readMerged(spark, t)
    assert(merged.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // the catalog read serves the chain head MERGED
    assert(stateOf(t) == Map(1L -> ("a", 1.0), 2L -> ("b", 2.0), 3L -> ("c", 3.0)))
    // overwrite folds back to a plain full-replace version
    df((9L, "z", 9.0)).write.format("graft-table")
      .option("dateCol", "d").mode("overwrite").save(t)
    assert(stateOf(t) == Map(9L -> ("z", 9.0)))
    assert(spark.read.format("graft-table").load(t)
      .select("k").as[Long].collect().toSeq == Seq(9L))
  }

  test("INSERT INTO appends as a MoR link; INSERT OVERWRITE full-replaces") {
    val t = graft.util.Scratch.dir("sqlw_ins") + "/t"
    df((1L, "a", 1.0)).write.format("graft-table")
      .option("dateCol", "d").mode("overwrite").save(t)
    spark.sql(s"INSERT INTO graft.`$t` SELECT 2L AS k, DATE'2024-03-16' AS d, " +
      "'b' AS s, 2.5D AS p")
    assert(Sinks.versionMeta(spark, t, 2L).contains("dv"))
    assert(stateOf(t) == Map(1L -> ("a", 1.0), 2L -> ("b", 2.5)))
    spark.sql(s"INSERT OVERWRITE graft.`$t` SELECT 7L AS k, DATE'2024-03-17' AS d, " +
      "'w' AS s, 7.0D AS p")
    assert(stateOf(t) == Map(7L -> ("w", 7.0)))
    // the overwrite is a plain data version again (no chain)
    assert(!Sinks.versionMeta(spark, t,
      Sinks.currentVersion(spark, t).get).contains("dv"))
  }

  test("MERGE INTO routes to one MoR commit: update + delete + insert") {
    val t = graft.util.Scratch.dir("sqlw_merge") + "/t"
    df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, "e", 4.0))
      .write.format("graft-table").option("dateCol", "d").mode("overwrite").save(t)
    df((1L, "A", 11.0), (3L, "DEL", 0.0), (5L, "n", 5.0))
      .withColumn("op", when(col("s") === "DEL", "D").otherwise("U"))
      .createOrReplaceTempView("sqlw_changes")
    spark.sql(
      s"""MERGE INTO graft.`$t` tgt USING sqlw_changes c ON tgt.k = c.k
         |WHEN MATCHED AND c.op = 'D' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET s = c.s, p = c.p, d = c.d
         |WHEN NOT MATCHED THEN INSERT (k, d, s, p) VALUES (c.k, c.d, c.s, c.p)
         |""".stripMargin)
    // exactly ONE new version, and it is a MoR link (base untouched)
    assert(Sinks.currentVersion(spark, t).contains(2L))
    assert(Sinks.versionMeta(spark, t, 2L).contains("dv"), "MERGE must commit as MoR")
    assert(stateOf(t) == Map(
      1L -> ("A", 11.0), 2L -> ("b", 2.0), 4L -> ("e", 4.0), 5L -> ("n", 5.0)))
    // a second MERGE scans the CHAIN HEAD (merged V1 scan) and chains on
    df((2L, "B2", 22.0), (6L, "f", 6.0)).withColumn("op", lit("U"))
      .createOrReplaceTempView("sqlw_changes2")
    spark.sql(
      s"""MERGE INTO graft.`$t` tgt USING sqlw_changes2 c ON tgt.k = c.k
         |WHEN MATCHED THEN UPDATE SET s = c.s, p = c.p, d = c.d
         |WHEN NOT MATCHED THEN INSERT (k, d, s, p) VALUES (c.k, c.d, c.s, c.p)
         |""".stripMargin)
    assert(Sinks.currentVersion(spark, t).contains(3L))
    assert(stateOf(t) == Map(
      1L -> ("A", 11.0), 2L -> ("B2", 22.0), 4L -> ("e", 4.0),
      5L -> ("n", 5.0), 6L -> ("f", 6.0)))
  }

  test("DELETE FROM and UPDATE become vector/upsert links") {
    val t = graft.util.Scratch.dir("sqlw_rowops") + "/t"
    df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .write.format("graft-table").option("dateCol", "d").mode("overwrite").save(t)
    spark.sql(s"DELETE FROM graft.`$t` WHERE k = 2")
    assert(Sinks.versionMeta(spark, t, 2L).contains("dv"))
    assert(stateOf(t) == Map(1L -> ("a", 1.0), 3L -> ("c", 3.0)))
    spark.sql(s"UPDATE graft.`$t` SET p = p + 10.0 WHERE k = 3")
    assert(stateOf(t) == Map(1L -> ("a", 1.0), 3L -> ("c", 13.0)))
    // three versions total: base + delete link + update link
    assert(Sinks.currentVersion(spark, t).contains(3L))
    // materialization folds the SQL-written chain back to one scan
    DeletionVectors.materializeDeletes(spark, t, "d", retainVersions = 4)
    assert(spark.read.format("graft-table").load(t)
      .select("k").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("VERSION AS OF reads through the catalog; writes can target a branch") {
    val t = graft.util.Scratch.dir("sqlw_asof") + "/t"
    df((1L, "a", 1.0)).write.format("graft-table")
      .option("dateCol", "d").mode("overwrite").save(t)
    df((2L, "b", 2.0)).write.format("graft-table")
      .option("dateCol", "d").mode("overwrite").save(t)
    assert(spark.sql(s"SELECT k FROM graft.`$t` VERSION AS OF 1")
      .as[Long].collect().toSeq == Seq(1L))
    assert(spark.sql(s"SELECT k FROM graft.`$t`").as[Long].collect().toSeq == Seq(2L))
    // branch-routed write: staged on the ref, invisible to main
    graft.sources.Branches.createBranch(spark, t, "stage")
    df((8L, "s", 8.0)).write.format("graft-table")
      .option("branch", "stage").mode("append").save(t)
    assert(spark.sql(s"SELECT k FROM graft.`$t`").as[Long].collect().toSeq == Seq(2L))
    assert(graft.sources.Branches.readBranch(spark, t, "stage")
      .select("k").as[Long].collect().sorted.toSeq == Seq(2L, 8L))
  }

  test("two racing MERGEs: at most one commits per head, the loser aborts cleanly and a retry lands") {
    val t = graft.util.Scratch.dir("sqlw_race") + "/t"
    df((1L, "a", 1.0), (2L, "b", 2.0)).write.format("graft-table")
      .option("dateCol", "d").mode("overwrite").save(t)
    df((1L, "X", 11.0)).createOrReplaceTempView("race_c1")
    df((2L, "Y", 22.0)).createOrReplaceTempView("race_c2")
    def stmt(view: String) =
      s"""MERGE INTO graft.`$t` tgt USING $view c ON tgt.k = c.k
         |WHEN MATCHED THEN UPDATE SET s = c.s, p = c.p, d = c.d
         |WHEN NOT MATCHED THEN INSERT (k, d, s, p) VALUES (c.k, c.d, c.s, c.p)
         |""".stripMargin
    def isOcc(e: Throwable): Boolean = {
      var c: Throwable = e
      while (c != null) {
        if (c.isInstanceOf[graft.sources.ConcurrentSnapshotUpdate]) return true
        c = c.getCause
      }
      false
    }
    // race the two statements; each either commits or aborts with OCC —
    // never a torn/partial merge, never a silent chain onto a moved head
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val outcomes = Await.result(
      Future.sequence(Seq("race_c1", "race_c2").map(v => Future {
        try { spark.sql(stmt(v)); None }
        catch { case e: Throwable if isOcc(e) => Some(v) }
      })), 5.minutes).toList
    // the loser (if the race was real and not serialized) retries cleanly
    outcomes.flatten.foreach(v => spark.sql(stmt(v)))
    assert(stateOf(t) == Map(1L -> ("X", 11.0), 2L -> ("Y", 22.0)),
      s"both merges must land (aborted: ${outcomes.flatten.mkString(",")})")
    assert(outcomes.flatten.size <= 1, "at most one side of the race aborts")
  }

  test("CALL procedures: history / restore / expire_snapshots through SQL") {
    val t = graft.util.Scratch.dir("sqlw_proc") + "/t"
    df((1L, "a", 1.0), (2L, "b", 2.0)).write.format("graft-table")
      .option("dateCol", "d").option("retainVersions", "100")
      .mode("overwrite").save(t)
    spark.sql(s"INSERT INTO graft.`$t` SELECT 3L AS k, DATE'2024-03-16' AS d, " +
      "'c' AS s, 3.0D AS p") // v2: MoR link
    // DESCRIBE HISTORY as a result set: versions, kinds, parents, live
    val h = spark.sql(s"CALL graft.system.history(table => '$t')")
      .orderBy("version").collect()
    assert(h.map(r => (r.getLong(0), r.getString(2),
      if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSeq ==
      Seq((1L, "data", -1L, false), (2L, "upsert-link", 1L, true)))
    assert(h.forall(!_.isNullAt(1)), "commit_time populated")
    // RESTORE through SQL: rollback to v1 as a NEW commit (v3)
    val r = spark.sql(s"CALL graft.system.restore(table => '$t', version => 1, " +
      "date_col => 'd', retain_versions => 100)").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq == Seq((1L, 3L)))
    assert(stateOf(t) == Map(1L -> ("a", 1.0), 2L -> ("b", 2.0)))
    // expire through SQL: nothing is old, so everything classifies kept
    val led = spark.sql(s"CALL graft.system.expire_snapshots(table => '$t', " +
      "older_than_ms => 86400000)").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(led == Map(1L -> "kept:recent", 2L -> "kept:recent", 3L -> "kept:recent"))
    // destructive-DDL refusal stands alongside the named verbs
    intercept[UnsupportedOperationException] { spark.sql(s"DROP TABLE graft.`$t`") }
    // unknown verbs and foreign namespaces refuse loudly (Spark wraps
    // the loader's message in FAILED_TO_LOAD_ROUTINE)
    val noSuch = intercept[Exception] {
      spark.sql(s"CALL graft.system.compact(table => '$t')")
    }
    def chain(x: Throwable): Seq[Throwable] =
      Iterator.iterate(x)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(noSuch).exists(c => c.getMessage != null &&
      (c.getMessage.contains("no procedure") ||
        c.getMessage.contains("FAILED_TO_LOAD_ROUTINE"))), noSuch.getMessage)
    intercept[Exception] { spark.sql(s"CALL graft.other.history(table => '$t')") }
  }

  test("CALL procedures: optimize / vacuum through SQL") {
    val t = graft.util.Scratch.dir("sqlw_opt") + "/t"
    df((1L, "a", 1.0), (2L, "b", 2.0)).write.format("graft-table")
      .option("dateCol", "d").option("retainVersions", "100")
      .mode("overwrite").save(t)
    df((3L, "c", 3.0)).write.format("graft-table").mode("append").save(t)
    val preState = stateOf(t)
    // OPTIMIZE through SQL: folds the v2 MoR chain, bin-packs, commits
    // as a new version; the merged state is content-neutral
    val led = spark.sql(s"CALL graft.system.optimize(table => '$t', " +
      "date_col => 'd')").collect()
    assert(led.length == 1)
    val (compacted, committed, fb, fa, bytes) = (led(0).getLong(0),
      led(0).getLong(1), led(0).getLong(2), led(0).getLong(3), led(0).getLong(4))
    assert(compacted == 2L && committed > compacted)
    assert(fb >= 1L && fa >= 1L && bytes > 0L)
    assert(Sinks.currentVersion(spark, t).contains(committed))
    assert(!Sinks.versionMeta(spark, t, committed).contains("dv"),
      "optimize must land a plain folded data version, not another link")
    assert(stateOf(t) == preState, "compaction is content-neutral")
    // z-order variant: same contract, clustered layout
    val led2 = spark.sql(s"CALL graft.system.optimize(table => '$t', " +
      "date_col => 'd', zorder => 'k,p')").collect()
    assert(led2(0).getLong(1) > committed && stateOf(t) == preState)
    // VACUUM through SQL: reclaims planted crash debris (an abandoned
    // written-never-marked dir + an orphan claim), never touches
    // committed history
    val abandoned = Sinks.plantAbandonedVersion(df((8L, "x", 8.0)), "d", t)
    val orphan = Sinks.plantOrphanClaim(spark, t)
    val vled = spark.sql(s"CALL graft.system.vacuum(table => '$t', " +
      "older_than_ms => -1000)").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(vled == Map(abandoned -> "abandoned_dir", orphan -> "orphan_claim"))
    assert(stateOf(t) == preState, "vacuum touches nothing marked")
  }

  test("CALL procedures: constraint lifecycle through SQL") {
    val t = graft.util.Scratch.dir("sqlw_ck") + "/t"
    df((1L, "a", 1.0), (2L, "b", 2.0)).write.format("graft-table")
      .option("dateCol", "d").option("retainVersions", "100")
      .mode("overwrite").save(t)
    val added = spark.sql(s"CALL graft.system.add_constraint(table => '$t', " +
      "name => 'p_pos', check_expr => 'p > 0')").collect()
    assert(added.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("p_pos", "p > 0")))
    // a violating SQL INSERT refuses through the constraint
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$t` SELECT 3L AS k, DATE'2024-03-16' AS d, " +
        "'c' AS s, -1.0D AS p")
    }
    def chain(x: Throwable): Seq[Throwable] =
      Iterator.iterate(x)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e).exists(
      _.isInstanceOf[graft.sources.ConstraintViolation]), e.toString)
    assert(stateOf(t) == Map(1L -> ("a", 1.0), 2L -> ("b", 2.0)))
    val shown = spark.sql(s"CALL graft.system.show_constraints(table => '$t')")
      .collect()
    assert(shown.map(_.getString(0)).toSeq == Seq("p_pos"))
    val dropped = spark.sql(s"CALL graft.system.drop_constraint(table => '$t', " +
      "name => 'p_pos')").collect()
    assert(dropped.isEmpty)
    // unbound again: the previously-refused row lands
    spark.sql(s"INSERT INTO graft.`$t` SELECT 3L AS k, DATE'2024-03-16' AS d, " +
      "'c' AS s, -1.0D AS p")
    assert(stateOf(t).keySet == Set(1L, 2L, 3L))
  }

  test("CALL table_detail: one operational summary row") {
    val t = graft.util.Scratch.dir("sqlw_detail") + "/t"
    df((1L, "a", 1.0), (2L, "b", 2.0)).write.format("graft-table")
      .option("dateCol", "d").option("retainVersions", "100")
      .mode("overwrite").save(t)
    spark.sql(s"INSERT INTO graft.`$t` SELECT 3L AS k, DATE'2024-03-16' AS d, " +
      "'c' AS s, 3.0D AS p") // v2: an upsert link — live state is a chain
    spark.sql(s"ALTER TABLE graft.`$t` ADD CONSTRAINT p_pos CHECK (p > 0)")
    val r = spark.sql(s"CALL graft.system.table_detail(table => '$t')").head()
    assert(r.getString(0) == t)
    assert(r.getLong(1) == 2L && r.getString(2) == "upsert-link")
    assert(r.getLong(3) == 2L, "two committed versions")
    assert(r.getLong(4) == 2L, "live chain closure: link + base")
    assert(r.getLong(5) > 0L && r.getLong(6) > 0L, "files and bytes counted")
    assert(r.getString(7) == "k", "chain merge key surfaced")
    assert(r.getLong(8) == 1L && r.getLong(9) == 0L &&
      r.getLong(10) == 0L && r.getLong(11) == 0L,
      "1 constraint, no views/branches/tags yet")
  }

  test("standard DDL: ALTER TABLE ADD/DROP CONSTRAINT … CHECK") {
    val t = graft.util.Scratch.dir("sqlw_ddl") + "/t"
    df((1L, "a", 1.0), (2L, "b", 2.0)).write.format("graft-table")
      .option("dateCol", "d").option("retainVersions", "100")
      .mode("overwrite").save(t)
    // the ANSI spelling lands in the same _constraints namespace the
    // procedures and the library maintain
    spark.sql(s"ALTER TABLE graft.`$t` ADD CONSTRAINT p_pos CHECK (p > 0)")
    assert(graft.sources.Constraints.constraintsOf(spark, t).keySet == Set("p_pos"))
    // …and binds every writer: a violating INSERT refuses pre-marker
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$t` SELECT 3L AS k, DATE'2024-03-16' AS d, " +
        "'c' AS s, -1.0D AS p")
    }
    def chain(x: Throwable): Seq[Throwable] =
      Iterator.iterate(x)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e).exists(
      _.isInstanceOf[graft.sources.ConstraintViolation]), e.toString)
    // ADD over violating existing data refuses (Spark's own exec scans
    // the merged state before the catalog persists anything)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$t` ADD CONSTRAINT p_big CHECK (p > 100)")
    }
    assert(graft.sources.Constraints.constraintsOf(spark, t).keySet == Set("p_pos"),
      "a refused ADD must persist nothing")
    // DROP: unknown refuses, IF EXISTS tolerates, real drop unbinds
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$t` DROP CONSTRAINT no_such")
    }
    spark.sql(s"ALTER TABLE graft.`$t` DROP CONSTRAINT IF EXISTS no_such")
    spark.sql(s"ALTER TABLE graft.`$t` DROP CONSTRAINT p_pos")
    assert(graft.sources.Constraints.constraintsOf(spark, t).isEmpty)
    spark.sql(s"INSERT INTO graft.`$t` SELECT 3L AS k, DATE'2024-03-16' AS d, " +
      "'c' AS s, -1.0D AS p")
    assert(stateOf(t).keySet == Set(1L, 2L, 3L))
  }

  test("CALL drop_table: ledgered destruction; DDL DROP TABLE still refuses") {
    val t = graft.util.Scratch.dir("sqlw_drop") + "/t"
    df((1L, "a", 1.0), (2L, "b", 2.0)).write.format("graft-table")
      .option("dateCol", "d").option("retainVersions", "100")
      .mode("overwrite").save(t)
    df((3L, "c", 3.0)).write.format("graft-table").mode("append").save(t) // v2 link
    // generic DDL destruction keeps refusing — destruction is a verb
    intercept[Exception] { spark.sql(s"DROP TABLE graft.`$t`") }
    assert(Sinks.currentVersion(spark, t).contains(2L))
    // a tag pins history: the verb refuses, naming it
    graft.sources.Tags.createTag(spark, t, "keepme", Some(1L))
    val tagged = intercept[Exception] {
      spark.sql(s"CALL graft.system.drop_table(table => '$t')")
    }
    assert(tagged.getMessage.contains("keepme"), tagged.getMessage)
    graft.sources.Tags.deleteTag(spark, t, "keepme")
    // a live branch refuses likewise
    graft.sources.Branches.createBranch(spark, t, "wip")
    val branched = intercept[Exception] {
      spark.sql(s"CALL graft.system.drop_table(table => '$t')")
    }
    assert(branched.getMessage.contains("wip"), branched.getMessage)
    graft.sources.Branches.deleteBranch(spark, t, "wip")
    // unpinned: the drop returns the removed ledger and the tree is gone
    val ledger = spark.sql(s"CALL graft.system.drop_table(table => '$t')").collect()
    assert(ledger.length == 1)
    val r = ledger.head
    assert(r.getString(0) == t && r.getLong(1) == 2L, r.toString) // v1 + v2 link
    assert(r.getLong(2) > 0L && r.getLong(3) > 0L, "files/bytes ledger must be real")
    assert(!new java.io.File(t).exists(), "the table tree must be removed")
    // dropping again refuses loudly (nothing to drop)
    intercept[Exception] {
      spark.sql(s"CALL graft.system.drop_table(table => '$t')")
    }
  }

  test("CTAS / RTAS: CREATE TABLE AS SELECT bootstraps, REPLACE publishes next version") {
    val base = graft.util.Scratch.dir("sqlw_ctas")
    val t = s"$base/t"
    // CTAS bootstraps a new store atomically (dateCol from OPTIONS)
    spark.sql(
      s"""CREATE TABLE graft.`$t` OPTIONS (dateCol 'd') AS
         |SELECT 1L AS k, DATE'2024-03-15' AS d, 'a' AS s, 1.0D AS p""".stripMargin)
    assert(Sinks.currentVersion(spark, t).contains(1L))
    assert(stateOf(t) == Map(1L -> ("a", 1.0)))
    // CREATE of an existing table refuses (standard semantics)
    val dup = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$t` AS SELECT 2L AS k, DATE'2024-03-16' AS d, " +
        "'b' AS s, 2.0D AS p")
    }
    assert(dup.getMessage.toLowerCase.contains("already exists"), dup.getMessage)
    // REPLACE TABLE AS SELECT publishes the NEXT version — history
    // keeps serving v1
    spark.sql(
      s"""REPLACE TABLE graft.`$t` AS
         |SELECT 7L AS k, DATE'2024-04-01' AS d, 'z' AS s, 7.0D AS p""".stripMargin)
    assert(Sinks.currentVersion(spark, t).contains(2L))
    assert(stateOf(t) == Map(7L -> ("z", 7.0)))
    assert(spark.sql(s"SELECT k FROM graft.`$t` VERSION AS OF 1")
      .as[Long].collect().toSeq == Seq(1L))
    // CREATE OR REPLACE works on both empty and existing stores; the
    // single-date-column rule supplies dateCol when OPTIONS doesn't
    spark.sql(s"CREATE OR REPLACE TABLE graft.`$t` AS " +
      "SELECT 9L AS k, DATE'2024-05-01' AS d, 'y' AS s, 9.0D AS p")
    assert(stateOf(t) == Map(9L -> ("y", 9.0)))
    // REPLACE of a missing table refuses; bare CREATE TABLE still does
    intercept[Exception] {
      spark.sql(s"REPLACE TABLE graft.`$base/missing` AS SELECT 1L AS k, " +
        "DATE'2024-01-01' AS d, 'x' AS s, 1.0D AS p")
    }
    val bare = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$base/bare` (k BIGINT, d DATE)")
    }
    assert(bare.getMessage.contains("AS SELECT"), bare.getMessage)
    // a REPLACE violating the table's CHECK constraint refuses whole:
    // the head stays, no new version lands
    spark.sql(s"CALL graft.system.add_constraint('$t', 'pos_p', 'p > 0')")
    intercept[Exception] {
      spark.sql(s"REPLACE TABLE graft.`$t` AS SELECT 5L AS k, " +
        "DATE'2024-06-01' AS d, 'w' AS s, -5.0D AS p")
    }
    assert(stateOf(t) == Map(9L -> ("y", 9.0)))
  }

  test("CALL clone: deep clone resolves chains, carries constraints + id mapping") {
    val base = graft.util.Scratch.dir("sqlw_clone")
    val src = s"$base/src"
    // an EVOLVED source with a chain: v1 publishes with stable ids,
    // v2 upserts, v3 deletes — the clone must land the MERGED state
    graft.sources.SchemaEvolution.publishEvolved(
      df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)), "d", src,
      retainVersions = 10)
    DeletionVectors.publishUpsert(spark, src, df((1L, "A", 11.0), (4L, "e", 4.0)),
      "k", df().select("k").limit(0), validate = false)
    DeletionVectors.publishDeletes(spark, src, Seq(2L).toDF("k"), "k")
    spark.sql(s"CALL graft.system.add_constraint('$src', 'pos_p', 'p > 0')")
    val tgt = s"$base/tgt"
    val ledger = spark.sql(
      s"CALL graft.system.clone('$src', '$tgt', 'd')").collect().head
    assert(ledger.getLong(0) == 3L && ledger.getLong(1) == 1L) // source v3 → clone v1
    assert(ledger.getLong(4) == 1L) // one constraint carried
    // the clone equals the source's merged head, as ONE plain version
    assert(stateOf(tgt) == Map(1L -> ("A", 11.0), 3L -> ("c", 3.0), 4L -> ("e", 4.0)))
    assert(Sinks.listVersions(spark, tgt) == Seq(1L))
    // the carried constraint ENFORCES on the clone's own writes
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$tgt` SELECT 9L, DATE'2024-03-18', 'x', -1.0D")
    }
    assert(e.getMessage.contains("pos_p"), e.getMessage)
    // the id mapping rode over: the clone's v1 resolves the same ids
    val srcMap = graft.sources.SchemaEvolution.schemaOf(spark, src, 3L).get
    val tgtMap = graft.sources.SchemaEvolution.schemaOf(spark, tgt, 1L).get
    assert(tgtMap.map(c => (c.id, c.name)) == srcMap.map(c => (c.id, c.name)))
    // the source is untouched (history, head, refs)
    assert(Sinks.currentVersion(spark, src).contains(3L))
    // a non-empty target refuses
    val e2 = intercept[Exception] {
      spark.sql(s"CALL graft.system.clone('$src', '$tgt', 'd')")
    }
    assert(e2.getMessage.contains("already has committed history"), e2.getMessage)
  }

  test("CALL partitions: per-month census, manifest row counts, link refusal") {
    val t = graft.util.Scratch.dir("sqlw_parts") + "/t"
    val base = spark.range(0, 90)
      .selectExpr("id AS k",
        "date_add(DATE '2024-01-15', CAST((id % 3) * 31 AS INT)) AS d",
        "concat('s', id) AS s", "CAST(id AS DOUBLE) AS p")
    graft.sources.Sinks.publishSnapshot(base, "d", t,
      colocateMonths = true, statsCols = Seq("k"), retainVersions = 100)
    val rows = spark.sql(s"CALL graft.system.partitions(table => '$t')").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("2024-01", "2024-02", "2024-03"))
    assert(rows.forall(_.getLong(1) == 1L), "one file per colocated month")
    assert(rows.forall(r => r.getLong(2) > 0L && r.getLong(4) == 1L))
    assert(rows.map(_.getLong(3)).sum == 90L, "manifest row counts are exact")
    // a link version's dir holds deltas: counted physically (version 2
    // echo), but row_count must REFUSE — its effective rows only exist
    // merged, and the link publish carries no stats manifest
    spark.sql(s"INSERT INTO graft.`$t` SELECT 1000L AS k, " +
      "DATE'2024-01-20' AS d, 'x' AS s, 1.0D AS p")
    val link = spark.sql(s"CALL graft.system.partitions(table => '$t')").collect()
    assert(link.nonEmpty && link.forall(_.getLong(4) == 2L))
    assert(link.forall(_.isNullAt(3)), "row_count must be NULL on a link version")
    // explicit version: the pinned census is the old snapshot's
    val pinned = spark.sql(
      s"CALL graft.system.partitions(table => '$t', version => 1)").collect()
    assert(pinned.map(_.getLong(3)).sum == 90L)
  }

  test("CALL clone of an old version refuses on a later constraint, target pristine") {
    val base = graft.util.Scratch.dir("sqlw_clone_viol")
    val src = s"$base/src"
    // v1 has a NEGATIVE price; v2 replaces it — then the constraint
    // lands (valid for the live state, not for v1)
    df((1L, "a", -5.0)).write.format("graft-table")
      .option("dateCol", "d").option("retainVersions", "10")
      .mode("overwrite").save(src)
    df((1L, "a", 5.0)).write.format("graft-table")
      .option("dateCol", "d").option("retainVersions", "10")
      .mode("overwrite").save(src)
    spark.sql(s"CALL graft.system.add_constraint('$src', 'pos_p', 'p > 0')")
    val tgt = s"$base/tgt"
    // cloning v1 would mint a table violating its own declared rules
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.system.clone('$src', '$tgt', 'd', version => 1)")
    }
    assert(e.getMessage.contains("pos_p"), e.getMessage)
    // refusal hygiene: the target path holds no committed versions and
    // no leftover constraint files
    assert(Sinks.currentVersion(spark, tgt).isEmpty)
    assert(graft.sources.Constraints.constraintsOf(spark, tgt).isEmpty)
    // the LIVE head clones fine under the same constraint
    spark.sql(s"CALL graft.system.clone('$src', '$tgt', 'd')")
    assert(stateOf(tgt) == Map(1L -> ("a", 5.0)))
  }

  test("standard DDL: ALTER TABLE ADD/RENAME/DROP COLUMN + type widening") {
    import graft.sources.SchemaEvolution
    val t = graft.util.Scratch.dir("sqlw_evo") + "/t"
    val base = Seq((1L, 10, 1.0), (2L, 20, 2.0)).toDF("k", "qty", "p")
      .withColumn("d", to_date(lit("2024-03-15"))).select("k", "d", "qty", "p")
    SchemaEvolution.publishEvolved(base, "d", t)
    // pin v1 against the evolution publishes' retention so the as-of
    // read-through at the end still has its data
    graft.sources.Tags.createTag(spark, t, "v1", Some(1L))
    def ids(v: Long): Map[String, Long] =
      SchemaEvolution.schemaOf(spark, t, v).get.map(c => c.name -> c.id).toMap
    def cols(): Seq[String] =
      spark.sql(s"SELECT * FROM graft.`$t`").columns.toSeq

    // RENAME: the stable id carries across (the id-inheritance the
    // library spells renamedFrom), values untouched
    spark.sql(s"ALTER TABLE graft.`$t` RENAME COLUMN p TO amount")
    assert(cols() == Seq("k", "d", "qty", "amount"))
    assert(ids(2L)("amount") == ids(1L)("p"), "rename must inherit the column id")
    // ADD with a position: typed null for existing rows, fresh id
    // above the high-water mark
    spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMNS (note STRING AFTER k)")
    assert(cols() == Seq("k", "note", "d", "qty", "amount"))
    assert(spark.sql(s"SELECT note FROM graft.`$t`").collect().forall(_.isNullAt(0)))
    assert(ids(3L)("note") > ids(1L).values.max, "added id must mint above the mark")
    // TYPE widening keeps the id; narrowing refuses
    spark.sql(s"ALTER TABLE graft.`$t` ALTER COLUMN qty TYPE BIGINT")
    assert(spark.sql(s"SELECT qty FROM graft.`$t`").schema.head.dataType ==
      org.apache.spark.sql.types.LongType)
    assert(ids(4L)("qty") == ids(1L)("qty"))
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$t` ALTER COLUMN amount TYPE FLOAT")
    }
    // DROP retires the id; dropping the month-partition column refuses
    spark.sql(s"ALTER TABLE graft.`$t` DROP COLUMN note")
    assert(cols() == Seq("k", "d", "qty", "amount"))
    intercept[Exception] { spark.sql(s"ALTER TABLE graft.`$t` DROP COLUMN d") }
    intercept[Exception] { spark.sql(s"ALTER TABLE graft.`$t` DROP COLUMN no_such") }
    // an IF EXISTS miss is a NO-OP: tolerated, and no version published
    val beforeNoop = Sinks.currentVersion(spark, t)
    spark.sql(s"ALTER TABLE graft.`$t` DROP COLUMN IF EXISTS no_such")
    assert(Sinks.currentVersion(spark, t) == beforeNoop,
      "a no-op ALTER must not republish the table")
    // NOT NULL adds refuse (existing rows have no value)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$t` ADD COLUMNS (x STRING NOT NULL)")
    }
    // as-of read-through: v1 resolves BY ID onto the live schema —
    // p surfaces as amount, qty reads widened, note never existed
    val asOf = SchemaEvolution.readSnapshotAs(spark, t, 1L)
    assert(asOf.columns.toSeq == Seq("k", "d", "qty", "amount"))
    assert(asOf.select("k", "qty", "amount").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet ==
      Set((1L, 10L, 1.0), (2L, 20L, 2.0)))
    // a CHECK constraint bound to a column blocks its rename (atomic
    // refusal: nothing publishes) until the constraint is dropped
    spark.sql(s"ALTER TABLE graft.`$t` ADD CONSTRAINT amt_pos CHECK (amount > 0)")
    val before = Sinks.currentVersion(spark, t)
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$t` RENAME COLUMN amount TO value")
    }
    assert(e.getMessage.contains("amt_pos"), e.getMessage)
    assert(Sinks.currentVersion(spark, t) == before, "a refused ALTER publishes nothing")
    assert(cols() == Seq("k", "d", "qty", "amount"))
    spark.sql(s"ALTER TABLE graft.`$t` DROP CONSTRAINT amt_pos")
    spark.sql(s"ALTER TABLE graft.`$t` RENAME COLUMN amount TO value")
    assert(cols() == Seq("k", "d", "qty", "value"))
    assert(spark.sql(s"SELECT SUM(value) AS s FROM graft.`$t`")
      .as[Double].head() == 3.0)
  }

  test("drop + re-add of a name in one ALTER mints a fresh id; DDL never prunes") {
    import graft.sources.SchemaEvolution
    val t = graft.util.Scratch.dir("sqlw_evo_ids") + "/t"
    val base = Seq((1L, "x1", 7.0), (2L, "x2", 8.0)).toDF("k", "s", "p")
      .withColumn("d", to_date(lit("2024-03-15"))).select("k", "d", "s", "p")
    SchemaEvolution.publishEvolved(base, "d", t)
    def ids(v: Long): Map[String, Long] =
      SchemaEvolution.schemaOf(spark, t, v).get.map(c => c.name -> c.id).toMap
    val sIdV1 = ids(1L)("s")
    // ONE statement: DROP s + re-ADD s (different type) — the new s
    // must NOT inherit the retired id (that would resolve the dropped
    // column's history into the unrelated new column). No SQL grammar
    // spells both in one statement, but the DSv2 alterTable contract
    // allows it — drive alterColumns with both changes directly.
    import org.apache.spark.sql.connector.catalog.TableChange
    SchemaEvolution.alterColumns(spark, t, Seq(
      TableChange.deleteColumn(Array("s"), false),
      TableChange.addColumn(Array("s"), org.apache.spark.sql.types.LongType)))
    val head1 = Sinks.currentVersion(spark, t).get
    assert(ids(head1)("s") != sIdV1, "re-added name must mint a fresh id")
    // as-of: v1 through the live schema null-fills the NEW s (no id
    // match) instead of resurrecting the dropped strings
    assert(SchemaEvolution.readSnapshotAs(spark, t, 1L)
      .select("s").collect().forall(_.isNullAt(0)),
      "the dropped column's history must not surface in the re-added column")
    // rename + add-under-the-old-name in ONE statement: two live
    // columns must get DISTINCT ids (p's id follows the rename)
    SchemaEvolution.alterColumns(spark, t, Seq(
      TableChange.renameColumn(Array("p"), "amount"),
      TableChange.addColumn(Array("p"), org.apache.spark.sql.types.StringType)))
    val head2 = Sinks.currentVersion(spark, t).get
    assert(ids(head2)("amount") == ids(1L)("p"), "rename keeps the id")
    assert(ids(head2)("p") != ids(1L)("p"), "the re-added name mints fresh")
    assert(ids(head2).values.toSeq.distinct.size == ids(head2).size,
      "no two live columns may share an id")
    // retention: the four ALTERs never pruned — v1 is still readable
    // WITHOUT any tag pinning it
    assert(Sinks.listVersions(spark, t).contains(1L),
      "DDL must not shrink the retained-history window")
  }

  test("ALTER TABLE column DDL collapses a live MoR chain correctly") {
    import graft.sources.SchemaEvolution
    val t = graft.util.Scratch.dir("sqlw_evo_chain") + "/t"
    val base = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "p")
      .withColumn("d", to_date(lit("2024-03-15"))).select("k", "d", "p")
    SchemaEvolution.publishEvolved(base, "d", t)
    graft.sources.Tags.createTag(spark, t, "v1", Some(1L)) // survive retention
    // live head is a CHAIN: v2 updates k=1 and inserts k=4, v3 deletes k=2
    spark.sql(s"UPDATE graft.`$t` SET p = p + 10.0 WHERE k = 1")
    spark.sql(s"INSERT INTO graft.`$t` SELECT 4L AS k, DATE'2024-03-16' AS d, 4.0D AS p")
    spark.sql(s"DELETE FROM graft.`$t` WHERE k = 2")
    // the rename must fold the MERGED state (update applied, insert
    // present, delete gone) into the evolution publish
    spark.sql(s"ALTER TABLE graft.`$t` RENAME COLUMN p TO price")
    val got = spark.sql(s"SELECT k, price FROM graft.`$t`").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 11.0, 3L -> 3.0, 4L -> 4.0))
    // the id carried: k=1's updated value reads back under the new
    // name from the PRE-chain version too
    val v1 = SchemaEvolution.readSnapshotAs(spark, t, 1L)
    assert(v1.columns.contains("price") && !v1.columns.contains("p"))
    // the collapsed head is a plain version again (no dv chain)
    val head = Sinks.currentVersion(spark, t).get
    assert(!Sinks.versionMeta(spark, t, head).contains("dv"),
      "the evolution publish must collapse the chain into a plain version")
  }

  test("standard DDL: CREATE / DROP MATERIALIZED VIEW") {
    val root = graft.util.Scratch.dir("sqlw_cmv")
    val t = s"$root/t"
    df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).write.format("graft-table")
      .option("dateCol", "d").option("retainVersions", "100")
      .mode("overwrite").save(t)
    val view = s"$root/view"
    val made = spark.sql(s"CREATE MATERIALIZED VIEW '$view' AS " +
      s"SELECT trunc(d, 'month') AS month, COUNT(*) AS n_live, " +
      s"COUNT(p) AS cnt_p, SUM(p) AS sum_p FROM graft.`$t` GROUP BY 1").collect()
    assert(made.map(r => (r.getString(0), r.getString(1))).toSeq == Seq((t, view)))
    try {
      // the registration armed the planner: count/sum/avg answer from
      // the view (avg derives from the SUM+COUNT pair)
      val q = spark.sql(s"SELECT COUNT(*) AS n, SUM(p) AS s, AVG(p) AS a " +
        s"FROM graft.`$t`")
      val readsBase = q.queryExecution.optimizedPlan.exists {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.exists(_.toString.contains(t))
            case _ => false
          }
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
          r.table.isInstanceOf[graft.sources.GraftTable]
        case _ => false
      }
      assert(!readsBase, s"CREATE MATERIALIZED VIEW must arm the rewrite:\n" +
        s"${q.queryExecution.optimizedPlan}")
      assert(q.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        .toSeq == Seq((3L, 6.0, 2.0)))
      // a pinned FROM refuses at CREATE (the view reflects live only)
      intercept[Exception] {
        spark.sql(s"CREATE MATERIALIZED VIEW '$root/v2' AS SELECT COUNT(*) AS n " +
          s"FROM graft.`$t` VERSION AS OF 1")
      }
      // bare CREATE refuses a duplicate name; OR REPLACE re-points it
      val dup = intercept[Exception] {
        spark.sql(s"CREATE MATERIALIZED VIEW '$root/v4' AS " +
          s"SELECT trunc(d, 'month') AS month, COUNT(*) AS n FROM graft.`$t` GROUP BY 1")
      }
      assert(dup.getMessage.contains("already registered"), dup.getMessage)
      spark.sql(s"CREATE OR REPLACE MATERIALIZED VIEW '$root/v4' AS " +
        s"SELECT trunc(d, 'month') AS month, COUNT(*) AS n FROM graft.`$t` GROUP BY 1")
      assert(graft.plans.MatViews.lookup(spark, t).exists(
        _.viewPath == s"$root/v4"), "OR REPLACE must re-point the registration")
      // MIN/MAX are maintainable-and-derivable shapes (r16): a named
      // extremes view arms and serves MIN/MAX queries
      spark.sql(s"CREATE MATERIALIZED VIEW '$root/v5' NAMED extremes AS " +
        s"SELECT trunc(d, 'month') AS month, MIN(p) AS mn, MAX(p) AS mx " +
        s"FROM graft.`$t` GROUP BY 1")
      val mm = spark.sql(s"SELECT MIN(p) AS mn, MAX(p) AS mx FROM graft.`$t`")
      assert(mm.collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq ==
        Seq((1.0, 3.0)))
      // an underivable aggregate still refuses with the reason
      val bad = intercept[Exception] {
        spark.sql(s"CREATE MATERIALIZED VIEW '$root/v3' AS " +
          s"SELECT trunc(d, 'month') AS m, STDDEV(p) AS sd FROM graft.`$t` GROUP BY 1")
      }
      assert(bad.getMessage.contains("stddev"), bad.getMessage)
    } finally {
      spark.sql(s"DROP MATERIALIZED VIEW FOR '$t'")
    }
    // dropped: aggregates read the base again
    assert(graft.plans.MatViews.lookup(spark, t).isEmpty)
  }

  private def dfAt(date: String, rows: (Long, String, Double)*) =
    rows.toDF("k", "s", "p")
      .withColumn("d", to_date(lit(date)))
      .select("k", "d", "s", "p")

  test("REPLACE WHERE: scoped overwrite as ONE MoR link, region semantics") {
    val t = graft.util.Scratch.dir("sqlw_rw") + "/t"
    // two months of state
    dfAt("2024-03-15", (1L, "a", 1.0), (2L, "b", 2.0))
      .unionByName(dfAt("2024-04-10", (10L, "x", 10.0), (11L, "y", 11.0)))
      .write.format("graft-table").option("dateCol", "d").mode("overwrite").save(t)
    // writer-option spelling (Delta's): re-upload March — new rows for
    // the region, April untouched
    dfAt("2024-03-20", (1L, "A", 1.5), (3L, "c", 3.0))
      .write.format("graft-table").mode("overwrite")
      .option("replaceWhere", "d < DATE'2024-04-01'").save(t)
    // ONE new version, and it is a link (base never rewritten)
    assert(Sinks.currentVersion(spark, t).contains(2L))
    assert(Sinks.versionMeta(spark, t, 2L).contains("dv"),
      "a scoped replace must commit as an O(changes) MoR link")
    assert(stateOf(t) == Map(
      1L -> ("A", 1.5), 3L -> ("c", 3.0),            // replaced region
      10L -> ("x", 10.0), 11L -> ("y", 11.0)))       // untouched region
    // SQL spelling: INSERT INTO … REPLACE WHERE (Spark 4 grammar) —
    // re-replace April through the catalog; the key scan resolves the
    // CHAIN head (version 2 is a link)
    spark.sql(s"INSERT INTO graft.`$t` REPLACE WHERE d >= DATE'2024-04-01' " +
      "SELECT 10L AS k, DATE'2024-04-20' AS d, 'X2' AS s, 20.0D AS p")
    assert(Sinks.currentVersion(spark, t).contains(3L))
    assert(stateOf(t) == Map(
      1L -> ("A", 1.5), 3L -> ("c", 3.0), 10L -> ("X2", 20.0)))
    // time travel still serves both pre-replace states
    assert(spark.sql(s"SELECT k FROM graft.`$t` VERSION AS OF 1")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 10L, 11L))
  }

  test("REPLACE WHERE row contract: out-of-region rows refuse, nothing committed") {
    val t = graft.util.Scratch.dir("sqlw_rw_viol") + "/t"
    dfAt("2024-03-15", (1L, "a", 1.0)).unionByName(
      dfAt("2024-04-10", (10L, "x", 10.0)))
      .write.format("graft-table").option("dateCol", "d").mode("overwrite").save(t)
    // an arriving April row under a March predicate raises in-flight
    val e = intercept[Exception] {
      dfAt("2024-04-20", (2L, "oops", 2.0)).write.format("graft-table")
        .mode("overwrite").option("replaceWhere", "d < DATE'2024-04-01'").save(t)
    }
    assert(e.getMessage.contains("does not satisfy the replace predicate"),
      s"got: ${e.getMessage}")
    // nothing committed, stage + claim reclaimed
    assert(Sinks.currentVersion(spark, t).contains(1L))
    assert(stateOf(t) == Map(1L -> ("a", 1.0), 10L -> ("x", 10.0)))
    assert(!new java.io.File(s"$t/v00000002").exists(),
      "refused replace must reclaim its staged version dir")
    // replaceWhere under append mode refuses up front
    val e2 = intercept[Exception] {
      dfAt("2024-03-20", (5L, "m", 5.0)).write.format("graft-table")
        .mode("append").option("replaceWhere", "d < DATE'2024-04-01'").save(t)
    }
    assert(e2.getMessage.contains("requires mode"))
    // on an EMPTY store the replace degenerates to the bootstrap
    val t2 = graft.util.Scratch.dir("sqlw_rw_boot") + "/t"
    dfAt("2024-03-15", (1L, "a", 1.0)).write.format("graft-table")
      .option("dateCol", "d").mode("overwrite")
      .option("replaceWhere", "d < DATE'2024-04-01'").save(t2)
    assert(Sinks.currentVersion(spark, t2).contains(1L))
  }

  test("append schema mismatch and empty-store reads fail loudly") {
    val t = graft.util.Scratch.dir("sqlw_err") + "/t"
    intercept[java.io.FileNotFoundException] {
      spark.read.format("graft-table").load(t).collect()
    }
    df((1L, "a", 1.0)).write.format("graft-table")
      .option("dateCol", "d").mode("overwrite").save(t)
    val bad = Seq((2L, "x")).toDF("k", "wrong")
    val e = intercept[Exception] {
      bad.write.format("graft-table").mode("append").save(t)
    }
    assert(e.getMessage.contains("must match the table's"))
  }
}

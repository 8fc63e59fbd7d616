package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Branches, Sinks, Tags}

/** Vacuum semantics: abandoned dirs and orphan claims reclaim; marked
  * versions (main, branch, tag-pinned) never do; the age guard holds
  * fresh debris. */
class VacuumSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def df(vals: Long*) = vals.map(v => (v, java.sql.Date.valueOf("2024-01-15")))
    .toDF("val", "transaction_date")

  test("vacuum reclaims abandoned dirs + orphan claims; committed, branch and tagged versions survive") {
    val tbl = graft.util.Scratch.dir("vacuum_spec") + "/t"
    Sinks.publishSnapshot(df(1L, 2L), "transaction_date", tbl, retainVersions = 4)
    Sinks.publishSnapshot(df(3L), "transaction_date", tbl, retainVersions = 4)
    Tags.createTag(spark, tbl, "pin", Some(1L))
    Branches.createBranch(spark, tbl, "side")
    val bv = Branches.publishToBranch(df(7L), "transaction_date", tbl, "side") // claims 3
    val a1 = Sinks.plantAbandonedVersion(df(9L), "transaction_date", tbl)      // 4
    val a2 = Sinks.plantAbandonedVersion(df(9L), "transaction_date", tbl)      // 5
    val oc = Sinks.plantOrphanClaim(spark, tbl)                                // 6
    assert((bv, a1, a2, oc) === ((3L, 4L, 5L, 6L)))
    val ledger = Sinks.vacuum(spark, tbl, olderThanMs = -1000L)
    assert(ledger === Seq(4L -> "abandoned_dir", 5L -> "abandoned_dir",
      6L -> "orphan_claim"))
    // nothing marked was touched
    assert(Sinks.listVersions(spark, tbl).sorted === Seq(1L, 2L))
    assert(Sinks.readSnapshot(spark, tbl).select("val").as[Long].head() === 3L)
    assert(Branches.readBranch(spark, tbl, "side")
      .select("val").as[Long].head() === 7L)
    assert(Tags.readTag(spark, tbl, "pin")
      .select("val").as[Long].collect().sorted === Array(1L, 2L))
    // idempotent: a second pass finds nothing
    assert(Sinks.vacuum(spark, tbl, olderThanMs = -1000L) === Seq.empty)
    // and the freed numbers are re-claimable: the next publish lands at 4
    assert(Sinks.publishSnapshot(df(8L), "transaction_date", tbl,
      retainVersions = 4) === 4L)
  }

  test("the age guard holds fresh debris: a young abandoned dir survives vacuum") {
    val tbl = graft.util.Scratch.dir("vacuum_spec_age") + "/t"
    Sinks.publishSnapshot(df(1L), "transaction_date", tbl)
    Sinks.plantAbandonedVersion(df(2L), "transaction_date", tbl)
    // everything here is milliseconds old: a 10-minute horizon sees no debris
    assert(Sinks.vacuum(spark, tbl, olderThanMs = 10L * 60 * 1000) === Seq.empty)
    // the dir is still there (an in-flight publisher would still own it)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(tbl, "v00000002")))
  }
}

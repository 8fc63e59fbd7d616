package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{DeletionVectors, Sinks}

/** Replication under CONCURRENT WRITES: the mirror drains the change
  * feed while the source keeps publishing — plain replaces, MoR links,
  * and a restore — across multiple AvailableNow rounds. The mirror
  * must converge to the source's merged state, and a restart from the
  * same checkpoint must not double-apply anything. */
class TableMirrorSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def rows(rs: (Long, String)*) = rs.toDF("k", "s")
    .withColumn("d", to_date(lit("2024-07-15"))).select("k", "d", "s")

  private def stateOf(t: String): Map[Long, String] =
    DeletionVectors.readMerged(spark, t).select("k", "s").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("mirror converges under a racing publisher; checkpoint restart is exact") {
    val base = graft.util.Scratch.dir("mirror_race")
    val src = s"$base/src"
    val dst = s"$base/dst"
    Sinks.publishSnapshot(rows(1L -> "a", 2L -> "b"), "d", src, retainVersions = 100)

    def drain(): Unit = graft.streaming.TableMirror.runTableMirror(
      spark, src, dst, s"$base/ckpt", "k", "d",
      retainVersions = 100, availableNow = true).awaitTermination()

    // the racing publisher: 7 commits of all three kinds, including a
    // RESTORE (which lands as a plain data commit the feed snapshots)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val publisher = Future {
      (1 to 3).foreach { i =>
        DeletionVectors.publishUpsert(spark, src,
          rows(i.toLong -> s"u$i", (100L + i) -> s"n$i"), "k",
          rows().select("k").limit(0), validate = false)
        DeletionVectors.publishDeletes(spark, src, Seq(100L + i).toDF("k"), "k")
        if (i == 2) {
          Sinks.publishSnapshot(rows(7L -> "seven", 8L -> "eight"), "d", src,
            retainVersions = 100) // full replace mid-stream
        }
      }
      // rollback: restore to the freshest full replace, as a new commit
      val snapVersion = Sinks.history(spark, src)
        .filter(col("kind") === "data").agg(max("version")).collect()(0).getLong(0)
      Sinks.restoreSnapshot(spark, src, snapVersion, "d", retainVersions = 100)
    }
    // drain WHILE the publisher runs — each AvailableNow round latches
    // whatever head it sees and applies those commits in order
    while (!publisher.isCompleted) drain()
    Await.result(publisher, 2.minutes)
    // post-quiesce drains until the mirror holds the full history
    drain(); drain()
    assert(stateOf(dst) == stateOf(src), "mirror state must converge to source")
    val settledHead = Sinks.currentVersion(spark, dst).get
    // restart from the same checkpoint with nothing new: no commit, no
    // double-apply (idle rounds move nothing)
    drain()
    assert(Sinks.currentVersion(spark, dst).contains(settledHead))
    assert(stateOf(dst) == stateOf(src))
    // one more source commit after the quiet period replicates cleanly
    DeletionVectors.publishUpsert(spark, src, rows(9L -> "nine"), "k",
      rows().select("k").limit(0), validate = false)
    drain()
    assert(stateOf(dst) == stateOf(src))
  }
}

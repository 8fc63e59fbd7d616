package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{DeletionVectors, Sinks}

/** Randomized model check of the merge-on-read chain: a seeded random
  * sequence of delete / upsert / materialize / compact steps is
  * applied to a published table while a plain-Scala Map tracks the
  * expected key→value state. After EVERY step the merged read must
  * equal the model exactly — vectors and deltas fold over arbitrary
  * interleavings, maintenance passes are content-neutral at any point
  * in the chain, and every historical version still reads as the
  * state the model held when it was committed.
  */
class MorPropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("random delete/upsert/materialize/compact walk matches the model at every step") {
    val rnd = new scala.util.Random(271828)
    val table = java.nio.file.Files.createTempDirectory("mor_prop").toString + "/t"
    val keys = 1L to 40L
    var model: Map[Long, Long] = keys.map(k => k -> (k * 100)).toMap
    def frame(m: Map[Long, Long]) =
      m.toSeq.map { case (k, v) => (k, v, d("2024-01-15")) }
        .toDF("k", "v", "day")
    Sinks.publishSnapshot(frame(model), "day", table, retainVersions = 60)

    def merged(): Map[Long, Long] =
      DeletionVectors.readMerged(spark, table)
        .select("k", "v").as[(Long, Long)].collect().toMap

    // remember the model state at each committed version for the
    // time-travel check at the end
    var history = Map(Sinks.currentVersion(spark, table).get -> model)

    for (step <- 1 to 12) {
      rnd.nextInt(4) match {
        case 0 => // pure delete of a random live subset
          val del = model.keys.toSeq.sorted.filter(_ => rnd.nextDouble() < 0.2)
          if (del.nonEmpty) {
            DeletionVectors.publishDeletes(spark, table, del.toDF("k"), "k")
            model = model -- del
          }
        case 1 => // upsert: update some live keys, insert some fresh ones
          val ups = model.keys.toSeq.sorted.filter(_ => rnd.nextDouble() < 0.25)
            .map(k => (k, k * 100 + step))
          val ins = (1 to rnd.nextInt(3))
            .map(i => (1000L * step + i, step * 10L + i))
          val changes = (ups ++ ins)
          if (changes.nonEmpty) {
            DeletionVectors.publishUpsert(spark, table,
              changes.map { case (k, v) => (k, v, d("2024-01-15")) }
                .toDF("k", "v", "day"),
              "k", Seq.empty[Long].toDF("k"))
            model = model ++ changes
          }
        case 2 => // fold the whole chain back into a data version
          DeletionVectors.materializeDeletes(spark, table, "day",
            retainVersions = 60)
        case _ => // content-neutral maintenance
          Sinks.compactSnapshot(spark, table, "day", retainVersions = 60)
      }
      assert(merged() === model, s"divergence after step $step")
      history += Sinks.currentVersion(spark, table).get -> model
    }

    // every committed version still reads as the state the model held
    // when it was committed (MoR versions resolve their chains; data
    // versions read directly)
    for ((v, expected) <- history) {
      val got = DeletionVectors.readMergedAt(spark, table, v)
        .select("k", "v").as[(Long, Long)].collect().toMap
      assert(got === expected, s"historical version $v diverged")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Reconcile

/** Randomized cross-check of Reconcile against a plain-Scala model of
  * the reference's verify/fix semantics (fixed seed → reproducible),
  * plus the convergence property: after one fix-up, a re-reconcile
  * must show zero file-only rows.
  */
class ReconcilePropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val rnd = new scala.util.Random(1234)

  private def randomSide(keys: Seq[Long]): Map[Long, (Long, Option[String])] =
    keys.map(k => k -> ((rnd.nextInt(5).toLong,
      if (rnd.nextBoolean()) Some(s"t${rnd.nextInt(3)}") else None))).toMap

  test("fixUp matches the per-key reference model on random inputs and converges") {
    for (round <- 1 to 5) {
      val universe = 0L until 60L
      val dbKeys = universe.filter(_ => rnd.nextDouble() < 0.8)
      val fileKeys = universe.filter(_ => rnd.nextDouble() < 0.8)
      val dbM = randomSide(dbKeys)
      val fileM = randomSide(fileKeys)
      val db = dbM.toSeq.map { case (k, (p, t)) => (k, p, t) }.toDF("k", "price", "tag")
      val file = fileM.toSeq.map { case (k, (p, t)) => (k, p, t) }.toDF("k", "price", "tag")

      // the per-key model: file wins where present-and-different
      val expected = (dbM.keySet ++ fileM.keySet).map { k =>
        (dbM.get(k), fileM.get(k)) match {
          case (None, Some(f))              => k -> ((f, "inserted"))
          case (Some(d), None)              => k -> ((d, "kept"))
          case (Some(d), Some(f)) if d == f => k -> ((d, "kept"))
          case (Some(_), Some(f))           => k -> ((f, "updated"))
          case (None, None)                 => sys.error("unreachable")
        }
      }.toMap

      val got = Reconcile.fixUp(db, file, "k", Seq("price", "tag"))
        .collect()
        .map(r => r.getLong(0) ->
          (((r.getLong(1), Option(r.getString(2))), r.getString(3)))).toMap
      assert(got === expected, s"round $round diverged from the reference model")

      // convergence: repaired DB vs the same file → nothing file-only
      val repaired = Reconcile.fixUp(db, file, "k", Seq("price", "tag")).drop("fix_action")
      val c = Reconcile.counts(repaired, file, Seq("k", "price", "tag")).head()
      assert(c.getLong(2) === 0L, s"round $round: file-only rows remain after fix-up")
    }
  }
}

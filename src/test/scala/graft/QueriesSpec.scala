package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (local[4], tiny SF). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

/** Every declared query runs, is non-degenerate, and each oracle key
  * points at a declared query. Detailed value checks live in the
  * DuckDB gate (tools/check_oracle.py) and the operator suites. */
class QueriesSpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs and returns a schema with rows") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      // the embed-dup variants legitimately return 0 rows at sf0.001
      // (no pair above threshold in the tiny sample); everything else
      // must produce data.
      if (!Set("d_embed_dup", "d_embed_dup_lsh")(name))
        assert(df.count() > 0, s"$name returned 0 rows")
      else assert(df.count() >= 0)
    }
  }
}

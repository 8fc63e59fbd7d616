package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sinks

/** Randomized invariants of the snapshot compaction pass (fixed seed →
  * reproducible): across random month distributions, row volumes, and
  * file-size targets, a compaction must (1) preserve the data exactly,
  * (2) never write a file above the learned rows-per-file cap, (3)
  * keep every month partition intact, and (4) publish exactly one new
  * version. These are the properties the example-based ScaleSpec tests
  * pin on specific shapes; here the shapes are adversarially random
  * (single hot month, skewed months, tiny targets).
  */
class CompactionPropertySpec extends AnyFunSuite {
  import TestSpark._

  private val rnd = new scala.util.Random(4242)

  test("compaction preserves data, caps file rows, and keeps partitions on random shapes") {
    for (round <- 1 to 4) {
      val table = Files.createTempDirectory(s"compact_prop$round").toString + "/t"
      // random month skew: a few months, one possibly dominating
      val nMonths = 1 + rnd.nextInt(4)
      val months = (0 until nMonths).map(m => f"2024-${m + 1}%02d-15")
      val rows = 2000 + rnd.nextInt(6000)
      val hot = months(rnd.nextInt(nMonths))
      val df = spark.range(rows).select(
        col("id").as("k"),
        (col("id") % 911).cast("double").as("v"),
        // ~70% of rows land in the hot month, the rest spread uniformly
        to_date(element_at(
          array((hot +: months).map(lit(_)): _*),
          (pmod(col("id") * 2654435761L, lit((10 * (1 + months.size)).toLong))
            .cast("int") % (1 + months.size)) + 1)).as("transaction_date"))
      Sinks.publishSnapshot(df.repartition(1 + rnd.nextInt(8)), "transaction_date", table)

      def checksum(): (Long, Long, Double) = {
        val r = Sinks.readSnapshot(spark, table)
          .agg(count(lit(1)), sum(col("k")), sum(col("v"))).head()
        (r.getLong(0), r.getLong(1), r.getDouble(2))
      }
      val before = checksum()
      val vBefore = Sinks.currentVersion(spark, table).get

      // random target spanning "everything in one file" to "tiny files"
      val vdir = new java.io.File(Sinks.currentVersionDir(spark, table))
      val totalBytes = vdir.listFiles().filter(_.getName.startsWith("txn_month="))
        .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
        .map(_.length()).sum
      val target = math.max(1L, totalBytes / (1 << rnd.nextInt(6)))
      val v = Sinks.compactSnapshot(spark, table, "transaction_date",
        targetFileBytes = target)
      assert(v === vBefore + 1, s"round $round: expected one new version")
      assert(checksum() === before, s"round $round: compaction changed the data")

      // the learned cap: recompute it the way compactSnapshot does
      val bytesPerRow = math.max(1L, totalBytes / before._1)
      val rowsPerFile = math.max(1L, target / bytesPerRow)
      val newVdir = new java.io.File(Sinks.currentVersionDir(spark, table))
      val monthDirs = newVdir.listFiles().filter(_.getName.startsWith("txn_month="))
      assert(monthDirs.map(_.getName).sorted.sameElements(
        vdir.listFiles().filter(_.getName.startsWith("txn_month=")).map(_.getName).sorted),
        s"round $round: month partitions changed")
      monthDirs.foreach { d =>
        d.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
          val n = spark.read.parquet(f.getAbsolutePath).count()
          assert(n <= rowsPerFile,
            s"round $round: ${f.getName} has $n rows, cap $rowsPerFile")
        }
      }
    }
  }
}

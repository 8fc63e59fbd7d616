package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Plan-audit helper: prints the formatted physical plan of selected
  * queries (all, if no names given) so pushdown / broadcast / shuffle
  * placement can be reviewed. Dev tool, not part of the driver
  * contract. Usage: runMain graft.tools.Explain <sfDir> [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    // the TUNED engine session (extensions, broadcast threshold, AQE):
    // auditing a bare session would print plans the bench never runs
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

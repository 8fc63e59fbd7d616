package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.plans.MatViews
import graft.sources.Sinks

/** Scale-evidence harness for the materialized-view auto-rewrite
  * (SURVEY §2 row 190): publishes the full `orders` table of a data
  * dir as a graft store, writes its monthly (n_live, sum_price)
  * aggregate as the view, registers it, and times the SAME yearly
  * rollup through the catalog twice — view registered (rewritten:
  * O(groups) re-aggregation) vs unregistered (base scan: O(table)).
  * One untimed warmup then min of 3 passes each, mirroring
  * `graft.Bench`'s estimator. The ratio is the operator's scale
  * claim made measurable: it grows linearly with table size while
  * the view stays months-sized.
  *
  * Usage: runMain graft.tools.MvEvidence <dataDir> <scratchDir> [factor]
  * (`factor` key-stride-replicates orders before publishing, so the
  * base side is large enough that per-query fixed overhead stops
  * masking the scan — the quantity under test.)
  */
object MvEvidence {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MvEvidence <dataDir> <scratchDir> [factor]")
    val dataDir = args(0)
    val scratch = args(1)
    val factor = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val store = s"$scratch/orders_store"
    val base0 = spark.read.parquet(s"$dataDir/orders.parquet").select(
      col("o_orderkey").cast("long").as("o_orderkey"),
      col("o_orderdate").cast("date").as("odate"),
      col("o_totalprice").cast("decimal(18,2)").as("price"))
    val stride = base0.agg(max(col("o_orderkey"))).head().getLong(0) + 1L
    val orders = base0.crossJoin(broadcast(spark.range(factor).toDF("__r")))
      .withColumn("o_orderkey", col("o_orderkey") + col("__r") * lit(stride))
      .drop("__r")
    Sinks.publishSnapshot(orders, "odate", store, retainVersions = 4)
    val view = s"$scratch/view"
    spark.sql(s"SELECT * FROM graft.`$store`")
      .groupBy(trunc(col("odate"), "month").as("month"))
      .agg(count(lit(1)).as("n_live"),
        sum("price").cast("decimal(18,2)").as("sum_price"))
      .coalesce(1).write.mode("overwrite").parquet(view)

    val sql = s"""SELECT CAST(year(trunc(odate, 'month')) AS BIGINT) AS yr,
                 |  COUNT(*) AS n_live, CAST(SUM(price) AS DOUBLE) AS sum_price
                 |FROM graft.`$store` GROUP BY 1 ORDER BY 1""".stripMargin

    def time(): Double = {
      spark.sql(sql).collect() // warmup
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(sql).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    val base = time() // no registration: full base scan
    MatViews.register(spark, store, view,
      asOfVersion = Sinks.currentVersion(spark, store).get,
      groups = Seq("month" -> trunc(col("odate"), "month")),
      countCol = Some("n_live"), sums = Seq("sum_price" -> col("price")))
    val rewritten = time()
    MatViews.unregister(store)
    val n = orders.count()
    println(f"""{"rows":$n,"base_scan_s":$base%.4f,"view_rewrite_s":$rewritten%.4f,"speedup":${base / rewritten}%.1f}""")
    spark.stop()
  }
}

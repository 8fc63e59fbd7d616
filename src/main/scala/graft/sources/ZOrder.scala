package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Z-order clustered writes — multi-column data-skipping layout (the
  * Delta/Iceberg `OPTIMIZE ZORDER BY` idea, built from Spark
  * primitives): rows are sorted by the bit-interleaving of per-column
  * equi-depth bucket ids, so each output file covers a small HYPERCUBE
  * of the key space instead of a thin slice of one column. A scan
  * filtering on ANY subset of the z-columns then prunes most files on
  * parquet min/max footer stats — where a single-column sort only
  * skips on its leading column.
  *
  * Cost model: one `approxQuantile` pass to learn boundaries (driver
  * holds nBuckets doubles per column — tiny), one range shuffle on the
  * z-value, local sorts. Write-time only; readers pay nothing. The
  * bucket id is a native codegen binary search (`BucketId`, 8 compares
  * at 256 buckets) — the composed `aggregate` fold is kept as the
  * semantic reference and spec-pinned equal.
  */
object ZOrder {

  /** Equi-depth bucket id of `c` given sorted quantile `bounds`:
    * the count of boundaries ≤ value, i.e. a rank in 0..bounds.size.
    * Null ranks 0 (sorts first, like NULLS FIRST). Native codegen
    * binary search (8 compares at 256 buckets) — the composed
    * `aggregate` fold below is the semantic reference (256 interpreted
    * compares per row), equality spec-pinned. */
  private[graft] def bucketOf(c: Column, bounds: Seq[Double]): Column =
    coalesce(
      graft.functions.native.bucket_id(c.cast(DoubleType), bounds),
      lit(0))

  private[graft] def bucketOfComposed(c: Column, bounds: Seq[Double]): Column =
    aggregate(
      array(bounds.map(lit(_)): _*),
      lit(0),
      (acc, b) => acc + when(c.cast(DoubleType) >= b, 1).otherwise(0))

  /** Bit-interleaved z-value of the given bucket columns: bit b of
    * column i lands at position b * nCols + i, so all columns share
    * the high bits equally — the locality property z-order is for. */
  private[graft] def zValue(buckets: Seq[Column], bits: Int): Column = {
    val k = buckets.size
    val terms = for {
      b <- 0 until bits
      (bk, i) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(bk, b).bitwiseAND(lit(1)), b * k + i)
    terms.reduce(_ + _)
  }

  /** Registered driver query: z-order the orders table on
    * (o_custkey, o_totalprice) into a scratch layout, then read it
    * back through a 2-D predicate — the full write→footer-pruned-scan
    * lifecycle runs under the driver's hash check against a plain
    * filter oracle (layout must never change results; the SKIPPING
    * property is spec-measured in ScaleSpec). */
  def zorderScan(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val tmp = graft.util.Scratch.dir("zorder_q")
    val df = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
    writeZOrdered(df, Seq("o_custkey", "o_totalprice"), tmp, nFiles = 16)
    spark.read.parquet(tmp)
      .filter(col("o_custkey") <= 500 && col("o_totalprice") <= 50000.0)
      .orderBy("o_orderkey")
  }

  /** Learn equi-depth boundaries and write `df` z-ordered on `cols`
    * (numeric columns) into `nFiles` files at `path`. Returns the
    * per-column boundaries used (for tests / re-use). */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
                    nFiles: Int, nBuckets: Int = 256): Map[String, Seq[Double]] = {
    require(cols.nonEmpty && nFiles >= 1 && nBuckets >= 2 && nBuckets <= (1 << 16),
      "need >=1 z-column, >=1 file, 2..65536 buckets")
    val bits = 32 - Integer.numberOfLeadingZeros(nBuckets - 1) // ceil(log2)
    require(bits * cols.size <= 31, "bits x columns must fit an int z-value")
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val bounds = df.stat.approxQuantile(cols.toArray, probs, 0.01)
    val byCol = cols.zip(bounds.map(_.toSeq.distinct.sorted)).toMap
    val z = zValue(cols.map(c => bucketOf(col(c), byCol(c))), bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path)
    byCol
  }
}

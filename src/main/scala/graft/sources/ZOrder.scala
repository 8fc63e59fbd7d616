package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  *
  * The z-value is a LONG (63 usable bits), so bits × columns ≤ 63:
  * up to 7 columns at 256 buckets, or finer buckets on fewer columns.
  * Non-numeric key columns join the interleave through order-
  * preserving numeric surrogates (see [[numericView]]): dates as
  * epoch days, timestamps as epoch seconds, strings as a packed
  * code-point prefix — quantile boundaries are learned on the SAME
  * surrogate, so equi-depth bucketing stays self-consistent.
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
    * the high bits equally — the locality property z-order is for.
    * Long arithmetic throughout: the interleave may use all 63
    * non-sign bits. */
  private[graft] def zValue(buckets: Seq[Column], bits: Int): Column = {
    val k = buckets.size
    val terms = for {
      b <- 0 until bits
      (bk, i) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(bk.cast(LongType), b).bitwiseAND(lit(1L)), b * k + i)
    terms.reduce(_ + _)
  }

  /** Order-preserving numeric surrogate for a z-column, by data type:
    * numerics cast to double; dates → epoch day; timestamps → epoch
    * second; strings → the first three code points packed big-endian
    * into 48 bits (16 per char, capped at 0xFFFF), which preserves
    * lexicographic order on the prefix — exact within the prefix, and
    * self-consistent because boundaries are learned on the same
    * mapping. 48 bits stays inside double's 53-bit exact-integer
    * range, so no two distinct surrogates collapse. Null propagates
    * (→ bucket 0 via [[bucketOf]]'s coalesce). */
  private[graft] def numericView(dt: DataType, c: Column): Column = dt match {
    case DateType      => unix_date(c).cast(DoubleType)
    case TimestampType => c.cast(LongType).cast(DoubleType)
    // NTZ has no direct numeric cast; the session-zone reinterpretation
    // is a monotone shift, which is all a bucket boundary needs
    case TimestampNTZType => c.cast(TimestampType).cast(LongType).cast(DoubleType)
    case StringType =>
      (0 until 3).map { i =>
        val cp = ascii(substring(c, i + 1, 1))
        when(cp > 65535, 65535L).otherwise(cp.cast(LongType)) * (1L << (16 * (2 - i)))
      }.reduce(_ + _).cast(DoubleType)
    case _ => c.cast(DoubleType)
  }

  /** Learn equi-depth boundaries for `cols` of `df` and build the
    * curve value (Morton z by default, Hilbert with `hilbert = true`).
    * Returns (df with the surrogate columns appended, the curve column
    * over them, the surrogate column names to drop after shuffling,
    * the per-column boundaries). Shared by [[writeZOrdered]],
    * [[writeHilbertOrdered]] and `Sinks.compactSnapshot`'s
    * OPTIMIZE-ZORDER mode. */
  private[graft] def zPrepared(df: DataFrame, cols: Seq[String], nBuckets: Int,
                               hilbert: Boolean = false)
      : (DataFrame, Column, Seq[String], Map[String, Seq[Double]]) = {
    require(cols.nonEmpty && nBuckets >= 2 && nBuckets <= (1 << 16),
      "need >=1 z-column, 2..65536 buckets")
    val bits = 32 - Integer.numberOfLeadingZeros(nBuckets - 1) // ceil(log2)
    require(bits * cols.size <= 63, "bits x columns must fit a long curve value")
    val sCols = cols.indices.map(i => s"__zs_$i")
    val withS = cols.zip(sCols).foldLeft(df) { case (d, (c, s)) =>
      d.withColumn(s, numericView(df.schema(c).dataType, col(c)))
    }
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val bounds = withS.stat.approxQuantile(sCols.toArray, probs, 0.01)
    val byCol = cols.zip(bounds.map(_.toSeq.distinct.sorted)).toMap
    // rescale each column's bucket id onto the FULL 0..nBuckets-1
    // range: a low-cardinality column (k distinct boundaries < the
    // requested count) would otherwise occupy only its low log2(k)
    // bits, while the interleave's file-splitting locality lives in
    // the HIGH bits — leaving that column unprunable. Monotone integer
    // scaling (multiply before divide, in long space) preserves bucket
    // order exactly; a full-cardinality column is the identity.
    val buckets = cols.zip(sCols).map { case (c, s) =>
      val k = byCol(c).size
      if (k == 0) lit(0L)
      else (bucketOf(col(s), byCol(c)).cast(LongType) * (nBuckets - 1)) / k
    }
    val curve =
      if (hilbert)
        graft.functions.native.hilbert_index(
          array(buckets.map(_.cast(IntegerType)): _*), bits)
      else zValue(buckets, bits)
    (withS, curve, sCols, byCol)
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
    * (numeric, date, timestamp, or string columns) into `nFiles` files
    * at `path`. Returns the per-column boundaries used (for tests /
    * re-use). */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
                    nFiles: Int, nBuckets: Int = 256): Map[String, Seq[Double]] =
    writeCurveOrdered(df, cols, path, nFiles, nBuckets, hilbert = false)

  /** Same layout machinery, Hilbert-curve ordering: the Hilbert walk
    * visits every cell of the bucket grid through unit steps (no
    * Morton quadrant jumps), so consecutive rows — and therefore file
    * boundaries — cut strictly fewer hypercubes; the stronger
    * clustering for box-query pruning (the idea behind Hilbert-based
    * OPTIMIZE in modern lakehouses). Index computed by the native
    * codegen `HilbertIndex` (Skilling's transform, spec-verified
    * unit-step). */
  def writeHilbertOrdered(df: DataFrame, cols: Seq[String], path: String,
                          nFiles: Int, nBuckets: Int = 256): Map[String, Seq[Double]] =
    writeCurveOrdered(df, cols, path, nFiles, nBuckets, hilbert = true)

  private def writeCurveOrdered(df: DataFrame, cols: Seq[String], path: String,
                                nFiles: Int, nBuckets: Int,
                                hilbert: Boolean): Map[String, Seq[Double]] = {
    require(nFiles >= 1, "need >=1 file")
    val (withS, curve, sCols, byCol) = zPrepared(df, cols, nBuckets, hilbert)
    withS.withColumn("__z", curve)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop(sCols :+ "__z": _*)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path)
    byCol
  }

  /** Registered Hilbert sibling of [[zorderScan]]: 3-D clustered write
    * (numeric, numeric, DATE — the date rides its epoch-day surrogate)
    * → box-filtered read-back, hash-checked against a plain filter
    * oracle. Layout must never change results; the pruning property is
    * spec-measured in ScaleSpec. */
  def hilbertScan(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val tmp = graft.util.Scratch.dir("hilbert_q")
    val df = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        to_date(col("o_orderdate")).as("o_orderdate"))
    writeHilbertOrdered(df, Seq("o_custkey", "o_totalprice", "o_orderdate"), tmp, nFiles = 16)
    spark.read.parquet(tmp)
      .filter(col("o_custkey") <= 500 && col("o_totalprice") <= 50000.0 &&
        col("o_orderdate") <= to_date(lit("1995-12-31")))
      .orderBy("o_orderkey")
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-evidence data generator: replicates a driver-generated
  * testdata directory N× with REMAPPED keys, producing a larger scale
  * factor (sf0.1 × 10 ≈ sf1) for measuring scaling exponents above the
  * largest shipped directory. Referential integrity is preserved by
  * offsetting every key column with a per-replica stride (each replica
  * is a disjoint, internally-consistent copy of the star schema);
  * dimension tables (region, nation) stay fixed, exactly as TPC-H
  * scales. Text and embedding payloads are PERTURBED per replica
  * (every 10th word suffixed / one vector coordinate nudged) so
  * near-duplicate detection does not see N−1 planted twins of every
  * document — replication without perturbation would quadratically
  * inflate candidate pairs and measure a data artifact, not the
  * engine. Replica 0 is the original data verbatim.
  *
  * Usage: runMain graft.ScaleUp <inDir> <outDir> <factor>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <inDir> <outDir> <factor>")
    val Array(in, out, fs) = args
    val factor = fs.toInt
    require(factor >= 1, "factor must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = spark.read.parquet(s"$in/$name.parquet")
    // one tiny driver action per keyed table: the replica stride
    def strideOf(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    // replicas as a broadcast 10-row side: each source row fans out to
    // `factor` rows in one pass, no shuffle
    val reps = broadcast(spark.range(factor).toDF("__r"))
    def replicate(df: DataFrame, offsets: Map[String, Long]): DataFrame = {
      val fanned = df.crossJoin(reps)
      val offset = offsets.foldLeft(fanned) { case (d, (k, s)) =>
        d.withColumn(k, col(k) + col("__r") * lit(s))
      }
      offset
    }
    def write(name: String, df: DataFrame): Unit = {
      df.drop("__r").write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name -> ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // fixed-size dimensions: verbatim
    write("region", t("region"))
    write("nation", t("nation"))

    val custS = strideOf(t("customer"), "c_custkey")
    val suppS = strideOf(t("supplier"), "s_suppkey")
    val partS = strideOf(t("part"), "p_partkey")
    val ordS  = strideOf(t("orders"), "o_orderkey")
    write("customer", replicate(t("customer"), Map("c_custkey" -> custS)))
    write("supplier", replicate(t("supplier"), Map("s_suppkey" -> suppS)))
    write("part", replicate(t("part"), Map("p_partkey" -> partS)))
    write("orders", replicate(t("orders"),
      Map("o_orderkey" -> ordS, "o_custkey" -> custS)))
    write("lineitem", replicate(t("lineitem"),
      Map("l_orderkey" -> ordS, "l_partkey" -> partS, "l_suppkey" -> suppS)))

    val evS = strideOf(t("events"), "event_id")
    val userS = strideOf(t("events"), "user_id")
    write("events", replicate(t("events"),
      Map("event_id" -> evS, "user_id" -> userS)))

    // documents: perturb every 10th word per replica (replica 0 =
    // original) so replicas are NOT near-duplicates of each other
    val docS = strideOf(t("documents"), "doc_id")
    val docs = replicate(t("documents"), Map("doc_id" -> docS))
      .withColumn("text", when(col("__r") === 0, col("text")).otherwise(
        concat_ws(" ", expr(
          "transform(split(text, ' '), (w, i) -> " +
          "IF(i % 10 = __r % 10, concat(w, '~', __r), w))"))))
      .withColumn("n_chars", length(col("text")).cast("long"))
    write("documents", docs)

    // embeddings: nudge one coordinate per replica — replicas stay
    // plausible vectors but are not planted cosine twins
    val vecS = strideOf(t("embeddings"), "vec_id")
    val embs = replicate(t("embeddings"), Map("vec_id" -> vecS))
      .withColumn("embedding", expr(
        "transform(embedding, (x, i) -> " +
        "IF(__r > 0 AND i = __r % size(embedding), " +
        "CAST(x + 0.07 * __r AS FLOAT), x))"))
    write("embeddings", embs)

    spark.stop()
  }
}

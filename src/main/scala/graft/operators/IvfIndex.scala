package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index: build once, probe many — the production shape
  * of ANN at 100 TB, where the expensive parts (k-means centroids,
  * corpus cell assignment) are amortized across every query batch
  * instead of re-run per search like the inline plans.
  *
  * Layout on disk:
  *   path/centroids — (cell, c_emb, c_nrm), one small file
  *   path/corpus    — (vec_id, embedding, nrm) PARTITIONED BY cell
  *
  * The cell partitioning is the whole point: a probe touches only the
  * nProbe cell directories per query (verified as PartitionFilters in
  * the scan), so probe IO is nProbe/kCells of the corpus regardless
  * of corpus size.
  */
object IvfIndex {

  /** Build the index: spherical-k-means-refined centroids, then the
    * corpus assigned and written cell-partitioned. Both are one-time
    * costs (iters + 1 corpus passes + one shuffled write). */
  def build(v0: DataFrame, path: String, kCells: Int = 16, iters: Int = 2): Unit = {
    val cents = SimilarityOps.ivfRefinedCentroidsOf(v0, kCells, iters)
      .withColumn("c_nrm", SimilarityOps.norm(col("c_emb")))
    cents.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/centroids")
    val v = v0.withColumn("nrm", SimilarityOps.norm(col("embedding")))
    SimilarityOps.nearestCell(v, cents)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell")
      .parquet(s"$path/corpus")
  }

  def centroids(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/centroids")

  /** Probe the persisted index with (query_id, q_emb) queries: rank
    * cells against the (tiny, broadcast) centroid table, then scan
    * ONLY the probed cell partitions. The probed cell set is collected
    * to the driver (nQueries × nProbe ints) so the partition filter is
    * static — the scan prunes directories, not rows.
    *
    * Query ids here are an EXTERNAL numbering, unrelated to the
    * indexed vec_ids, so self-exclusion is off: a corpus vector whose
    * vec_id happens to equal a query_id is a legitimate neighbor, not
    * the query itself. */
  def probe(spark: SparkSession, path: String, queries: DataFrame,
            k: Int = 10, nProbe: Int = 4): DataFrame = {
    val cents = centroids(spark, path)
    val q = queries.withColumn("q_nrm", SimilarityOps.norm(col("q_emb")))
      .select(col("query_id"), col("q_emb"), col("q_nrm"))
    val probes = SimilarityOps.probeCells(cents, q, nProbe)
    val cells = probes.select("cell").distinct().collect().map(_.getLong(0))
    val assigned = spark.read.parquet(s"$path/corpus")
      .filter(col("cell").isin(cells: _*))
    SimilarityOps.searchAssigned(assigned, probes, k, excludeSelf = false)
  }

  /** Registered driver query: build the persisted index in a scratch
    * location (removed on JVM exit — repeated bench runs don't
    * accumulate disk) and probe it with externally-numbered queries
    * (the corpus's first nQueries vectors re-issued at max(id)+1-based
    * ids, disjoint from every real id at ANY corpus size) — the full
    * build→layout→directory-pruned-probe lifecycle runs under the
    * driver's rows check. Each query's rank-1 neighbor is its own
    * corpus twin (cosine 1), by the external-numbering semantics.
    * Rows-only: k-means is not SQL-expressible; equality-to-inline and
    * the PartitionFilters pin live in ScaleSpec. `kCells = 0` derives
    * the cell count from the corpus size via
    * `SimilarityOps.kCellsFor`. */
  def annIndexed(spark: SparkSession, dir: String, nQueries: Int = 5,
                 k: Int = 10, kCells: Int = 0, nProbe: Int = 4,
                 iters: Int = 2): DataFrame = {
    val tmp = graft.util.Scratch.dir("ivf_index_q")
    val v0 = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val (maxId, n) = v0.agg(max("vec_id"), count(lit(1))).head() match {
      case r if r.isNullAt(0) => (0L, 0L) // empty corpus: no vectors at all
      case r                  => (r.getLong(0), r.getLong(1))
    }
    val kc = if (kCells > 0) kCells else SimilarityOps.kCellsFor(n)
    build(v0, tmp, kc, iters)
    val queries = v0.filter(col("vec_id") < nQueries)
      .select((col("vec_id") + lit(maxId + 1L)).as("query_id"),
        col("embedding").as("q_emb"))
    probe(spark, tmp, queries, k, nProbe)
  }
}

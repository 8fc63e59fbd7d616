package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Iterative link-analysis rank (PageRank) as a deterministic,
  * oracle-able Spark plan — the graph centrality read a web-scale
  * curation pipeline runs to prioritize crawl domains (CommonCrawl
  * publishes exactly this over its host graph) and the analytics
  * sibling of NearDedup's connected components.
  *
  * Why FIXED-POINT INTEGER arithmetic: float PageRank sums
  * contributions in partition order, so two runs of the same query
  * can differ in the last ulp and no cross-engine hash can pin it.
  * Here ranks live in micro-units (1e6 = rank 1.0) as LONGs; the
  * per-edge contribution is `rank div outdeg` (integer division —
  * engine-identical), the damped update is
  * `150000 + (850000 · Σcontrib) div 1000000`, and LONG sums are
  * exact and order-independent — so the whole iteration is
  * bit-reproducible at any partitioning AND in ANSI SQL, which is
  * what lets a 3-iteration unrolled DuckDB twin hash-match it.
  * The deliberate cost: integer division truncates (total mass
  * leaks slightly downward per hop), which is irrelevant for a
  * RANKING signal and the price of determinism.
  *
  * Scale shape: one iteration = one (edges ⋈ ranks) join on src +
  * one keyed sum on dst — the Pregel step expressed relationally;
  * `iters` bounds the rounds and `localCheckpoint` cuts the growing
  * lineage per round (the BPE-training precedent). Headroom: the
  * damping multiply stays inside a LONG while Σ in-contributions per
  * node < ~10^13 micro-units (~10^7-node graphs at default mass);
  * beyond that, widen the multiply to DECIMAL(38,0) — same algebra.
  * The bound is ENFORCED in-plan (a codegen'd raise_error guard on
  * each iteration's in_sum), so an oversized graph fails loudly
  * instead of silently wrapping the multiply in non-ANSI mode.
  */
object GraphRank {

  /** Rank every node of `edges` (cols `src`, `dst`) after `iters`
    * damped rounds, all nodes starting at 1.0 (1e6 micro-units).
    * Returns (node, rank) with rank in micro-units. Dangling nodes
    * (no out-edges) simply contribute nothing — standard practice
    * for ranking use. */
  def pageRankOf(edges: DataFrame, iters: Int = 3,
                 dampingPpm: Long = 850000L): DataFrame =
    pageRankImpl(edges, iters, dampingPpm, Long.MaxValue)

  /** [[pageRankOf]] with the overflow numerator injectable so the
    * guard is unit-testable without a 10^13-mass graph. */
  private[graft] def pageRankImpl(edges: DataFrame, iters: Int,
                                  dampingPpm: Long, headroom: Long): DataFrame = {
    require(iters >= 1 && dampingPpm >= 0 && dampingPpm <= 1000000L)
    val basePpm = 1000000L - dampingPpm
    // materialize the edge list ONCE: every iteration (and the node /
    // out-degree builds) joins it, and without the checkpoint the
    // caller's edge-derivation plan would re-execute per round
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).localCheckpoint()
    var ranks = nodes.withColumn("rank", lit(1000000L))
    for (i <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("in_sum"))
      // headroom guard, evaluated in-plan (codegen'd, no extra job):
      // in non-ANSI mode the damping multiply would WRAP silently once
      // Σ in-contributions per node exceeds Long.MaxValue/dampingPpm
      // (~10^13 micro-units at the default) — corrupt ranks on a
      // too-big graph must be a loud failure, not a quiet one
      val maxSafeInSum = headroom / math.max(dampingPpm, 1L)
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(basePpm)
            + expr(s"($dampingPpm * (CASE WHEN coalesce(in_sum, 0L) > ${maxSafeInSum}L " +
              s"THEN raise_error('pageRankOf: in_sum overflows LONG at dampingPpm=$dampingPpm " +
              s"— widen the damping multiply to DECIMAL(38,0) for graphs this large') " +
              s"ELSE coalesce(in_sum, 0L) END)) div 1000000"))
            .as("rank"))
      // each round references the previous ranks exactly ONCE, so the
      // unrolled plan is a linear DAG one action evaluates end-to-end —
      // a per-round eager localCheckpoint materialized every round as
      // its own job and broke pipelining at the default iters=3.
      // Lineage still can't grow unboundedly: deep iteration counts
      // cut it periodically.
      if (i % 8 == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Registered `q_graph_rank`: centrality of the customer→supplier
    * purchase graph (distinct edges from orders ⋈ lineitem, nodes
    * namespaced `c<id>`/`s<id>` so the two key spaces cannot
    * collide). Customers have no in-edges, so they settle at the
    * base mass and the suppliers sort by purchase centrality —
    * "which suppliers does the demand graph concentrate on", the
    * same read a crawl scheduler does over hosts. Hash-matched
    * against a 3-iteration unrolled DuckDB twin. */
  def supplierRank(spark: SparkSession, dir: String): DataFrame = {
    val edges = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey").cast("string")).as("src"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
      .distinct()
    pageRankOf(edges, iters = 3)
      .orderBy("node")
  }

  def supplierRankOracle: String =
    """WITH e AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
      |    's' || CAST(l_suppkey AS VARCHAR) AS dst
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      |od AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
      |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
      |c1 AS (SELECT e.dst AS node, CAST(SUM(r0.rank // od.outdeg) AS BIGINT) AS s
      |  FROM e JOIN r0 ON e.src = r0.node JOIN od ON e.src = od.src GROUP BY 1),
      |r1 AS (SELECT n.node,
      |    CAST(150000 + (850000 * COALESCE(c1.s, 0)) // 1000000 AS BIGINT) AS rank
      |  FROM nodes n LEFT JOIN c1 ON n.node = c1.node),
      |c2 AS (SELECT e.dst AS node, CAST(SUM(r1.rank // od.outdeg) AS BIGINT) AS s
      |  FROM e JOIN r1 ON e.src = r1.node JOIN od ON e.src = od.src GROUP BY 1),
      |r2 AS (SELECT n.node,
      |    CAST(150000 + (850000 * COALESCE(c2.s, 0)) // 1000000 AS BIGINT) AS rank
      |  FROM nodes n LEFT JOIN c2 ON n.node = c2.node),
      |c3 AS (SELECT e.dst AS node, CAST(SUM(r2.rank // od.outdeg) AS BIGINT) AS s
      |  FROM e JOIN r2 ON e.src = r2.node JOIN od ON e.src = od.src GROUP BY 1),
      |r3 AS (SELECT n.node,
      |    CAST(150000 + (850000 * COALESCE(c3.s, 0)) // 1000000 AS BIGINT) AS rank
      |  FROM nodes n LEFT JOIN c3 ON n.node = c3.node)
      |SELECT node, rank FROM r3 ORDER BY node""".stripMargin
}

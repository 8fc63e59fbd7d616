package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.sources.Tables

/** Fuzzy record linkage: match records across two feeds whose join
  * key is a NAME that arrives slightly corrupted (typos, OCR noise,
  * re-keyed exports) — the address/identity matching problem under
  * the reference's price-paid feed, where `tuid` is the clean key
  * precisely because upstream linkage already solved this.
  *
  * The classic two-stage shape: a BLOCKING key (cheap, high-recall)
  * restricts candidates to records that agree on some stable
  * fragment, then Levenshtein verifies each candidate pair — the
  * edit-distance evaluation is Spark's codegen `levenshtein`, and
  * work is Σ block² (bounded by the blocking key's selectivity),
  * never |left|×|right|. Blocking trades recall for scale by
  * construction: a corruption that hits the blocking fragment itself
  * escapes linkage — the standard mitigation is a second pass with a
  * different key (multi-pass blocking), which is just a `unionByName`
  * of two fuzzyJoin calls here.
  */
object RecordLinkage {

  /** Blocked fuzzy join: candidate pairs share the blocking key,
    * verified pairs have `levenshtein ≤ maxDist`. Emits every
    * surviving pair with its distance (callers pick rank-1 per left
    * row if they need a unique match). */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
                leftName: String, rightName: String,
                blockLeft: Column, blockRight: Column, maxDist: Int): DataFrame =
    left.withColumn("__bk", blockLeft)
      .join(right.withColumn("__bk", blockRight), "__bk")
      // THRESHOLDED edit distance: the bounded kernel computes only the
      // 2·maxDist+1 diagonal band and exits early (O(len·k), not
      // O(len²)) — candidate verification is the hot loop of blocked
      // linkage, and almost every candidate is a non-match the full
      // matrix wastes work rejecting. Returns −1 above the bound, the
      // exact distance otherwise, so surviving rows carry the same
      // name_dist the unbounded expression produced.
      .withColumn("name_dist",
        levenshtein(col(leftName), col(rightName), maxDist))
      .filter(col("name_dist") >= 0 && col("name_dist") <= maxDist)
      .drop("__bk")

  /** Registered `q_fuzzy_link`: a synthetic dirty feed — every
    * customer name re-keyed with one interior digit bumped (position
    * 12, the 10⁶ place: always 0 at test scales, so the bumped name
    * collides with no real customer and each dirty row has exactly
    * one true match at distance 1) — linked back to the clean table
    * blocking on the name's last 4 characters (untouched by the
    * perturbation, so blocking recall is exactly 1 here and the
    * linkage must recover every row). Hash-matched against the same
    * derivation + levenshtein in DuckDB. */
  def fuzzyLink(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_name"))
    val off = NearDedup.plantedOffset(c, "c_custkey")
    val dirty = c.select(
      (col("c_custkey") + off).as("d_id"),
      concat(substring(col("c_name"), 1, 11),
        ((substring(col("c_name"), 12, 1).cast("int") + 1) % 10).cast("string"),
        substring(col("c_name"), 13, 100)).as("d_name"))
    fuzzyJoin(dirty, c, "d_name", "c_name",
        expr("right(d_name, 4)"), expr("right(c_name, 4)"), maxDist = 1)
      .select(col("d_id"), col("c_custkey"),
        col("name_dist").cast(LongType).as("name_dist"))
      .orderBy("d_id", "c_custkey")
  }

  /** Blocked fuzzy join verified by JARO-WINKLER instead of edit
    * distance — the right verifier for name-shaped keys (shared
    * prefixes dominate; a transposed interior digit costs JW far less
    * than a changed leading one). The similarity is the native
    * codegen [[org.apache.spark.sql.graft.JaroWinkler]], bit-equal to
    * DuckDB's RapidFuzz kernel (ExpressionSpec pins the doubles), so
    * the emitted similarity column itself carries the hash oracle —
    * not just the survivor set. */
  def fuzzyJoinJw(left: DataFrame, right: DataFrame,
                  leftName: String, rightName: String,
                  blockLeft: Column, blockRight: Column,
                  minSim: Double): DataFrame =
    left.withColumn("__bk", blockLeft)
      .join(right.withColumn("__bk", blockRight), "__bk")
      .withColumn("name_sim",
        graft.functions.native.jaro_winkler(col(leftName), col(rightName)))
      .filter(col("name_sim") >= minSim)
      .drop("__bk")

  /** Registered `q_fuzzy_link_jw`: the same dirty feed as
    * `q_fuzzy_link`, verified by JW ≥ 0.9 (the bumped digit sits deep
    * in a ~18-char name, so true pairs score ≈0.97+, far from the
    * threshold; the blocking key bounds candidates identically). */
  def fuzzyLinkJw(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_name"))
    val off = NearDedup.plantedOffset(c, "c_custkey")
    val dirty = c.select(
      (col("c_custkey") + off).as("d_id"),
      concat(substring(col("c_name"), 1, 11),
        ((substring(col("c_name"), 12, 1).cast("int") + 1) % 10).cast("string"),
        substring(col("c_name"), 13, 100)).as("d_name"))
    fuzzyJoinJw(dirty, c, "d_name", "c_name",
        expr("right(d_name, 4)"), expr("right(c_name, 4)"), minSim = 0.9)
      .select(col("d_id"), col("c_custkey"), col("name_sim"))
      .orderBy("d_id", "c_custkey")
  }

  /** MULTI-PASS blocking — the documented recall repair for blocked
    * linkage, registered: a corruption inside one blocking fragment
    * escapes that pass, so production linkage runs several passes
    * with different keys and unions the verified pairs. Pass A blocks
    * on the name's last 4 chars, pass B on chars 13-16 (an interior
    * digit fragment — different positions, same selectivity); the
    * perturbation at position 12 touches neither, and the union
    * dedups on pair identity so a pair surviving both passes emits
    * once, keeping its best (min) distance. Cost = Σ passes' block
    * work — never |L|×|R|.
    *
    * SELECTIVITY IS THE CONTRACT: a blocking key must actually
    * partition the table. The tempting `left(name, 9)` here is the
    * constant literal `Customer#` on every row — ONE block, a silent
    * |L|×|R| cross join (measured: 477 s at sf0.1 vs ~1 s blocked).
    * Block-size skew is exactly what [[ReferenceOps.keySkewProfile]]
    * diagnoses; run it on a candidate key before shipping a pass. */
  def fuzzyLinkMultipass(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_name"))
    val off = NearDedup.plantedOffset(c, "c_custkey")
    val dirty = c.select(
      (col("c_custkey") + off).as("d_id"),
      concat(substring(col("c_name"), 1, 11),
        ((substring(col("c_name"), 12, 1).cast("int") + 1) % 10).cast("string"),
        substring(col("c_name"), 13, 100)).as("d_name"))
    val passA = fuzzyJoin(dirty, c, "d_name", "c_name",
      expr("right(d_name, 4)"), expr("right(c_name, 4)"), maxDist = 1)
    val passB = fuzzyJoin(dirty, c, "d_name", "c_name",
      expr("substring(d_name, 13, 4)"), expr("substring(c_name, 13, 4)"),
      maxDist = 1)
    passA.unionByName(passB)
      .groupBy("d_id", "c_custkey")
      .agg(min(col("name_dist")).cast(LongType).as("name_dist"),
        count(lit(1)).as("n_passes"))
      .orderBy("d_id", "c_custkey")
  }

  def fuzzyLinkMultipassOracle: String =
    """WITH c AS (SELECT c_custkey, c_name FROM customer),
      |o AS (SELECT MAX(c_custkey) + 1 AS off FROM c),
      |d AS (SELECT c_custkey + off AS d_id,
      |        substring(c_name, 1, 11) ||
      |        CAST((CAST(substring(c_name, 12, 1) AS INT) + 1) % 10 AS VARCHAR) ||
      |        substring(c_name, 13, 100) AS d_name
      |      FROM c CROSS JOIN o),
      |pa AS (SELECT d.d_id, c.c_custkey, levenshtein(d.d_name, c.c_name) AS nd
      |       FROM d JOIN c ON right(d.d_name, 4) = right(c.c_name, 4)
      |       WHERE levenshtein(d.d_name, c.c_name) <= 1),
      |pb AS (SELECT d.d_id, c.c_custkey, levenshtein(d.d_name, c.c_name) AS nd
      |       FROM d JOIN c ON substring(d.d_name, 13, 4) = substring(c.c_name, 13, 4)
      |       WHERE levenshtein(d.d_name, c.c_name) <= 1),
      |u AS (SELECT * FROM pa UNION ALL SELECT * FROM pb)
      |SELECT d_id, c_custkey, CAST(MIN(nd) AS BIGINT) AS name_dist,
      |  COUNT(*) AS n_passes
      |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def fuzzyLinkJwOracle: String =
    """WITH c AS (SELECT c_custkey, c_name FROM customer),
      |o AS (SELECT MAX(c_custkey) + 1 AS off FROM c),
      |d AS (SELECT c_custkey + off AS d_id,
      |        substring(c_name, 1, 11) ||
      |        CAST((CAST(substring(c_name, 12, 1) AS INT) + 1) % 10 AS VARCHAR) ||
      |        substring(c_name, 13, 100) AS d_name
      |      FROM c CROSS JOIN o)
      |SELECT d.d_id, c.c_custkey,
      |  jaro_winkler_similarity(d.d_name, c.c_name) AS name_sim
      |FROM d JOIN c ON right(d.d_name, 4) = right(c.c_name, 4)
      |WHERE jaro_winkler_similarity(d.d_name, c.c_name) >= 0.9
      |ORDER BY d_id, c_custkey""".stripMargin

  def fuzzyLinkOracle: String =
    """WITH c AS (SELECT c_custkey, c_name FROM customer),
      |o AS (SELECT MAX(c_custkey) + 1 AS off FROM c),
      |d AS (SELECT c_custkey + off AS d_id,
      |        substring(c_name, 1, 11) ||
      |        CAST((CAST(substring(c_name, 12, 1) AS INT) + 1) % 10 AS VARCHAR) ||
      |        substring(c_name, 13, 100) AS d_name
      |      FROM c CROSS JOIN o)
      |SELECT d.d_id, c.c_custkey,
      |  CAST(levenshtein(d.d_name, c.c_name) AS BIGINT) AS name_dist
      |FROM d JOIN c ON right(d.d_name, 4) = right(c.c_name, 4)
      |WHERE levenshtein(d.d_name, c.c_name) <= 1
      |ORDER BY d_id, c_custkey""".stripMargin
}

package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.FileStats

/** Optimizer rule: answer a whole-table `count(*)` / `count(col)` /
  * `min(col)` / `max(col)` over a graft snapshot version from the
  * version's committed stats manifest — ZERO data IO, no job at all.
  *
  * Why this matters at 100 TB: `SELECT count(*) FROM t` over a
  * 100k-file version is otherwise a full cluster-wide scan wave (or,
  * at best, 100k footer reads). The manifest ([[FileStats]]) already
  * recorded every file's exact row count, null counts and column
  * extrema ONCE at publish time, so the whole aggregate is one small
  * metadata file read at PLAN time — the Delta/Iceberg
  * "metadata-only query" answered the Spark-native way, by rewriting
  * the [[Aggregate]] to a [[LocalRelation]] carrying the result row.
  *
  * REFUSE-DON'T-GUESS (the [[MatViewRewrite]] contract): the rewrite
  * fires only on decisive evidence, and every refusal falls through
  * to the ordinary scan — it is an optimization, never a correctness
  * dependency. It refuses when:
  *  - the read is a CHAIN head (DV/MoR links apply — the manifest
  *    describes pre-merge files) or a write bootstrap
  *    ([[graft.sources.GraftTable.statsReadPoint]] is None);
  *  - the version carries no stats manifest, or reading it fails;
  *  - a grouping key other than the layout's `txn_month` partition
  *    column is present (partition values are path-exact per file, so
  *    GROUP BY txn_month serves one manifest-summed row per month —
  *    any other key would need to see inside files), or a FILTER
  *    clause, DISTINCT, or a filter between the aggregate and the
  *    relation is (file stats cannot see inside files);
  *  - an aggregate is anything but count(constant) / count(attr) /
  *    min(attr) / max(attr);
  *  - the manifest is not decisive for a column: some file lacks the
  *    column's entry or null count (count), or carries flag `u`
  *    (min/max — a writer that dropped stats, NaN doubles, unordered
  *    types like decimal/boolean);
  *  - the serialized stats domain does not losslessly produce the
  *    column's Catalyst type (notably ts-nanos: truncating to micros
  *    would fabricate a min that is not in the data).
  *
  * Soundness notes: parquet min/max statistics describe NON-NULL
  * values, exactly matching SQL min/max semantics; an all-null column
  * (every file flag `n`) decisively yields NULL. String extrema
  * compare in parquet's unsigned UTF-8 order — equal to code-point
  * order, which is Spark's binary string order. The manifest is
  * collected from the footers the publish itself wrote (Spark's
  * parquet writer, which does not truncate chunk statistics), and
  * version dirs are immutable, so the facts cannot drift from the
  * files. Pinned reads (versionAsOf / tag / timestampAsOf / branch)
  * are served too: the manifest is per-version metadata. The
  * partition column itself — absent from footers, exact in paths —
  * gets synthetic per-file facts ([[FileStats.aggFacts]]), so
  * count/min/max over `txn_month` serve like any other column.
  *
  * The rewritten plan contains no graft relation, making the rule
  * self-terminating under the optimizer's fixed point. Output
  * attributes keep their exprIds, so parents bind unchanged.
  *
  * Derived facts are cached per (path, version, manifest-file
  * identity) in a bounded LRU: every query pays one FS stat (which
  * also keeps a drop-and-recreate at the same path from serving stale
  * facts), repeat dashboards skip the manifest read+parse — the only
  * cost that grows with FILE COUNT at 100 TB.
  */
object MetaAggregate extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg: Aggregate if !agg.isStreaming =>
      tryReplace(agg).getOrElse(agg)
  }

  private def trace(msg: => String): Unit = logDebug(s"meta-aggregate: $msg")

  /** The relation under the aggregate — directly, or through the
    * pass-through Project column pruning inserts (attributes only; an
    * alias or computation would change what the stats describe). */
  private def baseOf(child: LogicalPlan): Option[DataSourceV2Relation] = child match {
    case r: DataSourceV2Relation => Some(r)
    case Project(list, r: DataSourceV2Relation)
        if list.forall(_.isInstanceOf[AttributeReference]) => Some(r)
    case _ => None
  }

  private def tryReplace(agg: Aggregate): Option[LogicalPlan] = {
    val rel = baseOf(agg.child).getOrElse { return None }
    val table = rel.table match {
      case t: graft.sources.GraftTable => t
      case _                           => return None
    }
    val (path, version) = table.statsReadPoint.getOrElse {
      trace("chain head or bootstrap — stats describe pre-merge files"); return None }
    // grouping: none (whole-table), or ONLY the layout's partition
    // column — every row of a file carries the file's one path value,
    // so per-group facts are exact per-file sums, nothing in-file
    val grouped = agg.groupingExpressions.nonEmpty
    if (!agg.groupingExpressions.forall {
          case a: AttributeReference => a.name == PartitionCol && fromRel(rel, a)
          case _ => false
        }) { trace("grouping is not the partition column"); return None }
    // every aggregate expression must be servable BEFORE any IO
    val specs: Seq[AggSpec] = agg.aggregateExpressions.map {
      case a: AttributeReference
          if grouped && a.name == PartitionCol && fromRel(rel, a) => GroupKey
      case Alias(a: AttributeReference, _)
          if grouped && a.name == PartitionCol && fromRel(rel, a) => GroupKey
      case Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(l: Literal)) if l.value != null => CountStar
          case Count(Seq(a: AttributeReference)) if fromRel(rel, a) =>
            CountCol(a.name)
          case Min(a: AttributeReference) if fromRel(rel, a) =>
            MinCol(a.name, a.dataType)
          case Max(a: AttributeReference) if fromRel(rel, a) =>
            MaxCol(a.name, a.dataType)
          case other => trace(s"unsupported aggregate: $other"); return None
        }
      case other => trace(s"unsupported output expression: $other"); return None
    }
    // FAULT ISOLATION: plan-time metadata reads must never break the
    // query — any failure falls through to the ordinary scan
    val facts = factsFor(path, version).getOrElse {
      trace(s"no stats manifest at $path@v$version"); return None }
    // (group key, facts) per output row: one whole-table row, or one
    // per partition dir found in the manifest
    val groups: Seq[(Option[String], FileStats.AggFacts)] =
      if (!grouped) Seq((None, facts.whole))
      else facts.byMonth.getOrElse {
        trace("a manifest entry is not under a partition dir"); return None
      }.toSeq.sortBy(_._1)
    val rows: Seq[InternalRow] = groups.map { case (month, f) =>
      val values: Seq[Any] = specs.map {
        case GroupKey  => month.map(UTF8String.fromString).orNull
        case CountStar => f.rows
        case CountCol(c) =>
          f.cols.get(c).flatMap(_.nonNull).getOrElse {
            trace(s"null counts not decisive for '$c'"); return None }
        case MinCol(c, dt) => extremum(f, c, dt, isMin = true).getOrElse { return None }
        case MaxCol(c, dt) => extremum(f, c, dt, isMin = false).getOrElse { return None }
      }
      InternalRow.fromSeq(values)
    }
    trace(s"served from $path@v$version manifest " +
      s"(${specs.size} aggregates × ${rows.size} group(s), no scan)")
    Some(LocalRelation(agg.aggregateExpressions.map(_.toAttribute), rows))
  }

  /** The layout's one partition column ([[graft.sources.Sinks]]'
    * month dirs) — the only grouping the manifest can attribute. */
  private val PartitionCol = "txn_month"

  private final case class Facts(whole: FileStats.AggFacts,
                                 byMonth: Option[Map[Option[String], FileStats.AggFacts]])

  /** Test-visible per-store count of actual manifest read+parse
    * passes, so a spec can pin that repeated optimizations of the
    * same version hit the cache (keyed by path: parallel suites'
    * stores never perturb each other's count). */
  private val manifestParses =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private[graft] def parsesOf(path: String): Long =
    Option(manifestParses.get(path)).fold(0L)(_.longValue)

  // (path@version + manifest-file mtime/length) → derived facts,
  // bounded LRU. Version dirs are immutable, but a table can be
  // DROPPED and re-created at the same path, so the key carries the
  // manifest FILE's identity: every query pays one cheap FS stat (the
  // probe also decides absence, which is never cached), and only a
  // matching identity serves cached facts — at a 100k-file manifest
  // the read+parse is the dominant plan-time cost and every dashboard
  // query would otherwise pay it. Read FAILURES are not cached
  // either: a transient IO error stays a one-query fallback, not a
  // sticky refusal.
  private val cacheCap = 64
  private val factsCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Facts](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Facts]): Boolean = size() > cacheCap
      })

  /** None = decisively no manifest OR the probe/read failed (logged). */
  private def factsFor(path: String, version: Long): Option[Facts] =
    try {
      val spark = SparkSession.active
      val (mtime, len) = FileStats.manifestStatus(spark, path, version)
        .getOrElse { return None }
      val key = s"$path@v$version:$mtime:$len"
      val hit = factsCache.get(key)
      if (hit != null) return Some(hit)
      val json = FileStats.manifestContent(spark, path, version)
        .getOrElse { return None } // raced a concurrent drop — refuse
      manifestParses.merge(path, 1L, (a, b) => a + b)
      val facts = Facts(FileStats.aggFacts(json), FileStats.aggFactsByMonth(json))
      factsCache.put(key, facts)
      Some(facts)
    } catch {
      case scala.util.control.NonFatal(e) =>
        trace(s"manifest read failed for $path@v$version (base read): $e"); None
    }

  private sealed trait AggSpec
  private case object GroupKey extends AggSpec
  private case object CountStar extends AggSpec
  private final case class CountCol(name: String) extends AggSpec
  private final case class MinCol(name: String, dt: DataType) extends AggSpec
  private final case class MaxCol(name: String, dt: DataType) extends AggSpec

  private def fromRel(rel: DataSourceV2Relation, a: AttributeReference): Boolean =
    rel.outputSet.contains(a)

  /** Some(value-or-null) when the manifest decisively knows the
    * extremum; Option[Any] is the refusal channel, the inner null the
    * SQL NULL of an all-null column. */
  private def extremum(f: FileStats.AggFacts, col: String, dt: DataType,
                       isMin: Boolean): Option[Any] = {
    val cf = f.cols.get(col).getOrElse { trace(s"no stats for '$col'"); return None }
    if (!cf.decisive) { trace(s"stats not decisive for '$col'"); return None }
    (if (isMin) cf.min else cf.max) match {
      case None    => Some(null) // all files all-null → SQL NULL
      case Some(s) =>
        val v = toCatalyst(cf.tpe, s, dt)
        if (v.isEmpty) trace(s"stats domain ${cf.tpe} does not produce $dt for '$col'")
        v
    }
  }

  /** Manifest-serialized value → Catalyst internal value of the
    * column's exact type; None where the mapping would lose
    * information. The (tag, Catalyst type) pairs mirror
    * [[FileStats.typeTag]]'s footer-type mapping, so a mismatch means
    * schema drift — refuse. */
  private def toCatalyst(tpe: String, s: String, dt: DataType): Option[Any] = (tpe, dt) match {
    case ("long", ByteType)       => Some(s.toLong.toByte)
    case ("long", ShortType)      => Some(s.toLong.toShort)
    case ("long", IntegerType)    => Some(s.toLong.toInt)
    case ("long", LongType)       => Some(s.toLong)
    case ("double", FloatType)    => Some(s.toDouble.toFloat)
    case ("double", DoubleType)   => Some(s.toDouble)
    case ("string", StringType)   => Some(UTF8String.fromString(s))
    case ("date", DateType)       => Some(s.toLong.toInt)
    case ("ts-micros", TimestampType) => Some(s.toLong)
    case ("ts-millis", TimestampType) => Some(math.multiplyExact(s.toLong, 1000L))
    case _ => None // incl. ts-nanos → micros: truncation fabricates values
  }
}

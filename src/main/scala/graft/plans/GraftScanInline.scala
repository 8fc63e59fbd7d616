package graft.plans

import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Optimizer rule: INLINE a catalog chain-head read's merged plan
  * into the consuming query, eliding the V1 bridge entirely.
  *
  * A chain head's state exists only merged, and the DSv2 fallback that
  * serves it ([[graft.sources.MergedScanBuilder]]) is a
  * [[org.apache.spark.sql.connector.read.V1Scan]] whose relation
  * executes the merged plan as an opaque RDD. That bridge is correct
  * but costs three things at scale: the seam drops vectorized /
  * whole-stage-codegen output where the RDD surfaces, the outer
  * planner cannot price the scan (Spark wraps V1 scans in
  * `V1ScanWrapper`, which forwards no statistics — a small dimension
  * head is costed at `defaultSizeInBytes` and never auto-broadcasts),
  * and the inner plan optimizes in isolation from the consumer.
  *
  * This rule — running in the operator-optimization batch, BEFORE
  * scan pushdown — replaces the relation with the chain-merged
  * logical plan itself, output-aliased onto the relation's attribute
  * ids so every parent binds unchanged. The whole tree then optimizes
  * as ONE query: the consumer's filters and column pruning sink
  * through the delta-union and anti-join into the base parquet scan
  * by Catalyst's own rules, sizes flow from parquet file statistics
  * (the anti-join prices at its streamed side, the union as the sum —
  * bytes the planner trusts for broadcast decisions), and codegen
  * spans from the base scan up into the consumer. The V1 bridge stays
  * as the fallback for sessions that load the connector without
  * [[graft.GraftExtensions]].
  *
  * Safety: [[graft.sources.GraftTable.inlineReadPlan]] is defined
  * exactly for catalog-mode chain heads (plain heads already delegate
  * to vectorized parquet scans); row-level-operation reads carry a
  * `RowLevelOperationTable`, write commands hold their target outside
  * the child list, and streaming relations are a different node — all
  * pass through untouched. The plan is rebuilt FRESH per occurrence,
  * so a self-join inlines with distinct expression ids, and the
  * inlined subtree contains no graft relation (chains resolve to
  * parquet scans), making the rule self-terminating under the
  * optimizer's fixed point. */
object GraftScanInline extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case r: DataSourceV2Relation =>
      r.table match {
        case t: graft.sources.GraftTable =>
          t.inlineReadPlan match {
            case Some(df) =>
              // the OPTIMIZED inner plan: analysis output still carries
              // ResolvedHint nodes (the merged read broadcasts its
              // delete-key sides) whose elimination batch already ran —
              // splicing them back in would crash the planner. The
              // optimized subtree is hint-free and still participates
              // in the outer fixed point (filters push into it).
              val inner = df.queryExecution.optimizedPlan
              val byName = inner.output.map(a => a.name -> a).toMap
              if (r.output.forall(o =>
                  byName.get(o.name).exists(_.dataType == o.dataType)))
                Project(r.output.map(o =>
                  Alias(byName(o.name), o.name)(exprId = o.exprId)), inner)
              else r // refuse-don't-guess: shape drift keeps the V1 bridge
            case None => r
          }
        case _ => r
      }
  }
}

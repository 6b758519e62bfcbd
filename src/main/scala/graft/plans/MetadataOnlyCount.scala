package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate,
  LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

import graft.sources.LakeFileIndex

/** Metadata-only `COUNT(*)` (Delta's OptimizeMetadataOnlyQuery
  * analog): an unfiltered scalar count over a lake relation is
  * answered from the transaction log — Σ numRecords − Σ dvCardinality
  * over the snapshot's AddFiles — instead of scanning the table. At
  * 100 TB that turns the most common sanity query there is from a
  * full-table scan into a driver-side metadata fold the snapshot has
  * already paid for.
  *
  * Strictly guarded, bail-to-scan on anything uncertain:
  *  - exactly one aggregate, `count(non-null literal)` (what
  *    `count(*)`/`count(1)` analyze to), not DISTINCT, no FILTER
  *    clause, no grouping;
  *  - nothing between the aggregate and the relation but deterministic
  *    projections (they cannot change cardinality; a Filter/Join/etc.
  *    does and stops the match);
  *  - every AddFile carries a footer row count (converted/foreign
  *    files may not — then the scan is the only truth).
  *
  * Deletion vectors are already net in the log: live rows per file =
  * numRecords − dvCardinality, the same arithmetic the DV-aware scan
  * materializes row by row.
  */
object MetadataOnlyCount extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(
        Seq(), Seq(a @ Alias(ae: AggregateExpression, _)), child, _)
        if isCountStar(ae) =>
      lakeIndexBelow(child) match {
        case Some(idx) if idx.snap.files.forall(_.numRecords >= 0L) =>
          val live = idx.snap.files
            .map(f => f.numRecords - f.dvCardinality).sum
          LocalRelation(Seq(a.toAttribute), Seq(InternalRow(live)))
        case _ => agg
      }
  }

  private def isCountStar(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case Count(Seq(Literal(v, _))) => v != null
      case _ => false
    })

  /** The lake FileIndex under nothing but deterministic projections. */
  private def lakeIndexBelow(p: LogicalPlan): Option[LakeFileIndex] =
    p match {
      case Project(projectList, child)
          if projectList.forall(_.deterministic) =>
        lakeIndexBelow(child)
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location match {
          case idx: LakeFileIndex => Some(idx)
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }
}

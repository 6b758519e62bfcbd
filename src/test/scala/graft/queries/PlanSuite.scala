package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan regression guards: the scale properties the gate
  * queries were designed around must survive refactors — a broadcast
  * that silently becomes a shuffle join, a filter that stops reaching
  * the parquet scan, or a top-K that becomes a global sort would pass
  * correctness gates while ruining 100 TB behavior.
  */
class PlanSuite extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.explainString(FormattedMode)
  }

  test("dimension joins broadcast (q3, q20)") {
    assert(planOf("q3_join_revenue").contains("BroadcastHashJoin"))
    val star = planOf("q20_star_join")
    assert(star.contains("BroadcastHashJoin"))
  }

  test("filters and projections reach the parquet scan (q2)") {
    val plan = planOf("q2_filter_project")
    assert(plan.contains("PushedFilters: ["))
    assert(!plan.contains("PushedFilters: []"))
    // narrow projection: the scan must not read all lineitem columns
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.count(_ == ',') < 8,
      s"scan reads too many columns: $readSchema")
  }

  test("top-K plans as TakeOrderedAndProject, not a global sort (q5)") {
    val plan = planOf("q5_topk_orders")
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("lake reads plan through LakeFileIndex with partition filters") {
    val plan = planOf("lake_partition_scan")
    assert(plan.contains("LakeFileIndex"))
    assert(plan.contains("PartitionFilters: ["))
  }

  test("sessionize plans as window+sort, not a group materialization") {
    val plan = planOf("sessionize_events")
    // gaps-and-islands: spillable sort + streaming window frames;
    // a typed flatMapGroups plan (MapGroups over materialized groups)
    // would OOM on one hot user at scale
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("MapGroups"), plan)
  }

  test("salted join stays a shuffled equi-join on (key, salt)") {
    val plan = planOf("q21_salted_skew_join")
    // the salt must be part of the join keys (no cartesian, no BNLJ)
    assert(plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}

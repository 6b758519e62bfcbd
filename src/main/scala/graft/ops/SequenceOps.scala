package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-event-sequence (funnel) analysis: for each entity, the
  * earliest time it completes step 1, then the earliest step-2 event
  * STRICTLY AFTER that, and so on — the standard product-analytics
  * funnel with strict event ordering (greedy-earliest, which is
  * optimal for "exists an ordered subsequence").
  *
  * Shape for scale: every step is a windowed conditional `min` over
  * the SAME `partitionBy(entity)` spec — the chain plans as one
  * shuffle + sequential window projections over it (no re-exchange
  * between steps), so a k-step funnel does not cost k joins or k
  * shuffles, and no group is ever materialized as a collection
  * (state per entity is k running minima).
  */
object SequenceOps {

  /** One row per entity: `step_1_ts .. step_k_ts` (earliest strictly-
    * ordered completion time of each prefix; NULL once a step is never
    * reached) and `funnel_depth` (longest completed prefix).
    */
  def funnel(
      df: DataFrame, entityCol: String, tsCol: String, typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(entityCol))
    val stepped = steps.zipWithIndex.foldLeft(df) { case (acc, (ev, i)) =>
      val cond =
        if (i == 0) col(typeCol) === ev
        else col(typeCol) === ev && col(tsCol) > col(s"__step_$i")
      acc.withColumn(s"__step_${i + 1}",
        min(when(cond, col(tsCol))).over(w))
    }
    // ascending fold so the DEEPEST completed step is checked first
    // (each later `when` wraps the previous as its otherwise-branch)
    val depth = steps.indices.foldLeft(lit(0)) { case (acc, i) =>
      when(col(s"__step_${i + 1}").isNotNull, i + 1).otherwise(acc)
    }
    stepped
      .groupBy(col(entityCol))
      .agg(first(col("__step_1")).as("step_1_ts"),
        (2 to steps.size).map(i =>
          first(col(s"__step_$i")).as(s"step_${i}_ts")) :+
          first(depth).as("funnel_depth"): _*)
  }
}

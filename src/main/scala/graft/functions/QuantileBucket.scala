package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Bucket index of a double against sorted quantile boundaries:
  * the number of boundaries strictly below the value, found by BINARY
  * SEARCH — O(log #boundaries) per row.
  *
  * Replaces the Z-order when-ladder (`foldLeft` of up to 2^bits-1
  * literal comparisons per column per row, [[graft.lake.ZOrder]]):
  * the ladder is codegen'd but O(2^bits) work per row, so raising
  * `bits` for finer clustering multiplied the per-row cost; here it
  * raises a log factor, and the generated code size stays O(1) (the
  * boundary array rides as one reference object, not inlined
  * comparisons).
  *
  * The second child is a foldable `ARRAY<DOUBLE>` literal of sorted
  * distinct boundaries, so the expression round-trips through the
  * function registry like every other graft expression.
  */
case class QuantileBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  /** Sorted boundaries, decoded once per task from the literal. */
  @transient private lazy val bounds: Array[Double] = {
    require(right.foldable, "quantile boundaries must be a literal")
    right.eval(null).asInstanceOf[ArrayData].toDoubleArray()
  }

  def bucketOf(v: Double): Long = {
    val r = java.util.Arrays.binarySearch(bounds, v)
    // exact hit at i → i boundaries strictly below (strict `>`
    // semantics, matching the ladder's `when(e > b, 1)`); miss →
    // insertion point = count of boundaries below
    if (r >= 0) r.toLong else (-(r + 1)).toLong
  }

  override def nullSafeEval(v: Any, ignored: Any): Any =
    bucketOf(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qbucket", this,
      classOf[QuantileBucket].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $ref.bucketOf($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QuantileBucket {
  private val FN = "graft_quantile_bucket"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FN, exprs => QuantileBucket(exprs(0), exprs(1)), "built-in")

  /** Column entry point: bucket index of `value` (double) against the
    * sorted `boundaries`. NULL value → NULL (callers that need the
    * ladder's null→bucket-0 behavior coalesce at the call site).
    */
  def apply(value: Column, boundaries: Array[Double]): Column = {
    register(SparkSession.active)
    org.apache.spark.sql.functions.call_function(FN, value,
      org.apache.spark.sql.functions.lit(boundaries))
  }
}

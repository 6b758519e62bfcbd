package graft.functions

import java.util.regex.Pattern
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ALL word n-gram shingles of a text as strings, in document order,
  * duplicates preserved — the counting-semantics sibling of
  * [[HashedShingles]] (which returns the distinct hashed SET).
  * Heavy-hitter mining and n-gram language stats need every
  * occurrence, as a string, so the aggregation key is human-readable.
  *
  * Same rationale as HashedShingles: the composable
  * `transform(sequence(...), i -> concat_ws(" ", slice(toks, i, n)))`
  * runs interpreted (higher-order functions never enter codegen) and
  * Catalyst inlines the tokenizing `split` into every lambda
  * invocation, making shingling O(tokens²·regex) per row — measured
  * 3.0 s for the sf0.1 heavy-hitters gate vs ~0.3 s through this
  * expression. One pass, whole-stage-codegen'd via a static call.
  */
case class StringShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    StringShingles.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.StringShingles.compute($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringShingles {

  private val WS = Pattern.compile("\\s+")

  /** Mirrors `DedupOps.shingles` exactly: `split(text, "\\s+")` tokens
    * (limit -1), grams of `n` consecutive tokens joined by one space,
    * the whole text as a single gram when fewer than `n` tokens.
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = WS.split(text.toString, -1)
    if (toks.length < n)
      return new GenericArrayData(
        Array[Any](UTF8String.fromString(toks.mkString(" "))))
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  private def fnName(n: Int) = s"graft_string_shingles_$n"

  def register(spark: SparkSession, n: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName(n), exprs => StringShingles(exprs.head, n), "built-in")

  /** Column API: all n-gram shingle strings of `text`, in order. */
  def apply(text: Column, n: Int): Column = {
    register(SparkSession.active, n)
    org.apache.spark.sql.functions.call_function(fnName(n), text)
  }
}

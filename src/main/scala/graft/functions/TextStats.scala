package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-byte-pass text statistics, packed into a single long:
  * `(whitespaceTokenCount << 32) | asciiPunctCount`.
  *
  * Why native: [[graft.ops.TextOps.qualityScore]] composed from
  * `size(split(text, "\\s+"))` (referenced three times) plus a punct
  * split — five regex passes per document, each converting the
  * UTF8String to a java String and materializing a fragment array.
  * Measured at sf0.1 that made quality scoring the single hottest
  * expression of the curation pipeline (~0.45 s of a ~0.8 s query,
  * vs ~0.17 s for the whole scan). This expression scans the RAW
  * UTF-8 BYTES once — no String, no regex, no arrays — and the two
  * counts unpack with codegen'd integer ops.
  *
  * Byte-identical to the regex formulation it replaces:
  *  - token count == `size(split(text, "\\s+"))` (Java split with
  *    limit -1): segments = maximal-whitespace-run count + 1, and
  *    Java `\s` is exactly ASCII {space, \t, \n, \x0B, \f, \r} —
  *    multi-byte UTF-8 units are all >= 0x80 and never match, so a
  *    byte scan sees precisely the characters the regex saw.
  *  - punct count == `size(split(text, "[\\p{Punct}]")) - 1`: the
  *    separator class matches SINGLE chars, so split points == punct
  *    chars; Java `\p{Punct}` (without UNICODE_CHARACTER_CLASS) is
  *    the ASCII set 33-47, 58-64, 91-96, 123-126.
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    TextStats.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextStats.compute($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStats {

  def compute(text: UTF8String): Long = {
    val n = text.numBytes
    var i = 0
    var runs = 0
    var punct = 0
    var inWs = false
    while (i < n) {
      val b = text.getByte(i) & 0xff
      val ws = b == 32 || (b >= 9 && b <= 13)
      if (ws && !inWs) runs += 1
      inWs = ws
      if ((b >= 33 && b <= 47) || (b >= 58 && b <= 64) ||
          (b >= 91 && b <= 96) || (b >= 123 && b <= 126)) punct += 1
      i += 1
    }
    ((runs + 1).toLong << 32) | punct.toLong
  }

  private val fnName = "graft_text_stats"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => TextStats(exprs.head), "built-in")

  /** Column API (packed long; unpack with [[tokenCount]]/
    * [[punctCount]]).
    */
  def apply(text: Column): Column = {
    register(SparkSession.active)
    org.apache.spark.sql.functions.call_function(fnName, text)
  }

  /** `size(split(text, "\\s+"))`, computed by the byte scan. */
  def tokenCount(text: Column): Column =
    org.apache.spark.sql.functions
      .shiftright(apply(text), 32).cast("int")

  /** ASCII punctuation char count, computed by the byte scan. */
  def punctCount(text: Column): Column =
    (apply(text).bitwiseAND(0xffffffffL)).cast("int")
}

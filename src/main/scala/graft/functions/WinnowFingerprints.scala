package graft.functions

import java.util.regex.Pattern
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken:
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD 2003 — the MOSS algorithm): hash every word n-gram in
  * sequence, slide a window of `w` consecutive hashes, keep each
  * window's minimum (rightmost on ties, per the paper), de-duplicate.
  *
  * The guarantee that makes this THE passage-overlap primitive: any
  * shared run of at least n + w - 1 tokens between two documents
  * yields at least one IDENTICAL fingerprint in both — so detecting
  * partial overlap (contamination, quotation, near-copies of
  * passages inside otherwise-different documents) reduces to an
  * inverted-index join on fingerprints, the same sub-quadratic shape
  * as `DedupOps.ngramJaccardPairs`, while whole-document similarity
  * measures (Jaccard, SimHash, MinHash) dilute small shared passages
  * to invisibility.
  *
  * Native single-pass expression for the same reason as
  * [[HashedShingles]]: a composable sliding-window-min over an array
  * column gets its producing expression inlined into every lambda
  * invocation by Catalyst, going quadratic per row.
  */
case class WinnowFingerprints(child: Expression, n: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    WinnowFingerprints.compute(v.asInstanceOf[UTF8String], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.WinnowFingerprints.compute($t, $n, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {

  private val WS = Pattern.compile("\\s+")

  private def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Ordered n-gram hashes → per-window minima (rightmost of ties) →
    * distinct, one pass. Documents shorter than n tokens fingerprint
    * their whole text; fewer grams than `w` use one window.
    */
  def compute(text: UTF8String, n: Int, w: Int): ArrayData = {
    val toks = WS.split(text.toString, -1)
    val grams: Array[Long] =
      if (toks.length < n) Array(fnv64(toks.mkString(" ")))
      else {
        val out = new Array[Long](toks.length - n + 1)
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
          out(i) = fnv64(sb.toString)
          i += 1
        }
        out
      }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val effW = math.min(w, grams.length)
    var start = 0
    while (start + effW <= grams.length) {
      var minIdx = start
      var k = start + 1
      while (k < start + effW) {
        if (grams(k) <= grams(minIdx)) minIdx = k // rightmost min
        k += 1
      }
      seen.add(grams(minIdx))
      start += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  private def fnName(n: Int, w: Int) = s"graft_winnow_${n}_$w"

  def register(spark: SparkSession, n: Int, w: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName(n, w), exprs => WinnowFingerprints(exprs.head, n, w),
      "built-in")

  def apply(text: Column, n: Int = 3, w: Int = 4): Column = {
    register(SparkSession.active, n, w)
    org.apache.spark.sql.functions.call_function(fnName(n, w), text)
  }
}

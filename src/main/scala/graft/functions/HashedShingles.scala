package graft.functions

import java.util.regex.Pattern
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 64-bit hashes of a text's word n-gram shingles, in one
  * pass: tokenize (same `\s+` split semantics as
  * `TextOps.tokens`), slide an n-window, hash each space-joined gram
  * with FNV-1a 64, and de-duplicate.
  *
  * The composable form
  * `array_distinct(transform(shingles(text), s => xxhash64(s)))`
  * is semantically identical as a SET (hash function differs — only
  * set identity matters to every consumer: Jaccard, minhash, banding)
  * but catastrophically slower in practice: higher-order functions are
  * interpreted, and Catalyst's collapse/infer rules inline the
  * tokenizing `split` into EVERY lambda invocation and into
  * explode-derived filters, making tokenization O(tokens²·regex) per
  * row and re-running it up to 3× per side of a self-join. This
  * expression costs O(text length) per row, runs inside whole-stage
  * codegen via a static call, and is evaluated exactly once per row.
  */
case class HashedShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    HashedShingles.compute(v.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.HashedShingles.compute($t, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedShingles {

  private val WS = Pattern.compile("\\s+")

  /** FNV-1a 64 over a CharSequence region (any 64-bit hash works —
    * consumers only rely on set identity; collisions are ~1e-11 at
    * realistic corpus sizes).
    */
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

  /** One-pass hashed n-gram shingles (distinct set by default; with
    * `distinct = false` every occurrence keeps its slot — the form a
    * frequency-weighted consumer like SimHash needs). Mirrors the
    * composable semantics exactly: `split(text, "\\s+")` tokens
    * (limit -1), grams of `n` consecutive tokens joined by one space,
    * whole-text gram when fewer than `n` tokens.
    */
  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val toks = WS.split(text.toString, -1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val all = if (distinct) null else new java.util.ArrayList[java.lang.Long]()
    def add(h: Long): Unit =
      if (distinct) { seen.add(h); () } else { all.add(h); () }
    if (toks.length < n) {
      add(fnv64(toks.mkString(" ")))
    } else {
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
        add(fnv64(sb.toString))
        i += 1
      }
    }
    val src: java.util.Collection[java.lang.Long] =
      if (distinct) seen else all
    val out = new Array[Long](src.size)
    val it = src.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  private def fnName(n: Int, distinct: Boolean) =
    if (distinct) s"graft_shingles_$n" else s"graft_shingles_${n}_all"

  def register(spark: SparkSession, n: Int, distinct: Boolean = true): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName(n, distinct),
      exprs => HashedShingles(exprs.head, n, distinct), "built-in")

  /** Column API: FNV-64 hashes of `text`'s n-gram shingles. */
  def apply(text: Column, n: Int, distinct: Boolean = true): Column = {
    register(SparkSession.active, n, distinct)
    org.apache.spark.sql.functions.call_function(fnName(n, distinct), text)
  }
}

package graft.functions

import java.util.regex.Pattern
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StructField,
  StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The full Gopher repetition-signal battery (Rae et al. 2021 §A1.1,
  * the filters RefinedWeb/FineWeb/Dolma reuse) computed in ONE pass
  * per document, returned as a struct of 13 fractions:
  *
  *  - `dup_line_frac` / `dup_line_char_frac`: duplicate occurrences
  *    beyond the first of each distinct non-empty `\n`-separated
  *    line, as a fraction of lines / of line characters.
  *  - `dup_para_frac` / `dup_para_char_frac`: same over `\n\n`
  *    paragraphs.
  *  - `top{2,3,4}gram_char_frac`: characters of all occurrences of
  *    the MOST frequent word n-gram (ties: lexicographically smallest
  *    joined form) over total word characters — 0 when the top n-gram
  *    does not repeat.
  *  - `dup{5..10}gram_char_frac`: characters of words covered by ANY
  *    occurrence of a repeated n-gram (positional union, so
  *    overlapping occurrences never double-count) over total word
  *    characters.
  *
  * Definitions are exact and engine-replayable: tokenization is the
  * same `\s+` split every other text op uses; character counts are
  * CODE POINTS (`len()` in DuckDB); all divisions are
  * integer-numerator-first so a SQL oracle reproduces the double
  * bit-for-bit.
  *
  * Why native: the positional-coverage masks need per-document hash
  * maps — inexpressible in codegen'd column math, and a 6-lambda
  * higher-order composition would re-tokenize per signal and fall out
  * of whole-stage codegen. This expression tokenizes once, builds
  * each n's count map over reused slices, and codegens to one static
  * call; per row it is O(len · 9) with no shuffle — the quality-scan
  * shape that survives a 100 TB corpus.
  */
case class RepetitionSignals(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionSignals.schema

  override def nullSafeEval(v: Any): Any =
    RepetitionSignals.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.RepetitionSignals.compute($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionSignals {

  val fieldNames: Seq[String] =
    Seq("dup_line_frac", "dup_line_char_frac",
      "dup_para_frac", "dup_para_char_frac",
      "top2gram_char_frac", "top3gram_char_frac", "top4gram_char_frac") ++
      (5 to 10).map(n => s"dup${n}gram_char_frac")

  val schema: StructType =
    StructType(fieldNames.map(StructField(_, DoubleType, nullable = false)))

  private val WS = Pattern.compile("\\s+")

  private def cp(s: String): Long = s.codePointCount(0, s.length).toLong

  /** (dup fraction, dup char fraction) of a segment multiset. */
  private def segStats(segs: Array[String]): (Double, Double) = {
    if (segs.isEmpty) return (0.0, 0.0)
    val counts = new java.util.HashMap[String, Int]()
    var totalChars = 0L
    var i = 0
    while (i < segs.length) {
      counts.merge(segs(i), 1, (a, b) => a + b)
      totalChars += cp(segs(i))
      i += 1
    }
    var dups = 0L
    var dupChars = 0L
    counts.forEach { (v, c) =>
      if (c > 1) { dups += c - 1; dupChars += (c - 1).toLong * cp(v) }
    }
    (dups.toDouble / segs.length,
      if (totalChars == 0) 0.0 else dupChars.toDouble / totalChars)
  }

  def compute(t: UTF8String): InternalRow = {
    val text = t.toString
    val (dlf, dlcf) = segStats(text.split("\n").filter(_.nonEmpty))
    val (dpf, dpcf) = segStats(text.split("\n\n").filter(_.nonEmpty))
    val words = WS.split(text, -1).filter(_.nonEmpty)
    val wlen = new Array[Long](words.length)
    var totalChars = 0L
    var i = 0
    while (i < words.length) {
      wlen(i) = cp(words(i)); totalChars += wlen(i); i += 1
    }

    def ngramCounts(n: Int): java.util.HashMap[String, Int] = {
      val counts = new java.util.HashMap[String, Int]()
      val sb = new java.lang.StringBuilder()
      var p = 0
      while (p + n <= words.length) {
        sb.setLength(0)
        var j = p
        while (j < p + n) {
          if (j > p) sb.append(' ')
          sb.append(words(j))
          j += 1
        }
        counts.merge(sb.toString, 1, (a, b) => a + b)
        p += 1
      }
      counts
    }

    // most-frequent n-gram's characters (all occurrences) / total —
    // 0 unless the top n-gram actually repeats
    def topFrac(n: Int): Double = {
      if (words.length < n || totalChars == 0) return 0.0
      var best: String = null
      var bestC = 0
      ngramCounts(n).forEach { (g, c) =>
        if (c > bestC || (c == bestC && g.compareTo(best) < 0)) {
          best = g; bestC = c
        }
      }
      if (bestC < 2) 0.0
      else {
        // words contain no whitespace, so the joined form's length
        // minus its n-1 separators is exactly the word-char total
        val chars = cp(best) - (n - 1)
        (bestC.toLong * chars).toDouble / totalChars
      }
    }

    // chars of words covered by any occurrence of a repeated n-gram
    // (positional union) / total
    def dupCoverage(n: Int): Double = {
      if (words.length < n || totalChars == 0) return 0.0
      val counts = ngramCounts(n)
      val covered = new Array[Boolean](words.length)
      val sb = new java.lang.StringBuilder()
      var p = 0
      while (p + n <= words.length) {
        sb.setLength(0)
        var j = p
        while (j < p + n) {
          if (j > p) sb.append(' ')
          sb.append(words(j))
          j += 1
        }
        if (counts.get(sb.toString) > 1) {
          j = p
          while (j < p + n) { covered(j) = true; j += 1 }
        }
        p += 1
      }
      var c = 0L
      var k = 0
      while (k < words.length) { if (covered(k)) c += wlen(k); k += 1 }
      c.toDouble / totalChars
    }

    new GenericInternalRow(Array[Any](
      dlf, dlcf, dpf, dpcf,
      topFrac(2), topFrac(3), topFrac(4),
      dupCoverage(5), dupCoverage(6), dupCoverage(7),
      dupCoverage(8), dupCoverage(9), dupCoverage(10)))
  }

  private val fnName = "graft_repetition_signals"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => RepetitionSignals(exprs.head), "built-in")

  def apply(spark: SparkSession, text: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(fnName, text)
  }
}

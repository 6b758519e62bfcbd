package graft.functions

import java.util.regex.Pattern
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Language guess over [[graft.ops.TextOps.stopwordProfiles]]: argmax
  * stopword-hit count, alphabetical tiebreak, "und" on zero hits —
  * byte-identical to the composable
  * `fold(when(score_lang > acc, ...))` over `size(filter(tokens,
  * isin(...)))` columns it replaces.
  *
  * Why native: higher-order `filter` lambdas never enter whole-stage
  * codegen, and CollapseProject textually re-inlines the five
  * per-language lambdas (each re-running the tokenizing split) into
  * every downstream consumer — the curation pipeline measured 4.4 s vs
  * 0.9 s at sf0.1 purely from that duplication, and needed a persist()
  * barrier as a workaround. This expression tokenizes ONCE, scores all
  * profiles in a single pass via a token→language-bitmask table, and
  * codegens to one static call, so inlining it twice costs two string
  * splits, not ten interpreted lambda trees.
  */
case class LangGuess(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    LangGuess.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.LangGuess.compute($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangGuess {

  private val WS = Pattern.compile("\\s+")

  /** Languages in alphabetical order — the tiebreak order of the
    * column-fold this replaces (earliest strictly-greater wins).
    */
  private val langs: Array[String] =
    graft.ops.TextOps.stopwordProfiles.keys.toArray.sorted

  private val und = UTF8String.fromString("und")
  private val langU8: Array[UTF8String] =
    langs.map(UTF8String.fromString)

  /** token → bitmask of profile indexes containing it ("in" is an en
    * AND de stopword; "de"/"la"/"en"/"un"/"que" are es AND fr).
    */
  private val tokenMask: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    langs.zipWithIndex.foreach { case (lang, i) =>
      graft.ops.TextOps.stopwordProfiles(lang).foreach { w =>
        m.merge(w, Integer.valueOf(1 << i),
          (a, b) => Integer.valueOf(a.intValue | b.intValue))
      }
    }
    m
  }

  def compute(text: UTF8String): UTF8String = {
    val toks = WS.split(text.toString, -1)
    val scores = new Array[Int](langs.length)
    var i = 0
    while (i < toks.length) {
      val mask = tokenMask.get(toks(i))
      if (mask ne null) {
        var m = mask.intValue
        while (m != 0) {
          val bit = java.lang.Integer.numberOfTrailingZeros(m)
          scores(bit) += 1
          m &= m - 1
        }
      }
      i += 1
    }
    var best = -1
    var bestIdx = -1
    i = 0
    while (i < scores.length) {
      if (scores(i) > best) { best = scores(i); bestIdx = i }
      i += 1
    }
    if (best <= 0) und else langU8(bestIdx)
  }

  private val fnName = "graft_lang_guess"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => LangGuess(exprs.head), "built-in")

  /** Column API: the language guess for `text`. Takes the session the
    * Column is ANALYZED against (SparkSession.active would leave the
    * function unresolved in cloned-session consumers — the hazard
    * documented on [[graft.lake.DvRowDeleted]]). NULL text guesses
    * "und", matching the column-fold this expression replaced (null
    * scores never beat the (-1, "und") accumulator there); the
    * expression itself is null-intolerant, so the coalesce supplies
    * that default without custom null codegen.
    */
  def apply(spark: SparkSession, text: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.coalesce(
      org.apache.spark.sql.functions.call_function(fnName, text),
      org.apache.spark.sql.functions.lit("und"))
  }
}

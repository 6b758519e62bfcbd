package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Deterministic random-hyperplane LSH bucket of an `ARRAY<FLOAT>`
  * vector: `bits` sign bits, bit p from the dot product with a
  * pseudo-random ±1 hyperplane whose component i is derived from
  * xxhash64(i, seed = p). Same-direction vectors collide with high
  * probability — the coarse quantizer for the ANN scale path.
  *
  * Native single-pass form: O(bits × dim) fused multiply-adds with an
  * inline hash, replacing per-row generation of `bits` hyperplane
  * arrays via higher-order functions.
  */
case class HyperplaneBucket(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 63, s"bits must be in [1,63], got $bits")

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var out = 0L
    var p = 0
    while (p < bits) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        val sign =
          if ((org.apache.spark.sql.catalyst.expressions.XXH64
            .hashLong(i.toLong, p.toLong) & 1L) == 1L) 1.0 else -1.0
        dot += arr.getFloat(i) * sign
        i += 1
      }
      if (dot >= 0) out |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val dot = ctx.freshName("dot")
      val out = ctx.freshName("out")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |int $n = $a.numElements();
         |long $out = 0L;
         |for (int $p = 0; $p < $bits; $p++) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $a.getFloat($i) *
         |      ((($xxh.hashLong((long) $i, (long) $p) & 1L) == 1L) ? 1.0 : -1.0);
         |  }
         |  if ($dot >= 0) $out |= (1L << $p);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBucket {
  def apply(vec: Column, bits: Int): Column = {
    val fn = s"graft_hyperplane_$bits"
    SparkSession.active.sessionState.functionRegistry
      .createOrReplaceTempFunction(fn,
        exprs => HyperplaneBucket(exprs.head, bits), "built-in")
    org.apache.spark.sql.functions.call_function(fn, vec)
  }
}

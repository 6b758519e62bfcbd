package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over a hashed-shingle array in ONE pass: for each
  * of `k` seeded hash functions, the min over the set — all `k` running
  * minima updated per element, no intermediate arrays.
  *
  * The composable form
  * `array((0 until k).map(i => array_min(transform(sh, s => xxhash64(lit(i), s)))))`
  * is semantically equivalent as a minhash family but materializes `k`
  * hashed copies of the shingle array per row through interpreted
  * higher-order functions (`transform` breaks whole-stage codegen);
  * this expression costs `k` mixer applications per element inside a
  * single static call, evaluated once per row.
  *
  * Hash family: `fmix64(e ^ seed_i)` with `seed_i = splitmix64(i)` —
  * a full-avalanche 64-bit mixer per seed, deterministic across runs
  * and JVMs (required: the correctness driver replays queries and
  * compares hashes). Family identity differs from the old
  * xxhash64-seeded form; consumers (banding, recall) rely only on the
  * minhash property, not specific values.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    MinHashSig.compute(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashSig.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {

  /** splitmix64 finalizer — full avalanche. */
  private def mix(x0: Long): Long = {
    var x = x0
    x ^= x >>> 30; x *= 0xbf58476d1ce4e5b9L
    x ^= x >>> 27; x *= 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** seed_i = splitmix64 stream at index i (the classic increment). */
  private def seeds(k: Int): Array[Long] = {
    val out = new Array[Long](k)
    var i = 0
    while (i < k) { out(i) = mix((i + 1) * 0x9e3779b97f4a7c15L); i += 1 }
    out
  }

  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  def compute(arr: ArrayData, k: Int): ArrayData = {
    val s = seedCache.computeIfAbsent(k, kk => seeds(kk))
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val e = arr.getLong(i)
      var j = 0
      while (j < k) {
        val h = mix(e ^ s(j))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  private def fnName(k: Int) = s"graft_minhash_$k"

  def register(spark: SparkSession, k: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName(k), exprs => MinHashSig(exprs.head, k), "built-in")

  /** Column API: length-`k` minhash signature of a hashed-shingle array. */
  def apply(shingles: Column, k: Int): Column = {
    register(SparkSession.active, k)
    org.apache.spark.sql.functions.call_function(fnName(k), shingles)
  }
}

package graft.lake

import java.lang.ref.SoftReference

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate,
  TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** In-scan deletion-vector membership test:
  * `graft_dv_deleted(_metadata.file_path, _metadata.row_index, dvMap)`
  * is true iff the row's physical index is in its file's deletion
  * vector.
  *
  * This replaces the old (file, row_index) anti-join read path. The
  * anti-join exploded DVs into O(deleted rows) join rows — fine
  * broadcast-sized, but past a cardinality threshold it degraded to a
  * FULL-TABLE shuffle on every read of a big-delete table until a
  * rewrite purged the DVs. Here deletion never plans a join at all:
  * the file→DV-path map (O(files with DVs), a few MB at 100k files)
  * rides the plan as ONE binary literal, executors lazily decode each
  * DV sidecar once into a compressed [[RowIndexSet]] (process-wide
  * soft-referenced cache — DV files are immutable, uuid-named; memory
  * is bounded ≲1 bit/row per file, not 8 B/deletion), and membership
  * is a container lookup + bit test inside the scan's
  * whole-stage-codegen'd filter. This is how Delta applies DVs — a
  * per-file roaring row-index bitmap inside the scan, no join at any
  * cardinality.
  *
  * The third child is a foldable [[BinaryType]] literal encoding the
  * map (length-prefixed UTF-8 pairs), so the expression round-trips
  * through the function registry like every other graft expression —
  * no per-snapshot registry entries, one registration per session.
  */
case class DvRowDeleted(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with Predicate {

  // no inputTypes contract: the only call sites are internal
  // (string file path, long row index, binary literal)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = first.nullable || second.nullable

  /** file → DV sidecar path, decoded once per task from the literal
    * (inline payload) or fetched from the riding broadcast (large
    * maps — see [[DvRowDeleted.payload]]).
    */
  @transient private lazy val dvFor: java.util.HashMap[String, String] = {
    require(third.foldable, "dv map must be a literal")
    DvRowDeleted.decodePayload(third.eval(null).asInstanceOf[Array[Byte]])
  }

  // Per-file memo: `_metadata.file_path` is constant across a file's
  // rows (and usually the SAME UTF8String instance per batch), so the
  // common per-row cost is one reference/equality check. Expression
  // instances are task-confined (deserialized from the stage's
  // taskBinary), so plain fields are safe.
  @transient private var lastFile: UTF8String = _
  @transient private var lastDv: RowIndexSet = _

  def contains(file: UTF8String, idx: Long): Boolean = {
    if (lastFile == null || !lastFile.equals(file)) {
      lastFile = file.clone()
      lastDv = dvFor.get(file.toString) match {
        case null => null
        case dv => DvRowDeleted.indexSet(dv)
      }
    }
    lastDv != null && lastDv.contains(idx)
  }

  override def nullSafeEval(file: Any, idx: Any, bytes: Any): Any =
    contains(file.asInstanceOf[UTF8String], idx.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvDeleted", this,
      classOf[DvRowDeleted].getName)
    nullSafeCodeGen(ctx, ev,
      (f, i, _) => s"${ev.value} = $ref.contains($f, $i);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object DvRowDeleted {

  /** Executor-local cache of decoded DVs in compressed
    * [[RowIndexSet]] form (bounded ≲1 bit/row per file instead of
    * 8 B/deletion), keyed by sidecar path. DV files are immutable and
    * uuid-named — no content invalidation, only memory bounding via
    * soft references; a key whose referent the GC cleared is removed
    * on the next miss so the map itself cannot accumulate dead
    * entries across snapshots on a long-lived executor.
    */
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, SoftReference[RowIndexSet]]()

  def indexSet(dvPath: String): RowIndexSet = {
    val ref = cache.get(dvPath)
    if (ref != null) {
      val cached = ref.get()
      if (cached != null) return cached
      cache.remove(dvPath, ref)
    }
    val set = DeletionVector.readSet(java.nio.file.Paths.get(dvPath))
    cache.put(dvPath, new SoftReference(set))
    set
  }

  /** The literal payload for `dvFor` — the shared
    * [[PathMapPayload]] encoding (inline below the broadcast
    * threshold, a riding Broadcast handle above). Either way the
    * expression surface is ONE foldable binary literal, so the
    * registry round-trip and the join-free plan shape are identical.
    */
  def payload(spark: SparkSession,
      dvFor: Seq[(String, String)]): Array[Byte] =
    PathMapPayload.payload(spark, dvFor)

  private[graft] def decodePayload(
      bytes: Array[Byte]): java.util.HashMap[String, String] =
    PathMapPayload.decodePayload(bytes)

  private val NAME = "graft_dv_deleted"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NAME, exprs => DvRowDeleted(exprs(0), exprs(1), exprs(2)), "built-in")

  /** Column API: row (filePath, rowIndex) is deleted per `dvFor`
    * (absolute data-file path → absolute DV sidecar path). Takes the
    * session the Column will be ANALYZED against — registering on
    * `SparkSession.active` instead would leave the function
    * unresolved when the consuming DataFrame belongs to a different
    * session (cloned streaming-microbatch sessions, multi-session
    * apps).
    */
  def apply(spark: SparkSession, filePath: Column, rowIndex: Column,
      dvFor: Seq[(String, String)]): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(NAME, filePath, rowIndex,
      org.apache.spark.sql.functions.lit(payload(spark, dvFor)))
  }
}

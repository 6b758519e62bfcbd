package graft.lake

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}
import java.lang.ref.SoftReference
import java.nio.charset.StandardCharsets.UTF_8

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

  def encode(dvFor: Seq[(String, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(dvFor.size)
    dvFor.foreach { case (file, dv) =>
      val f = file.getBytes(UTF_8); val d = dv.getBytes(UTF_8)
      out.writeInt(f.length); out.write(f)
      out.writeInt(d.length); out.write(d)
    }
    out.flush()
    bos.toByteArray
  }

  /** Map entries above which the payload rides a Spark broadcast
    * instead of sitting inline in the plan literal: a 10⁵-DV-file
    * map is a few MB — harmless once, but it would be re-rendered in
    * every explain string and copied through every plan-string
    * context. var only so tests can exercise the broadcast path.
    */
  private[lake] var BROADCAST_MIN_ENTRIES = 4096

  /** Driver-side pin of created broadcasts, keyed by content hash:
    * the only other reference to the handle is JAVA-SERIALIZED inside
    * the plan literal, which the ContextCleaner cannot see — without
    * the pin it could reap a broadcast whose plan is still live.
    * Keyed by content so repeated reads of the same snapshot reuse
    * one broadcast. Each entry remembers the OWNING applicationId: a
    * handle from a stopped SparkContext is unusable (executors throw
    * on `.value`), so a hit under a different context rebuilds
    * instead of resurrecting a dead handle. Access-ordered and capped
    * at [[PINNED_MAX]]: evicted entries are unpersisted (NOT
    * destroyed — a still-live plan re-fetches from the driver), so a
    * long-lived process reading many distinct large-DV-map snapshots
    * cannot accumulate block-manager storage without bound.
    */
  private val PINNED_MAX = 64
  private val pinned = new java.util.LinkedHashMap[
      String, (String, org.apache.spark.broadcast.Broadcast[Array[Byte]])](
      16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[
        String, (String, org.apache.spark.broadcast.Broadcast[Array[Byte]])])
        : Boolean = {
      val evict = size > PINNED_MAX
      if (evict) scala.util.Try(e.getValue._2.unpersist(blocking = false))
      evict
    }
  }

  private val TAG_INLINE: Byte = 'I'
  private val TAG_BROADCAST: Byte = 'B'

  /** The literal payload for `dvFor`: tag byte + inline map encoding
    * (small maps), or tag byte + java-serialized Broadcast handle
    * whose value is the map encoding (large maps). Either way the
    * expression surface is ONE foldable binary literal, so the
    * registry round-trip and the join-free plan shape are identical.
    */
  def payload(spark: SparkSession,
      dvFor: Seq[(String, String)]): Array[Byte] = {
    val body = encode(dvFor)
    val bos = new ByteArrayOutputStream()
    if (dvFor.size < BROADCAST_MIN_ENTRIES) {
      bos.write(TAG_INLINE.toInt)
      bos.write(body)
    } else {
      val key = java.util.Base64.getEncoder.encodeToString(
        java.security.MessageDigest.getInstance("SHA-256").digest(body))
      val appId = spark.sparkContext.applicationId
      // the multi-MB broadcast build runs OUTSIDE the monitor (holding
      // it would serialize concurrent reads of different snapshots);
      // a losing twin's handle is destroyed — nothing references it
      val cached = pinned.synchronized {
        pinned.get(key) match {
          case (`appId`, c) => Some(c)
          case _ => None // miss, or a dead handle from a stopped context
        }
      }
      val b = cached.getOrElse {
        val fresh = spark.sparkContext.broadcast(body)
        pinned.synchronized {
          pinned.get(key) match {
            case (`appId`, c) =>
              scala.util.Try(fresh.destroy()); c
            case _ => pinned.put(key, (appId, fresh)); fresh
          }
        }
      }
      bos.write(TAG_BROADCAST.toInt)
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(b)
      oos.flush()
    }
    bos.toByteArray
  }

  private[lake] def decodePayload(
      bytes: Array[Byte]): java.util.HashMap[String, String] =
    bytes(0) match {
      case TAG_INLINE =>
        decode(new DataInputStream(
          new ByteArrayInputStream(bytes, 1, bytes.length - 1)))
      case TAG_BROADCAST =>
        val ois = new java.io.ObjectInputStream(
          new ByteArrayInputStream(bytes, 1, bytes.length - 1))
        val b = ois.readObject()
          .asInstanceOf[org.apache.spark.broadcast.Broadcast[Array[Byte]]]
        decode(new DataInputStream(new ByteArrayInputStream(b.value)))
      case other => throw new IllegalArgumentException(
        s"unknown dv map payload tag: $other")
    }

  private def decode(in: DataInputStream): java.util.HashMap[String, String] = {
    val n = in.readInt()
    val m = new java.util.HashMap[String, String](n * 2)
    var i = 0
    while (i < n) {
      val f = new String(in.readNBytes(in.readInt()), UTF_8)
      val d = new String(in.readNBytes(in.readInt()), UTF_8)
      m.put(f, d)
      i += 1
    }
    m
  }

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

package graft.lake

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession

/** Plan-riding (path → path) map payload, shared by the two per-file
  * sidecar features: deletion vectors ([[DvRowDeleted]], data file →
  * DV sidecar) and bloom indexes
  * ([[graft.sources.BloomParquetFileFormat]], data file → bloom
  * sidecar). Either way the driver contributes O(files) path strings
  * — never sidecar contents — and the encoding is ONE opaque byte
  * array, so it can sit in a plan as a single foldable binary literal
  * (the DV expression) or a serialized closure field (the bloom
  * reader) without per-snapshot registry entries.
  *
  * Small maps inline; above [[BROADCAST_MIN_ENTRIES]] entries the
  * payload carries a java-serialized Broadcast handle instead — a
  * 10⁵-file map is a few MB, harmless once but not in every explain
  * string and task binary. Broadcast handles are pinned driver-side
  * (see [[payload]]) because the only other reference lives
  * java-serialized inside a plan, invisible to the ContextCleaner.
  */
object PathMapPayload {

  def encode(pairs: Seq[(String, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(pairs.size)
    pairs.foreach { case (file, target) =>
      val f = file.getBytes(UTF_8); val d = target.getBytes(UTF_8)
      out.writeInt(f.length); out.write(f)
      out.writeInt(d.length); out.write(d)
    }
    out.flush()
    bos.toByteArray
  }

  /** Map entries above which the payload rides a Spark broadcast
    * instead of sitting inline. var only so tests can exercise the
    * broadcast path.
    */
  private[graft] var BROADCAST_MIN_ENTRIES = 4096

  /** Driver-side pin of created broadcasts, keyed by content hash:
    * the only other reference to the handle is JAVA-SERIALIZED inside
    * the plan, which the ContextCleaner cannot see — without the pin
    * it could reap a broadcast whose plan is still live. Keyed by
    * content so repeated reads of the same snapshot reuse one
    * broadcast. Each entry remembers the OWNING applicationId: a
    * handle from a stopped SparkContext is unusable (executors throw
    * on `.value`), so a hit under a different context rebuilds
    * instead of resurrecting a dead handle. Access-ordered and capped
    * at [[PINNED_MAX]]: evicted entries are unpersisted (NOT
    * destroyed — a still-live plan re-fetches from the driver), so a
    * long-lived process reading many distinct large-map snapshots
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

  /** The payload for `pairs`: tag byte + inline map encoding (small
    * maps), or tag byte + java-serialized Broadcast handle whose
    * value is the map encoding (large maps). Either way the surface
    * is ONE byte array, so consumers need no broadcast-awareness.
    */
  def payload(spark: SparkSession,
      pairs: Seq[(String, String)]): Array[Byte] = {
    val body = encode(pairs)
    val bos = new ByteArrayOutputStream()
    if (pairs.size < BROADCAST_MIN_ENTRIES) {
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

  private[graft] def decodePayload(
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
        s"unknown path map payload tag: $other")
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
}

package graft.lake

import java.util.concurrent.ConcurrentHashMap

/** Compact, interned representations for the BULK log state — the
  * per-file stat and partition maps of [[AddFile]] (VERDICT r14 #1).
  *
  * Why: a replayed snapshot of a 10⁶-file table held ~5 GB of driver
  * heap (SCALE.md "metadata at 10⁶ files"), dominated not by data but
  * by REPETITION — every AddFile parsed its own copy of every column
  * name (3 stat maps + partition values + null counts ≈ 4k string
  * objects per 1k files per column), its own hash-map structures over
  * the same key sets, and a boxed Long per null count. The values
  * that actually differ per file (min/max strings, sizes) are a small
  * minority of the bytes.
  *
  * What: [[Interned.strMap]] / [[Interned.longMap]] rebuild a parsed
  * map as an array-backed immutable Map whose KEY ARRAY is interned
  * process-wide (all files of a table share one `Array[String]` of
  * column names — checkpoint writers emit a consistent field order,
  * so the hit rate is ~100%), whose keys and (for partition values)
  * low-cardinality values are interned strings, and whose null-count
  * values live in a primitive `long[]`. Everything stays a plain
  * `scala.collection.immutable.Map`, so the AddFile case class, its
  * structural equality, JSON round-trips, and every consumer are
  * unchanged.
  *
  * Interning tables are bounded: past [[Interned.MAX_ENTRIES]] a
  * table is cleared and re-fills (dedup quality degrades gracefully;
  * memory never grows unbounded). Used on the driver (replay) and on
  * executors (the columnar index's distributed checkpoint scans) —
  * both are per-JVM caches of metadata-sized content (column names,
  * partition values, key arrays).
  */
private[graft] object Interned {

  /** Per-table cap. Column names and key arrays are naturally tiny;
    * partition values are usually low-cardinality (dates, buckets) —
    * a pathological high-cardinality partitioning blows through the
    * cap and simply stops deduplicating.
    */
  private val MAX_ENTRIES = 1 << 17

  private val strings = new ConcurrentHashMap[String, String]()

  /** Content-keyed wrapper so `Array[String]` interns structurally. */
  private final class Keys(val a: Array[String]) {
    override val hashCode: Int = java.util.Arrays.hashCode(
      a.asInstanceOf[Array[AnyRef]])
    override def equals(o: Any): Boolean = o match {
      case k: Keys => java.util.Arrays.equals(
        a.asInstanceOf[Array[AnyRef]], k.a.asInstanceOf[Array[AnyRef]])
      case _ => false
    }
  }
  private val keyArrays = new ConcurrentHashMap[Keys, Array[String]]()

  /** Interned copy of `s` (bounded table; identity on overflow). */
  def str(s: String): String = {
    if (s == null) return null
    if (strings.size > MAX_ENTRIES) strings.clear()
    val prev = strings.putIfAbsent(s, s)
    if (prev == null) s else prev
  }

  private def keys(ks: Array[String]): Array[String] = {
    if (keyArrays.size > MAX_ENTRIES) keyArrays.clear()
    val w = new Keys(ks)
    val prev = keyArrays.putIfAbsent(w, ks)
    if (prev == null) ks else prev
  }

  /** WHOLE-MAP instance interning for maps whose full CONTENT is
    * low-cardinality across files: partition values (10⁶ files share
    * ~10³ partitions → ~10³ distinct maps) and null counts (the
    * all-zeros map is the overwhelmingly common row). Keyed by the
    * interleaved content as a List (structural equality over already
    * interned keys).
    */
  private val mapInstances =
    new ConcurrentHashMap[List[Any], Map[String, _]]()
  private def internInstance[V](content: List[Any], m: Map[String, V])
      : Map[String, V] = {
    if (mapInstances.size > MAX_ENTRIES) mapInstances.clear()
    val prev = mapInstances.putIfAbsent(content, m)
    (if (prev == null) m else prev).asInstanceOf[Map[String, V]]
  }

  /** Compact rebuild of a String→String map. `internValues` is for
    * the low-cardinality case (partition values, where the whole map
    * INSTANCE is interned too). Stat min/max maps — per-file-unique
    * values that must NOT churn the intern tables — byte-pack instead:
    * one shared key array + one UTF-8 blob + an offset array
    * ([[PackedStrMap]]), ~3× smaller than value-string arrays (each
    * java String costs ~40 B of header/padding around its ~10 bytes
    * of content); strings materialize on access. Maps carrying null
    * or surrogate-bearing VALUES keep the array form, which stores
    * the String object as-is (null has no byte encoding; UTF-8 is
    * lossy for unpaired surrogates).
    */
  def strMap(m: Map[String, String],
      internValues: Boolean = false): Map[String, String] = {
    if (m.isEmpty) return Map.empty
    val n = m.size
    val ks = new Array[String](n)
    val vs = new Array[String](n)
    var i = 0
    var unpackable = false
    m.foreach { case (k, v) =>
      ks(i) = str(k)
      // nulls have no byte encoding, and UTF-8 is LOSSY for invalid
      // UTF-16 (an unpaired surrogate encodes to '?') — such values
      // keep the array form, which stores the String as-is. Valid
      // surrogate PAIRS are also routed there: distinguishing them
      // needs pair-walking the string, and surrogate-bearing stat
      // values are rare enough that the compact win doesn't matter.
      if (v == null || v.exists(c => c >= 0xD800.toChar &&
          c <= 0xDFFF.toChar))
        unpackable = true
      vs(i) = if (internValues) str(v) else v
      i += 1
    }
    if (internValues) {
      val out = new StrArrayMap(keys(ks), vs)
      internInstance((ks.toList: List[Any]) ::: (vs.toList: List[Any]), out)
    } else if (unpackable) {
      new StrArrayMap(keys(ks), vs)
    } else {
      val enc = vs.map(
        _.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val starts = new Array[Int](n + 1)
      i = 0
      while (i < n) { starts(i + 1) = starts(i) + enc(i).length; i += 1 }
      val blob = new Array[Byte](starts(n))
      i = 0
      while (i < n) {
        System.arraycopy(enc(i), 0, blob, starts(i), enc(i).length)
        i += 1
      }
      new PackedStrMap(keys(ks), blob, starts)
    }
  }

  /** Compact rebuild of a String→Long map (null counts): primitive
    * value storage, shared key array, and whole-instance interning
    * (identical count vectors — all-zeros above all — collapse to one
    * object process-wide).
    */
  def longMap(m: Map[String, Long]): Map[String, Long] = {
    if (m.isEmpty) return Map.empty
    val n = m.size
    val ks = new Array[String](n)
    val vs = new Array[Long](n)
    var i = 0
    m.foreach { case (k, v) => ks(i) = str(k); vs(i) = v; i += 1 }
    val out = new LongArrayMap(keys(ks), vs)
    internInstance((ks.toList: List[Any]) ::: (vs.toList: List[Any]), out)
  }

  /** [[AddFile]] with its maps rebuilt compact/interned — applied at
    * the two BULK parse sites ([[Action.fromJson]] add lines,
    * [[CheckpointParquet]] add rows); everything downstream keeps
    * plain-Map semantics.
    */
  def addFile(a: AddFile): AddFile = a.copy(
    partitionValues = strMap(a.partitionValues, internValues = true),
    minValues = strMap(a.minValues),
    maxValues = strMap(a.maxValues),
    nullCounts = longMap(a.nullCounts))

  private[lake] def clearForTest(): Unit = {
    strings.clear(); keyArrays.clear(); mapInstances.clear()
  }

  /** Immutable Map over parallel arrays: one shared key array per
    * distinct key set process-wide, one small value array per
    * instance. Linear-scan lookups — these maps hold a table's column
    * names (tens at most), where a scan over an interned array beats
    * a hash probe's cache misses, and the dominant access pattern
    * (FilePruner, stats folds) is iteration anyway. Mutation paths
    * ([[updated]]/[[removed]]) are cold: they fall back to a standard
    * map.
    */
  private final class StrArrayMap(ks: Array[String], vs: Array[String])
      extends scala.collection.immutable.AbstractMap[String, String]
      with java.io.Serializable {
    private def idx(key: String): Int = {
      var i = 0
      while (i < ks.length) {
        // reference check first: interned keys make eq the common hit
        if (ks(i).eq(key) || ks(i) == key) return i
        i += 1
      }
      -1
    }
    override def get(key: String): Option[String] = {
      val i = idx(key); if (i < 0) None else Some(vs(i))
    }
    override def contains(key: String): Boolean = idx(key) >= 0
    override def size: Int = ks.length
    override def knownSize: Int = ks.length
    override def iterator: Iterator[(String, String)] =
      ks.indices.iterator.map(i => (ks(i), vs(i)))
    override def updated[V1 >: String](key: String, value: V1)
        : scala.collection.immutable.Map[String, V1] =
      iterator.toMap.updated(key, value)
    override def removed(key: String)
        : scala.collection.immutable.Map[String, String] =
      iterator.toMap.removed(key)
    override def foreachEntry[U](f: (String, String) => U): Unit = {
      var i = 0
      while (i < ks.length) { f(ks(i), vs(i)); i += 1 }
    }
  }

  /** [[StrArrayMap]] with the values byte-packed: one UTF-8 blob +
    * offsets instead of n String objects — the stat min/max shape
    * (never-null, per-file-unique values read a handful at a time by
    * the pruner). Strings materialize on access.
    */
  private final class PackedStrMap(
      ks: Array[String], blob: Array[Byte], starts: Array[Int])
      extends scala.collection.immutable.AbstractMap[String, String]
      with java.io.Serializable {
    private def idx(key: String): Int = {
      var i = 0
      while (i < ks.length) {
        if (ks(i).eq(key) || ks(i) == key) return i
        i += 1
      }
      -1
    }
    private def valueAt(i: Int): String = new String(
      blob, starts(i), starts(i + 1) - starts(i),
      java.nio.charset.StandardCharsets.UTF_8)
    override def get(key: String): Option[String] = {
      val i = idx(key); if (i < 0) None else Some(valueAt(i))
    }
    override def contains(key: String): Boolean = idx(key) >= 0
    override def size: Int = ks.length
    override def knownSize: Int = ks.length
    override def iterator: Iterator[(String, String)] =
      ks.indices.iterator.map(i => (ks(i), valueAt(i)))
    override def updated[V1 >: String](key: String, value: V1)
        : scala.collection.immutable.Map[String, V1] =
      iterator.toMap.updated(key, value)
    override def removed(key: String)
        : scala.collection.immutable.Map[String, String] =
      iterator.toMap.removed(key)
    override def foreachEntry[U](f: (String, String) => U): Unit = {
      var i = 0
      while (i < ks.length) { f(ks(i), valueAt(i)); i += 1 }
    }
  }

  /** [[StrArrayMap]] with primitive long values (null counts). */
  private final class LongArrayMap(ks: Array[String], vs: Array[Long])
      extends scala.collection.immutable.AbstractMap[String, Long]
      with java.io.Serializable {
    private def idx(key: String): Int = {
      var i = 0
      while (i < ks.length) {
        if (ks(i).eq(key) || ks(i) == key) return i
        i += 1
      }
      -1
    }
    override def get(key: String): Option[Long] = {
      val i = idx(key); if (i < 0) None else Some(vs(i))
    }
    override def contains(key: String): Boolean = idx(key) >= 0
    override def size: Int = ks.length
    override def knownSize: Int = ks.length
    override def iterator: Iterator[(String, Long)] =
      ks.indices.iterator.map(i => (ks(i), vs(i)))
    override def updated[V1 >: Long](key: String, value: V1)
        : scala.collection.immutable.Map[String, V1] =
      iterator.toMap.updated(key, value)
    override def removed(key: String)
        : scala.collection.immutable.Map[String, Long] =
      iterator.toMap.removed(key)
    override def foreachEntry[U](f: (String, Long) => U): Unit = {
      var i = 0
      while (i < ks.length) { f(ks(i), vs(i)); i += 1 }
    }
  }
}

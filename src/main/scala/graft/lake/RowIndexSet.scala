package graft.lake

/** Compressed immutable set of row indices — the in-memory form of a
  * decoded deletion vector (roaring-bitmap layout, dependency-free:
  * Delta uses RoaringBitmapArray for exactly this).
  *
  * The index space is partitioned into 65536-row containers keyed by
  * `idx >>> 16`. A container with ≤4096 entries stores sorted 16-bit
  * lows (2 B/deletion); a denser one stores a 1024-word bitmap (8 KB
  * flat — the break-even point, same rule as roaring). Executor memory
  * for a 10M-deleted-row file is thus ≤ ~1.3 MB instead of the 80 MB
  * an `Array[Long]` of raw indices costs, and never worse than 1/4 of
  * it — the bound that lets [[DvRowDeleted]]'s process-wide cache hold
  * big-delete DVs without pressuring the executor heap.
  *
  * `contains` is one binary search over the container keys (a handful
  * of cache lines) plus either a 16-bit binary search or a bit test.
  */
final class RowIndexSet private (
    private val keys: Array[Long],
    private val containers: Array[AnyRef],
    val cardinality: Long) extends Serializable {

  def contains(idx: Long): Boolean = {
    if (idx < 0) return false
    val c = java.util.Arrays.binarySearch(keys, idx >>> 16)
    if (c < 0) return false
    val low = (idx & 0xffffL).toInt
    containers(c) match {
      case words: Array[Long] =>
        (words(low >>> 6) >>> (low & 63) & 1L) != 0
      case lows: Array[Short] =>
        // unsigned 16-bit binary search
        var lo = 0
        var hi = lows.length - 1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          val v = lows(mid) & 0xffff
          if (v < low) lo = mid + 1
          else if (v > low) hi = mid - 1
          else return true
        }
        false
    }
  }
}

object RowIndexSet {

  /** Sparse→bitmap cutoff: 4096 shorts = 8 KB = one bitmap. */
  private val DENSE = 4096

  /** Build from STRICTLY ASCENDING indices (a decoded DV stream) —
    * single pass, never materializes the raw index array.
    */
  def fromSorted(it: Iterator[Long]): RowIndexSet = {
    val keys = scala.collection.mutable.ArrayBuffer.empty[Long]
    val conts = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var curKey = -1L
    var lows = new Array[Short](64)
    var n = 0
    var bitmap: Array[Long] = null
    var count = 0L
    def flush(): Unit = if (curKey >= 0) {
      keys += curKey
      conts += (if (bitmap != null) bitmap
                else java.util.Arrays.copyOf(lows, n))
    }
    while (it.hasNext) {
      val idx = it.next()
      count += 1
      val key = idx >>> 16
      if (key != curKey) {
        flush(); curKey = key; n = 0; bitmap = null
      }
      val low = (idx & 0xffffL).toInt
      if (bitmap == null && n >= DENSE) {
        bitmap = new Array[Long](1024)
        var i = 0
        while (i < n) {
          val v = lows(i) & 0xffff
          bitmap(v >>> 6) |= 1L << (v & 63)
          i += 1
        }
      }
      if (bitmap != null) bitmap(low >>> 6) |= 1L << (low & 63)
      else {
        if (n == lows.length)
          lows = java.util.Arrays.copyOf(lows, math.min(n * 2, DENSE))
        lows(n) = low.toShort
        n += 1
      }
    }
    flush()
    new RowIndexSet(keys.toArray, conts.toArray, count)
  }

  def fromSorted(indices: Array[Long]): RowIndexSet =
    fromSorted(indices.iterator)
}

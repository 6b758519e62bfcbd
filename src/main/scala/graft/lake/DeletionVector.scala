package graft.lake

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.nio.file.{Files, Path, Paths}

/** Deletion-vector sidecar files: the merge-on-read half of DELETE
  * (Delta deletion-vector analog; Armbrust et al. VLDB 2020 describes
  * the copy-on-write baseline these improve on).
  *
  * A DV file stores the SORTED physical row indices deleted from one
  * data file, delta-varint encoded: magic `GDV1`, varint count, then
  * the first index and successive gaps as varints. Sorted gaps are
  * small, so a vector of a few million deletions is a few MB — versus
  * rewriting a multi-hundred-MB parquet file to drop the same rows.
  * That asymmetry is the 100 TB story: a DELETE touching 1% of rows in
  * every file writes O(deleted row indices) bytes instead of
  * rewriting the whole table.
  *
  * Encoding is deliberately dependency-free (no roaring bitmap lib in
  * this build); the interface is the index array, so the codec can be
  * swapped without touching callers.
  */
object DeletionVector {

  /** Table-relative directory holding DV files. Flat: DVs are tiny and
    * uuid-named, partition locality buys nothing.
    */
  val DIR = "_deletion_vectors"

  private val MAGIC = Array[Byte]('G', 'D', 'V', '1')

  /** Write `sortedIndices` as a new DV file under `tablePath`; returns
    * the table-relative path. Safe to call from executors — the file
    * is uuid-named and unreferenced until some commit adopts it. The
    * body publishes as ONE [[DataStore.writeBytes]] object (a DV is
    * O(deleted-row gaps) small by design, so buffering it is the
    * single-PUT shape an object store wants anyway).
    */
  def write(tablePath: String, sortedIndices: Array[Long]): String = {
    require(sortedIndices.nonEmpty, "empty deletion vector")
    val rel = s"$DIR/dv-${java.util.UUID.randomUUID()}.bin"
    val target = Paths.get(tablePath).resolve(rel)
    val buf = new java.io.ByteArrayOutputStream(
      16 + sortedIndices.length * 2)
    val out = new BufferedOutputStream(buf)
    try {
      out.write(MAGIC)
      writeVarint(out, sortedIndices.length.toLong)
      var prev = -1L
      var i = 0
      while (i < sortedIndices.length) {
        val v = sortedIndices(i)
        require(v > prev, s"indices not strictly ascending at $i")
        writeVarint(out, v - prev - (if (i == 0) 0 else 1))
        prev = v
        i += 1
      }
    } finally out.close()
    DataStore.current.writeBytes(target, buf.toByteArray)
    rel
  }

  /** Read a DV file into the compressed [[RowIndexSet]] form — the
    * long-lived executor-side representation (see [[DvRowDeleted]]).
    * Streams the varint decode straight into containers; the raw
    * index array is never materialized.
    */
  def readSet(file: Path): RowIndexSet = {
    val in = new BufferedInputStream(new java.io.ByteArrayInputStream(
      DataStore.current.readBytes(file)))
    try {
      val magic = in.readNBytes(4)
      require(java.util.Arrays.equals(magic, MAGIC),
        s"not a deletion vector file: $file")
      val n = readVarint(in).toInt
      RowIndexSet.fromSorted(new Iterator[Long] {
        private var prev = -1L
        private var i = 0
        def hasNext: Boolean = i < n
        def next(): Long = {
          val gap = readVarint(in)
          prev = prev + gap + (if (i == 0) 0 else 1)
          i += 1
          prev
        }
      })
    } finally in.close()
  }

  /** Read a DV file back to its sorted index array (the transient
    * per-file form the DML merge/rewrite paths use).
    */
  def read(file: Path): Array[Long] = {
    val in = new BufferedInputStream(new java.io.ByteArrayInputStream(
      DataStore.current.readBytes(file)))
    try {
      val magic = in.readNBytes(4)
      require(java.util.Arrays.equals(magic, MAGIC),
        s"not a deletion vector file: $file")
      val n = readVarint(in).toInt
      val out = new Array[Long](n)
      var prev = -1L
      var i = 0
      while (i < n) {
        val gap = readVarint(in)
        prev = prev + gap + (if (i == 0) 0 else 1)
        out(i) = prev
        i += 1
      }
      out
    } finally in.close()
  }

  /** Union of two sorted index arrays (both strictly ascending and —
    * by construction — disjoint: a row already in the old DV is
    * invisible to the scan that produced the new one, but overlaps are
    * tolerated anyway).
    */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) { out(k) = a(i); i += 1 }
      else if (a(i) > b(j)) { out(k) = b(j); j += 1 }
      else { out(k) = a(i); i += 1; j += 1 }
      k += 1
    }
    while (i < a.length) { out(k) = a(i); i += 1; k += 1 }
    while (j < b.length) { out(k) = b(j); j += 1; k += 1 }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }

  private def writeVarint(out: java.io.OutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def readVarint(in: java.io.InputStream): Long = {
    var shift = 0
    var result = 0L
    while (true) {
      val b = in.read()
      require(b >= 0, "truncated deletion vector")
      result |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return result
      shift += 7
    }
    result // unreachable
  }
}

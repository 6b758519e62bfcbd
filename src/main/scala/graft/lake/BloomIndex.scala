package graft.lake

import java.io.{DataInputStream, DataOutputStream}
import java.lang.ref.SoftReference
import java.nio.file.{Files, Path, Paths}
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Per-file bloom-filter index for high-cardinality point lookups —
  * the data-skipping lever min/max stats cannot provide (Databricks'
  * bloom filter index; the reference's tables run on that platform).
  * A `WHERE id = x` on a table whose files all span the full id range
  * prunes NOTHING from min/max; a per-file bloom answers "x is
  * definitely not in this file" for all but ~fpp of the files, so a
  * needle-in-haystack lookup on 100 TB opens a handful of files
  * instead of all of them.
  *
  * Shape:
  *  - `graft.bloomFilter.columns` opts logical columns in; writes
  *    build one bloom per (file, column) in ONE distributed pass over
  *    the staged files (reading only the indexed columns — a
  *    column-pruned parquet scan of data this commit just wrote) and
  *    store them in an immutable, uuid-named sidecar under `_bloom/`,
  *    referenced by [[AddFile.bloomPath]]. Sidecars ride the log like
  *    DV sidecars: unreferenced until the commit publishes, swept on
  *    abort, protected from VACUUM while any live or in-window
  *    version references them, aged out afterwards.
  *  - Scans skip WHOLE FILES executor-side: the parquet reader checks
  *    its file's sidecar (decoded once per executor, soft-ref cached
  *    like DVs) against the pushed equality/IN conjuncts before
  *    opening the footer. Skipping is executor-side BY DESIGN — the
  *    driver never reads 10⁶ sidecars at planning time; each task
  *    pays one cached sidecar read for its own files only.
  *  - Rewrites (DELETE/UPDATE/MERGE/OPTIMIZE) recompute blooms for
  *    the files they produce via the same staging pass; a DV re-add
  *    keeps the file's existing bloom (deletion never adds values, so
  *    the bloom stays conservative-correct).
  *
  * NOT protocol-gated on the read side: an engine that ignores blooms
  * reads correctly, just slower — same class as min/max stats. Writes
  * by an unaware engine produce AddFiles without `bloomPath`, which
  * simply don't skip.
  *
  * The staging writer also enables parquet-native bloom filters
  * (`parquet.bloom.filter.enabled#col`) for the same columns, so
  * row-group-level skipping inside files the sidecar could not
  * exclude comes free from the stock reader.
  */
object BloomIndex {

  val PROP_COLUMNS = "graft.bloomFilter.columns"
  val PROP_FPP = "graft.bloomFilter.fpp"
  val PROP_NUM_ITEMS = "graft.bloomFilter.numItems"

  /** Table-relative directory holding bloom sidecars. */
  val DIR = "_bloom"

  private val MAGIC = 0x47424c4d // "GBLM"

  /** Logical columns the table property opts in (empty = disabled). */
  def indexedColumns(props: Map[String, String]): Seq[String] =
    props.get(PROP_COLUMNS).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  def fpp(props: Map[String, String]): Double =
    props.get(PROP_FPP).map(_.toDouble).getOrElse(0.01)

  /** Expected distinct items PER FILE (Databricks' numItems knob).
    * Oversizing wastes sidecar bytes, undersizing raises the
    * false-positive rate — never correctness.
    */
  def numItems(props: Map[String, String]): Long =
    props.get(PROP_NUM_ITEMS).map(_.toLong).getOrElse(1000000L)

  /** A type whose write-side Row value and read-side pushed-Filter
    * value hash identically in [[put]]/[[mightContain]]. Dates and
    * timestamps normalize to their underlying int64 (epoch days /
    * epoch micros — the parquet physical representation — via
    * [[canonical]], covering both the java.sql and java.time external
    * forms); decimals normalize to a scale-canonical plain string.
    * Floats/doubles stay out: binary-equality point lookups on
    * floating point are a user error the index should not encourage.
    */
  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case StringType | BinaryType => true
    case DateType | TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Normalize the engine-dependent EXTERNAL representations of one
    * logical value to a single hashable form. Both sides use this:
    * the build hashes Row values (java.sql.Date/Timestamp, or
    * java.time.LocalDate/Instant under the java8 datetime API, or
    * LocalDateTime for TIMESTAMP_NTZ), the scan hashes pushed-Filter
    * literals — the same value must hash identically whichever form
    * it arrives in. Decimals are the subtle one: 1.0 and 1.00 are the
    * SAME value at different scales, so the canonical form strips
    * trailing zeros before printing.
    */
  private def canonical(v: Any): Any = v match {
    case d: java.sql.Date =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils
        .fromJavaDate(d).toLong
    case d: java.time.LocalDate => d.toEpochDay
    case t: java.sql.Timestamp =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)
    case i: java.time.Instant =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i)
    case l: java.time.LocalDateTime =>
      org.apache.spark.sql.catalyst.util.DateTimeUtils
        .localDateTimeToMicros(l)
    case b: java.math.BigDecimal =>
      if (b.signum() == 0) "0" else b.stripTrailingZeros.toPlainString
    case d: org.apache.spark.sql.types.Decimal =>
      canonical(d.toJavaBigDecimal)
    case other => other
  }

  private def put(bf: BloomFilter, v: Any): Unit = canonical(v) match {
    case b: java.lang.Byte => bf.putLong(b.longValue()); ()
    case s: java.lang.Short => bf.putLong(s.longValue()); ()
    case i: java.lang.Integer => bf.putLong(i.longValue()); ()
    case l: java.lang.Long => bf.putLong(l); ()
    case s: String => bf.putString(s); ()
    case u: org.apache.spark.unsafe.types.UTF8String =>
      bf.putString(u.toString); ()
    case b: Array[Byte] => bf.putBinary(b); ()
    case _ => () // unreachable: build pre-filters to supported types
  }

  /** Conservative membership for a pushed literal: true (keep the
    * file) whenever the value's type is not one we hash.
    */
  private def mightContain(bf: BloomFilter, v: Any): Boolean =
    canonical(v) match {
      case b: java.lang.Byte => bf.mightContainLong(b.longValue())
      case s: java.lang.Short => bf.mightContainLong(s.longValue())
      case i: java.lang.Integer => bf.mightContainLong(i.longValue())
      case l: java.lang.Long => bf.mightContainLong(l)
      case s: String => bf.mightContainString(s)
      case u: org.apache.spark.unsafe.types.UTF8String =>
        bf.mightContainString(u.toString)
      case b: Array[Byte] => bf.mightContainBinary(b)
      case _ => true
    }

  // ---- write side --------------------------------------------------------

  /** Build one bloom sidecar per data file, distributed.
    *
    * Reads ONLY the indexed physical columns of the files under
    * `readPaths` (plus `_metadata.file_path` to group by file),
    * merges per-file across splits, and writes each file's sidecar
    * from the executor that reduced it — the driver ships base paths
    * and receives (rel path → sidecar relative path) pairs, O(files)
    * strings, never bloom bytes. Task retries may orphan a
    * uuid-named sidecar; orphans are unreferenced and age out via
    * vacuum exactly like crashed staging files.
    *
    * Two callers: the write path (staging dir, `relBase` = staging,
    * uniform schema) and the backfill
    * ([[LakeTable.rebuildBloomIndexes]]: explicit live-file list,
    * `relBase` = table root, `mergeSchema` because pre-evolution
    * files may lack an indexed column — a file without the column
    * contributes an empty bloom for it, which is exactly right: no
    * value of that column can match there).
    *
    * Returns Map(rel path → sidecar rel path). Indexed columns
    * missing from the read schema entirely are skipped; partition
    * columns and unsupported types throw — a configured index that
    * can never be built should fail the write, not silently not
    * exist.
    */
  private[lake] def buildSidecars(
      spark: SparkSession,
      readPaths: Seq[String],
      relBase: Path,
      tableRoot: Path,
      physCols: Seq[String],
      partCols: Seq[String],
      expectedItems: Long,
      fppValue: Double,
      mergeSchema: Boolean = false): Map[String, String] = {
    val df = spark.read
      .option("mergeSchema", mergeSchema.toString)
      .parquet(readPaths: _*)
    physCols.foreach { c =>
      require(!partCols.contains(c),
        s"$PROP_COLUMNS names partition column $c: partition values " +
        "are pruned from log metadata already and are not stored in " +
        "the data files; index a data column instead")
    }
    val present = physCols.filter(df.columns.contains)
    present.foreach { c =>
      val dt = df.schema(c).dataType
      require(supported(dt),
        s"$PROP_COLUMNS names $c of unsupported type " +
        s"${dt.simpleString}; supported: integral, string, binary, " +
        "date, timestamp, decimal")
    }
    if (present.isEmpty) return Map.empty
    val sel = df.select(
      (col("_metadata.file_path") +: present.map(col)): _*)
    val n = present.size
    val items = expectedItems
    val fppV = fppValue
    val baseStr = relBase.toAbsolutePath.normalize.toString
    val rootStr = tableRoot.toAbsolutePath.normalize.toString
    val colNames = present.toArray
    sel.rdd.mapPartitions { it =>
      val acc = scala.collection.mutable.HashMap
        .empty[String, Array[BloomFilter]]
      it.foreach { r =>
        val blooms = acc.getOrElseUpdate(r.getString(0),
          Array.fill(n)(BloomFilter.create(items, fppV)))
        var i = 0
        while (i < n) {
          if (!r.isNullAt(i + 1)) put(blooms(i), r.get(i + 1))
          i += 1
        }
      }
      acc.iterator
    }.reduceByKey { (a, b) =>
      var i = 0
      while (i < n) { a(i).mergeInPlace(b(i)); i += 1 }
      a
    }.map { case (absFile, blooms) =>
      val abs =
        if (absFile.startsWith("file:"))
          Paths.get(java.net.URI.create(absFile))
        else Paths.get(absFile)
      val rel = Paths.get(baseStr)
        .relativize(abs.toAbsolutePath.normalize).toString
      val sidecarRel = s"$DIR/${UUID.randomUUID()}.bloom"
      val target = Paths.get(rootStr).resolve(sidecarRel)
      // one DataStore PUT per sidecar body (executor-side, like the
      // DV writer): blooms are KB–MB sized by construction
      val buf = new java.io.ByteArrayOutputStream(4096)
      val out = new DataOutputStream(new java.io.BufferedOutputStream(
        buf))
      try {
        out.writeInt(MAGIC)
        // v2: each bloom is LENGTH-PREFIXED. Spark's
        // BloomFilter.readFrom(InputStream) over-consumes the stream
        // past the bloom's own bytes (its internal buffering), so a
        // v1 sidecar with more than one column was unreadable past
        // the first entry — every multi-column sidecar silently fell
        // back to "never skip". The length prefix makes each entry
        // independently decodable.
        out.writeInt(2)
        out.writeInt(n)
        var i = 0
        while (i < n) {
          out.writeUTF(colNames(i))
          val bb = new java.io.ByteArrayOutputStream()
          blooms(i).writeTo(bb)
          val bytes = bb.toByteArray
          out.writeInt(bytes.length)
          out.write(bytes)
          i += 1
        }
      } finally out.close()
      DataStore.current.writeBytes(target, buf.toByteArray)
      (rel, sidecarRel)
    }.collect().toMap
  }

  // ---- read side ---------------------------------------------------------

  /** Executor-local soft-ref cache of decoded sidecars (immutable,
    * uuid-named — no invalidation, only memory bounding; cleared refs
    * are removed on the next miss, mirroring [[DvRowDeleted]]'s DV
    * cache).
    */
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, SoftReference[Map[String, BloomFilter]]]()

  private[lake] def read(sidecarPath: String): Map[String, BloomFilter] = {
    val ref = cache.get(sidecarPath)
    if (ref != null) {
      val cached = ref.get()
      if (cached != null) return cached
      cache.remove(sidecarPath, ref)
    }
    val in = new DataInputStream(new java.io.BufferedInputStream(
      new java.io.ByteArrayInputStream(
        DataStore.current.readBytes(Paths.get(sidecarPath)))))
    val m =
      try {
        require(in.readInt() == MAGIC, s"not a bloom sidecar: $sidecarPath")
        val version = in.readInt()
        require(version == 1 || version == 2,
          s"unknown bloom sidecar version $version")
        val n = in.readInt()
        (0 until n).map { _ =>
          val name = in.readUTF()
          val bf =
            if (version == 2) {
              // length-prefixed: decode from an exact-bounds buffer
              // (BloomFilter.readFrom over-consumes a raw stream)
              val buf = new Array[Byte](in.readInt())
              in.readFully(buf)
              BloomFilter.readFrom(new java.io.ByteArrayInputStream(buf))
            } else BloomFilter.readFrom(in) // v1: single-column only
          name -> bf
        }.toMap
      } finally in.close()
    cache.put(sidecarPath, new SoftReference(m))
    m
  }

  /** Count of files skipped by bloom exclusion — observability for
    * tests and the correctness gate's effectiveness `require`.
    */
  val skippedFiles = new java.util.concurrent.atomic.AtomicLong

  /** True iff the sidecar PROVES the file cannot satisfy the
    * conjunctive requirements: some (column → candidate values) entry
    * has a bloom for that column and NO candidate might be present.
    * IO or decode failure keeps the file (skipping is an optimization
    * — never let a corrupt sidecar fail a scan that would succeed
    * without it).
    */
  private[graft] def excludes(
      sidecarPath: String, eqs: Seq[(String, Seq[Any])]): Boolean =
    try {
      val blooms = read(sidecarPath)
      eqs.exists { case (colName, values) =>
        blooms.get(colName)
          .exists(bf => !values.exists(v => mightContain(bf, v)))
      }
    } catch { case _: Exception => false }

  /** Pushed-filter conjuncts usable for bloom skipping:
    * `col = lit` and `col IN (lits)` with non-null literals. Filter
    * names here are PHYSICAL (post-translation). Nested And is split;
    * Or/Not shapes are left to the row-level filter.
    */
  private[graft] def equalityRequirements(
      filters: Seq[org.apache.spark.sql.sources.Filter])
      : Seq[(String, Seq[Any])] = {
    import org.apache.spark.sql.sources._
    def split(f: Filter): Seq[Filter] = f match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    filters.flatMap(split).collect {
      case EqualTo(a, v) if v != null => (a, Seq(v))
      case In(a, vs) if vs.nonEmpty && vs.forall(_ != null) =>
        (a, vs.toSeq)
    }
  }
}

package graft.lake

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Storage seam for the commit-critical log primitives (Delta's
  * LogStore analog). The transaction protocol needs exactly four
  * storage guarantees, and everything else in the engine is ordinary
  * streaming I/O:
  *
  *  1. [[putIfAbsent]] — atomically publish a finished file, failing
  *     if the name exists. THE commit primitive: whoever wins the
  *     name owns the version.
  *  2. [[atomicReplace]] — atomically (re)place an auxiliary file
  *     (checkpoints, history sidecars); last writer wins is fine,
  *     readers must never see a torn file.
  *  3. [[listDir]] — list a directory's entries.
  *  4. [[readLines]] — read a published file back.
  *
  * The default [[LocalLogStore]] implements them with POSIX/HDFS
  * semantics (exclusive `createLink`, `ATOMIC_MOVE`). An object-store
  * port supplies conditional-PUT (`If-None-Match: *`) for 1, plain PUT
  * for 2, LIST for 3 — S3/GCS/ABFS all offer these today, which is
  * why Delta runs there with the same four-call surface. Swap via
  * [[LogStore.current]] before any table I/O; one store per process
  * (mixing stores against one table forfeits the mutual-exclusion
  * guarantee, same as Delta's single-LogStore rule).
  */
trait LogStore {

  /** Write `lines` and publish them as `target` atomically; throw
    * [[java.nio.file.FileAlreadyExistsException]] if `target` already
    * exists. MUST be all-or-nothing: readers never observe a partial
    * file under `target`.
    */
  def putIfAbsent(target: Path, lines: Seq[String]): Unit

  /** [[putIfAbsent]] whose lines STREAM from an iterator — the
    * O(table)-bulk commit shape (RESTORE re-adds): the caller's heap
    * holds one chunk of actions, never the whole serialized commit.
    * The default materializes for third-party stores; the bundled
    * stores override with true streaming writes.
    */
  def putIfAbsent(target: Path, lines: Iterator[String]): Unit =
    putIfAbsent(target, lines.toSeq)

  /** Write `lines` as `target` atomically, REPLACING any previous
    * content. Readers must never observe a torn file.
    */
  def atomicReplace(target: Path, lines: Seq[String]): Unit

  /** Entries of `dir` (non-recursive); empty if `dir` is missing. */
  def listDir(dir: Path): Seq[Path]

  /** Lines of `p`. */
  def readLines(p: Path): Seq[String]

  /** Stream the lines of `p` through `f` — peak memory is one line
    * plus whatever `f` retains, where [[readLines]] materializes the
    * whole file's Strings first. Matters for BULK version files: a
    * RESTORE of a 10⁷-file table legitimately commits ~7 GB of re-add
    * lines in one version, and the post-restore fold must not hold
    * 10⁷ Strings AND 10⁷ parsed actions at once. The default
    * delegates to [[readLines]] (correct for any store; remote stores
    * buffer one GET anyway); locally-backed stores override with a
    * true line stream.
    */
  def readLinesStream[A](p: Path)(f: Iterator[String] => A): A =
    f(readLines(p).iterator)

  /** Lines of `p` starting with one of `prefixes` (ASCII) — the
    * metadata-light replay's line filter PUSHED TO THE STORE, where a
    * locally-backed implementation can match raw bytes: a 100k-add
    * version file yields its two meta lines without materializing
    * 100k Strings. Both log writers emit lines with the envelope key
    * first and no leading whitespace, so a byte-prefix match is exact.
    * The default decodes-then-filters, which keeps any store's fault
    * injection on [[readLines]] in the path.
    */
  def readLinesWithPrefix(p: Path, prefixes: Seq[String]): Seq[String] =
    readLines(p).filter(l => prefixes.exists(l.startsWith))

  def exists(p: Path): Boolean

  def delete(p: Path): Boolean

  /** (size bytes, modification time millis) of `p`, or None if it is
    * absent or unreadable — an object store's HEAD request. Used for
    * the cheap identity/age probes of log files (snapshot-cache
    * fingerprints, retention age gates, commit-timestamp fallbacks),
    * so a port needs no extra local-filesystem calls for them. The
    * default covers any locally-backed store.
    */
  def stat(p: Path): Option[(Long, Long)] =
    try Some((Files.size(p), Files.getLastModifiedTime(p).toMillis))
    catch { case _: java.io.IOException => None }

  /** Where a caller must stage a large binary body destined for
    * `target` before handing it to [[atomicReplaceFile]] — the store
    * owns the location so ITS [[cleanupStaging]] sweep finds the body
    * if the writer crashes between staging and publish, and so the
    * staged file never surfaces as a listable key of the store. The
    * local default stages as a `.rep-*.tmp` sibling (same directory =
    * same filesystem, so the publish move stays atomic), which the
    * local sweep already matches.
    */
  def stageFileTarget(target: Path): Path = {
    Files.createDirectories(target.getParent)
    target.resolveSibling(
      s".rep-${java.util.UUID.randomUUID()}.tmp")
  }

  /** Atomically publish an already-staged LOCAL binary file as
    * `target`, replacing previous content — the binary twin of
    * [[atomicReplace]] for files too large or non-line-oriented to
    * buffer as strings (parquet checkpoint parts). The staged file
    * must come from [[stageFileTarget]]. Same contract: last writer
    * wins, readers never observe a torn file. An object store
    * implements this as a single-object upload (PUT is atomic on
    * S3/GCS/ABFS); the local default moves atomically.
    */
  def atomicReplaceFile(staged: Path, target: Path): Unit = {
    Files.createDirectories(target.getParent)
    Files.move(staged, target,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Sweep this store's own staging debris in `dir` older than
    * `horizonMs` — a writer crashed between staging and publish
    * orphans its tmp file forever otherwise. Stores that stage
    * nothing (pure conditional-PUT) need not override. Must never
    * throw: it runs on commit-side maintenance paths.
    */
  def cleanupStaging(dir: Path, horizonMs: Long): Unit = ()

  /** SERIALIZABLE read handle for a published binary log file (a
    * parquet checkpoint part). The handle is built on the DRIVER —
    * capturing whatever the store needs (key, credentials, endpoint)
    * — and shipped inside Spark task closures, so executor-side
    * checkpoint scans go through the store's own GET semantics
    * instead of assuming the driver's filesystem is mounted on every
    * executor. The default handle is correct for any store whose
    * objects are directly readable as local files on all nodes
    * (POSIX, NFS, HDFS mounts); an object-store port returns a
    * GET-backed handle with [[LogFileReader.localPath]] = None.
    */
  def fileReader(p: Path): LogFileReader =
    new LocalLogFileReader(p.toString)
}

/** Byte-level reader for one published binary log file, shippable to
  * executors. Callers prefer [[localPath]] when present (zero-copy
  * streaming/projected parquet reads against the local filesystem)
  * and fall back to [[readAllBytes]] — the single-object GET every
  * store can serve — otherwise.
  */
trait LogFileReader extends Serializable {

  /** The entire object body — one GET. Always available. */
  def readAllBytes(): Array[Byte]

  /** Local filesystem path of the object when the store is
    * locally/POSIX-backed on every node; None for a remote store,
    * telling the caller to parse [[readAllBytes]] instead.
    */
  def localPath: Option[String]
}

/** Handle for locally-readable stores: the path string IS the handle. */
final class LocalLogFileReader(path: String) extends LogFileReader {
  override def readAllBytes(): Array[Byte] =
    Files.readAllBytes(java.nio.file.Paths.get(path))
  override def localPath: Option[String] = Some(path)
}

/** POSIX/HDFS implementation: exclusive hard-link publish, tmp-file +
  * `ATOMIC_MOVE` replace.
  */
object LocalLogStore extends LogStore {

  override def putIfAbsent(target: Path, lines: Seq[String]): Unit =
    putIfAbsent(target, lines.iterator)

  override def putIfAbsent(target: Path, lines: Iterator[String]): Unit = {
    val dir = target.getParent
    Files.createDirectories(dir)
    if (Files.exists(target))
      throw new java.nio.file.FileAlreadyExistsException(target.toString)
    val tmp = Files.createTempFile(dir, s".put-${target.getFileName}-", ".tmp")
    try {
      val w = Files.newBufferedWriter(tmp)
      try lines.foreach { l => w.write(l); w.newLine() }
      finally w.close()
      // createLink fails atomically if the name exists (rename would
      // silently REPLACE — a lost commit under concurrent writers)
      Files.createLink(target, tmp)
    } finally Files.deleteIfExists(tmp)
  }

  override def atomicReplace(target: Path, lines: Seq[String]): Unit = {
    val dir = target.getParent
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, s".rep-${target.getFileName}-", ".tmp")
    try {
      Files.write(tmp, lines.asJava)
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    } finally Files.deleteIfExists(tmp)
  }

  override def listDir(dir: Path): Seq[Path] = {
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    try s.iterator.asScala.toSeq
    finally s.close()
  }

  override def readLines(p: Path): Seq[String] =
    Files.readAllLines(p).asScala.toSeq

  override def readLinesStream[A](p: Path)(f: Iterator[String] => A): A = {
    val r = Files.newBufferedReader(p)
    try f(Iterator.continually(r.readLine()).takeWhile(_ != null))
    finally r.close()
  }

  /** Byte-level prefix scan: one read of the raw bytes, line starts
    * located by '\n', prefixes compared byte-for-byte, and ONLY
    * matching lines decoded to Strings — the 100k-add version file a
    * metadata fold walks costs one buffer and two decodes, not 100k
    * String allocations. Files past [[LocalLogStore.SLURP_MAX_BYTES]]
    * take the STREAMING scan instead: a single commit can
    * legitimately exceed the JVM's 2 GB array bound (a RESTORE of a
    * 10⁷-file table writes ~7 GB of re-add lines in one version
    * file — found by MetaScaleBench at 10⁷, where `readAllBytes`
    * threw "Required array size too large" on the post-restore meta
    * fold), and the scan only ever needs one buffer plus the line
    * being decided.
    */
  override def readLinesWithPrefix(
      p: Path, prefixes: Seq[String]): Seq[String] = {
    val pfx = prefixes.map(
      _.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
    val size = try Files.size(p) catch { case _: Throwable => 0L }
    if (size > LocalLogStore.SLURP_MAX_BYTES)
      return streamLinesWithPrefix(p, pfx)
    val bytes = Files.readAllBytes(p)
    val out = Seq.newBuilder[String]
    val n = bytes.length
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && bytes(j) != '\n') j += 1
      var end = j
      if (end > i && bytes(end - 1) == '\r') end -= 1
      // tolerate leading space/tab the String-path readers' .trim
      // accepted — a hand-edited or foreign-writer line must not be
      // silently dropped from meta replay or history extraction
      var st = i
      while (st < end && (bytes(st) == ' ' || bytes(st) == '\t')) st += 1
      val len = end - st
      var m = 0
      var hit = false
      while (!hit && m < pfx.length) {
        val q = pfx(m)
        if (len >= q.length) {
          var k = 0
          while (k < q.length && bytes(st + k) == q(k)) k += 1
          hit = k == q.length
        }
        m += 1
      }
      if (hit)
        out += new String(bytes, st, len,
          java.nio.charset.StandardCharsets.UTF_8)
      i = j + 1
    }
    out.result()
  }

  /** Slurp bound for the prefix scan; above it the streaming scan
    * runs. Comfortably under the 2 GB array limit with headroom for
    * the decode.
    */
  private[lake] var SLURP_MAX_BYTES: Long = 512L * 1024 * 1024

  /** Streaming twin of the byte-prefix scan: chunked reads, one
    * bounded buffer; each line's first bytes (past leading space/tab)
    * decide the match, matching lines accumulate and decode, and the
    * 10⁷ non-matching add lines of a bulk commit are DISCARDED as the
    * chunks flow past — memory is one chunk plus the longest matching
    * line, never the file.
    */
  private def streamLinesWithPrefix(
      p: Path, pfx: Array[Array[Byte]]): Seq[String] = {
    val out = Seq.newBuilder[String]
    val maxPfx = if (pfx.isEmpty) 0 else pfx.map(_.length).max
    val in = Files.newInputStream(p)
    try {
      val buf = new Array[Byte](1 << 20)
      // per-line state, carried across chunk boundaries
      val head = new java.io.ByteArrayOutputStream(maxPfx + 16)
      var atLineStart = true // still skipping leading space/tab
      var decided = false // head held enough bytes to test the prefixes
      var keeping = false // line matched: accumulate to emit
      var n = in.read(buf)
      def matches(h: Array[Byte], len: Int): Boolean = {
        var m = 0
        while (m < pfx.length) {
          val q = pfx(m)
          if (len >= q.length) {
            var k = 0
            while (k < q.length && h(k) == q(k)) k += 1
            if (k == q.length) return true
          }
          m += 1
        }
        false
      }
      def endLine(): Unit = {
        if (!decided) {
          // short line: decide on what we have
          keeping = matches(head.toByteArray, head.size)
        }
        if (keeping) {
          val h = head.toByteArray
          var len = h.length
          if (len > 0 && h(len - 1) == '\r') len -= 1
          out += new String(h, 0, len,
            java.nio.charset.StandardCharsets.UTF_8)
        }
        head.reset(); atLineStart = true; decided = false; keeping = false
      }
      while (n > 0) {
        var i = 0
        while (i < n) {
          val b = buf(i)
          if (b == '\n') endLine()
          else if (atLineStart && (b == ' ' || b == '\t')) ()
          else {
            atLineStart = false
            if (!decided) {
              head.write(b.toInt)
              if (head.size >= maxPfx) {
                decided = true
                keeping = matches(head.toByteArray, head.size)
                if (!keeping) head.reset()
              }
            } else if (keeping) head.write(b.toInt)
          }
          i += 1
        }
        n = in.read(buf)
      }
      if (head.size > 0 || keeping) endLine() // unterminated final line
      out.result()
    } finally in.close()
  }

  override def exists(p: Path): Boolean = Files.exists(p)

  override def delete(p: Path): Boolean = Files.deleteIfExists(p)

  /** Sweep `.put-*`/`.rep-*` tmp orphans a crashed writer left between
    * write and link/move, plus the `..rep-*.tmp.crc` siblings Hadoop's
    * checksummed LocalFileSystem writes next to staged parquet bodies
    * (deleted eagerly on the happy path, orphaned on a crash).
    * Age-gated so a LIVE writer's in-flight tmp (milliseconds old) is
    * never yanked from under it.
    */
  override def cleanupStaging(dir: Path, horizonMs: Long): Unit = {
    val cutoff = System.currentTimeMillis() - horizonMs
    listDir(dir).foreach { p =>
      val n = p.getFileName.toString
      if (((n.startsWith(".put-") || n.startsWith(".rep-")) &&
            n.endsWith(".tmp")) ||
          ((n.startsWith("..put-") || n.startsWith("..rep-")) &&
            n.endsWith(".tmp.crc"))) {
        try {
          if (Files.getLastModifiedTime(p).toMillis < cutoff)
            Files.deleteIfExists(p)
          ()
        } catch { case _: java.io.IOException => () }
      }
    }
  }
}

object LogStore {
  /** Process-wide store. Replace before any table I/O to port the
    * engine to a different storage system; the default is correct for
    * local disks, NFS with O_EXCL, and HDFS.
    */
  @volatile var current: LogStore = LocalLogStore
}

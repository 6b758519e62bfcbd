package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.SparkSession
import org.json4s.DefaultFormats
import org.json4s.jackson.Serialization

/** Engine-level name → path catalog for lake tables (SURVEY §1.4):
  * the equivalent of the reference's metastore registration
  * (`CREATE TABLE ... USING DELTA LOCATION`, K6). Registered names are
  * exposed to Spark SQL as temp views refreshed on demand by
  * [[LakeSql]], so plain DQL over lake tables "just works".
  *
  * Registrations are PERSISTENT: the name → path map is written
  * through to `_graft_catalog.json` under the warehouse directory
  * (override with `-Dgraft.catalog.dir`), so a brand-new session —
  * like the reference's metastore-backed `CREATE TABLE ... USING
  * DELTA LOCATION` (etl/01:149-161, rapid:166-171) — resolves every
  * previously registered table by name without re-registration.
  * Writes are atomic (temp file + move); entries whose path no longer
  * holds a lake log are pruned on load, so dead test/tmp tables
  * self-clean instead of accumulating.
  */
object LakeCatalog {

  private implicit val formats: DefaultFormats.type = DefaultFormats

  private val tables = TrieMap.empty[String, String]
  // Names dropped by THIS session — merge-on-persist must not
  // resurrect them from a stale on-disk map. Guarded by ioLock.
  private val dropped = scala.collection.mutable.Set.empty[String]
  private val ioLock = new Object
  @volatile private var loadedFrom: Option[Path] = None

  private def stripScheme(dir: String): String =
    dir.stripPrefix("file://").stripPrefix("file:")

  /** Resolution order: explicit system property, the (active)
    * session's warehouse dir, then ./spark-warehouse — the same
    * location Spark's own embedded metastore would use.
    */
  private def catalogFile(spark: Option[SparkSession]): Path = {
    val dir = sys.props.get("graft.catalog.dir")
      .orElse(spark.orElse(SparkSession.getActiveSession)
        .flatMap(s => s.conf.getOption("spark.sql.warehouse.dir")))
      .getOrElse(sys.props("user.dir") + "/spark-warehouse")
    Paths.get(stripScheme(dir), "_graft_catalog.json")
  }

  /** Merge the on-disk map into memory. In-memory entries win per key
    * (they are newer), names dropped by this session stay dropped, and
    * disk entries whose path no longer holds a lake log are pruned.
    * Caller must hold ioLock.
    */
  private def mergeFromDisk(f: Path): Unit =
    if (Files.isRegularFile(f)) {
      val disk =
        try Serialization.read[Map[String, String]](
          new String(Files.readAllBytes(f), "UTF-8"))
        catch { case _: Throwable => Map.empty[String, String] }
      disk.foreach { case (n, p) =>
        if (!tables.contains(n) && !dropped(n) && LakeTable.isLakeTable(p))
          tables.put(n, p)
      }
    }

  /** Merge persisted registrations into memory once per catalog file. */
  private def ensureLoaded(spark: Option[SparkSession]): Unit = {
    val f = catalogFile(spark)
    if (loadedFrom.contains(f)) return
    ioLock.synchronized {
      if (loadedFrom.contains(f)) return
      mergeFromDisk(f)
      loadedFrom = Some(f)
    }
  }

  /** Write-through with MERGE-ON-PERSIST: re-read the on-disk map
    * immediately before writing, so a concurrent process's
    * registrations made since our last read survive our write
    * (read-once-then-overwrite would drop them — last writer wins per
    * FILE; with the merge, last writer wins per KEY). The
    * read-merge-write runs under an OS file lock on a `.lock` sidecar
    * so two processes can't interleave their reads before both writes
    * either (ioLock already serializes threads of THIS JVM, which is
    * also why the advisory FileLock can't self-overlap). Caller must
    * hold ioLock.
    */
  private def persist(spark: Option[SparkSession]): Unit = {
    val f = catalogFile(spark)
    Files.createDirectories(f.getParent)
    val lockPath = f.resolveSibling(f.getFileName.toString + ".lock")
    val ch = java.nio.channels.FileChannel.open(lockPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      val osLock = ch.lock()
      try {
        mergeFromDisk(f)
        val tmp = f.resolveSibling(f.getFileName.toString + ".tmp")
        Files.write(tmp, Serialization.write(tables.toMap).getBytes("UTF-8"))
        Files.move(tmp, f, StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.ATOMIC_MOVE)
      } finally osLock.release()
    } finally ch.close()
  }

  /** Test hook: forget in-memory state so the next access re-reads the
    * on-disk catalog — simulates a fresh JVM/session.
    */
  private[graft] def resetForTest(): Unit = ioLock.synchronized {
    tables.clear()
    dropped.clear()
    loadedFrom = None
  }

  /** K6 — register (or re-register) a name for a lake path. */
  def register(spark: SparkSession, name: String, path: String): Unit = {
    require(LakeTable.isLakeTable(path),
      s"$path is not a lake table (no ${LakeLog.LOG_DIR})")
    ioLock.synchronized {
      ensureLoaded(Some(spark))
      val key = normalize(name)
      dropped -= key
      tables.put(key, path)
      persist(Some(spark))
    }
    refreshView(spark, name)
  }

  /** K8 — drop the registration (data/log untouched). */
  def drop(spark: SparkSession, name: String): Unit = {
    ioLock.synchronized {
      ensureLoaded(Some(spark))
      val key = normalize(name)
      dropped += key
      tables.remove(key)
      persist(Some(spark))
    }
    spark.catalog.dropTempView(name)
    ()
  }

  def pathOf(name: String): Option[String] = {
    ensureLoaded(None)
    val key = normalize(name)
    tables.get(key).orElse {
      // Another process may have registered the name since this JVM
      // last read the catalog file — re-merge from disk on a miss
      // (misses are rare, so this costs nothing on the happy path).
      ioLock.synchronized(mergeFromDisk(catalogFile(None)))
      tables.get(key)
    }
  }

  def table(spark: SparkSession, name: String): LakeTable = {
    ensureLoaded(Some(spark))
    LakeTable.forPath(spark, pathOf(name).getOrElse(
      throw new IllegalArgumentException(
        s"lake table not registered: $name")))
  }

  def registeredNames: Seq[String] = {
    ensureLoaded(None)
    tables.keys.toSeq.sorted
  }

  /** True for error conditions Spark raises when a name cannot be a
    * temp view identifier — the only failures refreshView may swallow.
    * Matches the condition families (INVALID_*, TEMP_VIEW_*) rather
    * than two pinned codes, and treats a null condition (legacy,
    * un-classified errors — all name-validation-shaped in practice)
    * as non-addressable too, matching register()'s tolerance.
    */
  private def invalidViewNameCondition(c: String): Boolean =
    c == null || c.startsWith("INVALID_") || c.startsWith("TEMP_VIEW_") ||
      c == "_LEGACY_ERROR_TEMP_1321" // invalid chars / spaces

  def refreshView(spark: SparkSession, name: String): Unit =
    pathOf(name).foreach { p =>
      try LakeTable.forPath(spark, p).toDF.createOrReplaceTempView(name)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if invalidViewNameCondition(e.getCondition) =>
          () // name not view-addressable; catalog lookup still works
        // any other analysis failure would leave a silently stale
        // view behind — let it surface
      }
    }

  private val IdentTokenRe = """`[^`]+`|[A-Za-z_][A-Za-z0-9_.]*""".r

  /** Refresh views for every registered table referenced in `sqlText`.
    * Matches whole identifiers (including dotted/backticked forms and
    * their parts), not substrings — a statement mentioning `tx` must
    * not refresh a table named `t`, or every statement churns
    * O(tables) snapshot replays.
    */
  def refreshReferenced(spark: SparkSession, sqlText: String): Unit = {
    ensureLoaded(Some(spark))
    if (tables.isEmpty) return
    val tokens = IdentTokenRe.findAllIn(sqlText).flatMap { t =>
      val base = t.toLowerCase.stripPrefix("`").stripSuffix("`")
      Iterator(base) ++ base.split('.').iterator
    }.toSet
    tables.keys.foreach(n => if (tokens(n)) refreshView(spark, n))
  }

  private def normalize(name: String): String =
    name.toLowerCase.stripPrefix("`").stripSuffix("`")
}

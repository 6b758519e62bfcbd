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

  /** On-disk shape: registrations and drop TOMBSTONES, each stamped
    * with its wall-clock time so concurrent sessions can merge by
    * last-writer-wins PER KEY. Tombstones are what let a drop in one
    * process survive another live process's merge-on-persist (which
    * would otherwise write its older in-memory registration back).
    * Legacy flat `{name: path}` files read as timestamp-0 entries —
    * any newer state beats them. Tombstones are not GC'd: they are
    * one (name, long) pair per distinct dropped name, erased again by
    * re-registration.
    *
    * CLOCK ASSUMPTION: per-key LWW orders operations by wall-clock
    * stamps taken in different processes, so correctness across HOSTS
    * assumes clocks synchronized to within the smallest interesting
    * register/drop gap (NTP-class skew; same assumption Delta makes
    * for commit timestamps). Within what one session has SEEN, the
    * assumption is discharged: stamps are taken as
    * max(now, maxSeenStamp + 1), so a session never writes a stamp
    * behind state it has already merged, even if its own clock steps
    * backwards.
    */
  private case class CatalogDisk(
      tables: Map[String, String] = Map.empty,
      registeredAt: Map[String, Long] = Map.empty,
      dropped: Map[String, Long] = Map.empty)

  private val tables = TrieMap.empty[String, String]
  // When each in-memory registration happened (millis) — the local
  // side of the per-key last-writer-wins merge. Guarded by ioLock.
  private val regTime = scala.collection.mutable.Map.empty[String, Long]
  // Names dropped, with drop time: kept in memory AND persisted, so
  // neither this session's next merge nor another process's
  // merge-on-persist resurrects them from stale state.
  private val dropped = scala.collection.mutable.Map.empty[String, Long]
  private val ioLock = new Object
  @volatile private var loadedFrom: Option[Path] = None
  // Largest timestamp observed in merged disk state or stamped by this
  // session — the monotonic floor for new stamps. Guarded by ioLock.
  private var maxSeenStamp = 0L

  /** New LWW stamp: wall clock, but never at-or-behind anything this
    * session has merged or written (see the clock note on CatalogDisk).
    * Caller must hold ioLock.
    */
  private def stampNow(): Long = {
    maxSeenStamp = math.max(System.currentTimeMillis(), maxSeenStamp + 1)
    maxSeenStamp
  }

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

  /** Merge the on-disk state into memory, last-writer-wins per key by
    * timestamp (ties go to the drop), pruning disk entries whose path
    * no longer holds a lake log. A file that cannot be parsed must NOT
    * read as empty — the next persist would atomically replace it with
    * only this session's entries, silently discarding every other
    * session's registrations — so the unreadable file is backed up
    * aside (`.corrupt`) and the failure logged before starting fresh.
    * Caller must hold ioLock.
    */
  private def mergeFromDisk(f: Path): Unit =
    if (Files.isRegularFile(f)) {
      val disk: CatalogDisk =
        try {
          val jv = org.json4s.jackson.JsonMethods.parse(
            new String(Files.readAllBytes(f), "UTF-8"))
          jv \ "tables" match {
            case _: org.json4s.JObject => jv.extract[CatalogDisk]
            case _ => // legacy flat {name: path}: timestamp-0 entries
              CatalogDisk(tables = jv.extract[Map[String, String]])
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            val backup = f.resolveSibling(f.getFileName.toString + ".corrupt")
            System.err.println(s"[graft] unreadable catalog $f " +
              s"(${e.getClass.getSimpleName}: ${e.getMessage}); " +
              s"preserving it as $backup")
            try Files.move(f, backup, StandardCopyOption.REPLACE_EXISTING)
            catch { case scala.util.control.NonFatal(_) => () }
            CatalogDisk()
        }
      maxSeenStamp = (maxSeenStamp +:
        (disk.registeredAt.values ++ disk.dropped.values).toSeq).max
      disk.dropped.foreach { case (n, t) =>
        if (!regTime.get(n).exists(_ > t)) { // our re-register is newer?
          tables.remove(n); regTime.remove(n)
          dropped(n) = math.max(dropped.getOrElse(n, 0L), t)
        }
      }
      disk.tables.foreach { case (n, p) =>
        val t = disk.registeredAt.getOrElse(n, 0L)
        val newerLocal =
          regTime.get(n).exists(_ >= t) || dropped.get(n).exists(_ >= t)
        if (!newerLocal && LakeTable.isLakeTable(p)) {
          dropped.remove(n)
          tables.put(n, p)
          regTime(n) = t
        }
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
        Files.write(tmp, Serialization.write(CatalogDisk(
          tables.toMap, regTime.toMap, dropped.toMap)).getBytes("UTF-8"))
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
    regTime.clear()
    dropped.clear()
    maxSeenStamp = 0L
    loadedFrom = None
  }

  /** Test hook: plant an in-memory registration with a chosen
    * timestamp, bypassing persist — simulates another JVM that is
    * still holding the name from before a cross-process drop.
    */
  private[graft] def seedForTest(name: String, path: String, at: Long): Unit =
    ioLock.synchronized {
      val key = normalize(name)
      tables.put(key, path)
      regTime(key) = at
      dropped.remove(key)
      ()
    }

  /** K6 — register (or re-register) a name for a lake path. */
  def register(spark: SparkSession, name: String, path: String): Unit = {
    require(LakeTable.isLakeTable(path),
      s"$path is not a lake table (no ${LakeLog.LOG_DIR})")
    ioLock.synchronized {
      ensureLoaded(Some(spark))
      val key = normalize(name)
      dropped.remove(key)
      tables.put(key, path)
      regTime(key) = stampNow()
      persist(Some(spark))
    }
    refreshView(spark, name)
  }

  /** K8 — drop the registration (data/log untouched). */
  def drop(spark: SparkSession, name: String): Unit = {
    ioLock.synchronized {
      ensureLoaded(Some(spark))
      val key = normalize(name)
      dropped(key) = stampNow()
      tables.remove(key)
      regTime.remove(key)
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

  /** True ONLY for the error conditions Spark raises when a name
    * cannot be a temp view identifier — the sole failures refreshView
    * may swallow (probed against Spark 4.1: invalid characters/spaces
    * raise `_LEGACY_ERROR_TEMP_1321`, dotted names raise
    * `TEMP_VIEW_NAME_TOO_MANY_NAME_PARTS`). Anything else — including
    * other members of the INVALID_ and TEMP_VIEW_ families, like
    * INVALID_OPTIONS — signals a real analysis problem and must
    * surface rather than leave a silently stale view behind.
    */
  private def invalidViewNameCondition(c: String): Boolean =
    c == "_LEGACY_ERROR_TEMP_1321" ||
      (c != null && c.startsWith("TEMP_VIEW_NAME_"))

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

package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption, NoSuchFileException}
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** The transaction log of one lake table: `<table>/_lake_log/NNN...N.json`,
  * one numbered JSON-lines file per version (Delta-protocol layout,
  * SURVEY §7.1). Commits are atomic: write a temp file, then
  * `ATOMIC_MOVE` into place; the move fails if the version already
  * exists, which is the optimistic-concurrency conflict signal.
  */
final class LakeLog(val tablePath: String) {
  import LakeLog._

  val logDir: Path = Paths.get(tablePath, LOG_DIR)

  def exists: Boolean = Files.isDirectory(logDir) && latestVersion >= 0

  /** Highest committed version, or -1 for a nonexistent table. */
  def latestVersion: Long = {
    if (!Files.isDirectory(logDir)) return -1L
    listVersionFiles.lastOption.map(versionOf).getOrElse(-1L)
  }

  def listVersionFiles: Seq[Path] = {
    if (!Files.isDirectory(logDir)) return Nil
    val s = Files.list(logDir)
    try s.iterator.asScala
      .filter(p => VERSION_FILE_RE.matches(p.getFileName.toString))
      .toSeq.sortBy(_.getFileName.toString)
    finally s.close()
  }

  def readVersion(version: Long): Seq[Action] = {
    val p = versionFile(version)
    if (!Files.exists(p))
      throw new NoSuchFileException(
        s"version $version does not exist for lake table at $tablePath")
    Files.readAllLines(p).asScala.iterator
      .map(_.trim).filter(_.nonEmpty).map(Action.fromJson).toSeq
  }

  /** Atomically commit `actions` as `version`. Throws
    * [[ConcurrentWriteException]] if that version was already written.
    */
  def commit(version: Long, actions: Seq[Action]): Unit = {
    Files.createDirectories(logDir)
    val target = versionFile(version)
    if (Files.exists(target)) throw new ConcurrentWriteException(version)
    val tmp = Files.createTempFile(logDir, s".tmp-$version-", ".json")
    try {
      Files.write(tmp, actions.map(Action.toJson).asJava)
      try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      catch { case NonFatal(_) if Files.exists(target) =>
        throw new ConcurrentWriteException(version)
      }
    } finally Files.deleteIfExists(tmp)
  }

  /** Replay all actions up to and including `version` (-1 = latest). */
  def snapshot(version: Long = -1): Snapshot = {
    val latest = latestVersion
    if (latest < 0)
      throw new IllegalStateException(s"not a lake table: $tablePath " +
        s"(no $LOG_DIR directory)")
    val v = if (version < 0) latest else version
    if (v > latest)
      throw new IllegalArgumentException(
        s"cannot time travel to version $v; latest is $latest " +
        s"(table: $tablePath)")
    Snapshot.replay(this, v)
  }

  def versionFile(version: Long): Path =
    logDir.resolve(f"$version%020d.json")
}

object LakeLog {
  val LOG_DIR = "_lake_log"
  private val VERSION_FILE_RE = "\\d{20}\\.json".r

  def versionOf(p: Path): Long =
    p.getFileName.toString.stripSuffix(".json").toLong
}

final class ConcurrentWriteException(version: Long) extends RuntimeException(
  s"concurrent write detected: version $version was committed by " +
  "another writer; re-read the table and retry")

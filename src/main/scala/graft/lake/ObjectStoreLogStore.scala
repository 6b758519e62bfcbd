package graft.lake

import java.io.IOException
import java.nio.file.{FileAlreadyExistsException, Files, Path, StandardCopyOption}
import java.util.concurrent.atomic.AtomicInteger
import scala.jdk.CollectionConverters._

/** Emulated object-store [[LogStore]]: the client surface of a
  * conditional-PUT store (S3 `If-None-Match: *`, GCS
  * `x-goog-if-generation-match: 0`, ABFS create-if-not-exists) over a
  * local directory. The reference runs every Delta write against
  * exactly this storage class (delta_batch_etl/01_raw_to_bronze.py:
  * 122-134 — DBFS-backed tables), so this store exists to certify the
  * engine's commit protocol against object-store semantics rather than
  * the POSIX semantics [[LocalLogStore]] gets for free:
  *
  *  - NO atomic rename, NO hard links at the client API. `putIfAbsent`
  *    is a single conditional PUT the emulated "service" applies
  *    atomically (the internal lock + tmp/move is the server-side
  *    atomicity every real object store provides for one PUT — a
  *    client never observes a partial object).
  *  - `atomicReplace` is a plain unconditional PUT (last writer wins,
  *    never torn) — exactly what checkpoints/sidecars need.
  *  - LIST may lag behind a PUT (tunable below). The commit protocol
  *    must treat `putIfAbsent` as the sole authority on who owns a
  *    version; a lagged LIST only costs a retry, never a lost commit.
  *
  * Fault injection (all scoped to paths under [[faultScope]] so a
  * shared store can fail one table's log without touching others):
  *
  *  - [[timeoutPutsRemaining]]: the PUT lands durably but the client
  *    sees a timeout — the classic ambiguous object-store failure. The
  *    retry then hits 412/FileAlreadyExists on its OWN commit;
  *    [[LakeLog.commit]] resolves the ambiguity by reading the object
  *    back and comparing content.
  *  - [[lostPutsRemaining]]: the connection dies before the PUT
  *    reaches the service — nothing lands. Enough consecutive losses
  *    emulate a writer crashing between data-file staging and log
  *    publish; the invariant under test is that readers never see a
  *    version for it and the staged files stay unreferenced.
  *  - [[lagListsRemaining]]: LIST omits the lexicographically newest
  *    key, emulating eventual list-after-write consistency.
  */
final class ObjectStoreLogStore extends LogStore {

  /** Serializes "requests" to the emulated service — the stand-in for
    * the store's server-side per-object atomicity.
    */
  private val serverLock = new Object

  /** Path prefix the fault counters apply to; empty = everywhere. */
  @volatile var faultScope: String = ""

  val timeoutPutsRemaining = new AtomicInteger(0)
  val lostPutsRemaining = new AtomicInteger(0)
  val lagListsRemaining = new AtomicInteger(0)

  private def inScope(p: Path): Boolean =
    faultScope.isEmpty || p.toAbsolutePath.toString.startsWith(faultScope)

  /** Atomically take one unit from a fault budget; false when spent. */
  private def consume(c: AtomicInteger): Boolean = {
    while (true) {
      val v = c.get()
      if (v <= 0) return false
      if (c.compareAndSet(v, v - 1)) return true
    }
    false
  }

  override def putIfAbsent(target: Path, lines: Seq[String]): Unit = {
    if (inScope(target) && consume(lostPutsRemaining))
      throw new IOException(
        s"injected fault: connection lost before PUT of $target reached " +
        "the store")
    serverLock.synchronized {
      if (Files.exists(target))
        throw new FileAlreadyExistsException(target.toString)
      Files.createDirectories(target.getParent)
      // server-side materialization of one atomic PUT; the tmp file
      // lives OUTSIDE the bucket so clients can never list it
      val tmp = Files.createTempFile("objstore-put-", ".tmp")
      try {
        Files.write(tmp, lines.asJava)
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      } finally Files.deleteIfExists(tmp)
    }
    if (inScope(target) && consume(timeoutPutsRemaining))
      throw new IOException(
        s"injected fault: PUT of $target timed out (object landed)")
  }

  override def atomicReplace(target: Path, lines: Seq[String]): Unit =
    serverLock.synchronized {
      Files.createDirectories(target.getParent)
      val tmp = Files.createTempFile("objstore-put-", ".tmp")
      try {
        Files.write(tmp, lines.asJava)
        Files.move(tmp, target,
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      } finally Files.deleteIfExists(tmp)
    }

  override def listDir(dir: Path): Seq[Path] = {
    val entries =
      if (!Files.isDirectory(dir)) Nil
      else {
        val s = Files.list(dir)
        try s.iterator.asScala.toSeq
        finally s.close()
      }
    if (entries.nonEmpty && inScope(dir) && consume(lagListsRemaining))
      entries.sortBy(_.getFileName.toString).dropRight(1)
    else entries
  }

  override def readLines(p: Path): Seq[String] =
    Files.readAllLines(p).asScala.toSeq

  override def exists(p: Path): Boolean = Files.exists(p)

  override def delete(p: Path): Boolean = Files.deleteIfExists(p)

  // No staging debris inside the bucket: PUT bodies stage in the
  // system temp dir, so the default no-op cleanupStaging is right.
}

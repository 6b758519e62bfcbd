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

  /** GETs that fail before the body arrives (transient read fault).
    * Exercises the commit readback's retry: an ambiguous put resolved
    * through a flaky read must not be misclassified as a lost race.
    */
  val failReadsRemaining = new AtomicInteger(0)

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

  override def putIfAbsent(target: Path, lines: Seq[String]): Unit =
    putIfAbsent(target, lines.iterator)

  override def putIfAbsent(target: Path, lines: Iterator[String]): Unit = {
    if (inScope(target) && consume(lostPutsRemaining))
      throw new IOException(
        s"injected fault: connection lost before PUT of $target reached " +
        "the store")
    serverLock.synchronized {
      if (Files.exists(target))
        throw new FileAlreadyExistsException(target.toString)
      Files.createDirectories(target.getParent)
      val tmp = stageTmp(target)
      try {
        val w = Files.newBufferedWriter(tmp)
        try lines.foreach { l => w.write(l); w.newLine() }
        finally w.close()
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      } finally Files.deleteIfExists(tmp)
    }
    if (inScope(target) && consume(timeoutPutsRemaining))
      throw new IOException(
        s"injected fault: PUT of $target timed out (object landed)")
  }

  /** Server-side materialization of one atomic PUT stages next to the
    * target in a hidden subdirectory: ATOMIC_MOVE requires source and
    * target on the SAME filesystem (java.io.tmpdir is commonly tmpfs,
    * and a cross-filesystem move throws — every commit would fail for
    * tables outside the temp filesystem). Clients still never list the
    * staged body: LIST is non-recursive, and the bucket's key regexes
    * exclude the directory entry itself.
    */
  private def stageTmp(target: Path): Path = {
    val staging = target.getParent.resolve(ObjectStoreLogStore.STAGING_DIR)
    Files.createDirectories(staging)
    Files.createTempFile(staging, "objstore-put-", ".tmp")
  }

  override def atomicReplace(target: Path, lines: Seq[String]): Unit =
    serverLock.synchronized {
      Files.createDirectories(target.getParent)
      val tmp = stageTmp(target)
      try {
        Files.write(tmp, lines.asJava)
        Files.move(tmp, target,
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      } finally Files.deleteIfExists(tmp)
    }

  /** Large binary bodies stage inside the server-internal staging
    * area, NOT as siblings of the target: a sibling would be a
    * listable key of the bucket (violating the emulation — a real
    * client's upload buffer is never a key), and a writer crashing
    * between staging and publish would orphan it outside this store's
    * [[cleanupStaging]] sweep. Same filesystem as the target, so the
    * publish move stays atomic.
    */
  override def stageFileTarget(target: Path): Path = {
    val staging = target.getParent.resolve(ObjectStoreLogStore.STAGING_DIR)
    Files.createDirectories(staging)
    staging.resolve(
      s"objstore-file-${java.util.UUID.randomUUID()}.tmp")
  }

  /** The single-object upload of an already-staged body: one atomic
    * unconditional PUT under the server lock, exactly like
    * [[atomicReplace]] — last writer wins, never torn.
    */
  override def atomicReplaceFile(staged: Path, target: Path): Unit =
    serverLock.synchronized {
      Files.createDirectories(target.getParent)
      Files.move(staged, target,
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }

  override def listDir(dir: Path): Seq[Path] = {
    val entries =
      if (!Files.isDirectory(dir)) Nil
      else {
        val s = Files.list(dir)
        // the staging area is server-internal, never a listable key
        try s.iterator.asScala.filterNot(
          _.getFileName.toString == ObjectStoreLogStore.STAGING_DIR).toSeq
        finally s.close()
      }
    if (entries.nonEmpty && inScope(dir) && consume(lagListsRemaining))
      entries.sortBy(_.getFileName.toString).dropRight(1)
    else entries
  }

  override def readLines(p: Path): Seq[String] = {
    if (inScope(p) && consume(failReadsRemaining))
      throw new IOException(s"injected fault: GET of $p failed")
    Files.readAllLines(p).asScala.toSeq
  }

  /** One unit of read-fault budget for `p`, spent from a TASK — the
    * GET-reader handles below call back through the registry so an
    * executor-side checkpoint scan exercises the same transient-GET
    * failures as driver reads (Spark's task retry is the recovery
    * under test).
    */
  private[lake] def maybeFailRead(p: Path): Unit =
    if (inScope(p) && consume(failReadsRemaining))
      throw new IOException(s"injected fault: GET of $p failed")

  /** Register on first use so task-side readers can find this store's
    * fault budgets in the same JVM (tests run local[*]).
    */
  private[lake] val storeId: String =
    ObjectStoreLogStore.register(this)

  /** GET-backed handle: [[LogFileReader.localPath]] is None even
    * though the emulated bucket IS a local directory — the point of
    * this store is certifying the byte-buffered GET path (and its
    * fault injection), not inheriting the local fast path.
    */
  override def fileReader(p: Path): LogFileReader =
    new ObjectStoreLogStore.GetReader(storeId, p.toString)

  override def exists(p: Path): Boolean = Files.exists(p)

  override def delete(p: Path): Boolean = Files.deleteIfExists(p)

  /** Sweep aged crash orphans out of the staging subdirectory (a
    * writer killed between write and move leaves its body behind).
    * Age-gated so a live writer's in-flight body is never yanked.
    */
  override def cleanupStaging(dir: Path, horizonMs: Long): Unit = {
    val staging = dir.resolve(ObjectStoreLogStore.STAGING_DIR)
    if (!Files.isDirectory(staging)) return
    val cutoff = System.currentTimeMillis() - horizonMs
    try {
      val s = Files.list(staging)
      try s.iterator.asScala.foreach { p =>
        try {
          if (Files.getLastModifiedTime(p).toMillis < cutoff)
            Files.deleteIfExists(p)
          ()
        } catch { case _: IOException => () }
      } finally s.close()
    } catch { case _: IOException => () }
  }
}

object ObjectStoreLogStore {
  /** Server-internal staging area inside each "bucket" directory —
    * same filesystem as the targets so the publish move stays atomic.
    */
  private[lake] val STAGING_DIR = ".objstore-staging"

  /** storeId → live store, weakly held: a task-side [[GetReader]]
    * looks its store back up to spend fault budgets (same JVM under
    * local[*]); a reader deserialized into a JVM without the store —
    * the real-cluster shape — reads without injection. Weak values so
    * test-created stores are not pinned for the process lifetime.
    */
  private val registry = new java.util.concurrent.ConcurrentHashMap[
    String, java.lang.ref.WeakReference[ObjectStoreLogStore]]()

  private def register(s: ObjectStoreLogStore): String = {
    val id = java.util.UUID.randomUUID().toString
    registry.put(id, new java.lang.ref.WeakReference(s))
    id
  }

  /** The emulated single-object GET: whole body or an injected
    * transient failure — never a torn read (real stores return the
    * object atomically or error).
    */
  private final class GetReader(storeId: String, key: String)
      extends LogFileReader {
    override def localPath: Option[String] = None
    override def readAllBytes(): Array[Byte] = {
      val p = java.nio.file.Paths.get(key)
      Option(registry.get(storeId)).flatMap(r => Option(r.get()))
        .foreach(_.maybeFailRead(p))
      Files.readAllBytes(p)
    }
  }
}

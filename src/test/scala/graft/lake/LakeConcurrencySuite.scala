package graft.lake

import graft.SparkSuite

/** Logical conflict detection on rewrite commits (Delta optimistic
  * concurrency, SURVEY §7.1): a rewrite whose RemoveFile set was
  * computed from a stale snapshot must abort if a concurrent commit
  * already removed one of those files — not silently resurrect the
  * deleted rows (the round-1 lost-update anomaly).
  */
class LakeConcurrencySuite extends SparkSuite {
  import spark.implicits._

  private def seed = (1L to 100L).map(i => (i, s"k$i", i * 1.0))
    .toDF("id", "k", "v").coalesce(2)

  test("stale rewrite after a concurrent DELETE of the same file aborts") {
    val path = tablePath("conflict1")
    LakeWriter.write(seed, path)
    val t = LakeTable.forPath(spark, path)
    val stale = t.snapshot() // writer A reads here

    // writer B deletes rows, removing (rewriting) data files
    LakeTable.forPath(spark, path).delete("id <= 50")
    assert(t.snapshot().version === 1L)

    // writer A now tries to commit a rewrite of the files it read
    val ex = intercept[ConflictingCommitException] {
      t.commitRewrite(stale, stale.files.map(_.path), Nil, "DELETE",
        Map("predicate" -> "id > 90"))
    }
    assert(ex.getMessage.contains("removed file"))
    // and the table still reflects only writer B's delete
    assert(t.toDF.count() === 50L)
  }

  test("concurrent UPDATE x DELETE on overlapping files conflicts") {
    val path = tablePath("conflict2")
    LakeWriter.write(seed, path)
    val a = LakeTable.forPath(spark, path)
    val b = LakeTable.forPath(spark, path)

    // simulate interleaving: A computes its plan from version 0 ...
    val staleSnap = a.snapshot()
    val cond = org.apache.spark.sql.functions.expr("id % 2 = 0")
    val touched = a.touchedFiles(staleSnap, cond)
    assert(touched.nonEmpty)
    // ... B commits a delete touching the same files first ...
    b.delete("id = 2")
    // ... then A tries to publish its stale rewrite.
    intercept[ConflictingCommitException] {
      a.commitRewrite(staleSnap, touched, Nil, "UPDATE", Map.empty)
    }
  }

  test("concurrent blind APPEND does not conflict with a rewrite") {
    val path = tablePath("noconflict")
    LakeWriter.write(seed, path)
    val t = LakeTable.forPath(spark, path)
    val stale = t.snapshot()

    // another writer appends (adds files, removes nothing)
    LakeWriter.write(Seq((101L, "x", 1.0)).toDF("id", "k", "v"), path)

    // the stale rewrite retries past the version collision and commits
    val v = t.commitRewrite(stale, stale.files.map(_.path), Nil,
      "DELETE", Map.empty)
    assert(v === 2L)
    // appended row survives; original files removed
    assert(t.toDF.count() === 1L)
    assert(t.toDF.select("id").as[Long].collect() === Array(101L))
  }

  test("idempotent txn write skips an already-committed batch") {
    val path = tablePath("txn1")
    val batch = (1L to 10L).toDF("id")
    val r0 = LakeWriter.write(batch, path, transaction = Some(("q", 0L)))
    assert(r0.added.nonEmpty)
    // crash-replay of the same micro-batch: skipped, no duplicates
    val replay = LakeWriter.write(batch, path, transaction = Some(("q", 0L)))
    assert(replay.added.isEmpty)
    val t = LakeTable.forPath(spark, path)
    assert(t.toDF.count() === 10L)
    assert(t.snapshot().version === 0L)
    // next batch proceeds; a different app's id 0 also proceeds
    assert(LakeWriter.write(batch, path,
      transaction = Some(("q", 1L))).added.nonEmpty)
    assert(LakeWriter.write(batch, path,
      transaction = Some(("other", 0L))).added.nonEmpty)
    assert(t.toDF.count() === 30L)
    // and replaying an OLD batch after newer ones is still skipped
    assert(LakeWriter.write(batch, path,
      transaction = Some(("q", 1L))).added.isEmpty)
  }

  test("txn watermarks survive log checkpointing") {
    val path = tablePath("txn2")
    val batch = Seq(1L).toDF("id")
    (0L to 12L).foreach { b => // crosses the checkpoint interval (10)
      LakeWriter.write(batch, path, transaction = Some(("q", b)))
    }
    val snap = LakeTable.forPath(spark, path).snapshot()
    assert(snap.transactions("q") === 12L)
    assert(LakeWriter.write(batch, path,
      transaction = Some(("q", 5L))).added.isEmpty)
    assert(LakeTable.forPath(spark, path).toDF.count() === 13L)
  }

  test("8 threads x 5 appends: every commit lands, versions contiguous") {
    val path = tablePath("stress")
    LakeWriter.write(Seq(0L).toDF("id").coalesce(1), path) // v0
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 8).map { t =>
      new Thread(() => {
        try {
          (0 until 5).foreach { i =>
            LakeWriter.write(
              Seq(t * 100L + i).toDF("id").coalesce(1), path)
          }
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"concurrent appends failed: ${errors.peek()}")
    val t = LakeTable.forPath(spark, path)
    // 1 seed + 40 concurrent appends, every version present exactly once
    assert(t.snapshot().version === 40L)
    assert(t.toDF.count() === 41L)
    val log = new LakeLog(path)
    (0L to 40L).foreach(v => assert(log.readVersion(v).nonEmpty))
  }

  test("cross-process commit race: every writer's commit lands exactly once") {
    // Three SEPARATE JVMs plus this one race CommitInfo-only commits
    // through the exclusive-createLink publish path — certifying the
    // atomicity claim ACROSS processes, where in-JVM locks can't help.
    // A lost update would show up as a missing (writer, seq) tag.
    val path = tablePath("xproc")
    LakeWriter.write(Seq(0L).toDF("id").coalesce(1), path) // v0
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val perWriter = 25
    val children = (1 to 3).map { c =>
      new ProcessBuilder(javaBin, "-cp", cp,
        "graft.lake.CommitRaceChild", path, s"child$c", perWriter.toString)
        .inheritIO().start()
    }
    // drop the start-line marker, then race in-process as writer 4
    java.nio.file.Files.createFile(java.nio.file.Paths.get(path, "_race_go"))
    CommitRaceChild.main(Array(path, "parent", perWriter.toString))
    children.foreach { p =>
      assert(p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        "child JVM timed out")
      assert(p.exitValue() === 0, s"child JVM exited ${p.exitValue()}")
    }
    val log = new LakeLog(path)
    val latest = log.latestVersion
    assert(latest === 4L * perWriter, s"expected ${4 * perWriter} race " +
      s"commits after v0, log ends at v$latest")
    val tags = (1L to latest).flatMap(v => log.readVersion(v).collect {
      case ci: CommitInfo if ci.operation == "RACE" =>
        (ci.operationParameters("writer"), ci.operationParameters("seq"))
    })
    assert(tags.size === 4 * perWriter)
    assert(tags.distinct.size === 4 * perWriter,
      "a (writer, seq) tag landed twice — duplicated commit")
    // and the log replays cleanly through the raced range
    assert(LakeTable.forPath(spark, path).snapshot().version === latest)
  }

  test("cross-process DV supersession race: no increment is ever lost") {
    // Three separate JVMs plus this one race deletion-vector re-adds
    // of the SAME data file (the merge-on-read DELETE commit shape).
    // The re-add conflict rule must serialize them: every successful
    // commit increments the cardinality read from ITS OWN fresh base,
    // so a single lost update shows as a final cardinality below the
    // total commit count.
    val path = tablePath("dvrace")
    LakeWriter.write(Seq(0L).toDF("id").coalesce(1), path) // v0
    val sharedFile = LakeTable.forPath(spark, path).snapshot().files.head.path
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val perWriter = 15
    val children = (1 to 3).map { c =>
      new ProcessBuilder(javaBin, "-cp", cp,
        "graft.lake.DvRaceChild", path, s"child$c", perWriter.toString,
        sharedFile).inheritIO().start()
    }
    java.nio.file.Files.createFile(java.nio.file.Paths.get(path, "_race_go"))
    DvRaceChild.main(Array(path, "parent", perWriter.toString, sharedFile))
    children.foreach { p =>
      assert(p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        "child JVM timed out")
      assert(p.exitValue() === 0, s"child JVM exited ${p.exitValue()}")
    }
    val log = new LakeLog(path)
    Snapshot.clearCacheForTest() // other JVMs advanced the log
    val finalSnap = log.snapshot()
    val entry = finalSnap.files.find(_.path == sharedFile).get
    assert(entry.dvCardinality === 4L * perWriter,
      s"${4 * perWriter - entry.dvCardinality} DV supersessions lost " +
      "to the race — the re-add conflict rule missed cross-process")
    // every landed commit's increment is +1 over its predecessor
    val cards = (1L to finalSnap.version).flatMap(v =>
      log.readVersion(v).collect {
        case a: AddFile if a.path == sharedFile => a.dvCardinality })
    assert(cards === (1L to 4L * perWriter))
  }

  test("a custom LogStore carries every commit and conflicts intact") {
    // instrumented wrapper: same semantics, counts the seam calls —
    // proves LakeLog routes publish/list/read through LogStore.current
    val puts = new java.util.concurrent.atomic.AtomicInteger
    val conflicts = new java.util.concurrent.atomic.AtomicInteger
    val wrapped = new LogStore {
      private val d = LocalLogStore
      override def putIfAbsent(t: java.nio.file.Path, l: Seq[String]) = {
        puts.incrementAndGet()
        try d.putIfAbsent(t, l)
        catch { case e: java.nio.file.FileAlreadyExistsException =>
          conflicts.incrementAndGet(); throw e
        }
      }
      override def atomicReplace(t: java.nio.file.Path, l: Seq[String]) =
        d.atomicReplace(t, l)
      override def listDir(p: java.nio.file.Path) = d.listDir(p)
      override def readLines(p: java.nio.file.Path) = d.readLines(p)
      override def exists(p: java.nio.file.Path) = d.exists(p)
      override def delete(p: java.nio.file.Path) = d.delete(p)
    }
    val prev = LogStore.current
    LogStore.current = wrapped
    try {
      val path = tablePath("logstore1")
      LakeWriter.write(seed, path) // v0
      LakeTable.forPath(spark, path).delete("id <= 10") // v1
      assert(puts.get() >= 2, s"commits bypassed the LogStore seam")
      // a direct same-version race surfaces as ConcurrentWrite via
      // the store's put-if-absent contract
      val log = new LakeLog(path)
      intercept[ConcurrentWriteException] {
        log.commit(1L, Seq(CommitInfo(1L, "APPEND", Map.empty)))
      }
      assert(LakeTable.forPath(spark, path).toDF.count() === 90L)
    } finally LogStore.current = prev
  }

  test("restoreTo aborts when a concurrent commit removed its files") {
    val path = tablePath("conflict3")
    LakeWriter.write(seed, path) // v0
    LakeWriter.write(Seq((200L, "y", 2.0)).toDF("id", "k", "v"), path) // v1
    val t = LakeTable.forPath(spark, path)
    // concurrently, someone deletes everything (removes v0/v1 files)
    val racer = new Thread(() =>
      LakeTable.forPath(spark, path).delete("id <= 1000"))
    racer.start(); racer.join()
    // restore computed against the pre-delete snapshot would now be
    // stale; a fresh restore (reads latest) is fine:
    t.restoreTo(0L)
    assert(t.toDF.count() === 100L)
  }
}

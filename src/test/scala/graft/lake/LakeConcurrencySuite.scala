package graft.lake

import graft.SparkSuite

/** The [[StoreContractSuite]] commit-protocol contract on the default
  * POSIX-semantics [[LocalLogStore]], plus the local-only scenarios:
  * cross-process races (exclusive createLink is a filesystem-wide
  * primitive; the emulated object store's server lock is per-JVM) and
  * the seam-instrumentation test.
  */
class LakeConcurrencySuite extends StoreContractSuite {
  import spark.implicits._

  override protected def makeStore(): LogStore = LocalLogStore

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

  test("stale LocalLogStore tmp orphans are swept at checkpoint time") {
    val path = tablePath("tmpsweep")
    LakeWriter.write(Seq(1L).toDF("id").coalesce(1), path) // v0
    val logDir = new LakeLog(path).logDir
    // plant a crash orphan, aged past the horizon
    val orphan = logDir.resolve(".put-00000000000000000099.json-x.tmp")
    java.nio.file.Files.write(orphan, java.util.List.of("junk"))
    java.nio.file.Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2 * LakeLog.TMP_ORPHAN_HORIZON_MS))
    // and a FRESH tmp (a live writer's in-flight staging): must survive
    val fresh = logDir.resolve(".rep-live-x.tmp")
    java.nio.file.Files.write(fresh, java.util.List.of("live"))
    // drive commits across a checkpoint boundary to trigger cleanup
    (1 to 10).foreach(i =>
      LakeWriter.write(Seq(i.toLong).toDF("id").coalesce(1), path))
    assert(!java.nio.file.Files.exists(orphan), "aged orphan not swept")
    assert(java.nio.file.Files.exists(fresh), "live tmp wrongly swept")
    java.nio.file.Files.delete(fresh)
  }

  test("racing twin MERGEs with one Txn apply exactly once") {
    // Two threads run the SAME logical merge with the same
    // (appId, version) — the duplicate-delivery shape of a streaming
    // foreachBatch replayed concurrently after a partial restart. The
    // Txn watermark must let exactly ONE apply: the additive SET
    // would show v + 200 if both landed.
    val path = tablePath("twin-merge")
    LakeWriter.write((1L to 50L).map(i => (i, i)).toDF("id", "v"), path)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    try {
      val runs = (1 to 2).map { _ =>
        Future {
          LakeTable.forPath(spark, path).as("t")
            .merge(
              (1L to 50L).toDF("id").as("s"), "t.id = s.id")
            .whenMatchedUpdate(Map("v" -> "t.v + 100"))
            .withTransaction("twin-app", 7L)
            .execute()
        }
      }
      // both futures must COMPLETE (a losing twin returns quietly —
      // success by the winner's hand — rather than throwing)
      runs.foreach(Await.result(_, 120.seconds))
    } finally pool.shutdown()
    val t = LakeTable.forPath(spark, path)
    assert(t.snapshot().transactions.get("twin-app").contains(7L))
    val vs = t.toDF.select("id", "v")
      .as[(Long, Long)].collect().toMap
    assert((1L to 50L).forall(i => vs(i) == i + 100L),
      s"merge applied twice or not at all: ${vs.toSeq.sortBy(_._1).take(5)}")
    // a replay AFTER both finish is also a no-op
    val before = t.snapshot().version
    LakeTable.forPath(spark, path).as("t")
      .merge((1L to 50L).toDF("id").as("s"), "t.id = s.id")
      .whenMatchedUpdate(Map("v" -> "t.v + 100"))
      .withTransaction("twin-app", 7L)
      .execute()
    assert(LakeTable.forPath(spark, path).snapshot().version === before)
  }
}

package graft.lake

import graft.SparkSuite

/** Multi-part checkpoints (VERDICT r8 item 2): bounded-size parts
  * written incrementally, streamed replay, crash-partial sets ignored,
  * and the synthetic many-AddFile scale check. Raw `log.commit` drives
  * the log directly — these tests exercise metadata machinery, not
  * Spark I/O.
  */
class LakeCheckpointSuite extends SparkSuite {

  /** A metadata action so replay has a schema. */
  private def meta = Metadata("id BIGINT", Nil, 0L, Map.empty, Map.empty)

  /** Run `body` with the part size lowered to `partMax`. */
  private def withPartMax[A](partMax: Int)(body: => A): A = {
    val prev = LakeLog.CHECKPOINT_PART_MAX_ACTIONS
    LakeLog.CHECKPOINT_PART_MAX_ACTIONS = partMax
    try body finally LakeLog.CHECKPOINT_PART_MAX_ACTIONS = prev
  }

  private def addFile(name: String) =
    AddFile(s"$name.parquet", Map.empty, 10L, 1L, Map.empty, Map.empty,
      Map.empty)

  /** Ground-truth naive replay: accumulate adds/removes over all
    * version files, ignoring checkpoints entirely.
    */
  private def naiveLiveSet(log: LakeLog, version: Long): Set[String] = {
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    (0L to version).foreach { v =>
      log.readVersion(v).foreach {
        case a: AddFile    => live += a.path; ()
        case r: RemoveFile => live -= r.path; ()
        case _             => ()
      }
    }
    live.toSet
  }

  test("multi-part checkpoint write + streamed replay equals full replay") {
    withPartMax(5) {
      val path = tablePath("ckpt-multi")
      val log = new LakeLog(path)
      log.commit(0L, Seq(CommitInfo(1L, "CREATE", Map.empty), meta,
        Protocol()))
      // 14 commits: each adds 2 files, removes 1 → crosses the
      // checkpoint interval (10) with >5 live files at the boundary
      (1L to 14L).foreach { v =>
        log.commit(v, Seq(
          CommitInfo(v, "APPEND", Map.empty),
          addFile(s"f${v}a"), addFile(s"f${v}b"),
          RemoveFile(s"f${v - 1}a.parquet", v)))
      }
      // the v10 checkpoint must be multi-part (2 + 11 files > 5)
      val names = LogStore.current.listDir(log.logDir)
        .map(_.getFileName.toString)
      val partNames = names.filter(_.matches(
        "\\d{20}\\.checkpoint\\.\\d{4}\\.\\d{4}\\.json"))
      assert(partNames.nonEmpty, s"no multi-part checkpoint in $names")
      assert(!names.exists(_.matches("\\d{20}\\.checkpoint\\.json")),
        "above the part budget the single-file form must not be written")
      // every part respects the size bound
      partNames.foreach { n =>
        val lines = LogStore.current.readLines(log.logDir.resolve(n))
        assert(lines.size <= 5, s"$n has ${lines.size} actions > partMax")
      }
      assert(log.latestCheckpointAtOrBefore(14L).map(_._1).contains(10L))
      // replay-through-checkpoint == ground truth, at the boundary,
      // past it, and on prefixes before it (property over versions)
      Seq(9L, 10L, 12L, 14L).foreach { v =>
        Snapshot.clearCacheForTest()
        val snap = log.snapshot(v)
        assert(snap.files.map(_.path).toSet === naiveLiveSet(log, v),
          s"replay mismatch at version $v")
      }
      // O(delta): replaying v14 from the v10 checkpoint reads only
      // the 4 tail version files
      Snapshot.clearCacheForTest()
      val before = LakeLog.readVersionCalls.get()
      log.snapshot(14L)
      assert(LakeLog.readVersionCalls.get() - before <= 4)
    }
  }

  test("a crashed writer's partial part set is ignored") {
    withPartMax(3) {
      val path = tablePath("ckpt-partial")
      val log = new LakeLog(path)
      log.commit(0L, Seq(CommitInfo(1L, "CREATE", Map.empty), meta,
        Protocol()))
      (1L to 10L).foreach { v =>
        log.commit(v, Seq(CommitInfo(v, "APPEND", Map.empty),
          addFile(s"g$v")))
      }
      val parts = LogStore.current.listDir(log.logDir).filter(
        _.getFileName.toString.matches(
          "\\d{20}\\.checkpoint\\.\\d{4}\\.\\d{4}\\.json"))
      assert(parts.size >= 2)
      // simulate the crash: one part of the set never landed
      LogStore.current.delete(parts.sortBy(_.toString).head)
      Snapshot.clearCacheForTest()
      // the incomplete set must not be used — replay falls back to
      // the full log and still yields the exact state
      assert(log.latestCheckpointAtOrBefore(10L).isEmpty)
      val snap = log.snapshot(10L)
      assert(snap.files.map(_.path).toSet === naiveLiveSet(log, 10L))
    }
  }

  test("100k-AddFile state checkpoints in bounded parts and replays") {
    withPartMax(30000) {
      val path = tablePath("ckpt-100k")
      val log = new LakeLog(path)
      log.commit(0L, Seq(CommitInfo(1L, "CREATE", Map.empty), meta,
        Protocol()))
      // one bulk commit with 100k adds, then drive to the checkpoint
      log.commit(1L, CommitInfo(2L, "APPEND", Map.empty) +:
        (1 to 100000).map(i => addFile(s"bulk$i"): Action))
      (2L to 10L).foreach { v =>
        log.commit(v, Seq(CommitInfo(v + 1, "APPEND", Map.empty),
          addFile(s"tail$v")))
      }
      val names = LogStore.current.listDir(log.logDir)
        .map(_.getFileName.toString)
      val partNames = names.filter(_.matches(
        "\\d{20}\\.checkpoint\\.\\d{4}\\.\\d{4}\\.json")).sorted
      // 2 + 100009 actions at 30k/part = 4 parts
      assert(partNames.size === 4, s"parts: $partNames")
      assert(partNames.forall(_.endsWith(".0004.json")))
      Snapshot.clearCacheForTest()
      val snap = log.snapshot(10L)
      assert(snap.files.size === 100009)
      assert(snap.version === 10L)
    }
  }

  test("single-file checkpoints remain the small-state fast path") {
    val path = tablePath("ckpt-single")
    val log = new LakeLog(path)
    log.commit(0L, Seq(CommitInfo(1L, "CREATE", Map.empty), meta,
      Protocol()))
    (1L to 10L).foreach { v =>
      log.commit(v, Seq(CommitInfo(v, "APPEND", Map.empty),
        addFile(s"s$v")))
    }
    val names = LogStore.current.listDir(log.logDir)
      .map(_.getFileName.toString)
    assert(names.exists(_.matches("\\d{20}\\.checkpoint\\.json")))
    assert(!names.exists(_.contains(".checkpoint.0")))
  }

  test("stale multi-part checkpoints are cleaned up with the aux files") {
    withPartMax(2) {
      val path = tablePath("ckpt-clean")
      val log = new LakeLog(path)
      log.commit(0L, Seq(CommitInfo(1L, "CREATE", Map.empty), meta,
        Protocol()))
      // five checkpoint boundaries (v10..v50); RETAINED_AUX = 3 keeps
      // the part sets for v30+ only
      (1L to 50L).foreach { v =>
        log.commit(v, Seq(CommitInfo(v, "APPEND", Map.empty),
          addFile(s"c$v")))
      }
      val partVersions = LogStore.current.listDir(log.logDir)
        .map(_.getFileName.toString)
        .filter(_.matches("\\d{20}\\.checkpoint\\.\\d{4}\\.\\d{4}\\.json"))
        .map(_.split("\\.")(0).toLong).distinct.sorted
      assert(partVersions === Seq(30L, 40L, 50L))
    }
  }
}

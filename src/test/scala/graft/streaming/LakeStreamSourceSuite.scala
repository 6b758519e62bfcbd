package graft.streaming

import graft.SparkSuite
import graft.lake.{LakeTable, LakeWriter}
import org.apache.spark.sql.streaming.Trigger

/** readStream/writeStream format("lake") — the Delta streaming
  * source/sink analog: version-based offsets, append-only contract,
  * Txn-idempotent sink commits.
  */
class LakeStreamSourceSuite extends SparkSuite {
  import spark.implicits._

  private def runAvailableNow(
      src: String, dst: String, ckpt: String,
      extraReadOptions: Map[String, String] = Map.empty): Unit = {
    var reader = spark.readStream.format("lake")
    extraReadOptions.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load(src)
      .writeStream.format("lake")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination(120000)
    ()
  }

  test("lake-to-lake streaming: appends flow, restart sees only new data") {
    val src = tablePath("ss-src")
    val dst = tablePath("ss-dst")
    val ckpt = tmpDir("ss-ckpt")
    LakeWriter.write((1L to 100L).toDF("id"), src)
    LakeWriter.write((101L to 150L).toDF("id"), src)

    runAvailableNow(src, dst, ckpt)
    val first = LakeTable.forPath(spark, dst).toDF
    assert(first.count() === 150L)

    // second run with the same checkpoint: nothing new -> no change
    runAvailableNow(src, dst, ckpt)
    assert(LakeTable.forPath(spark, dst).toDF.count() === 150L)

    // append upstream, rerun: exactly the delta arrives, no dupes
    LakeWriter.write((151L to 180L).toDF("id"), src)
    runAvailableNow(src, dst, ckpt)
    val ids = LakeTable.forPath(spark, dst).toDF
      .select("id").as[Long].collect().sorted
    assert(ids === (1L to 180L).toArray)
  }

  test("non-append commits fail the stream unless ignoreDeletes") {
    val src = tablePath("ss-del-src")
    val dst = tablePath("ss-del-dst")
    LakeWriter.write((1L to 50L).toDF("id").coalesce(1), src)
    runAvailableNow(src, dst, tmpDir("ss-del-ck1"))
    assert(LakeTable.forPath(spark, dst).toDF.count() === 50L)

    LakeTable.forPath(spark, src).delete("id <= 10") // rewrite commit

    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("lake").load(src)
        .writeStream.format("lake")
        .option("checkpointLocation", tmpDir("ss-del-ck2"))
        .trigger(Trigger.AvailableNow())
        .start(tablePath("ss-del-dst2"))
      q.awaitTermination(120000)
    }
    assert(failed.getMessage.contains("non-append") ||
      Option(failed.getCause).exists(_.getMessage.contains("non-append")))

    // ignoreChanges passes the rewrite through. The Delta contract:
    // the rewritten file's rows are RE-emitted (the original 50 plus
    // the 40-row rewrite = 90 delivered) — downstream dedupes on key.
    val dst3 = tablePath("ss-del-dst3")
    runAvailableNow(src, dst3, tmpDir("ss-del-ck3"),
      Map("ignoreChanges" -> "true"))
    assert(LakeTable.forPath(spark, dst3).toDF.count() === 90L)
    // every live row is present at least once
    assert(LakeTable.forPath(spark, dst3).toDF
      .select("id").distinct().count() === 50L)
  }

  test("ignoreDeletes skips delete-only commits; later appends still flow") {
    val src = tablePath("ss-id-src")
    val dst = tablePath("ss-id-dst")
    val ckpt = tmpDir("ss-id-ck")
    // partitioned so a partition-predicate delete is metadata-only:
    // a RemoveFile-only commit, the exact case ignoreDeletes documents
    LakeWriter.write(
      Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "p"),
      src, partitionBy = Seq("p"))
    runAvailableNow(src, dst, ckpt, Map("ignoreDeletes" -> "true"))
    assert(LakeTable.forPath(spark, dst).toDF.count() === 3L)

    LakeTable.forPath(spark, src).delete("p = 'a'") // delete-only commit
    LakeWriter.write(Seq((4L, "c")).toDF("id", "p"), src,
      partitionBy = Seq("p"))
    // the delete-only commit is skipped (nothing re-delivered), the
    // append after it arrives
    runAvailableNow(src, dst, ckpt, Map("ignoreDeletes" -> "true"))
    val ids = LakeTable.forPath(spark, dst).toDF
      .select("id").as[Long].collect().sorted
    assert(ids === Array(1L, 2L, 3L, 4L))
  }

  test("ignoreDeletes alone does NOT pass rewrite commits through") {
    val src = tablePath("ss-idrw-src")
    LakeWriter.write((1L to 50L).toDF("id").coalesce(1), src)
    LakeTable.forPath(spark, src).delete("id <= 10") // rewrite: rm+add
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("lake")
        .option("ignoreDeletes", "true").load(src)
        .writeStream.format("lake")
        .option("checkpointLocation", tmpDir("ss-idrw-ck"))
        .trigger(Trigger.AvailableNow())
        .start(tablePath("ss-idrw-dst"))
      q.awaitTermination(120000)
    }
    assert(failed.getMessage.contains("non-append") ||
      Option(failed.getCause).exists(_.getMessage.contains("non-append")))
  }

  test("startingVersion skips the table's earlier history") {
    val src = tablePath("ss-sv-src")
    LakeWriter.write((1L to 10L).toDF("id"), src)   // v0
    LakeWriter.write((11L to 20L).toDF("id"), src)  // v1
    val dst = tablePath("ss-sv-dst")
    runAvailableNow(src, dst, tmpDir("ss-sv-ck"),
      Map("startingVersion" -> "1"))
    val ids = LakeTable.forPath(spark, dst).toDF
      .select("id").as[Long].collect().sorted
    assert(ids === (11L to 20L).toArray)
  }

  test("skipChangeCommits drops remove-carrying commits wholesale") {
    val src = tablePath("ss-scc-src")
    LakeWriter.write((1L to 50L).toDF("id").coalesce(1), src)   // v0
    // v1 is a rewrite (rm+add): under skipChangeCommits neither its
    // removes nor its adds are delivered
    LakeTable.forPath(spark, src).update("id = 1", Map("id" -> "1000"))
    LakeWriter.write((51L to 60L).toDF("id"), src)              // v2 append
    val dst = tablePath("ss-scc-dst")
    runAvailableNow(src, dst, tmpDir("ss-scc-ck"),
      Map("skipChangeCommits" -> "true"))
    val ids = LakeTable.forPath(spark, dst).toDF
      .select("id").as[Long].collect().sorted
    // v0's original file + v2's append; the rewritten file (999 rows
    // incl. 1000) never arrives
    assert(ids === (1L to 60L).toArray)
  }

  test("startingTimestamp maps to the first commit at or after it") {
    val src = tablePath("ss-st-src")
    LakeWriter.write((1L to 10L).toDF("id"), src)   // v0
    Thread.sleep(20)
    val cut = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(20)
    LakeWriter.write((11L to 20L).toDF("id"), src)  // v1, after cut
    val dst = tablePath("ss-st-dst")
    runAvailableNow(src, dst, tmpDir("ss-st-ck"),
      Map("startingTimestamp" -> cut.toString))
    val ids = LakeTable.forPath(spark, dst).toDF
      .select("id").as[Long].collect().sorted
    assert(ids === (11L to 20L).toArray)
    intercept[Exception] {
      spark.readStream.format("lake")
        .option("startingVersion", "0")
        .option("startingTimestamp", cut.toString).load(src)
    }
  }

  test("maxFilesPerTrigger bounds each micro-batch") {
    val src = tablePath("ss-rate-src")
    // 4 commits x 1 file
    (0 until 4).foreach { i =>
      LakeWriter.write(Seq(i.toLong).toDF("id").coalesce(1), src)
    }
    val dst = tablePath("ss-rate-dst")
    val q = spark.readStream.format("lake")
      .option("maxFilesPerTrigger", "1")
      .load(src)
      .writeStream.format("lake")
      .option("checkpointLocation", tmpDir("ss-rate-ck"))
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination(120000)
    val t = LakeTable.forPath(spark, dst)
    assert(t.toDF.count() === 4L)
    // one bounded batch per upstream commit -> multiple sink commits
    assert(t.snapshot().version >= 3L)
  }

  test("maxBytesPerTrigger bounds each micro-batch by size") {
    val src = tablePath("ss-bytes-src")
    (0 until 4).foreach { i =>
      LakeWriter.write(Seq(i.toLong).toDF("id").coalesce(1), src)
    }
    val dst = tablePath("ss-bytes-dst")
    val q = spark.readStream.format("lake")
      .option("maxBytesPerTrigger", "1") // < any parquet file: 1 commit/batch
      .load(src)
      .writeStream.format("lake")
      .option("checkpointLocation", tmpDir("ss-bytes-ck"))
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination(120000)
    val t = LakeTable.forPath(spark, dst)
    assert(t.toDF.count() === 4L)
    // the byte budget binds below one commit's size, so each upstream
    // commit became its own bounded micro-batch -> multiple sink commits
    assert(t.snapshot().version >= 3L)
  }

  test("vacuumed files fail the stream unless failOnDataLoss=false") {
    val src = tablePath("ss-loss-src")
    LakeWriter.write(Seq(1L, 2L).toDF("id").coalesce(1), src)   // v0
    LakeWriter.write(Seq(3L, 4L).toDF("id").coalesce(1), src)   // v1
    // rewrite v0's file away, then vacuum it so the physical file is gone
    LakeTable.forPath(spark, src).delete("id = 1")              // v2
    spark.conf.set(LakeTable.RETENTION_CHECK_KEY, "false")
    try LakeTable.forPath(spark, src).vacuum(0.0)
    finally spark.conf.unset(LakeTable.RETENTION_CHECK_KEY)

    // a fresh consumer reading from version 0 hits the lost file
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("lake")
        .option("ignoreChanges", "true").load(src)
        .writeStream.format("lake")
        .option("checkpointLocation", tmpDir("ss-loss-ck1"))
        .trigger(Trigger.AvailableNow())
        .start(tablePath("ss-loss-d1"))
      q.awaitTermination(120000)
    }

    val dst = tablePath("ss-loss-d2")
    val q2 = spark.readStream.format("lake")
      .option("ignoreChanges", "true")
      .option("failOnDataLoss", "false").load(src)
      .writeStream.format("lake")
      .option("checkpointLocation", tmpDir("ss-loss-ck2"))
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q2.awaitTermination(120000)
    // surviving files' rows arrive: v1 (3,4) + v2 rewrite (2)
    val ids = LakeTable.forPath(spark, dst).toDF
      .select("id").as[Long].collect().sorted
    assert(ids === Array(2L, 3L, 4L))
  }

  /** Pad the log with empty commits (CommitInfo only — no files) so a
    * checkpoint boundary passes and, with `LOG_RETENTION_PROP = "0"`,
    * retention deletes the aged version-file prefix below the cut.
    */
  private def padLog(src: String, from: Long, to: Long): Unit = {
    val log = new graft.lake.LakeLog(src)
    (from to to).foreach { v =>
      log.commit(v, Seq(graft.lake.CommitInfo(
        System.currentTimeMillis(), "EMPTY", Map.empty)))
    }
  }

  test("fresh stream on a retention-aged table starts from the floor " +
      "snapshot and loses nothing") {
    val src = tablePath("ss-ret-fresh-src")
    val dst = tablePath("ss-ret-fresh-dst")
    LakeWriter.write((1L to 100L).toDF("id").coalesce(1), src,
      properties = Map(graft.lake.LakeLog.LOG_RETENTION_PROP -> "0"))
    LakeWriter.write((101L to 150L).toDF("id").coalesce(1), src)  // v1
    padLog(src, 2L, 29L)
    LakeWriter.write((151L to 160L).toDF("id").coalesce(1), src)  // v30
    // v30's checkpoint ran retention: version files 0..9 are gone
    assert(new graft.lake.LakeLog(src).earliestReplayableVersion === 10L)

    // versions 0..9 are unreplayable, but their surviving effect IS
    // the snapshot at the floor — a fresh stream must deliver it as
    // its first batch (the "all existing data" default), then replay
    // the surviving tail. No row may be lost.
    runAvailableNow(src, dst, tmpDir("ss-ret-fresh-ck"))
    val ids = LakeTable.forPath(spark, dst).toDF
      .select("id").as[Long].collect().sorted
    assert(ids === (1L to 160L).toArray)
  }

  test("rate-limited initial snapshot arrives in bounded chunks, " +
      "listed through the columnar index (no full replay)") {
    val src = tablePath("ss-init-chunk-src")
    val dst = tablePath("ss-init-chunk-dst")
    val prevMax = graft.lake.LakeLog.CHECKPOINT_PART_MAX_ACTIONS
    graft.lake.LakeLog.CHECKPOINT_PART_MAX_ACTIONS = 4
    try {
      // 10 single-file commits v0..v9, then aged below the retention
      // floor: the fresh stream's first deliverable is the 10-file
      // snapshot at the floor
      (0 until 10).foreach { i =>
        LakeWriter.write(
          ((i * 10 + 1L) to (i * 10 + 10L)).toDF("id").coalesce(1), src,
          properties = if (i == 0)
            Map(graft.lake.LakeLog.LOG_RETENTION_PROP -> "0")
          else Map.empty)
      }
      padLog(src, 10L, 29L)
      LakeWriter.write((101L to 110L).toDF("id").coalesce(1), src) // v30
      val log = new graft.lake.LakeLog(src)
      assert(log.earliestReplayableVersion === 10L)
      assert(graft.sources.ColumnarLakeFileIndex
        .tryBuild(spark, log, 10L).isDefined,
        "expected a multi-part parquet checkpoint at the floor")
      val replaysBefore = graft.lake.Snapshot.fullReplays.get()
      runAvailableNow(src, dst, tmpDir("ss-init-chunk-ck"),
        Map("maxFilesPerTrigger" -> "2"))
      assert(graft.lake.Snapshot.fullReplays.get() === replaysBefore,
        "chunked initial snapshot must list through the columnar " +
        "index, never a full snapshot replay")
      // every pre-floor row arrives exactly once, plus the tail append
      val ids = LakeTable.forPath(spark, dst).toDF
        .select("id").as[Long].collect().sorted
      assert(ids === (1L to 110L).toArray)
      // ...in MULTIPLE bounded micro-batches: 10 floor files at 2 per
      // trigger = 5 chunks, then the tail versions as one more batch
      val streamingCommits = LakeTable.forPath(spark, dst).history()
        .filter(org.apache.spark.sql.functions.col("operation") ===
          "STREAMING UPDATE").count()
      assert(streamingCommits === 6L,
        s"expected 5 snapshot chunks + 1 tail batch, got $streamingCommits")
      // Mid-snapshot restart contract: the engine hands the
      // checkpointed "version#fileIndex" json back as a
      // SerializedOffset; a FRESH source instance must replay that
      // chunk and resume from its index, not restart the snapshot.
      import org.apache.spark.sql.execution.streaming.SerializedOffset
      val fresh = new graft.sources.LakeStreamSource(spark, src,
        Map("maxFilesPerTrigger" -> "2"))
      fresh.getBatch(Some(SerializedOffset("10#2")), SerializedOffset("10#4"))
      assert(fresh.getOffset.map(_.json()) === Some("10#6"),
        "restart replay of a mid-snapshot chunk must resume AFTER it")
    } finally graft.lake.LakeLog.CHECKPOINT_PART_MAX_ACTIONS = prevMax
  }

  test("initial snapshot chunking survives a restart at EVERY chunk " +
      "boundary; byte budget admits at least one file") {
    val src = tablePath("ss-init-restart-src")
    val prevMax = graft.lake.LakeLog.CHECKPOINT_PART_MAX_ACTIONS
    graft.lake.LakeLog.CHECKPOINT_PART_MAX_ACTIONS = 4
    try {
      (0 until 10).foreach { i =>
        LakeWriter.write(
          ((i * 10 + 1L) to (i * 10 + 10L)).toDF("id").coalesce(1), src,
          properties = if (i == 0)
            Map(graft.lake.LakeLog.LOG_RETENTION_PROP -> "0")
          else Map.empty)
      }
      padLog(src, 10L, 29L)
      LakeWriter.write((101L to 110L).toDF("id").coalesce(1), src) // v30
      assert(new graft.lake.LakeLog(src).earliestReplayableVersion === 10L)
      import org.apache.spark.sql.execution.streaming.SerializedOffset

      // Drive the source the way a crash-looping engine would: a
      // FRESH instance per trigger, replaying the last committed
      // batch from serialized offsets before asking for the next.
      def driveToEnd(opts: Map[String, String]): Seq[(String, Long)] = {
        var prev: Option[String] = None
        var cur: Option[String] = None
        val out = Seq.newBuilder[(String, Long)]
        var spins = 0
        while (spins < 40) {
          val s = new graft.sources.LakeStreamSource(spark, src, opts)
          cur.foreach { c => // restart replay of the committed batch
            s.getBatch(prev.map(SerializedOffset(_)), SerializedOffset(c))
          }
          s.getOffset match {
            case None => spins = 40
            case Some(o) =>
              val df = s.getBatch(cur.map(SerializedOffset(_)), o)
              // count the delivered rows off the batch's own RDD (a
              // bare streaming frame rejects batch execution)
              val n = df.queryExecution.logical.collectFirst {
                case l: org.apache.spark.sql.execution.LogicalRDD =>
                  l.rdd.count()
              }.getOrElse(sys.error("expected a LogicalRDD batch"))
              out += ((o.json(), n))
              prev = cur
              cur = Some(o.json())
              spins += 1
          }
        }
        out.result()
      }

      // files budget 3 over a 10-file snapshot: [3,3,3,1] chunks,
      // then the tail versions as one more batch — with a restart
      // BETWEEN EVERY pair, no chunk is lost or re-delivered
      val byFiles = driveToEnd(Map("maxFilesPerTrigger" -> "3"))
      assert(byFiles.map(_._1) ===
        Seq("10#3", "10#6", "10#9", "10#10", "30"))
      assert(byFiles.map(_._2) === Seq(30L, 30L, 30L, 10L, 10L))

      // byte budget below one file's size: the at-least-one-file rule
      // yields exactly one file per chunk, ten chunks
      val byBytes = driveToEnd(Map("maxBytesPerTrigger" -> "1"))
      assert(byBytes.map(_._1) ===
        (1 to 10).map(i => s"10#$i") :+ "30")
      assert(byBytes.map(_._2).sum === 110L)
    } finally graft.lake.LakeLog.CHECKPOINT_PART_MAX_ACTIONS = prevMax
  }

  test("restart below the retention floor: loud data-loss error, or " +
      "resume from the floor with failOnDataLoss=false") {
    val src = tablePath("ss-ret-lag-src")
    val dst = tablePath("ss-ret-lag-dst")
    val ckpt = tmpDir("ss-ret-lag-ck")
    LakeWriter.write((1L to 50L).toDF("id").coalesce(1), src,
      properties = Map(graft.lake.LakeLog.LOG_RETENTION_PROP -> "0"))
    runAvailableNow(src, dst, ckpt)                               // cursor v0
    assert(LakeTable.forPath(spark, dst).toDF.count() === 50L)

    LakeWriter.write((51L to 60L).toDF("id").coalesce(1), src)    // v1
    padLog(src, 2L, 29L)
    LakeWriter.write((61L to 70L).toDF("id").coalesce(1), src)    // v30
    assert(new graft.lake.LakeLog(src).earliestReplayableVersion === 10L)

    // the consumer's cursor (v0) fell below the floor while it lagged:
    // v1's rows are gone from the log — that's data loss, surfaced
    // loudly by default...
    val failed =
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        runAvailableNow(src, dst, ckpt)
      }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(failed).exists(_.contains("log retention")))

    // ...and an explicit opt-in resumes from the floor; v1's rows
    // (51..60) are lost — exactly the versions retention outran
    runAvailableNow(src, dst, ckpt, Map("failOnDataLoss" -> "false"))
    val ids = LakeTable.forPath(spark, dst).toDF
      .select("id").as[Long].collect().sorted
    assert(ids === ((1L to 50L) ++ (61L to 70L)).toArray)
  }

  test("startingVersion below the retention floor is rejected up front") {
    val src = tablePath("ss-ret-startv-src")
    LakeWriter.write((1L to 20L).toDF("id").coalesce(1), src,
      properties = Map(graft.lake.LakeLog.LOG_RETENTION_PROP -> "0"))
    padLog(src, 1L, 29L)
    LakeWriter.write((21L to 30L).toDF("id").coalesce(1), src)    // v30
    assert(new graft.lake.LakeLog(src).earliestReplayableVersion === 10L)

    val failed =
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        runAvailableNow(src, tablePath("ss-ret-startv-dst"),
          tmpDir("ss-ret-startv-ck"), Map("startingVersion" -> "5"))
      }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(failed).exists(m =>
      m.contains("below the log retention") &&
      m.contains("earliest replayable version: 10")))
  }

  test("user-specified readStream schema is rejected") {
    val src = tablePath("ss-schema-src")
    LakeWriter.write((1L to 10L).toDF("id"), src)
    val ex = intercept[IllegalArgumentException] {
      spark.readStream.format("lake")
        .schema(new org.apache.spark.sql.types.StructType()
          .add("id", "long"))
        .load(src)
    }
    assert(ex.getMessage.contains("user-specified schema"))
  }

  test("partition column ordered first in the declared schema streams " +
      "unswapped") {
    val src = tablePath("ss-part-order-src")
    val dst = tablePath("ss-part-order-dst")
    // Partition column FIRST in the declared schema; the snapshot
    // relation emits it LAST (dataSchema ++ partitionSchema). Both
    // columns are BIGINT, so a positional relabel would silently swap
    // values rather than fail — the worst failure mode.
    val df = spark.range(1, 21).selectExpr("id * 1000 AS bucket", "id AS v")
    LakeWriter.write(df, src, partitionBy = Seq("bucket"))
    runAvailableNow(src, dst, tmpDir("ss-part-order-ck"))
    val out = LakeTable.forPath(spark, dst).toDF
      .select("bucket", "v").as[(Long, Long)].collect().sorted
    assert(out === (1L to 20L).map(i => (i * 1000, i)).toArray)
  }

  test("explicit startingVersion overrides a stale lower checkpoint " +
      "cursor") {
    val src = tablePath("ss-startv-src")
    val dst = tablePath("ss-startv-dst")
    val ckpt = tmpDir("ss-startv-ck")
    LakeWriter.write((1L to 10L).toDF("id").coalesce(1), src)     // v0
    runAvailableNow(src, dst, ckpt)                               // cursor v0
    LakeWriter.write((11L to 20L).toDF("id").coalesce(1), src)    // v1
    LakeWriter.write((21L to 30L).toDF("id").coalesce(1), src)    // v2
    // restart with startingVersion=2: the checkpointed cursor (v0) is
    // below the requested start — v1 must NOT be resurrected
    runAvailableNow(src, dst, ckpt, Map("startingVersion" -> "2"))
    val ids = LakeTable.forPath(spark, dst).toDF
      .select("id").as[Long].collect().sorted
    assert(ids === ((1L to 10L) ++ (21L to 30L)).toArray)
  }

  test("readChangeFeed streams row-level changes incrementally") {
    val src = tablePath("ss-cdf-src")
    LakeWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "k")
      .coalesce(1), src)                                         // v0
    LakeWriter.write(Seq((3L, "c")).toDF("id", "k")
      .coalesce(1), src)                                         // v1
    LakeTable.forPath(spark, src).update("id = 2", Map("k" -> "'B'")) // v2
    val dst = tablePath("ss-cdf-dst")
    val ckpt = tmpDir("ss-cdf-ck")
    def drain(): Unit = {
      val q = spark.readStream.format("lake")
        .option("readChangeFeed", "true").load(src)
        .writeStream.format("lake")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination(120000)
      ()
    }
    drain()
    def delivered() = LakeTable.forPath(spark, dst).toDF
      .select("_commit_version", "_change_type", "id", "k")
      .as[(Long, String, Long, String)].collect().toSet
    assert(delivered() === Set(
      (0L, "insert", 1L, "a"), (0L, "insert", 2L, "b"),
      (1L, "insert", 3L, "c"),
      (2L, "delete", 2L, "b"), (2L, "insert", 2L, "B")))
    // incremental: one more DML, same checkpoint -> only the delta
    LakeTable.forPath(spark, src).delete("id = 1")               // v3
    drain()
    assert(delivered() === Set(
      (0L, "insert", 1L, "a"), (0L, "insert", 2L, "b"),
      (1L, "insert", 3L, "c"),
      (2L, "delete", 2L, "b"), (2L, "insert", 2L, "B"),
      (3L, "delete", 1L, "a")))
  }

  test("streaming sessionization: closed sessions emitted from state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = input.toDF().toDF("user_id", "ts", "value")
    val sessions = LakeStreaming.sessionizeStream(df, gapMinutes = 30)
    val q = sessions.writeStream.format("memory")
      .queryName("sess_out").outputMode("append").start()
    // offset from epoch 0: the initial watermark is 0 and would drop
    // an event AT the epoch as late
    def ts(min: Long) = new java.sql.Timestamp(86400000L + min * 60000L)
    try {
      input.addData((1L, ts(0), 1.0), (1L, ts(5), 2.0), (2L, ts(1), 7.0))
      q.processAllAvailable()
      input.addData((1L, ts(120), 5.0)) // advances watermark past gap
      q.processAllAvailable()
      input.addData((1L, ts(121), 0.5)) // watermark now covers session 1
      q.processAllAvailable()
      val got = spark.table("sess_out")
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().toSet
      assert(got.contains((1L, 2L, 3.0))) // user 1's first session closed
      assert(got.contains((2L, 1L, 7.0))) // user 2's lone session closed
      // the open session (120-121 min) is still in state, not emitted
      assert(!got.exists(s => s._1 == 1L && s._3 == 5.5))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: bounded-state streaming dedup") {
    // the bounded-lateness sibling of the streaming_dedup gate's
    // unbounded dropDuplicates: state for a key is evictable once the
    // watermark passes it, the right trade when redelivery lag is
    // bounded (the gate's at-least-once replay scenario keeps the
    // unbounded form — arbitrarily late replays)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val df = input.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = df.writeStream.format("memory")
      .queryName("wmdedup_out").outputMode("append").start()
    def ts(min: Long) = new java.sql.Timestamp(86400000L + min * 60000L)
    try {
      input.addData((1L, ts(0)), (2L, ts(1)))
      q.processAllAvailable()
      // duplicate of 1 arrives within the watermark window: suppressed
      input.addData((1L, ts(2)), (3L, ts(3)))
      q.processAllAvailable()
      val got = spark.table("wmdedup_out")
        .select("event_id").as[Long].collect().toSeq
      assert(got.sorted === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("sink partitions output and records batch txns") {
    val src = tablePath("ss-part-src")
    LakeWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "p"), src)
    val dst = tablePath("ss-part-dst")
    val ckpt = tmpDir("ss-part-ck")
    val q = spark.readStream.format("lake").load(src)
      .writeStream.format("lake")
      .partitionBy("p")
      .option("checkpointLocation", ckpt)
      .option("txnAppId", "ss-part-test")
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination(120000)
    val t = LakeTable.forPath(spark, dst)
    assert(t.snapshot().partitionColumns === Seq("p"))
    assert(t.toDF.count() === 2L)
    assert(t.snapshot().transactions.get("ss-part-test").contains(0L))
  }

  test("applyChanges maintains a replica through the change feed") {
    val src = tablePath("ac-src")
    val dst = tablePath("ac-dst")
    val ckpt = tmpDir("ac-ckpt")
    val rows = (1L to 100L).map(i => (i, s"n$i", i * 10.0))
    LakeWriter.write(rows.toDF("id", "name", "bal"), src)          // v0
    LakeTable.forPath(spark, src)
      .update("id <= 10", Map("bal" -> "bal + 5"))                 // v1
    LakeTable.forPath(spark, src).delete("id > 90")                // v2

    LakeStreaming.applyChanges(spark, src, dst, ckpt, Seq("id"))
      .awaitTermination(120000)
    def state(path: String) =
      LakeTable.forPath(spark, path).toDF
        .select("id", "name", "bal").orderBy("id").collect().toSeq
    assert(state(dst) === state(src))
    assert(LakeTable.forPath(spark, dst).toDF.count() === 90L)

    // incremental: more source DML, same checkpoint — only the new
    // changes flow, and the replica converges again
    LakeTable.forPath(spark, src)
      .update("id = 20", Map("name" -> "'renamed'"))               // v3
    LakeWriter.write(Seq((200L, "new", 1.0)).toDF("id", "name", "bal"),
      src)                                                         // v4
    LakeTable.forPath(spark, src).delete("id = 1")                 // v5
    LakeStreaming.applyChanges(spark, src, dst, ckpt, Seq("id"))
      .awaitTermination(120000)
    assert(state(dst) === state(src))

    // exactly-once: replaying an already-committed micro-batch is a
    // silent no-op (the Txn watermark rides the MERGE commit)
    val replica = LakeTable.forPath(spark, dst)
    val before = replica.snapshot().version
    // appId = checkpoint path + the query UUID from its metadata file
    assert(replica.snapshot().transactions.exists { case (k, v) =>
      k.startsWith(s"$ckpt@") && v >= 0L })
    val replay = LakeTable.forPath(spark, src).changes(0, 2)
    LakeStreaming.applyChangesBatch(replay, dst, Seq("id"), ckpt, 0L)
    assert(LakeTable.forPath(spark, dst).snapshot().version === before,
      "replayed batch must not commit")
    assert(state(dst) === state(src))

    // checkpoint RESET: deleting the checkpoint restarts batchIds at
    // 0 — the Txn appId carries the fresh query UUID, so the replay
    // re-applies (converging MERGEs) instead of silently no-opping
    // against the stale watermark and missing the new change below
    LakeWriter.deleteRecursively(java.nio.file.Paths.get(ckpt))
    LakeTable.forPath(spark, src)
      .update("id = 30", Map("name" -> "'post-reset'"))            // v6
    LakeStreaming.applyChanges(spark, src, dst, ckpt, Seq("id"))
      .awaitTermination(120000)
    assert(state(dst) === state(src),
      "reset checkpoint must reprocess, not silently skip")
    assert(LakeTable.forPath(spark, dst).toDF
      .where("name = 'post-reset'").count() === 1L)
  }

  test("RATE-LIMITED restart below the retention floor: the chunked " +
      "init path makes the same data-loss decision as the version path") {
    val src = tablePath("ss-ret-lag-chunk-src")
    val dst = tablePath("ss-ret-lag-chunk-dst")
    val ckpt = tmpDir("ss-ret-lag-chunk-ck")
    LakeWriter.write((1L to 50L).toDF("id").coalesce(1), src,
      properties = Map(graft.lake.LakeLog.LOG_RETENTION_PROP -> "0"))
    runAvailableNow(src, dst, ckpt, Map("maxFilesPerTrigger" -> "2"))
    assert(LakeTable.forPath(spark, dst).toDF.count() === 50L)

    LakeWriter.write((51L to 60L).toDF("id").coalesce(1), src)    // v1
    padLog(src, 2L, 29L)
    LakeWriter.write((61L to 70L).toDF("id").coalesce(1), src)    // v30
    assert(new graft.lake.LakeLog(src).earliestReplayableVersion === 10L)

    // The cursor (v0) fell below the floor while the consumer lagged.
    // The rate limit makes getOffset produce an initial-snapshot CHUNK
    // offset; silently delivering it would duplicate rows 1..50. The
    // default must be the same loud error the unthrottled path throws.
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    val failed =
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        runAvailableNow(src, dst, ckpt, Map("maxFilesPerTrigger" -> "2"))
      }
    assert(messages(failed).exists(_.contains("log retention")))

    // failOnDataLoss=false resumes from the floor WITHOUT snapshot
    // re-delivery: 51..60 are lost (exactly the aged-out versions),
    // 1..50 do NOT duplicate, 61..70 flow
    runAvailableNow(src, dst, ckpt,
      Map("maxFilesPerTrigger" -> "2", "failOnDataLoss" -> "false"))
    val ids = LakeTable.forPath(spark, dst).toDF
      .select("id").as[Long].collect().sorted
    assert(ids === ((1L to 50L) ++ (61L to 70L)).toArray)
  }

  test("chunk cursors are keyed to the pinned snapshot version: a " +
      "cursor from an older pinned version is not trusted") {
    val src = tablePath("ss-init-vpin-src")
    (0 until 10).foreach { i =>
      LakeWriter.write(
        ((i * 10 + 1L) to (i * 10 + 10L)).toDF("id").coalesce(1), src,
        properties = if (i == 0)
          Map(graft.lake.LakeLog.LOG_RETENTION_PROP -> "0")
        else Map.empty)
    }
    padLog(src, 10L, 29L)
    LakeWriter.write((101L to 110L).toDF("id").coalesce(1), src)  // v30
    assert(new graft.lake.LakeLog(src).earliestReplayableVersion === 10L)
    import org.apache.spark.sql.execution.streaming.SerializedOffset

    def rowsOf(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.logical.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.count()
      }.getOrElse(sys.error("expected a LogicalRDD batch"))

    // restart replay whose START offset pins an OLDER snapshot version
    // (the floor advanced between the checkpointed batch and this one):
    // its file index counts against a differently-sorted list — it must
    // restart at 0 (at-least-once), never slice from the stale index
    val s = new graft.sources.LakeStreamSource(spark, src,
      Map("maxFilesPerTrigger" -> "2"))
    val replayed = s.getBatch(
      Some(SerializedOffset("8#5")), SerializedOffset("10#2"))
    assert(rowsOf(replayed) === 20L,
      "a stale-version cursor must not skip snapshot files")
    assert(s.getOffset.map(_.json()) === Some("10#4"))

    // mid-run floor advance on a LIVE source: the next checkpoint run
    // ages more versions out, the pinned version changes, and the
    // in-memory delivered-index cursor must reset with it
    padLog(src, 31L, 39L)
    LakeWriter.write((111L to 120L).toDF("id").coalesce(1), src)  // v40
    assert(new graft.lake.LakeLog(src).earliestReplayableVersion === 20L)
    assert(s.getOffset.map(_.json()) === Some("20#2"),
      "the cursor must restart when the pinned snapshot version changes")
  }
}

package graft.lake

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Deletion vectors: merge-on-read DELETE, DV-aware reads, REORG
  * PURGE, vacuum protection, CDC and streaming interplay.
  */
class LakeDeletionVectorSuite extends SparkSuite {
  import spark.implicits._

  private def seed = Seq.tabulate(100)(i =>
    (i.toLong, s"k$i", i % 10, i * 1.0))
    .toDF("id", "k", "bucket", "v").coalesce(2)

  private def dvTable(name: String): String = {
    val path = tablePath(name)
    LakeWriter.write(seed, path,
      properties = Map(LakeTable.PROP_ENABLE_DV -> "true"))
    path
  }

  test("RESTORE to a pre-DV-delete version resurrects soft-deleted " +
      "rows (entry diff, not path diff)") {
    val path = dvTable("dv-restore-entry")
    val t = LakeTable.forPath(spark, path)
    val v0 = new LakeLog(path).latestVersion
    assert(t.toDF.count() === 100L)
    // DV delete: the files stay LIVE at both versions — only their
    // entries change (dvPath). A path-only restore diff would skip
    // them and leave the rows dead.
    t.delete("id < 20")
    assert(LakeTable.forPath(spark, path).toDF.count() === 80L)
    LakeTable.forPath(spark, path).restoreTo(v0)
    val restored = LakeTable.forPath(spark, path)
    assert(restored.toDF.count() === 100L,
      "restore must undo the DV soft-delete on files live at both " +
      "versions")
    assert(restored.snapshot().files.forall(_.dvPath.isEmpty))
    // and the reverse: restoring forward TO the DV state re-applies it
    val vDeleted = restored.snapshot().version - 1
    LakeTable.forPath(spark, path).restoreTo(vDeleted)
    assert(LakeTable.forPath(spark, path).toDF.count() === 80L)
  }

  test("codec: write/read/merge roundtrip") {
    val dir = tmpDir("dv-codec")
    val a = Array(0L, 1L, 5L, 1000L, 1000000L)
    val rel = DeletionVector.write(dir, a)
    assert(DeletionVector.read(Paths.get(dir, rel)) === a)
    val b = Array(2L, 5L, 999999L)
    assert(DeletionVector.merge(a, b) ===
      Array(0L, 1L, 2L, 5L, 1000L, 999999L, 1000000L))
  }

  test("RowIndexSet: sparse/dense containers agree with the raw set") {
    val rnd = new scala.util.Random(42)
    // mixed shape: a sparse low container, a DENSE container (forces
    // the bitmap conversion at >4096), a gap of empty containers, and
    // boundary values at 65535/65536 and a huge index
    val dense = (0 until 30000).map(_ => (65536L * 3) + rnd.nextInt(65536))
    val sparse = Seq(0L, 1L, 17L, 65535L, 65536L, 1L << 40)
    val all = (dense ++ sparse).distinct.sorted.toArray
    val set = RowIndexSet.fromSorted(all)
    assert(set.cardinality === all.length.toLong)
    val member = all.toSet
    assert(all.forall(set.contains))
    val probes = (0 until 20000).map(_ => rnd.nextLong(65536L * 5))
    probes.foreach { p =>
      assert(set.contains(p) === member(p), s"probe $p")
    }
    assert(!set.contains(-1L))
    assert(!set.contains((1L << 40) + 1))
  }

  test("RowIndexSet: streaming DV decode matches array decode") {
    val dir = tmpDir("dv-set")
    val rnd = new scala.util.Random(7)
    val idxs = (0 until 9000).map(_ => rnd.nextLong(1L << 30))
      .distinct.sorted.toArray
    val rel = DeletionVector.write(dir, idxs)
    val set = DeletionVector.readSet(Paths.get(dir, rel))
    assert(set.cardinality === idxs.length.toLong)
    assert(idxs.forall(set.contains))
    val member = idxs.toSet
    (0 until 9000).foreach { _ =>
      val p = rnd.nextLong(1L << 30)
      assert(set.contains(p) === member(p))
    }
  }

  test("DV delete soft-deletes without rewriting data files") {
    val path = dvTable("dv1")
    val t = LakeTable.forPath(spark, path)
    val filesBefore = t.snapshot().files.map(_.path).toSet
    t.delete("id % 10 = 3") // 10 rows across both files
    val snap = t.snapshot()
    assert(snap.version === 1L)
    // same physical files, now carrying DVs — nothing was rewritten
    assert(snap.files.map(_.path).toSet === filesBefore)
    assert(snap.files.forall(_.dvPath.isDefined))
    assert(snap.files.map(_.dvCardinality).sum === 10L)
    val got = t.toDF.select("id").as[Long].collect().sorted
    assert(got.length === 90)
    assert(!got.exists(_ % 10 == 3))
    // filters + aggregates read through the DV
    assert(t.toDF.filter($"bucket" === 3).count() === 0L)
    assert(t.toDF.count() === 90L)
  }

  test("second DV delete merges vectors; time travel sees all states") {
    val path = dvTable("dv2")
    val t = LakeTable.forPath(spark, path)
    t.delete("id < 10")   // v1
    t.delete("id >= 90")  // v2: DVs must merge, not replace
    val snap = t.snapshot()
    assert(snap.files.map(_.dvCardinality).sum === 20L)
    assert(t.toDF.count() === 80L)
    assert(t.toDF.agg(min("id"), max("id")).as[(Long, Long)].head ===
      ((10L, 89L)))
    assert(t.asOf(0).count() === 100L)
    assert(t.asOf(1).count() === 90L)
  }

  test("full-file deletion removes the entry instead of carrying a DV") {
    val path = tablePath("dv3")
    // two single-partition files via partitioning on bucket parity
    LakeWriter.write(
      seed.withColumn("par", $"id" % 2).repartition(2, $"par"),
      path, partitionBy = Seq("par"),
      properties = Map(LakeTable.PROP_ENABLE_DV -> "true"))
    val t = LakeTable.forPath(spark, path)
    // delete every odd row by a NON-partition predicate (partition
    // predicates take the metadata-only path, not the DV path)
    t.delete("id % 2 = 1")
    val snap = t.snapshot()
    // the par=1 file is fully dead: removed outright, no DV entry
    assert(snap.files.size === 1)
    assert(snap.files.forall(_.dvPath.isEmpty))
    assert(t.toDF.count() === 50L)
  }

  test("UPDATE and MERGE on a DV table read through the DV") {
    val path = dvTable("dv4")
    val t = LakeTable.forPath(spark, path)
    t.delete("id < 50")
    // merge-on-read UPDATE: DVs the old row versions + appends new
    t.update("id >= 90", Map("v" -> "v + 1000"))
    val afterUpd = LakeTable.forPath(spark, path)
    assert(afterUpd.toDF.count() === 50L)
    assert(afterUpd.toDF.filter($"v" >= 1000).count() === 10L)
    // a deleted row must NOT be matchable by MERGE
    val src = Seq((10L, "ghost"), (60L, "live")).toDF("id", "nk")
    afterUpd.as("t")
      .merge(src.as("s"), "t.id = s.id")
      .whenMatchedUpdate(Map("k" -> "s.nk"))
      .whenNotMatchedInsert(Map("id" -> "s.id", "k" -> "s.nk",
        "bucket" -> "CAST(0 AS INT)", "v" -> "CAST(0.0 AS DOUBLE)"))
      .execute()
    val end = LakeTable.forPath(spark, path).toDF
    assert(end.filter($"id" === 60 && $"k" === "live").count() === 1L)
    // id=10 was soft-deleted → the merge INSERTED it fresh
    assert(end.filter($"id" === 10).count() === 1L)
    assert(end.filter($"id" === 10 && $"k" === "ghost").count() === 1L)
  }

  test("REORG APPLY (PURGE) rewrites DV files clean; SQL route") {
    val path = dvTable("dv5")
    LakeCatalog.register(spark, "dv5t", path)
    val t = LakeTable.forPath(spark, path)
    t.delete("bucket = 7")
    val before = t.toDF.select("id").as[Long].collect().sorted
    LakeSql.sql(spark, "REORG TABLE dv5t APPLY (PURGE)")
    val after = LakeTable.forPath(spark, path)
    assert(after.snapshot().files.forall(_.dvPath.isEmpty))
    assert(after.toDF.select("id").as[Long].collect().sorted === before)
    // purging twice is a no-op commit-wise
    val v = after.snapshot().version
    assert(after.purgeDeletionVectors() === 0)
    assert(LakeTable.forPath(spark, path).snapshot().version === v)
  }

  test("CDC records DV deletes; detail() surfaces DV counts") {
    val path = dvTable("dv6")
    val t = LakeTable.forPath(spark, path)
    t.delete("id = 42")
    val ch = t.changes(1)
    assert(ch.filter($"_change_type" === "delete")
      .select("id").as[Long].collect() === Array(42L))
    val d = t.detail().select("numDeletionVectors", "numDeletedRows")
      .as[(Long, Long)].head
    assert(d === ((1L, 1L)))
  }

  test("vacuum keeps live DV sidecars, sweeps them after purge") {
    val path = dvTable("dv7")
    val t = LakeTable.forPath(spark, path)
    t.delete("id < 5")
    val dvRel = t.snapshot().files.flatMap(_.dvPath).head
    spark.conf.set(LakeTable.RETENTION_CHECK_KEY, "false")
    try {
      t.vacuum(0.0)
      assert(Files.exists(Paths.get(path, dvRel)),
        "live DV sidecar must survive vacuum")
      assert(t.toDF.count() === 95L)
      t.purgeDeletionVectors()
      LakeTable.forPath(spark, path).vacuum(0.0)
      assert(!Files.exists(Paths.get(path, dvRel)),
        "orphaned DV sidecar should be swept once unreferenced")
    } finally spark.conf.set(LakeTable.RETENTION_CHECK_KEY, "true")
  }

  test("streaming source treats a DV delete as a change commit") {
    val path = dvTable("dv8")
    LakeTable.forPath(spark, path).delete("id < 10") // v1: DV commit
    val out = tmpDir("dv8-sink")
    // default options: a change commit must fail the stream loudly
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("lake").load(path)
        .writeStream.format("parquet")
        .option("checkpointLocation", s"$out/ckpt")
        .option("path", s"$out/data")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    assert(e.getMessage.contains("non-append") ||
      Option(e.getCause).exists(_.getMessage.contains("non-append")))
    // ignoreDeletes: the DV commit is a delete-only change — skipped,
    // only the original append's rows flow
    val out2 = tmpDir("dv8-sink2")
    val q2 = spark.readStream.format("lake")
      .option("ignoreDeletes", "true").load(path)
      .writeStream.format("parquet")
      .option("checkpointLocation", s"$out2/ckpt")
      .option("path", s"$out2/data")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    assert(spark.read.parquet(s"$out2/data").count() === 100L)
  }

  test("merge-on-read UPDATE appends only updated rows, DVs the old") {
    val path = dvTable("dv10")
    val t = LakeTable.forPath(spark, path)
    val origFiles = t.snapshot().files.map(_.path).toSet
    t.update("id % 10 = 0", Map("v" -> "v + 0.5", "k" -> "concat(k, '!')"))
    val snap = LakeTable.forPath(spark, path).snapshot()
    // original files survive (now DV-carrying); updated rows appended
    assert(origFiles.subsetOf(snap.files.map(_.path).toSet))
    val dvd = snap.files.filter(_.dvPath.isDefined)
    assert(dvd.nonEmpty && dvd.map(_.dvCardinality).sum === 10L)
    assert(snap.files.size > origFiles.size)
    val got = LakeTable.forPath(spark, path).toDF
    assert(got.count() === 100L)
    assert(got.filter($"k".endsWith("!")).count() === 10L)
    assert(got.filter($"id" === 40L).select("v").as[Double].head === 40.5)
    // CDC carries the pre/post pair
    val ch = LakeTable.forPath(spark, path).changes(1)
      .filter($"id" === 40L)
      .select("_change_type", "v").as[(String, Double)].collect().sortBy(_._1)
    assert(ch === Array(("delete", 40.0), ("insert", 40.5)))
  }

  test("merge-on-read MERGE: DVs clause hits, appends updates+inserts") {
    val path = dvTable("dv11")
    val t = LakeTable.forPath(spark, path)
    val origFiles = t.snapshot().files.map(_.path).toSet
    val src = Seq((5L, 5000.0), (15L, 15000.0), (999L, 999000.0))
      .toDF("id", "nv")
    t.as("t").merge(src.as("s"), "t.id = s.id")
      .whenMatchedUpdate("t.id = 5", Map("v" -> "s.nv"))
      .whenMatchedDelete("t.id = 15")
      .whenNotMatchedInsert(Map("id" -> "s.id", "k" -> "'new'",
        "bucket" -> "CAST(0 AS INT)", "v" -> "s.nv"))
      .execute()
    val snap = LakeTable.forPath(spark, path).snapshot()
    // touched files kept in place with DVs (2 clause-hit rows),
    // new files appended for the update's new version + the insert
    assert(origFiles.subsetOf(snap.files.map(_.path).toSet))
    assert(snap.files.flatMap(_.dvPath).nonEmpty)
    assert(snap.files.map(_.dvCardinality).sum === 2L)
    val got = LakeTable.forPath(spark, path).toDF
    assert(got.count() === 100L) // 100 - deleted(1) + inserted(1)
    assert(got.filter($"id" === 5L).select("v").as[Double].head === 5000.0)
    assert(got.filter($"id" === 15L).count() === 0L)
    assert(got.filter($"id" === 999L && $"k" === "new").count() === 1L)
    // CDC: update pre+post, delete pre, insert
    val ch = LakeTable.forPath(spark, path).changes(1)
      .select("id", "_change_type").as[(Long, String)].collect().sorted
    assert(ch === Array((5L, "delete"), (5L, "insert"),
      (15L, "delete"), (999L, "insert")))
  }

  test("merge-on-read MERGE with by-source delete over DV'd rows") {
    val path = dvTable("dv12")
    val t = LakeTable.forPath(spark, path)
    t.delete("id >= 90") // DVs exist before the merge
    val src = Seq.range(0L, 50L).toDF("id")
    t.as("t").merge(src.as("s"), "t.id = s.id")
      .whenNotMatchedBySourceDelete()
      .execute()
    val after = LakeTable.forPath(spark, path)
    // rows 50..89 by-source-deleted (90..99 already gone), 0..49 stay
    assert(after.toDF.count() === 50L)
    assert(after.toDF.agg(max("id")).as[Long].head === 49L)
    // the second file's merge DV (40 new + 10 pre-existing = all 50
    // physical rows) proves the vectors MERGED: a replace would leave
    // cardinality 40 and the file alive; the merged full-dead file is
    // removed outright instead
    assert(after.snapshot().files.size === 1)
    assert(after.snapshot().files.forall(_.dvPath.isEmpty))
  }

  test("concurrent re-add of the same file conflicts (DV-DV race)") {
    val path = dvTable("dv13")
    val t = LakeTable.forPath(spark, path)
    val v0 = t.snapshot().version
    val file = t.snapshot().files.head
    // a "concurrent" DV delete lands first
    t.delete("id = 1")
    // a second writer that read v0 and supersedes the same file must
    // fail its commit rather than silently drop the first delete
    val e = intercept[ConflictingCommitException] {
      LakeWriter.commitWithRetry(t.log, v0, Seq(file.path)) { _ =>
        Seq(CommitInfo(System.currentTimeMillis(), "DELETE", Map.empty),
          file.copy(dvPath = Some("_deletion_vectors/bogus.bin"),
            dvCardinality = 1L))
      }
    }
    assert(e.getMessage.contains("superseded"))
  }

  test("streaming change feed delivers DV-deleted rows") {
    val path = dvTable("dv14")
    LakeTable.forPath(spark, path).delete("id = 7") // v1, DV commit
    val out = tmpDir("dv14-sink")
    val q = spark.readStream.format("lake")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1")
      .load(path)
      .writeStream.format("parquet")
      .option("checkpointLocation", s"$out/ckpt")
      .option("path", s"$out/data")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(s"$out/data")
      .select("id", "_change_type").as[(Long, String)].collect()
    assert(got === Array((7L, "delete")))
  }

  test("large DV maps ride a broadcast; the plan literal stays small") {
    // VERDICT r8 item 5: above the entry threshold the file→DV map is
    // a Spark broadcast — the plan carries only a serialized handle —
    // with identical read results and the same join-free plan shape.
    val prev = PathMapPayload.BROADCAST_MIN_ENTRIES
    PathMapPayload.BROADCAST_MIN_ENTRIES = 1 // force the broadcast path
    try {
      val path = dvTable("dv-bcast")
      val t = LakeTable.forPath(spark, path)
      t.delete("id % 7 = 0") // DV delete → map non-empty → broadcast
      assert(t.snapshot().files.exists(_.dvPath.isDefined))
      val df = t.toDF
      assert(df.count() === 100L - 15L)
      assert(df.filter($"id" % 7 === 0).count() === 0L)
      // plan shape unchanged: one relation, no join/exchange
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), plan)
      assert(!plan.contains("Exchange"), plan)
      // the riding literal is a handle, not the map
      val lits = df.queryExecution.optimizedPlan
        .collect { case p => p.expressions }.flatten.flatMap(
        _.collect {
          case l: org.apache.spark.sql.catalyst.expressions.Literal
            if l.dataType ==
              org.apache.spark.sql.types.BinaryType => l
        })
      assert(lits.nonEmpty)
      lits.foreach { l =>
        val bytes = l.value.asInstanceOf[Array[Byte]]
        assert(bytes.length < 1024,
          s"dv payload literal is ${bytes.length} B — not a handle")
      }
    } finally PathMapPayload.BROADCAST_MIN_ENTRIES = prev
  }

  test("a 1k-entry DV map payload stays bounded via the broadcast") {
    val prev = PathMapPayload.BROADCAST_MIN_ENTRIES
    PathMapPayload.BROADCAST_MIN_ENTRIES = 4096
    try {
      val big = (1 to 1000).map(i =>
        (s"/tmp/fake/part-$i.parquet", s"/tmp/fake/dv-$i.bin"))
      // below threshold: inline payload carries the whole map
      val inline = DvRowDeleted.payload(spark, big)
      assert(inline.length > 50000)
      PathMapPayload.BROADCAST_MIN_ENTRIES = 100
      val handle = DvRowDeleted.payload(spark, big)
      assert(handle.length < 1024,
        s"broadcast payload is ${handle.length} B")
      // identical decoded content either way, and the same content
      // reuses the same pinned broadcast (no handle churn per read)
      assert(DvRowDeleted.decodePayload(handle) ===
        DvRowDeleted.decodePayload(inline))
      assert(DvRowDeleted.payload(spark, big) === handle)
    } finally PathMapPayload.BROADCAST_MIN_ENTRIES = prev
  }

  test("copy-on-write stays the default without the property") {
    val path = tablePath("dv9")
    LakeWriter.write(seed, path)
    val t = LakeTable.forPath(spark, path)
    val filesBefore = t.snapshot().files.map(_.path).toSet
    t.delete("id < 10")
    val snap = t.snapshot()
    assert(snap.files.forall(_.dvPath.isEmpty))
    // the touched file was physically rewritten (untouched ones stay)
    assert((filesBefore -- snap.files.map(_.path).toSet).nonEmpty)
    assert(t.toDF.count() === 90L)
  }

  test("DV update racing a metadata commit aborts, commits nothing") {
    // A DV-mode UPDATE stages its rewritten rows and CDC under the
    // READ snapshot's mapping/constraint epoch. If a metadata commit
    // (rename, new constraint, property change) lands between the
    // read and the commit, the update must abort — same rule as
    // commitRewrite — not land files from the stale epoch. The race
    // is forced deterministically: the store wrapper commits a
    // property change right before the update's own commit attempt.
    val path = dvTable("dv-meta-race")
    val prev = LogStore.current
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reentrant = new ThreadLocal[java.lang.Boolean] {
      override def initialValue = java.lang.Boolean.FALSE
    }
    LogStore.current = new LogStore {
      override def putIfAbsent(t: java.nio.file.Path, l: Seq[String]) = {
        if (!reentrant.get && t.getFileName.toString.matches("\\d{20}\\.json")
            && fired.compareAndSet(false, true)) {
          reentrant.set(true)
          try LakeTable.forPath(spark, path)
            .setTblProperties(Map("user.epoch" -> "2"))
          finally reentrant.set(false)
        }
        prev.putIfAbsent(t, l)
      }
      override def atomicReplace(t: java.nio.file.Path, l: Seq[String]) =
        prev.atomicReplace(t, l)
      override def listDir(d: java.nio.file.Path) = prev.listDir(d)
      override def readLines(p: java.nio.file.Path) = prev.readLines(p)
      override def exists(p: java.nio.file.Path) = prev.exists(p)
      override def delete(p: java.nio.file.Path) = prev.delete(p)
    }
    try {
      val ex = intercept[ConflictingCommitException] {
        LakeTable.forPath(spark, path).update("id = 6", Map("v" -> "99.0"))
      }
      assert(ex.getMessage.contains("changed concurrently"))
    } finally LogStore.current = prev
    // nothing landed: the value is unchanged and no commit after the
    // property change exists
    val t = LakeTable.forPath(spark, path)
    assert(t.toDF.filter($"id" === 6L).select("v").as[Double].head()
      === 6.0)
    assert(t.snapshot().metadata.properties.get("user.epoch")
      .contains("2"))
  }
}

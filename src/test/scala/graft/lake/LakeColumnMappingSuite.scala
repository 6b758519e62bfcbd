package graft.lake

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** Column mapping (Delta columnMapping.mode=name analog): metadata-only
  * RENAME COLUMN, physical-name writes, stats skipping across renames,
  * safe drop/re-add, time travel through the rename, protocol gating.
  */
class LakeColumnMappingSuite extends SparkSuite {
  import spark.implicits._

  private def seed = Seq.tabulate(100)(i => (i.toLong, s"k$i", i % 10))
    .toDF("id", "k", "bucket").coalesce(2)

  private def mappedTable(name: String): String = {
    val path = tablePath(name)
    LakeWriter.write(seed, path)
    LakeTable.forPath(spark, path).setTblProperties(
      Map(ColumnMapping.MODE_PROP -> "name"))
    path
  }

  test("rename is metadata-only: file set unchanged, data correct") {
    val path = mappedTable("cm1")
    val t = LakeTable.forPath(spark, path)
    val filesBefore = t.snapshot().files.map(f => (f.path, f.size)).toSet
    t.renameColumn("k", "label")
    val after = LakeTable.forPath(spark, path)
    assert(after.snapshot().files.map(f => (f.path, f.size)).toSet ===
      filesBefore, "rename must not touch a single data file")
    assert(after.toDF.columns.toSeq === Seq("id", "label", "bucket"))
    assert(after.toDF.filter($"id" === 7L).select("label").as[String].head()
      === "k7")
    assert(after.toDF.count() === 100L)
  }

  test("time travel across the rename: each version has its own names") {
    val path = mappedTable("cm2")
    val t = LakeTable.forPath(spark, path)
    val preRename = t.snapshot().version
    t.renameColumn("k", "label")
    val after = LakeTable.forPath(spark, path)
    assert(after.asOf(preRename).columns.contains("k"))
    assert(after.asOf(preRename).filter($"id" === 3L)
      .select("k").as[String].head() === "k3")
    assert(after.toDF.columns.contains("label"))
  }

  test("appends after the rename land under the stable physical name") {
    val path = mappedTable("cm3")
    val t = LakeTable.forPath(spark, path)
    t.renameColumn("k", "label")
    LakeWriter.write(
      Seq((100L, "k100", 0)).toDF("id", "label", "bucket"), path)
    val got = LakeTable.forPath(spark, path).toDF
    assert(got.count() === 101L)
    // rows from both pre- and post-rename files resolve the column
    assert(got.filter($"id".isin(7L, 100L)).select("label")
      .as[String].collect().sorted === Array("k100", "k7"))
    // physical file actually carries the ORIGINAL name
    val newest = LakeTable.forPath(spark, path).snapshot().files
      .map(_.path).filterNot(
        LakeTable.forPath(spark, path).asOf(0).inputFiles
          .map(f => f.substring(f.indexOf(path) + path.length + 1)).toSet)
    val raw = spark.read.parquet(
      newest.map(p => s"$path/$p"): _*)
    assert(raw.columns.contains("k") && !raw.columns.contains("label"))
  }

  test("filter pushdown and stats skipping survive the rename") {
    val path = tablePath("cm4")
    // two files with disjoint id ranges → skippable stats
    LakeWriter.write(
      spark.range(0, 50).select($"id", lit("a").as("k")).coalesce(1), path)
    LakeWriter.write(
      spark.range(50, 100).select($"id", lit("b").as("k")).coalesce(1), path)
    val t = LakeTable.forPath(spark, path)
    t.setTblProperties(Map(ColumnMapping.MODE_PROP -> "name"))
    t.renameColumn("id", "row_id")
    val after = LakeTable.forPath(spark, path)
    // data skipping via the log: only one file survives pruning
    val pruned = FilePruner.prune(after.snapshot(), "row_id >= 50")
    assert(pruned.size === 1, pruned.map(_.path))
    // parquet pushdown: PushedFilters non-empty (under the physical
    // name) and the result correct
    val df = after.toDF.filter($"row_id" === 60L)
    val plan = df.queryExecution.explainString(FormattedMode)
    assert(!plan.contains("PushedFilters: []"), plan)
    assert(df.select("k").as[String].head() === "b")
  }

  test("drop then re-add under mapping: no resurrection, fresh physical") {
    val path = mappedTable("cm5")
    val t = LakeTable.forPath(spark, path)
    t.dropColumn("k")
    val t2 = LakeTable.forPath(spark, path)
    assert(!t2.toDF.columns.contains("k"))
    // re-add is ALLOWED (unmapped tables reject this) and reads null
    t2.addColumn("k", "STRING")
    val got = LakeTable.forPath(spark, path).toDF
    assert(got.columns.contains("k"))
    assert(got.filter($"k".isNotNull).count() === 0L,
      "old bytes must not resurrect under the re-added name")
    // and the re-added column round-trips through a write
    LakeWriter.write(Seq((200L, "fresh", 0)).toDF("id", "k", "bucket"), path)
    assert(LakeTable.forPath(spark, path).toDF
      .filter($"k" === "fresh").count() === 1L)
  }

  test("DML on a mapped table after rename (CoW delete + update)") {
    val path = mappedTable("cm6")
    val t = LakeTable.forPath(spark, path)
    t.renameColumn("k", "label")
    LakeTable.forPath(spark, path).delete("label = 'k5'")
    val afterDel = LakeTable.forPath(spark, path)
    assert(afterDel.toDF.count() === 99L)
    afterDel.update("id = 6", Map("label" -> "'updated'"))
    val got = LakeTable.forPath(spark, path).toDF
    assert(got.filter($"label" === "updated")
      .select("id").as[Long].head() === 6L)
    assert(got.count() === 99L)
  }

  test("mergeSchema evolution post-enable assigns a fresh physical name") {
    val path = mappedTable("cm7")
    LakeWriter.write(
      Seq((300L, "k300", 1, 9.5)).toDF("id", "k", "bucket", "score"),
      path, mergeSchema = true)
    val t = LakeTable.forPath(spark, path)
    val ov = ColumnMapping.overrides(t.snapshot().metadata)
    assert(ov.contains("score") && ov("score").startsWith("col-"), ov)
    val got = t.toDF
    assert(got.filter($"score".isNotNull).count() === 1L)
    assert(got.filter($"id" === 300L).select("score").as[Double].head() === 9.5)
    // old files null-fill the new column
    assert(got.filter($"id" === 1L).select("score").isEmpty
      || got.filter($"id" === 1L).select("score").as[Option[Double]]
        .head().isEmpty)
  }

  test("rename of a partition column stays rejected; mapping is one-way") {
    val path = tablePath("cm8")
    LakeWriter.write(seed.withColumn("par", $"id" % 2), path,
      partitionBy = Seq("par"))
    val t = LakeTable.forPath(spark, path)
    t.setTblProperties(Map(ColumnMapping.MODE_PROP -> "name"))
    intercept[IllegalArgumentException] {
      LakeTable.forPath(spark, path).renameColumn("par", "parity")
    }
    intercept[IllegalArgumentException] {
      LakeTable.forPath(spark, path).setTblProperties(
        Map(ColumnMapping.MODE_PROP -> "none"))
    }
    intercept[IllegalArgumentException] {
      LakeTable.forPath(spark, path).unsetTblProperties(
        Seq(ColumnMapping.MODE_PROP))
    }
  }

  test("protocol gates mapped tables with the columnMapping feature") {
    val path = mappedTable("cm9")
    val p = LakeTable.forPath(spark, path).snapshot().protocol
    assert(p.readerFeatures.contains(LakeProtocol.FEATURE_COLUMN_MAPPING), p)
    assert(p.writerFeatures.contains(LakeProtocol.FEATURE_COLUMN_MAPPING), p)
  }

  test("deletion vectors on a mapped table: DV delete after rename") {
    val path = tablePath("cm11")
    LakeWriter.write(seed, path,
      properties = Map(LakeTable.PROP_ENABLE_DV -> "true"))
    LakeTable.forPath(spark, path).setTblProperties(
      Map(ColumnMapping.MODE_PROP -> "name"))
    LakeTable.forPath(spark, path).renameColumn("k", "label")
    val filesBefore = LakeTable.forPath(spark, path)
      .snapshot().files.map(_.path).toSet
    // predicate over the RENAMED column takes the merge-on-read path
    LakeTable.forPath(spark, path).delete("label rlike 'k[0-9]$'") // k0..k9
    val after = LakeTable.forPath(spark, path)
    assert(after.snapshot().files.map(_.path).toSet === filesBefore,
      "DV delete must not rewrite files on the mapped table")
    // only files containing matches carry a DV (k0..k9 live in one of
    // the two coalesced files)
    assert(after.snapshot().files.exists(_.dvPath.isDefined))
    assert(after.snapshot().files.map(_.dvCardinality).sum === 10L)
    assert(after.toDF.count() === 90L)
    assert(after.toDF.filter($"label" === "k5").count() === 0L)
    // CDF carries the deleted rows under the CURRENT logical name
    val ch = after.changes(after.snapshot().version)
    assert(ch.columns.contains("label"))
    assert(ch.filter($"_change_type" === "delete").count() === 10L)
    // format("lake") composes the name-mapping and the in-scan DV
    // filter (DvParquetFileFormat extends the mapped format): same
    // rows as toDF, logical names, no resurrection
    val viaFormat = spark.read.format("lake").load(path)
    assert(viaFormat.columns.toSeq === after.toDF.columns.toSeq)
    assert(viaFormat.count() === 90L)
    assert(viaFormat.filter($"label" === "k5").count() === 0L)
    assert(viaFormat.orderBy("id").collect().toSeq ===
      after.toDF.orderBy("id").collect().toSeq)
  }

  test("OPTIMIZE compaction preserves mapped data and skipping stats") {
    val path = mappedTable("cm12")
    LakeTable.forPath(spark, path).renameColumn("k", "label")
    // a second small append creates compactable debris
    LakeWriter.write(
      Seq((100L, "k100", 0), (101L, "k101", 1))
        .toDF("id", "label", "bucket").coalesce(1), path)
    val t = LakeTable.forPath(spark, path)
    val filesBefore = t.snapshot().files.size
    t.compact()
    val after = LakeTable.forPath(spark, path)
    assert(after.snapshot().files.size < filesBefore,
      "compaction should have coalesced small files")
    assert(after.toDF.count() === 102L)
    assert(after.toDF.filter($"label" === "k100").count() === 1L)
    // compacted files still carry PHYSICAL names + translated stats:
    // pruning on the renamed column must keep working
    val pruned = FilePruner.prune(after.snapshot(), "label = 'k5'")
    assert(pruned.nonEmpty)
    pruned.foreach { f =>
      assert(f.minValues.contains("k") || f.minValues.isEmpty,
        s"stats must stay under the physical name: ${f.minValues.keys}")
    }
  }

  test("streaming reads of a mapped table resolve physical names") {
    val path = mappedTable("cm13")
    LakeTable.forPath(spark, path).renameColumn("k", "label")
    val out = tmpDir("cm13-sink")
    val q = spark.readStream.format("lake").load(path)
      .writeStream.format("parquet")
      .option("checkpointLocation", s"$out/ckpt")
      .option("path", s"$out/data")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(s"$out/data")
    assert(got.columns.contains("label"))
    assert(got.count() === 100L)
    assert(got.filter($"label" === "k7").count() === 1L,
      "streamed rows must carry the physical column's data")
  }

  test("mapping enabled at CREATE via writer properties; protocol at v0") {
    val path = tablePath("cm14")
    LakeWriter.write(seed, path,
      properties = Map(ColumnMapping.MODE_PROP -> "name"))
    val t = LakeTable.forPath(spark, path)
    assert(ColumnMapping.enabled(t.snapshot().metadata))
    assert(t.snapshot().protocol.readerFeatures
      .contains(LakeProtocol.FEATURE_COLUMN_MAPPING))
    // identity physical names at creation: rename is already O(1)
    val files = t.snapshot().files.map(_.path).toSet
    t.renameColumn("k", "label")
    assert(LakeTable.forPath(spark, path).snapshot()
      .files.map(_.path).toSet === files)
    assert(LakeTable.forPath(spark, path).toDF
      .filter($"label" === "k3").count() === 1L)
  }

  test("full SQL route: enable mapping, rename, read — metadata-only") {
    val path = mappedTable("cm19")
    LakeCatalog.register(spark, "cm19t", path)
    val filesBefore = LakeTable.forPath(spark, path)
      .snapshot().files.map(_.path).toSet
    LakeSql.sql(spark, "ALTER TABLE cm19t RENAME COLUMN k TO label")
    assert(LakeTable.forPath(spark, path).snapshot()
      .files.map(_.path).toSet === filesBefore,
      "SQL rename on a mapped table must stay metadata-only")
    val got = LakeSql.sql(spark,
      "SELECT label FROM cm19t WHERE id = 7")
    assert(got.as[String].head() === "k7")
    // SHOW TBLPROPERTIES surfaces the mapping state
    val props = LakeSql.sql(spark, "SHOW TBLPROPERTIES cm19t")
      .as[(String, String)].collect().toMap
    assert(props.get(ColumnMapping.MODE_PROP).contains("name"))
  }

  test("RESTORE to a pre-rename version reverts schema AND mapping") {
    val path = mappedTable("cm18")
    val preRename = LakeTable.forPath(spark, path).snapshot().version
    LakeTable.forPath(spark, path).renameColumn("k", "label")
    LakeWriter.write(
      Seq((200L, "k200", 0)).toDF("id", "label", "bucket"), path)
    LakeTable.forPath(spark, path).restoreTo(preRename)
    val t = LakeTable.forPath(spark, path)
    // old logical name back, post-rename append gone, data readable
    assert(t.toDF.columns.toSeq === Seq("id", "k", "bucket"))
    assert(t.toDF.count() === 100L)
    assert(t.toDF.filter($"k" === "k7").count() === 1L)
    // the restored mapping is the pre-rename one (no stale override)
    assert(!ColumnMapping.overrides(t.snapshot().metadata).contains("label"))
    // and the table keeps working: rename again post-restore
    t.renameColumn("k", "tag")
    assert(LakeTable.forPath(spark, path).toDF
      .filter($"tag" === "k7").count() === 1L)
  }

  test("CDF range spanning a rename conforms via physical identity") {
    val path = mappedTable("cm17")
    LakeTable.forPath(spark, path).delete("id = 5")            // v2 CDC
    LakeTable.forPath(spark, path).renameColumn("k", "label")  // v3
    LakeTable.forPath(spark, path).delete("id = 7")            // v4 CDC
    val ch = LakeTable.forPath(spark, path).changes(2, 4)
    assert(ch.columns.contains("label") && !ch.columns.contains("k"))
    // the PRE-rename change's value must ride into the current name,
    // not null out (the CDC file stores the old logical name; the
    // stable physical name is the bridge)
    val got = ch.filter($"_change_type" === "delete")
      .select("id", "label").as[(Long, String)].collect().toMap
    assert(got === Map(5L -> "k5", 7L -> "k7"), got)
    // a bounded read BEFORE the rename keeps that version's own name
    val pre = LakeTable.forPath(spark, path).changes(2, 2)
    assert(pre.columns.contains("k"))
    assert(pre.filter($"_change_type" === "delete")
      .select("k").as[String].head() === "k5")
  }

  test("two concurrent renames of different columns both land") {
    val path = mappedTable("cm16")
    // both threads read the same snapshot; the commit loser retries
    // and must COMPOSE with the winner's metadata (a stale re-emit
    // would silently revert one rename)
    val t1 = new Thread(() =>
      LakeTable.forPath(spark, path).renameColumn("k", "label"))
    val t2 = new Thread(() =>
      LakeTable.forPath(spark, path).renameColumn("bucket", "cell"))
    t1.start(); t2.start(); t1.join(); t2.join()
    val cols = LakeTable.forPath(spark, path).toDF.columns.toSet
    assert(cols === Set("id", "label", "cell"), cols)
    assert(LakeTable.forPath(spark, path).toDF
      .filter($"label" === "k3").select("cell").as[Int].head() === 3)
  }

  test("append under the pre-rename name is rejected, not misfiled") {
    val path = mappedTable("cm15")
    LakeTable.forPath(spark, path).renameColumn("k", "label")
    // a writer still using the old logical name must fail schema
    // enforcement (the column set no longer matches) — silently
    // accepting it would bind "k" to a NEW physical slot and split
    // the logical column across files
    intercept[SchemaMismatchException] {
      LakeWriter.write(
        Seq((500L, "k500", 5)).toDF("id", "k", "bucket"), path)
    }
    assert(LakeTable.forPath(spark, path).toDF.count() === 100L)
    // the new name lands and reads back through the stable physical
    LakeWriter.write(
      Seq((500L, "k500", 5)).toDF("id", "label", "bucket"), path)
    assert(LakeTable.forPath(spark, path).toDF
      .filter($"id" === 500L).select("label").as[String].head() === "k500")
  }

  test("repeated renames chase the same physical name; swap-safe") {
    val path = mappedTable("cm10")
    LakeTable.forPath(spark, path).renameColumn("k", "a")
    LakeTable.forPath(spark, path).renameColumn("a", "b")
    // swap: rename id→k (k is free), then b→id, exercising the
    // one-projection physical rename (chained renames would collide)
    LakeTable.forPath(spark, path).renameColumn("id", "k")
    LakeTable.forPath(spark, path).renameColumn("b", "id")
    val t = LakeTable.forPath(spark, path)
    assert(t.toDF.columns.toSet === Set("k", "id", "bucket"))
    // "id" now holds the ORIGINAL k strings; "k" the original ids
    assert(t.toDF.filter($"k" === 7L).select("id").as[String].head() === "k7")
    // a write through the swapped names lands correctly
    LakeWriter.write(Seq((999L, "k999", 3))
      .toDF("k", "id", "bucket"), path)
    assert(LakeTable.forPath(spark, path).toDF
      .filter($"k" === 999L).select("id").as[String].head() === "k999")
  }

  test("instrumented race: MERGE loses loudly to a concurrent RENAME; " +
      "CDC names stay correct") {
    // ADVICE r8's medium scenario, driven end-to-end: a MERGE stages
    // its rewrite under the read snapshot's mapping epoch; a mapped
    // RENAME COLUMN lands between the merge's read and its publish.
    // The instrumented store fires the rename exactly at the merge's
    // first commit PUT — the merge MUST abort on the metadata-change
    // rule (silently committing would publish files whose physical
    // columns belong to the old epoch), and a rerun under the new
    // names must produce CDC with the NEW logical column names.
    val path = mappedTable("cmrace")
    LakeTable.forPath(spark, path).setTblProperties(
      Map(LakeTable.PROP_ENABLE_CDF -> "true"))
    val logDir = java.nio.file.Paths
      .get(path, LakeLog.LOG_DIR).toAbsolutePath
    val prev = LogStore.current
    @volatile var armed = true
    val hook = new LogStore {
      private def maybeFire(target: java.nio.file.Path): Unit = {
        val name = target.getFileName.toString
        if (armed && target.toAbsolutePath.startsWith(logDir) &&
            name.endsWith(".json") && !name.contains("checkpoint")) {
          armed = false // the rename's own commits delegate plainly
          LakeTable.forPath(spark, path).renameColumn("k", "label")
        }
      }
      override def putIfAbsent(t: java.nio.file.Path,
          lines: Seq[String]): Unit = {
        maybeFire(t); prev.putIfAbsent(t, lines)
      }
      override def atomicReplace(t: java.nio.file.Path,
          lines: Seq[String]): Unit = prev.atomicReplace(t, lines)
      override def listDir(d: java.nio.file.Path): Seq[java.nio.file.Path] =
        prev.listDir(d)
      override def readLines(p: java.nio.file.Path): Seq[String] =
        prev.readLines(p)
      override def exists(p: java.nio.file.Path): Boolean = prev.exists(p)
      override def delete(p: java.nio.file.Path): Boolean = prev.delete(p)
    }
    val src = Seq((3L, "updated3"), (101L, "new101"))
      .toDF("id", "newk")
    LogStore.current = hook
    val ex =
      try intercept[ConflictingCommitException] {
        LakeTable.forPath(spark, path).as("t")
          .merge(src.as("s"), "t.id = s.id")
          .whenMatchedUpdate(Map("k" -> "s.newk"))
          .whenNotMatchedInsert(Map(
            "id" -> "s.id", "k" -> "s.newk", "bucket" -> "0"))
          .execute()
      } finally LogStore.current = prev
    assert(ex.getMessage.contains("metadata"),
      s"merge must lose on the metadata-change rule, got: ${ex.getMessage}")
    assert(!armed, "the instrumented rename never fired")

    // the rename WON: new logical schema, merge's effects absent
    val t = LakeTable.forPath(spark, path)
    assert(t.toDF.columns.toSeq === Seq("id", "label", "bucket"))
    assert(t.toDF.filter($"id" === 3L).select("label").as[String].head()
      === "k3")
    assert(t.toDF.count() === 100L)

    // rerun under the new name: succeeds, and the change feed speaks
    // the NEW logical vocabulary (physical identity underneath)
    val renameV = t.snapshot().version
    t.as("t").merge(src.as("s"), "t.id = s.id")
      .whenMatchedUpdate(Map("label" -> "s.newk"))
      .whenNotMatchedInsert(Map(
        "id" -> "s.id", "label" -> "s.newk", "bucket" -> "0"))
      .execute()
    val cdc = t.changes(renameV + 1)
    assert(cdc.columns.contains("label") && !cdc.columns.contains("k"))
    // MERGE commits use the read-time CDF diff (no staged cdc files),
    // where an update reads as delete(old image) + insert(new image):
    // 2 inserts (updated row + fresh row), 1 delete (pre-image)
    val byType = cdc.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType("insert") === 2L)
    assert(byType("delete") === 1L)
    assert(cdc.filter($"_change_type" === "insert")
      .select("label").as[String].collect().toSet ===
      Set("updated3", "new101"))
    assert(cdc.filter($"_change_type" === "delete")
      .select("label").as[String].head() === "k3")
  }
}

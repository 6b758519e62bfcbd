package graft.lake

import graft.SparkSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions.col

/** TBLPROPERTIES (Delta parity): stored on the Metadata action,
  * committed like any schema change, and the `graft.*` namespace is
  * HONORED — per-table vacuum retention and the change-data-feed
  * toggle actually change engine behavior.
  */
class LakeTblPropertiesSuite extends SparkSuite {
  import spark.implicits._

  private def seed = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "k")

  test("SET/UNSET/SHOW TBLPROPERTIES round-trip through SQL") {
    val path = tablePath("props-sql")
    LakeWriter.write(seed.coalesce(1), path)
    LakeSql.sql(spark, s"CREATE TABLE props_t USING lake LOCATION '$path'")
    LakeSql.sql(spark, "ALTER TABLE props_t SET TBLPROPERTIES " +
      "('team.owner'='data-eng', 'graft.deletedFileRetentionHours'='720')")
    val shown = LakeSql.sql(spark, "SHOW TBLPROPERTIES props_t")
      .as[(String, String)].collect().toMap
    assert(shown === Map("team.owner" -> "data-eng",
      "graft.deletedFileRetentionHours" -> "720"))
    // DESCRIBE DETAIL carries them too
    val detail = LakeSql.sql(spark, "DESCRIBE DETAIL props_t")
      .select("properties").as[Seq[String]].head()
    assert(detail === Seq("graft.deletedFileRetentionHours=720",
      "team.owner=data-eng"))
    LakeSql.sql(spark,
      "ALTER TABLE props_t UNSET TBLPROPERTIES ('team.owner')")
    assert(LakeTable.forPath(spark, path).tblProperties ===
      Map("graft.deletedFileRetentionHours" -> "720"))
    // properties survive a fresh snapshot read and show in history
    val ops = LakeTable.forPath(spark, path).history()
      .select("operation").as[String].collect().toSet
    assert(ops.contains("SET TBLPROPERTIES") &&
      ops.contains("UNSET TBLPROPERTIES"))
    LakeCatalog.drop(spark, "props_t")
  }

  test("unknown or malformed graft.* properties are rejected") {
    val path = tablePath("props-bad")
    LakeWriter.write(seed.coalesce(1), path)
    val t = LakeTable.forPath(spark, path)
    intercept[IllegalArgumentException] {
      t.setTblProperties(Map("graft.enableChangeDataFed" -> "true")) // typo
    }
    intercept[IllegalArgumentException] {
      t.setTblProperties(Map("graft.deletedFileRetentionHours" -> "-3"))
    }
    intercept[IllegalArgumentException] {
      t.setTblProperties(Map("graft.enableChangeDataFeed" -> "maybe"))
    }
    // nothing was committed by the failures
    assert(t.tblProperties.isEmpty)
  }

  test("vacuum honors the per-table retention property as default AND floor") {
    val path = tablePath("props-vac")
    LakeWriter.write(seed.coalesce(1), path) // v0
    val fileA = LakeWriter.walkParquet(Paths.get(path)).head
    LakeTable.forPath(spark, path).delete("id >= 1") // v1 tombstones fileA
    Files.setLastModifiedTime(fileA,
      java.nio.file.attribute.FileTime.fromMillis(1000L))
    // without the property, the no-arg vacuum uses the 168 h default:
    // the tombstone is in-window, nothing is deleted, and an explicit
    // short retention trips the guard (check stays ENABLED throughout)
    assert(LakeTable.forPath(spark, path).vacuum().isEmpty)
    intercept[IllegalArgumentException](
      LakeTable.forPath(spark, path).vacuum(0.0))
    // the table owner opts THIS table into short retention
    LakeTable.forPath(spark, path).setTblProperties(
      Map(LakeTable.PROP_RETENTION_HOURS -> "0"))
    val deleted = LakeTable.forPath(spark, path).vacuum()
    assert(deleted.nonEmpty && !Files.exists(fileA))
    // and the vacuumed version now fails loudly, as always
    intercept[IllegalStateException](
      LakeTable.forPath(spark, path).asOf(0).collect())
  }

  test("create-time properties: set at v0, loud on mismatch, DML honors") {
    val path = tablePath("props-create")
    LakeWriter.write(seed.coalesce(1), path,
      properties = Map(LakeTable.PROP_ENABLE_CDF -> "false",
        "team.owner" -> "ingest"))
    val t = LakeTable.forPath(spark, path)
    assert(t.tblProperties === Map(
      LakeTable.PROP_ENABLE_CDF -> "false", "team.owner" -> "ingest"))
    // matching properties on a later write are fine (idempotent create)
    LakeWriter.write(seed.coalesce(1), path,
      properties = Map(LakeTable.PROP_ENABLE_CDF -> "false"))
    // conflicting or new properties on an existing table fail loudly
    val e = intercept[IllegalArgumentException] {
      LakeWriter.write(seed.coalesce(1), path,
        properties = Map(LakeTable.PROP_ENABLE_CDF -> "true"))
    }
    assert(e.getMessage.contains("setTblProperties"))
    intercept[IllegalArgumentException] {
      LakeWriter.write(seed.coalesce(1), path,
        properties = Map("team.area" -> "billing"))
    }
    // the honored semantics apply from creation: DML stages no CDC
    t.delete("id = 1")
    assert(!Files.list(Paths.get(path)).iterator().asScala
      .exists(_.getFileName.toString.startsWith("cdc-")))
    // unknown graft.* keys rejected at create too
    intercept[IllegalArgumentException] {
      LakeWriter.write(seed.coalesce(1), tablePath("props-create-bad"),
        properties = Map("graft.enableChangeDataFed" -> "false"))
    }
  }

  test("create-time properties ride format(\"lake\") writer options") {
    val path = tablePath("props-dsv1")
    seed.coalesce(1).write.format("lake")
      .option(LakeTable.PROP_ENABLE_CDF, "false")
      .option("team.owner", "stream")
      .save(path)
    val props = LakeTable.forPath(spark, path).tblProperties
    // only graft.* options are table properties; generic writer
    // options (team.owner is not a graft key) must NOT leak in
    assert(props === Map(LakeTable.PROP_ENABLE_CDF -> "false"))
  }

  test("graft.appendOnly rejects row-removing ops, allows appends") {
    val path = tablePath("props-ao")
    LakeWriter.write(seed.coalesce(1), path,
      properties = Map(LakeTable.PROP_APPEND_ONLY -> "true"))
    val t = LakeTable.forPath(spark, path)
    // appends and insert-only merges stay legal
    LakeWriter.write(Seq((4L, "d")).toDF("id", "k"), path)
    t.as("t").merge(Seq((9L, "z")).toDF("id", "k").as("s"),
        "t.id = s.id")
      .whenNotMatchedInsertAll().execute()
    assert(t.toDF.count() === 5L)
    intercept[UnsupportedOperationException] { t.delete("id = 1") }
    intercept[UnsupportedOperationException] {
      t.update("id = 1", Map("k" -> "'x'")) }
    intercept[UnsupportedOperationException] {
      t.as("t").merge(seed.as("s"), "t.id = s.id")
        .whenMatchedDelete().execute()
    }
    intercept[UnsupportedOperationException] {
      LakeWriter.write(seed, path, mode = "overwrite")
    }
    // nothing was mutated by the rejected ops
    assert(t.toDF.count() === 5L)
    // unset makes it mutable again
    t.unsetTblProperties(Seq(LakeTable.PROP_APPEND_ONLY))
    t.delete("id = 1")
    assert(t.toDF.count() === 4L)
  }

  test("graft.autoOptimize.autoCompact compacts touched partitions") {
    val path = tablePath("props-ac")
    val rows = (1L to 100L).map(i => (i, s"p${i % 2}")).toDF("id", "p")
    LakeWriter.write(rows.repartition(4), path,
      partitionBy = Seq("p"),
      properties = Map(
        LakeTable.PROP_AUTO_COMPACT -> "true",
        LakeTable.PROP_AUTO_COMPACT_MIN_FILES -> "4"))
    val t = LakeTable.forPath(spark, path)
    // 4 tasks x 2 partitions = 8 small files >= 4 per partition ->
    // compaction fired on the same write
    val snap = t.snapshot()
    assert(snap.files.size === 2,
      s"auto compact left ${snap.files.size} files, want 1/partition")
    assert(t.toDF.count() === 100L)
    val ops = t.history().select("operation")
      .as[String].collect()
    assert(ops.contains("OPTIMIZE"))
    // a small append below the threshold does NOT trigger another pass
    LakeWriter.write(Seq((101L, "p0")).toDF("id", "p"), path)
    assert(LakeTable.forPath(spark, path).snapshot().files.size === 3)
  }

  test("graft.optimizeWrite coalesces appends toward one bin per " +
      "partition value") {
    val rows = (1L to 200L).map(i => (i, s"p${i % 2}")).toDF("id", "p")
    // trickle shape, partitioned: 16 writer tasks × 2 partition values
    // must NOT become 32 files — the rebalance bins them to 2
    val path = tablePath("props-ow")
    LakeWriter.write(rows.repartition(16), path, partitionBy = Seq("p"),
      properties = Map(LakeTable.PROP_OPTIMIZE_WRITE -> "true"))
    assert(LakeTable.forPath(spark, path).snapshot().files.size === 2)
    // unpartitioned (the streaming-sink shape): one file per commit
    val upath = tablePath("props-ow-unpart")
    LakeWriter.write(rows.drop("p").repartition(16), upath,
      properties = Map(LakeTable.PROP_OPTIMIZE_WRITE -> "true"))
    assert(LakeTable.forPath(spark, upath).snapshot().files.size === 1)
    // steady state: 5 more trickle appends stay 1 file per append,
    // never numShufflePartitions files
    (1 to 5).foreach { i =>
      LakeWriter.write(Seq(1000L + i).toDF("id").repartition(8), upath)
    }
    assert(LakeTable.forPath(spark, upath).snapshot().files.size === 6)
    // counterfactual: without the property the same append splinters
    val cpath = tablePath("props-ow-off")
    LakeWriter.write(rows.drop("p").repartition(16), cpath)
    assert(LakeTable.forPath(spark, cpath).snapshot().files.size > 1)
  }

  test("graft.optimizeWrite governs DML rewrite output; clustered " +
      "OPTIMIZE layout is exempt") {
    val path = tablePath("props-ow-dml")
    val rows = (1L to 4000L).map(i => (i, i % 7)).toDF("id", "v")
    LakeWriter.write(rows.repartition(8), path,
      properties = Map(LakeTable.PROP_OPTIMIZE_WRITE -> "true"))
    val t = LakeTable.forPath(spark, path)
    assert(t.snapshot().files.size === 1)
    // a rewrite DML's kept rows pass the same choke point: the
    // rewrite must not splinter the touched file into
    // shuffle-partition-many outputs
    t.delete("id % 2 = 0")
    assert(t.snapshot().files.size === 1,
      s"DELETE splintered to ${t.snapshot().files.size} files")
    assert(t.toDF.count() === 2000L)
    t.update("id < 100", Map("v" -> "v + 1"))
    assert(t.snapshot().files.size <= 2)
    assert(t.toDF.where("id < 100 AND id % 2 = 1").count() === 50L)
    // clustered OPTIMIZE under the same property keeps its range+sort
    // layout (a rebalance would shuffle the sort away): after
    // clustering, a narrow filter must still prune to a file subset
    val cpath = tablePath("props-ow-cluster")
    val shuffled = new scala.util.Random(5)
      .shuffle((0L until 20000L).toList).toDF("id")
    LakeWriter.write(shuffled.repartition(8), cpath,
      properties = Map(LakeTable.PROP_OPTIMIZE_WRITE -> "true",
        LakeTable.PROP_TARGET_FILE_SIZE -> (1024L * 1024).toString))
    val ct = LakeTable.forPath(spark, cpath)
    ct.compactClustered(Seq("id"),
      targetFileBytes = math.max(1024L, ct.snapshot().sizeInBytes / 8))
    val files = ct.snapshot().files
    assert(files.size >= 4, s"clustering produced ${files.size} files")
    // range-disjoint layout ⟺ a 5% range hits ≤ 2 files' stat spans
    val lo = "1000"; val hi = "2000"
    val hit = files.count(f =>
      f.minValues.get("id").exists(_.toLong < hi.toLong) &&
        f.maxValues.get("id").exists(_.toLong >= lo.toLong))
    assert(hit <= 2, s"narrow range spans $hit of ${files.size} files " +
      "— optimizeWrite rebalance destroyed the clustered sort")
  }

  test("graft.optimizeWrite splits an oversized write toward " +
      "graft.targetFileSize") {
    val path = tablePath("props-ow-split")
    // ~9 MB of incompressible-ish payload (hex digests) against a
    // 1 MiB target: the single input partition must split across
    // several writer tasks/files, not funnel into one giant file
    val big = spark.range(0, 60000).select(col("id"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.md5(col("id").cast("string")),
        org.apache.spark.sql.functions.sha2(col("id").cast("string"), 256),
        org.apache.spark.sql.functions.sha2(
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit("s"),
            col("id").cast("string")), 512)
      ).as("payload"))
    LakeWriter.write(big.coalesce(1), path,
      properties = Map(
        LakeTable.PROP_OPTIMIZE_WRITE -> "true",
        LakeTable.PROP_TARGET_FILE_SIZE -> (1024L * 1024).toString))
    val files = LakeTable.forPath(spark, path).snapshot().files
    assert(files.size > 1,
      s"a write many× the 1 MiB target stayed ${files.size} file(s)")
    assert(LakeTable.forPath(spark, path).toDF.count() === 60000L)
    // a malformed size is rejected up front, not stored-and-ignored
    intercept[IllegalArgumentException] {
      LakeTable.validateProperties(
        Map(LakeTable.PROP_TARGET_FILE_SIZE -> "1000"))
    }
  }

  test("generated columns: computed when omitted, checked when supplied") {
    val path = tablePath("props-gen")
    val events = Seq((1L, "2024-03-05 10:00:00"), (2L, "2024-03-06 11:30:00"))
      .toDF("id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    LakeWriter.write(events, path, partitionBy = Seq("p_date"),
      properties = Map(
        LakeTable.PROP_GENERATED_PREFIX + "p_date" -> "CAST(ts AS DATE)"))
    val t = LakeTable.forPath(spark, path)
    // the generated partition column landed in the schema, computed
    assert(t.snapshot().schema.fieldNames.toSeq ===
      Seq("id", "ts", "p_date"))
    assert(t.toDF.select("p_date").as[java.sql.Date].collect().map(_.toString)
      .sorted === Array("2024-03-05", "2024-03-06"))
    // a write SUPPLYING a consistent value passes
    LakeWriter.write(
      Seq((3L, "2024-03-07 09:00:00", "2024-03-07"))
        .toDF("id", "ts", "p_date")
        .select(col("id"), col("ts").cast("timestamp"),
          col("p_date").cast("date")), path)
    assert(t.toDF.count() === 3L)
    // a divergent supplied value is a constraint violation
    intercept[ConstraintViolationException] {
      LakeWriter.write(
        Seq((4L, "2024-03-08 09:00:00", "2099-01-01"))
          .toDF("id", "ts", "p_date")
          .select(col("id"), col("ts").cast("timestamp"),
            col("p_date").cast("date")), path)
    }
    assert(t.toDF.count() === 3L)
    // malformed generation expression rejected up front
    intercept[Exception] {
      LakeWriter.write(events, tablePath("props-gen-bad"),
        properties = Map(
          LakeTable.PROP_GENERATED_PREFIX + "x" -> "CAST(("))
    }
  }

  test("properties survive a mergeSchema evolution write") {
    val path = tablePath("props-evolve")
    LakeWriter.write(seed.coalesce(1), path)
    LakeTable.forPath(spark, path).setTblProperties(
      Map("team.owner" -> "data-eng",
        LakeTable.PROP_RETENTION_HOURS -> "720"))
    // evolution rewrites the Metadata action — properties must ride it
    LakeWriter.write(Seq((4L, "d", 1.5)).toDF("id", "k", "extra"),
      path, mergeSchema = true)
    val t = LakeTable.forPath(spark, path)
    assert(t.snapshot().schema.fieldNames.contains("extra"))
    assert(t.tblProperties === Map("team.owner" -> "data-eng",
      LakeTable.PROP_RETENTION_HOURS -> "720"))
  }

  test("graft.optimizeWrite pre-shuffles partitioned appends") {
    val path = tablePath("props-ow")
    val rows = (1L to 100L).map(i => (i, s"p${i % 2}")).toDF("id", "p")
    LakeWriter.write(rows.repartition(8), path, partitionBy = Seq("p"))
    // baseline: 8 tasks x 2 partition values -> many small files
    val before = LakeTable.forPath(spark, path).snapshot().files.size
    assert(before > 2, s"expected a small-file explosion, got $before")
    LakeTable.forPath(spark, path).setTblProperties(
      Map(LakeTable.PROP_OPTIMIZE_WRITE -> "true"))
    LakeWriter.write(rows.repartition(8), path)
    val snap = LakeTable.forPath(spark, path).snapshot()
    val added = snap.files.size - before
    // the pre-shuffle routes each partition value to ONE task
    assert(added === 2, s"optimizeWrite appended $added files, want 2")
    assert(LakeTable.forPath(spark, path).toDF.count() === 200L)
  }

  test("graft.clusterBy: plain OPTIMIZE re-clusters on the stored columns") {
    val path = tablePath("props-clusterby")
    // 8 files, each spanning the FULL key range — worst case for
    // min/max skipping before clustering
    (1 to 8).foreach { i =>
      LakeWriter.write(
        spark.range(0, 800).select(
          (col("id") * 7 % 800).as("k"),
          col("id").as("v")).coalesce(1), path)
    }
    val t = LakeTable.forPath(spark, path)
    t.setTblProperties(Map(LakeTable.PROP_CLUSTER_BY -> "k"))
    LakeSql.sql(spark, s"OPTIMIZE `$path`")
    // the OPTIMIZE commit must record the property-driven clustering
    val hist = t.history().select("operation", "operationParameters")
      .collect()
    val opt = hist.find(_.getString(0) == "OPTIMIZE").get
      .getMap[String, String](1)
    assert(opt("clusterBy") === "k")
    assert(opt("zOrder") === "false")
    // content unchanged
    assert(t.toDF.count() === 6400)
    // multi-column policy interleaves (Z-order) by default
    t.setTblProperties(Map(LakeTable.PROP_CLUSTER_BY -> "k, v"))
    LakeSql.sql(spark, s"OPTIMIZE `$path`")
    val opt2 = t.history().select("operation", "operationParameters")
      .collect().find(_.getString(0) == "OPTIMIZE").get
      .getMap[String, String](1)
    assert(opt2("clusterBy") === "k,v")
    assert(opt2("zOrder") === "true")
    // clustering quality itself (narrow min/max slices) is pinned by
    // the Z-ORDER scan-gate tests; this test pins the POLICY plumbing
  }

  test("graft.enableChangeDataFeed=false: DML persists no CDC, CDF falls back") {
    val path = tablePath("props-nocdf")
    LakeWriter.write(seed.coalesce(1), path) // v0
    LakeTable.forPath(spark, path).setTblProperties(
      Map(LakeTable.PROP_ENABLE_CDF -> "false")) // v1
    LakeTable.forPath(spark, path).update("id = 2", Map("k" -> "'B'")) // v2
    LakeTable.forPath(spark, path).delete("id = 3") // v3
    LakeTable.forPath(spark, path).as("t")
      .merge(Seq((1L, "A"), (9L, "i")).toDF("id", "nk").as("s"), "t.id = s.id")
      .whenMatchedUpdate(Map("k" -> "s.nk"))
      .whenNotMatchedInsert(Map("id" -> "s.id", "k" -> "s.nk"))
      .execute() // v4
    // no change-data files anywhere: neither on disk nor in the log
    assert(!Files.exists(Paths.get(path, "_change_data")))
    val log = new LakeLog(path)
    (0L to log.latestVersion).foreach { v =>
      assert(!log.readVersion(v).exists(_.isInstanceOf[CdcFile]),
        s"version $v carries cdc files despite CDF off")
    }
    // changes() still answers, via the read-time diff fallback
    val ch = LakeTable.forPath(spark, path).changes(2, 4)
      .select("id", "k", "_change_type").as[(Long, String, String)]
      .collect().toSet
    assert(ch === Set(
      (2L, "b", "delete"), (2L, "B", "insert"),   // update v2
      (3L, "c", "delete"),                         // delete v3
      (1L, "a", "delete"), (1L, "A", "insert"),    // merge update v4
      (9L, "i", "insert")))                        // merge insert v4
    // table state is right
    assert(LakeTable.forPath(spark, path).toDF
      .as[(Long, String)].collect().toSet ===
      Set((1L, "A"), (2L, "B"), (9L, "i")))
  }
}

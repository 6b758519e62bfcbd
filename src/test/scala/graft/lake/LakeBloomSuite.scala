package graft.lake

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Bloom-filter index ([[BloomIndex]]): per-file sidecars built at
  * write time, whole-file skipping applied executor-side at scan time
  * ([[graft.sources.BloomParquetFileFormat]]). The skip must be a
  * pure optimization — every test asserts result equality against an
  * unindexed read first, then the skip count.
  */
class LakeBloomSuite extends SparkSuite {
  import spark.implicits._

  private val BLOOM_PROPS = Map(
    BloomIndex.PROP_COLUMNS -> "id",
    // small per-file cardinality: size the filters to the test data
    BloomIndex.PROP_NUM_ITEMS -> "10000")

  /** Rows 0..n-1 hash-scattered over `files` files, so every file
    * spans the full id range and min/max stats can prune NOTHING —
    * exactly the shape where only a bloom can skip.
    */
  private def writeScattered(path: String, n: Int, files: Int): Unit =
    LakeWriter.write(
      spark.range(n.toLong).select(col("id"),
        concat(lit("payload-"), col("id")).as("s"))
        .repartition(files, col("id")),
      path, properties = BLOOM_PROPS)

  private def skipsDuring[A](body: => A): (A, Long) = {
    val before = BloomIndex.skippedFiles.get()
    val result = body
    (result, BloomIndex.skippedFiles.get() - before)
  }

  test("writes attach bloom sidecars; point lookup skips files") {
    val path = tablePath("bloom-basic")
    writeScattered(path, 5000, 8)
    val snap = new LakeLog(path).snapshot()
    assert(snap.files.size === 8)
    assert(snap.files.forall(_.bloomPath.isDefined),
      "every AddFile should carry a bloom sidecar")
    snap.files.flatMap(_.bloomPath).foreach { rel =>
      assert(rel.startsWith(BloomIndex.DIR + "/"))
      assert(Files.exists(Paths.get(path, rel)), s"sidecar missing: $rel")
    }

    val t = LakeTable.forPath(spark, path)
    val (rows, skipped) =
      skipsDuring(t.toDF.filter(col("id") === 4321L).collect())
    assert(rows.map(_.getLong(0)).toSeq === Seq(4321L))
    // one file holds the needle; of the other 7 each skips unless a
    // ~1% false positive keeps it — require most of them gone
    assert(skipped >= 5, s"expected >=5 of 7 prunable files skipped, " +
      s"got $skipped")

    // IN-list: only files containing NEITHER value may be skipped
    val (inRows, inSkipped) = skipsDuring(
      t.toDF.filter(col("id").isin(7L, 4999L)).as[(Long, String)]
        .collect().sortBy(_._1))
    assert(inRows.map(_._1).toSeq === Seq(7L, 4999L))
    assert(inSkipped >= 1)
  }

  test("filters on unindexed columns and non-equality shapes skip nothing") {
    val path = tablePath("bloom-shapes")
    writeScattered(path, 2000, 4)
    val t = LakeTable.forPath(spark, path)
    val (n1, s1) = skipsDuring(
      t.toDF.filter(col("s") === "payload-7").count())
    assert(n1 === 1L && s1 === 0L)
    val (n2, s2) = skipsDuring(t.toDF.filter(col("id") > 1990L).count())
    assert(n2 === 9L && s2 === 0L)
    // disjunction across columns cannot use the conjunct rule
    val (n3, s3) = skipsDuring(t.toDF
      .filter(col("id") === 5L || col("s") === "payload-9").count())
    assert(n3 === 2L && s3 === 0L)
  }

  test("skipping stays correct under DV deletes (conservative bloom)") {
    val path = tablePath("bloom-dv")
    LakeWriter.write(
      spark.range(3000L).select(col("id"),
        concat(lit("p"), col("id")).as("s")).repartition(6, col("id")),
      path, properties = BLOOM_PROPS + (LakeTable.PROP_ENABLE_DV -> "true"))
    val t = LakeTable.forPath(spark, path)
    t.delete("id = 1234")
    val snap = new LakeLog(path).snapshot()
    // the DV re-add keeps the file's sidecar: deletion never adds values
    assert(snap.files.exists(f => f.dvPath.isDefined && f.bloomPath.isDefined))

    // deleted needle: the bloom still CONTAINS 1234 (conservative), so
    // its file is opened and the DV filter drops the row
    assert(t.toDF.filter(col("id") === 1234L).count() === 0L)
    // a surviving neighbor still reads back, with skipping active
    val (rows, skipped) =
      skipsDuring(t.toDF.filter(col("id") === 1233L).collect())
    assert(rows.map(_.getLong(0)).toSeq === Seq(1233L))
    assert(skipped >= 3)
  }

  test("rewrites rebuild sidecars; vacuum keeps live ones, sweeps dead") {
    val path = tablePath("bloom-vacuum")
    writeScattered(path, 2000, 4)
    val sidecarsV0 = new LakeLog(path).snapshot()
      .files.flatMap(_.bloomPath).toSet
    val t = LakeTable.forPath(spark, path)
    t.delete("id < 500") // CoW rewrite: new files, new sidecars
    val snap1 = new LakeLog(path).snapshot()
    val sidecarsV1 = snap1.files.flatMap(_.bloomPath).toSet
    assert(snap1.files.forall(_.bloomPath.isDefined))
    assert((sidecarsV1 -- sidecarsV0).nonEmpty,
      "rewritten files must carry fresh sidecars")

    spark.conf.set(LakeTable.RETENTION_CHECK_KEY, "false")
    try {
      t.vacuum(retentionHours = 0.0)
      // live sidecars survive (the ADVICE finding: vacuum's live set
      // must include bloomPath); superseded v0 sidecars are swept
      sidecarsV1.foreach(rel =>
        assert(Files.exists(Paths.get(path, rel)),
          s"vacuum deleted a LIVE bloom sidecar: $rel"))
      (sidecarsV0 -- sidecarsV1).foreach(rel =>
        assert(!Files.exists(Paths.get(path, rel)),
          s"vacuum kept a dead bloom sidecar: $rel"))
    } finally spark.conf.unset(LakeTable.RETENTION_CHECK_KEY)

    // post-vacuum reads still skip and still answer correctly
    val (rows, skipped) =
      skipsDuring(t.toDF.filter(col("id") === 1500L).collect())
    assert(rows.map(_.getLong(0)).toSeq === Seq(1500L))
    assert(skipped >= 1)
  }

  test("column mapping: lookups skip through a rename") {
    val path = tablePath("bloom-mapped")
    LakeWriter.write(
      spark.range(2000L).select(col("id"),
        concat(lit("p"), col("id")).as("s")).repartition(4, col("id")),
      path, properties = BLOOM_PROPS +
        (ColumnMapping.MODE_PROP -> "name"))
    val t = LakeTable.forPath(spark, path)
    t.renameColumn("id", "doc_id")
    // the index follows the LOGICAL name config; the sidecars store
    // physical names and the scan translates before matching
    val t2 = LakeTable.forPath(spark, path)
    val (rows, skipped) =
      skipsDuring(t2.toDF.filter(col("doc_id") === 42L).collect())
    assert(rows.map(_.getLong(0)).toSeq === Seq(42L))
    assert(skipped >= 2)
  }

  test("all-removes DML on a bloom table commits (empty staging guard)") {
    val path = tablePath("bloom-empty")
    writeScattered(path, 100, 2)
    val t = LakeTable.forPath(spark, path)
    t.delete("id >= 0") // kept frame is empty: zero staged part files
    assert(t.toDF.count() === 0L)
  }

  test("type matrix: date, timestamp, and decimal keys skip files") {
    // values normalize through BloomIndex.canonical (epoch days /
    // epoch micros / scale-stripped decimal string), so the write-side
    // Row form and the read-side pushed-literal form must meet in the
    // same hash. Hash-scattered layout: every file spans the full
    // range of every key column, min/max stats prune nothing, and the
    // needles are interior — only the bloom can skip.
    val path = tablePath("bloom-types")
    LakeWriter.write(
      spark.range(4000L).select(
        col("id"),
        expr("date_add(date'2020-01-01', CAST(id AS INT))").as("d"),
        expr("timestamp'2020-01-01 00:00:00' + " +
          "make_interval(0, 0, 0, 0, 0, 0, id)").as("ts"),
        expr("CAST(id * 1.25 AS DECIMAL(12,2))").as("dec"))
        .repartition(8, col("id")),
      path, properties = Map(
        BloomIndex.PROP_COLUMNS -> "d,ts,dec",
        BloomIndex.PROP_NUM_ITEMS -> "10000"))
    val t = LakeTable.forPath(spark, path)
    assert(t.snapshot().files.forall(_.bloomPath.isDefined))

    // interior needles for row id = 2345
    val dNeedle = java.sql.Date.valueOf(
      java.time.LocalDate.of(2020, 1, 1).plusDays(2345))
    val tsNeedle = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2020, 1, 1, 0, 0, 0).plusSeconds(2345))
    val decNeedle = new java.math.BigDecimal("2931.25") // 2345 * 1.25

    val (dRows, dSkip) =
      skipsDuring(t.toDF.filter(col("d") === dNeedle).collect())
    assert(dRows.map(_.getLong(0)).toSeq === Seq(2345L))
    assert(dSkip >= 5, s"date lookup skipped only $dSkip of 8 files")

    val (tsRows, tsSkip) =
      skipsDuring(t.toDF.filter(col("ts") === tsNeedle).collect())
    assert(tsRows.map(_.getLong(0)).toSeq === Seq(2345L))
    assert(tsSkip >= 5, s"timestamp lookup skipped only $tsSkip of 8")

    val (decRows, decSkip) =
      skipsDuring(t.toDF.filter(col("dec") === decNeedle).collect())
    assert(decRows.map(_.getLong(0)).toSeq === Seq(2345L))
    assert(decSkip >= 5, s"decimal lookup skipped only $decSkip of 8")

    // scale variants of the same decimal VALUE hash identically:
    // an equality written with extra trailing zeros must still match
    // (and therefore must NOT skip the needle's own file)
    val padded = t.toDF.filter(
      col("dec") === new java.math.BigDecimal("2931.2500")).collect()
    assert(padded.map(_.getLong(0)).toSeq === Seq(2345L))

    // floats remain out: configuring one still fails loudly
    val e = intercept[IllegalArgumentException] {
      LakeWriter.write(
        spark.range(10L).select(col("id"),
          col("id").cast("double").as("x")),
        tablePath("bloom-float"),
        properties = Map(BloomIndex.PROP_COLUMNS -> "x"))
    }
    assert(e.getMessage.contains("unsupported type"))
  }

  test("java.time literal forms and TIMESTAMP_NTZ hash like java.sql") {
    // spark.sql.datetime.java8API.enabled changes the EXTERNAL form
    // of pushed filter literals (LocalDate/Instant instead of
    // java.sql.Date/Timestamp); the canonical encoding must make both
    // meet the sidecar the write side built. NTZ keys always arrive
    // as LocalDateTime.
    val path = tablePath("bloom-java8")
    LakeWriter.write(
      spark.range(4000L).select(
        col("id"),
        expr("date_add(date'2020-01-01', CAST(id AS INT))").as("d"),
        expr("timestamp'2020-01-01 00:00:00' + " +
          "make_interval(0, 0, 0, 0, 0, 0, id)").as("ts"),
        expr("CAST(timestamp_ntz'2020-01-01 00:00:00' + " +
          "make_interval(0, 0, 0, 0, 0, 0, id) AS TIMESTAMP_NTZ)")
          .as("tsn"))
        .repartition(8, col("id")),
      path, properties = Map(
        BloomIndex.PROP_COLUMNS -> "d,ts,tsn",
        BloomIndex.PROP_NUM_ITEMS -> "10000"))

    val ns = spark.newSession()
    ns.conf.set("spark.sql.datetime.java8API.enabled", "true")
    val t = ns.read.format("lake").load(path)
    val base = java.time.LocalDateTime.of(2020, 1, 1, 0, 0, 0)

    val (dRows, dSkip) = skipsDuring(t.filter(
      col("d") === java.time.LocalDate.of(2020, 1, 1).plusDays(2345))
      .collect())
    assert(dRows.map(_.getLong(0)).toSeq === Seq(2345L))
    assert(dSkip >= 5, s"LocalDate lookup skipped only $dSkip of 8")

    val (tsRows, tsSkip) = skipsDuring(t.filter(
      col("ts") === base.plusSeconds(2345)
        .atZone(java.time.ZoneOffset.UTC).toInstant).collect())
    assert(tsRows.map(_.getLong(0)).toSeq === Seq(2345L))
    assert(tsSkip >= 5, s"Instant lookup skipped only $tsSkip of 8")

    val (ntzRows, ntzSkip) = skipsDuring(t.filter(
      col("tsn") === base.plusSeconds(2345)).collect())
    assert(ntzRows.map(_.getLong(0)).toSeq === Seq(2345L))
    assert(ntzSkip >= 5, s"NTZ lookup skipped only $ntzSkip of 8")
  }

  test("unknown configured column fails the write loudly") {
    val path = tablePath("bloom-typo")
    val e = intercept[IllegalArgumentException] {
      LakeWriter.write(Seq((1L, "a")).toDF("id", "s"), path,
        properties = Map(BloomIndex.PROP_COLUMNS -> "id_typo"))
    }
    assert(e.getMessage.contains("id_typo"))
  }

  test("property validation accepts bloom knobs, rejects bad values") {
    val path = tablePath("bloom-props")
    writeScattered(path, 10, 1)
    val t = LakeTable.forPath(spark, path)
    intercept[IllegalArgumentException] {
      t.setTblProperties(Map(BloomIndex.PROP_FPP -> "1.5"))
    }
    intercept[IllegalArgumentException] {
      t.setTblProperties(Map(BloomIndex.PROP_NUM_ITEMS -> "-3"))
    }
    t.setTblProperties(Map(BloomIndex.PROP_FPP -> "0.05"))
    assert(new LakeLog(path).snapshot().metadata
      .properties(BloomIndex.PROP_FPP) === "0.05")
  }

  test("rebuildBloomIndexes backfills existing files without rewriting") {
    val path = tablePath("bloom-backfill")
    // table predates the index: no bloom config at write time
    LakeWriter.write(
      spark.range(4000L).select(col("id"),
        concat(lit("p"), col("id")).as("s")).repartition(8, col("id")),
      path)
    val t = LakeTable.forPath(spark, path)
    assert(t.snapshot().files.forall(_.bloomPath.isEmpty))
    val filesBefore = t.snapshot().files.map(f => (f.path, f.size)).toSet

    t.setTblProperties(Map(
      BloomIndex.PROP_COLUMNS -> "id",
      BloomIndex.PROP_NUM_ITEMS -> "10000"))
    assert(LakeTable.forPath(spark, path).rebuildBloomIndexes() === 8)
    val after = LakeTable.forPath(spark, path)
    val snap = after.snapshot()
    assert(snap.files.forall(_.bloomPath.isDefined))
    // metadata-only: not one data file rewritten
    assert(snap.files.map(f => (f.path, f.size)).toSet === filesBefore)
    // the backfilled index actually skips
    val (rows, skipped) =
      skipsDuring(after.toDF.filter(col("id") === 2345L).collect())
    assert(rows.map(_.getLong(0)).toSeq === Seq(2345L))
    assert(skipped >= 5)
    // idempotent: everything covered now
    assert(after.rebuildBloomIndexes() === 0)
  }

  test("backfill covers a shallow clone's absolute-path files") {
    // A shallow clone's AddFiles reference the SOURCE table's data
    // files by absolute path. buildSidecars keys its result by
    // relativized scan path, so a raw f.path lookup silently skipped
    // every cloned file: the backfill wrote sidecars, then committed
    // nothing (returning 0 as if all were covered) and orphaned them.
    val srcPath = tablePath("bloom-clone-src")
    LakeWriter.write(
      spark.range(4000L).select(col("id"),
        concat(lit("p"), col("id")).as("s")).repartition(8, col("id")),
      srcPath)
    val clonePath = tablePath("bloom-clone-dst")
    val clone = LakeTable.forPath(spark, srcPath).shallowCloneTo(clonePath)
    assert(clone.snapshot().files.forall(_.path.startsWith("/")),
      "fixture broken: shallow clone must reference files absolutely")

    clone.setTblProperties(Map(
      BloomIndex.PROP_COLUMNS -> "id",
      BloomIndex.PROP_NUM_ITEMS -> "10000"))
    val indexed = LakeTable.forPath(spark, clonePath).rebuildBloomIndexes()
    assert(indexed === 8, s"backfill indexed $indexed of 8 cloned files")
    val after = LakeTable.forPath(spark, clonePath)
    assert(after.snapshot().files.forall(_.bloomPath.isDefined))
    // cloned data files untouched; sidecars live under the CLONE
    assert(after.snapshot().files.forall(_.path.startsWith("/")))
    // the backfilled index skips on the clone's scan path
    val (rows, skipped) =
      skipsDuring(after.toDF.filter(col("id") === 2345L).collect())
    assert(rows.map(_.getLong(0)).toSeq === Seq(2345L))
    assert(skipped >= 5)
    // idempotent second pass: everything covered
    assert(after.rebuildBloomIndexes() === 0)
  }

  test("backfill across schema evolution: pre-evolution files skip entirely") {
    val path = tablePath("bloom-backfill-evo")
    LakeWriter.write(
      spark.range(500L).select(col("id"),
        concat(lit("p"), col("id")).as("s")).repartition(2, col("id")),
      path)
    // evolution adds s2; only the second write's files carry it
    LakeWriter.write(
      spark.range(500L, 1000L).select(col("id"),
        concat(lit("p"), col("id")).as("s"),
        concat(lit("x"), col("id")).as("s2")).repartition(2, col("id")),
      path, mergeSchema = true)
    val t = LakeTable.forPath(spark, path)
    t.setTblProperties(Map(
      BloomIndex.PROP_COLUMNS -> "s2",
      BloomIndex.PROP_NUM_ITEMS -> "10000"))
    assert(LakeTable.forPath(spark, path).rebuildBloomIndexes() === 4)
    val after = LakeTable.forPath(spark, path)
    // pre-evolution files hold NO s2 values: their blooms are empty,
    // so an s2 needle opens only post-evolution files
    val (rows, skipped) =
      skipsDuring(after.toDF.filter(col("s2") === "x777").collect())
    assert(rows.map(_.getLong(0)).toSeq === Seq(777L))
    assert(skipped >= 2, s"pre-evolution files not skipped ($skipped)")
  }

  test("SQL: CREATE BLOOMFILTER INDEX backfills; DROP strips and stops") {
    val path = tablePath("bloom-sql")
    LakeWriter.write(
      spark.range(2000L).select(col("id"),
        concat(lit("p"), col("id")).as("s")).repartition(4, col("id")),
      path)
    LakeSql.sql(spark,
      s"CREATE BLOOMFILTER INDEX ON TABLE `$path` FOR COLUMNS (id) " +
        "OPTIONS (fpp = 0.02, numItems = 10000)")
    val snap = new LakeLog(path).snapshot()
    assert(snap.files.forall(_.bloomPath.isDefined),
      "CREATE must backfill existing files")
    assert(snap.metadata.properties(BloomIndex.PROP_FPP) === "0.02")
    val t = LakeTable.forPath(spark, path)
    val (rows, skipped) =
      skipsDuring(t.toDF.filter(col("id") === 1234L).collect())
    assert(rows.map(_.getLong(0)).toSeq === Seq(1234L))
    assert(skipped >= 2)

    LakeSql.sql(spark, s"DROP BLOOMFILTER INDEX ON TABLE `$path`")
    val snap2 = new LakeLog(path).snapshot()
    assert(snap2.files.forall(_.bloomPath.isEmpty),
      "DROP must strip bloomPath from every live file")
    assert(!snap2.metadata.properties.contains(BloomIndex.PROP_COLUMNS))
    // reads stop skipping, results unchanged
    val (rows2, skipped2) =
      skipsDuring(LakeTable.forPath(spark, path).toDF
        .filter(col("id") === 1234L).collect())
    assert(rows2.map(_.getLong(0)).toSeq === Seq(1234L))
    assert(skipped2 === 0L)
    // the orphaned sidecars are now vacuum-able debris
    spark.conf.set(LakeTable.RETENTION_CHECK_KEY, "false")
    try {
      LakeTable.forPath(spark, path).vacuum(retentionHours = 0.0)
      val bloomDir = Paths.get(path, BloomIndex.DIR)
      assert(!Files.exists(bloomDir) || {
        val l = Files.list(bloomDir)
        try !l.iterator().hasNext finally l.close()
      }, "dropped sidecars must be vacuumed")
    } finally spark.conf.unset(LakeTable.RETENTION_CHECK_KEY)
  }

  test("partition-scoped backfill indexes only the named partition") {
    val path = tablePath("bloom-backfill-scoped")
    LakeWriter.write(
      spark.range(1000L).select(col("id"),
        (col("id") % 2 === 0).cast("string").as("p")),
      path, partitionBy = Seq("p"))
    LakeTable.forPath(spark, path).setTblProperties(
      Map(BloomIndex.PROP_COLUMNS -> "id"))
    val t = LakeTable.forPath(spark, path)
    val scoped = t.rebuildBloomIndexes(Some("p = 'true'"))
    assert(scoped > 0)
    val snap = new LakeLog(path).snapshot()
    assert(snap.files.filter(_.partitionValues("p") == "true")
      .forall(_.bloomPath.isDefined))
    assert(snap.files.filter(_.partitionValues("p") == "false")
      .forall(_.bloomPath.isEmpty),
      "out-of-scope partition must stay un-indexed")
    // the remainder picks up on an unscoped pass
    assert(LakeTable.forPath(spark, path).rebuildBloomIndexes() > 0)
    assert(new LakeLog(path).snapshot()
      .files.forall(_.bloomPath.isDefined))
    // non-partition predicates are rejected loudly (scopeFiles rule)
    intercept[IllegalArgumentException] {
      LakeTable.forPath(spark, path)
        .rebuildBloomIndexes(Some("id = 1"))
    }
  }

  test("bloom build/drop commits are invisible to CDF and streams") {
    // a backfill RE-ADDS every live file with no RemoveFile; row-level
    // readers must not misread that as a whole-table insert (the
    // pre-fix behavior: changes() doubled the table, a stream
    // re-delivered it)
    val path = tablePath("bloom-cdf")
    LakeWriter.write(spark.range(100L).select(col("id"))
      .coalesce(2), path) // v0: no bloom config
    LakeTable.forPath(spark, path).setTblProperties(
      Map(BloomIndex.PROP_COLUMNS -> "id"))                // v1
    assert(LakeTable.forPath(spark, path).rebuildBloomIndexes() === 2) // v2
    LakeWriter.write(spark.range(100L, 150L).select(col("id"))
      .coalesce(1), path)                                  // v3
    LakeTable.forPath(spark, path).dropBloomIndexes()      // v4 + v5

    val t = LakeTable.forPath(spark, path)
    // change feed: only the two real appends, nothing from v2/v5
    val cdf = t.changes(0)
    assert(cdf.count() === 150L)
    assert(cdf.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap === Map("insert" -> 150L))

    // stream from scratch: version replay crosses the backfill and
    // drop commits; exactly the 150 appended rows arrive
    val out = tmpDir("bloom-cdf-sink")
    val q = spark.readStream.format("lake").load(path)
      .writeStream.format("parquet")
      .option("checkpointLocation", s"$out/ckpt")
      .option("path", s"$out/data")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.read.parquet(s"$out/data").count() === 150L,
      "bloom metadata commits must not re-deliver rows to streams")
  }

  test("backfill loses loudly to a concurrent rewrite; sidecars swept") {
    val path = tablePath("bloom-backfill-race")
    writeScattered(path, 1000, 4)
    // strip the index config trick: table was created WITH bloom
    // props, so drop them and the sidecars to get a clean un-indexed
    // table, then re-enable for the raced backfill
    LakeTable.forPath(spark, path).dropBloomIndexes()
    LakeTable.forPath(spark, path).setTblProperties(
      Map(BloomIndex.PROP_COLUMNS -> "id"))
    val logDir = java.nio.file.Paths
      .get(path, LakeLog.LOG_DIR).toAbsolutePath
    // dropBloomIndexes above orphaned v0's sidecars (they await
    // vacuum); account for them so the post-race assertion isolates
    // what the BACKFILL left behind
    def onDiskSidecars(): Set[String] = {
      val bloomDir = Paths.get(path, BloomIndex.DIR)
      if (!Files.exists(bloomDir)) Set.empty
      else {
        val l = Files.list(bloomDir)
        try l.iterator().asScala
          .map(p => s"${BloomIndex.DIR}/${p.getFileName}").toSet
        finally l.close()
      }
    }
    val orphansBefore = onDiskSidecars()
    val prev = LogStore.current
    @volatile var armed = true
    LogStore.current = new LogStore {
      override def putIfAbsent(t: java.nio.file.Path,
          lines: Seq[String]): Unit = {
        val n = t.getFileName.toString
        if (armed && t.toAbsolutePath.startsWith(logDir) &&
            n.endsWith(".json") && !n.contains("checkpoint")) {
          armed = false
          // a rewrite DELETE lands between the backfill's snapshot
          // and its commit, removing files it wants to re-add
          LakeTable.forPath(spark, path).delete("id < 500")
        }
        prev.putIfAbsent(t, lines)
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
    try {
      intercept[ConflictingCommitException] {
        LakeTable.forPath(spark, path).rebuildBloomIndexes()
      }
    } finally LogStore.current = prev
    assert(!armed, "the instrumented delete never fired")
    // the aborted backfill swept its sidecars — its only products.
    // (The concurrent DELETE's rewrite legitimately built sidecars of
    // its own — bloom config was live — and the pre-race drop's
    // orphans legitimately await vacuum; the assertion is that the
    // backfill added NOTHING to the unreferenced set.)
    val live = new LakeLog(path).snapshot()
      .files.flatMap(_.bloomPath).toSet
    val unreferenced = onDiskSidecars() -- live
    assert(unreferenced === orphansBefore,
      s"aborted backfill left unreferenced sidecars: " +
        s"${unreferenced -- orphansBefore}")
    // data intact (the delete won) — and since the delete's rewrite
    // ran with bloom config live, its output files already carry
    // sidecars: the table is fully indexed and a fresh backfill
    // correctly finds nothing to do
    val t = LakeTable.forPath(spark, path)
    assert(t.toDF.count() === 500L)
    assert(t.snapshot().files.forall(_.bloomPath.isDefined))
    assert(t.rebuildBloomIndexes() === 0)
  }

  test("large file-count maps ride the broadcast payload path") {
    val prev = PathMapPayload.BROADCAST_MIN_ENTRIES
    PathMapPayload.BROADCAST_MIN_ENTRIES = 2 // force broadcast
    try {
      val path = tablePath("bloom-broadcast")
      writeScattered(path, 1000, 5)
      val t = LakeTable.forPath(spark, path)
      val (rows, skipped) =
        skipsDuring(t.toDF.filter(col("id") === 77L).collect())
      assert(rows.map(_.getLong(0)).toSeq === Seq(77L))
      assert(skipped >= 2)
    } finally PathMapPayload.BROADCAST_MIN_ENTRIES = prev
  }
}

package graft.lake

import graft.SparkSuite
import graft.sources.{LakeDataSource, LakeFileIndex}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference,
  EqualTo, GreaterThan, Literal}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.types.{LongType, StringType}

/** The `format("lake")` DataSource (SURVEY §7.1 upgrade path): reads
  * plan through the log-backed FileIndex (no driver-side path list) so
  * partition pruning and min/max data skipping happen in the planner
  * for every read path, including plain `toDF`.
  */
class LakeDataSourceSuite extends SparkSuite {
  import spark.implicits._

  /** numFiles actually selected by the scan of `df`'s plan. */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // force execution so the final plan + metrics exist
    val plan = df.queryExecution.executedPlan
    val finalPlan = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    finalPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f.metrics("numFiles").value
    }.sum
  }

  test("format(\"lake\") read matches toDF; versionAsOf time-travels") {
    val path = tablePath("dsv2read")
    LakeWriter.write((1L to 100L).toDF("id").coalesce(1), path)
    LakeWriter.write((101L to 200L).toDF("id").coalesce(1), path)

    val viaFormat = spark.read.format("lake").load(path)
    assert(viaFormat.count() === 200L)
    assert(viaFormat.schema === LakeTable.forPath(spark, path).toDF.schema)

    val v0 = spark.read.format("lake").option("versionAsOf", "0").load(path)
    assert(v0.count() === 100L)
    assert(v0.agg(org.apache.spark.sql.functions.max("id"))
      .as[Long].head() === 100L)

    // timestampAsOf resolves the commit at-or-before the timestamp
    val v0time = new LakeLog(path).readVersion(0)
      .collectFirst { case c: CommitInfo => c.timestamp }.get
    val byTs = spark.read.format("lake")
      .option("timestampAsOf", new java.sql.Timestamp(v0time).toString)
      .load(path)
    assert(byTs.count() === 100L)
  }

  test("write options txnAppId/txnVersion make batch writes idempotent") {
    val path = tablePath("dsv2txn")
    def writeOnce(batch: Long): Unit =
      Seq(batch * 10).toDF("id").write.format("lake").mode("append")
        .option("txnAppId", "loader").option("txnVersion", batch.toString)
        .save(path)
    writeOnce(1)
    writeOnce(1) // replay of the same (appId, version): skipped
    writeOnce(2)
    assert(LakeTable.forPath(spark, path).toDF.count() === 2L)
    assert(LakeTable.forPath(spark, path)
      .snapshot().transactions.get("loader").contains(2L))
  }

  test("format(\"lake\") write: append, overwrite, partitionBy") {
    val path = tablePath("dsv2write")
    Seq((1L, "a"), (2L, "b")).toDF("id", "p")
      .write.format("lake").partitionBy("p").save(path)
    val t = LakeTable.forPath(spark, path)
    assert(t.snapshot().partitionColumns === Seq("p"))
    assert(t.toDF.count() === 2L)

    Seq((3L, "a")).toDF("id", "p")
      .write.format("lake").mode("append").save(path)
    assert(LakeTable.forPath(spark, path).toDF.count() === 3L)

    Seq((9L, "z")).toDF("id", "p")
      .write.format("lake").mode("overwrite").save(path)
    val after = LakeTable.forPath(spark, path)
    assert(after.toDF.count() === 1L)
    assert(after.snapshot().partitionColumns === Seq("p"))
    // old versions still time-travelable
    assert(after.asOf(1).count() === 3L)
  }

  test("min/max data skipping prunes files inside the planner (toDF)") {
    val path = tablePath("dsv2skip")
    // two files with disjoint id ranges
    LakeWriter.write((1L to 100L).toDF("id").coalesce(1), path)
    LakeWriter.write((101L to 200L).toDF("id").coalesce(1), path)
    val t = LakeTable.forPath(spark, path)
    assert(t.snapshot().numFiles === 2)

    assert(scannedFiles(t.toDF.where("id > 150")) === 1L)
    assert(scannedFiles(t.toDF.where("id <= 100")) === 1L)
    assert(scannedFiles(t.toDF) === 2L)
    // and the pruned scan still returns the right rows
    assert(t.toDF.where("id > 150").count() === 50L)
  }

  test("min/max skipping prunes on DATE and TIMESTAMP columns") {
    // date stats are the parquet int32 days, timestamp stats the
    // int64 micros — both compare numerically against Catalyst's
    // internal literals, so range filters on datetime columns skip
    // whole files (the most common analytical filter shape)
    val path = tablePath("dsv2dateskip")
    def slice(lo: Int, hi: Int) =
      spark.range(lo.toLong, hi.toLong).select(
        $"id",
        org.apache.spark.sql.functions.expr(
          "date_add(date'2021-01-01', CAST(id AS INT))").as("d"),
        org.apache.spark.sql.functions.expr(
          "timestamp'2021-01-01 00:00:00' + " +
            "make_interval(0, 0, 0, 0, 0, 0, id * 60)").as("ts"),
        org.apache.spark.sql.functions.expr(
          "CAST(id * 1.25 AS DECIMAL(10,2))").as("dec"))
        .coalesce(1)
    LakeWriter.write(slice(0, 100), path)    // days 0-99
    LakeWriter.write(slice(100, 200), path)  // days 100-199
    val t = LakeTable.forPath(spark, path)
    assert(t.snapshot().numFiles === 2)

    val dLate = t.toDF.where("d > date'2021-04-20'") // day >= 110
    assert(scannedFiles(dLate) === 1L)
    assert(dLate.count() === 90L)
    assert(scannedFiles(t.toDF.where("d <= date'2021-02-01'")) === 1L)

    val tsLate = t.toDF.where(
      "ts >= timestamp'2021-01-01 02:00:00'") // minute 120+
    assert(scannedFiles(tsLate) === 1L)
    assert(tsLate.count() === 80L)
    // equality on an absent interior value still scans conservatively
    assert(t.toDF.where("d = date'2021-04-11'").count() === 1L)

    // int-backed DECIMAL stats record SCALED (unscaled 12345 must not
    // compare against literal 123.45): file 2 holds dec >= 125.00
    val decHigh = t.toDF.where("dec > 150.00")
    assert(scannedFiles(decHigh) === 1L)
    assert(decHigh.count() === 79L) // ids 121-199: 121*1.25 = 151.25
    assert(scannedFiles(t.toDF.where("dec <= 100.0")) === 1L)
  }

  test("partition pruning selects only matching partitions' files") {
    val path = tablePath("dsv2part")
    (1L to 90L).map(i => (i, s"p${i % 3}")).toDF("id", "p")
      .repartition(3, $"p").write.format("lake").partitionBy("p").save(path)
    val t = LakeTable.forPath(spark, path)
    val total = t.snapshot().numFiles
    assert(total >= 3)

    val pruned = scannedFiles(t.toDF.where("p = 'p1'"))
    assert(pruned < total)
    assert(t.toDF.where("p = 'p1'").count() === 30L)
  }

  test("LakeFileIndex.listFiles prunes directly on resolved predicates") {
    val path = tablePath("dsv2idx")
    LakeWriter.write((1L to 100L).toDF("id").coalesce(1), path)
    LakeWriter.write((101L to 200L).toDF("id").coalesce(1), path)
    val snap = LakeTable.forPath(spark, path).snapshot()
    val idx = new LakeFileIndex(spark, snap)

    val id = AttributeReference("id", LongType)()
    val hi = idx.listFiles(Nil, Seq(GreaterThan(id, Literal(150L))))
    assert(hi.flatMap(_.files).size === 1)
    val all = idx.listFiles(Nil, Nil)
    assert(all.flatMap(_.files).size === 2)
    assert(idx.sizeInBytes === snap.sizeInBytes)
  }

  test("Z-ORDER makes single-column filters skip files at scan time") {
    val path = tablePath("dsv2zorder")
    // shuffled 96x96 grid across 8 files: no column has locality, so
    // every file spans both full ranges
    val rnd = new scala.util.Random(7)
    val rows = rnd.shuffle(
      (0 until 96).flatMap(x => (0 until 96).map(y => (x.toLong, y.toLong))))
    LakeWriter.write(rows.toDF("x", "y").repartition(8), path)
    val t = LakeTable.forPath(spark, path)
    val before = t.snapshot().numFiles.toLong
    assert(before === 8L)
    // pre-OPTIMIZE: the selective y filter reads EVERY file
    assert(scannedFiles(t.toDF.where("y < 6")) === before)

    t.compactClustered(Seq("x", "y"),
      targetFileBytes = t.snapshot().sizeInBytes / 16, zOrder = true)
    val total = t.snapshot().numFiles.toLong
    assert(total >= 8L)
    // post-OPTIMIZE: the same filter — and one on x alone — reach the
    // parquet scan over a small fraction of the files (planner-side
    // skipping through LakeFileIndex, measured by scan metrics)
    val yScan = scannedFiles(t.toDF.where("y < 6"))
    val xScan = scannedFiles(t.toDF.where("x < 6"))
    assert(yScan * 2 <= total, s"y filter scanned $yScan/$total files")
    assert(xScan * 2 <= total, s"x filter scanned $xScan/$total files")
    // and the skipped scans still return exactly the right rows
    assert(t.toDF.where("y < 6").count() === 96L * 6L)
    assert(t.toDF.where("x < 6").count() === 96L * 6L)
  }

  test("INCREMENTAL OPTIMIZE rewrites O(new files) and keeps skipping " +
      "tight") {
    val path = tablePath("dsv2incr")
    val rnd = new scala.util.Random(11)
    import org.apache.spark.sql.functions.{md5, concat, sha2, col}
    // ~1.5 MB of payload behind gen 1 so it is STABLE against the
    // 1 MiB target (generation total >= target/2) — a real table's
    // clustered generations hold real data; only trickle debris folds
    def withPayload(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("payload", concat(
        md5(col("id").cast("string")),
        sha2(col("id").cast("string"), 256)))
    LakeWriter.write(
      withPayload(rnd.shuffle((0L until 20000L).toList).toDF("id"))
        .repartition(8), path,
      properties = Map(
        LakeTable.PROP_TARGET_FILE_SIZE -> (1024L * 1024).toString))
    val t = LakeTable.forPath(spark, path)
    // full clustering pass → one generation of range-disjoint files
    t.compactClustered(Seq("id"),
      targetFileBytes = math.max(64L * 1024,
        t.snapshot().sizeInBytes / 8))
    val gen1 = t.snapshot().files
    assert(gen1.forall(_.clusterGen.isDefined),
      "clustering OPTIMIZE must stamp a generation on its output")
    assert(gen1.map(_.size).sum >= 512L * 1024,
      "fixture too small for a stable generation — grow the payload")
    val gen1Paths = gen1.map(_.path).toSet
    // a trickle append lands unclustered (no generation)
    LakeWriter.write(
      withPayload(rnd.shuffle((20000L until 21000L).toList).toDF("id"))
        .coalesce(1), path)
    assert(t.snapshot().files.exists(_.clusterGen.isEmpty))
    // INCREMENTAL: rewritten set = the new file ONLY — yesterday's
    // stable layout is never re-sorted to admit today's 5 %
    t.compactClustered(Seq("id"), incremental = true)
    val after = t.snapshot().files
    assert(gen1Paths.subsetOf(after.map(_.path).toSet),
      "incremental OPTIMIZE rewrote a stable generation")
    assert(after.size === gen1.size + 1)
    assert(after.forall(_.clusterGen.isDefined))
    // skipping quality holds: each generation is internally disjoint,
    // so a narrow range opens at most one file per generation
    val scan = scannedFiles(t.toDF.where("id >= 500 AND id < 600"))
    assert(scan <= 2, s"narrow range scanned $scan files")
    assert(t.toDF.where("id >= 500 AND id < 600").count() === 100L)
    assert(t.toDF.count() === 21000L)
    // a second INCREMENTAL with nothing new is a no-op commit-wise
    val v = t.snapshot().version
    t.compactClustered(Seq("id"), incremental = true)
    assert(t.snapshot().version === v,
      "incremental OPTIMIZE with no unclustered files must not commit")
    // SQL surface: INCREMENTAL keyword parses and routes; the
    // clusterGen tag round-trips the JSON log (snapshot re-read);
    // and the prior trickle GENERATION — sub-half-target debris —
    // FOLDS into this run instead of accumulating (bounded
    // generation count, the liquid minCubeSize posture)
    LakeWriter.write(withPayload(Seq(30000L).toDF("id")), path)
    LakeSql.sql(spark, s"OPTIMIZE `$path` BY (id) INCREMENTAL")
    Snapshot.clearCacheForTest()
    val again = LakeTable.forPath(spark, path).snapshot().files
    assert(again.forall(_.clusterGen.isDefined))
    assert(gen1Paths.subsetOf(again.map(_.path).toSet))
    assert(again.size === gen1.size + 1,
      s"trickle generations accumulated: ${again.size - gen1.size} " +
        "extra files — unstable generations must fold")
    // plain compaction has no generations to skip — loud, not silent
    intercept[IllegalArgumentException] {
      LakeSql.sql(spark, s"OPTIMIZE `$path` INCREMENTAL")
    }
  }

  test("QuantileBucket binary search matches the when-ladder semantics") {
    // the O(bits) bucket expression must agree with the reference
    // ladder (count of boundaries STRICTLY below) on boundary-equal
    // values, out-of-range values, and nulls (→ bucket 0 at the
    // Z-order call site via coalesce)
    import org.apache.spark.sql.functions.{coalesce, lit, when, col}
    val bounds = Array(10.0, 20.0, 30.0)
    val vals: Seq[java.lang.Double] =
      Seq(5.0, 10.0, 10.5, 20.0, 25.0, 30.0, 35.0, null)
    val df = vals.toDF("v")
    val ladder = bounds.foldLeft(lit(0L)) { (acc, b) =>
      acc + when(col("v") > lit(b), 1L).otherwise(0L)
    }
    val fast = coalesce(graft.functions.QuantileBucket(col("v"), bounds),
      lit(0L))
    val rows = df.select(ladder.as("ladder"), fast.as("fast"))
      .collect()
    rows.zip(vals).foreach { case (r, v) =>
      assert(r.getLong(0) === r.getLong(1), s"mismatch for value $v")
    }
    // expected absolute buckets: strictly-below counts
    assert(df.select(fast).as[Long].collect() ===
      Array(0L, 0L, 1L, 1L, 2L, 2L, 3L, 0L))
  }

  test("ZORDER BY accepts more than 10 columns (adaptive bit width)") {
    val path = tablePath("dsv2zwide")
    val cols = (0 until 12).map(i => s"c$i")
    val df = spark.range(0, 256).select(
      cols.map(c => (org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("id") *
          (cols.indexOf(c) + 17), org.apache.spark.sql.functions.lit(97L)))
        .as(c)): _*)
    LakeWriter.write(df.repartition(4), path)
    val t = LakeTable.forPath(spark, path)
    // 12 clustered columns: bits adapts to 62/12 = 5 instead of the
    // require(6*12 <= 62) failure
    t.compactClustered(cols,
      targetFileBytes = t.snapshot().sizeInBytes / 4, zOrder = true)
    assert(t.toDF.count() === 256L)
    assert(t.history().select("operationParameters").head()
      .getMap[String, String](0).get("zOrder").contains("true"))
  }

  test("format(\"lake\") applies deletion vectors — no resurrection") {
    // the external read path returns a bare relation (no DataFrame
    // filter can attach), so DVs must apply INSIDE the scan via
    // DvParquetFileFormat; before round 11 this path resurrected
    // every soft-deleted row. Bloom sidecars coexist: the DV format
    // extends the skipping format.
    val path = tablePath("dsv2dvread")
    LakeWriter.write(
      spark.range(1000L).select($"id",
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("p"), $"id").as("s"))
        .repartition(4, $"id"),
      path, properties = Map(
        "graft.enableDeletionVectors" -> "true",
        BloomIndex.PROP_COLUMNS -> "id",
        BloomIndex.PROP_NUM_ITEMS -> "10000"))
    LakeTable.forPath(spark, path).delete("id % 5 = 0")

    val viaFormat = spark.read.format("lake").load(path)
    val viaTable = LakeTable.forPath(spark, path).toDF
    assert(viaFormat.count() === 800L)
    assert(viaFormat.where("id % 5 = 0").count() === 0L,
      "deleted rows resurrected through format(\"lake\")")
    // row-identical to the toDF path, values included
    assert(viaFormat.orderBy("id").collect().toSeq ===
      viaTable.orderBy("id").collect().toSeq)
    // filters + DV filtering compose
    assert(viaFormat.where("id > 500").count() ===
      viaTable.where("id > 500").count())
    // bloom point lookup still skips on the DV-carrying snapshot
    assert(viaFormat.where("id = 123").count() === 1L)
    assert(viaFormat.where("id = 120").count() === 0L) // deleted
    // time travel to the pre-delete version sees every row
    assert(spark.read.format("lake").option("versionAsOf", "0")
      .load(path).count() === 1000L)

    // a query that itself asks for _metadata.row_index shares the
    // temporary column with the DV filter (no duplicate request):
    // surviving rows keep their PHYSICAL file indexes
    val withIdx = viaFormat
      .select($"id",
        org.apache.spark.sql.functions.col("_metadata.row_index")
          .as("ri"))
    assert(withIdx.count() === 800L)
    assert(withIdx.where("id % 5 = 0").count() === 0L)
    // physical indexes: unique per file, within the file's row count
    val pairs = viaFormat.select(
      org.apache.spark.sql.functions.col("_metadata.file_path").as("f"),
      org.apache.spark.sql.functions.col("_metadata.row_index").as("ri"))
      .as[(String, Long)].collect()
    assert(pairs.length === 800)
    assert(pairs.distinct.length === 800, "duplicate (file, row_index)")
    assert(pairs.forall { case (_, r) => r >= 0 && r < 1000 })
  }

  test("DV row indexes stay exact across row groups under pushdown") {
    // the in-scan DV filter keys on the parquet row index, which must
    // stay PHYSICAL (file-absolute) even when predicate pushdown
    // skips whole row groups; a reader that renumbered surviving
    // groups from zero would delete the wrong rows. Forced multi-row-
    // group layout: tiny parquet block size, one file.
    val path = tablePath("dsv2dvgroups")
    val df = spark.range(200000L).select($"id",
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("payload-padding-"),
        $"id").as("s")).coalesce(1)
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    hc.set("parquet.block.size", "65536")
    try LakeWriter.write(df, path,
      properties = Map("graft.enableDeletionVectors" -> "true"))
    finally {
      if (prevBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prevBlock)
    }
    // sanity: the single file really has several row groups
    val dataFile = LakeTable.forPath(spark, path).snapshot().files.head
    val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(
          LakeLog.resolveFile(path, dataFile.path).toString),
        spark.sparkContext.hadoopConfiguration))
    val nGroups = try footer.getFooter.getBlocks.size finally footer.close()
    assert(nGroups >= 3, s"fixture needs several row groups, got $nGroups")

    LakeTable.forPath(spark, path).delete("id % 1000 = 0") // 200 rows
    val t = spark.read.format("lake").load(path)
    assert(t.count() === 199800L)
    // selective pushed range lands in LATE row groups: the row
    // indexes the DV filter sees must still be file-absolute
    val late = t.where("id >= 150000 AND id < 160000")
    assert(late.count() === 10000L - 10L)
    assert(late.where("id % 1000 = 0").count() === 0L)
    // and the surviving values are exactly the undeleted ids
    assert(late.agg(org.apache.spark.sql.functions.sum("id"))
      .head().getLong(0) ===
      (150000L until 160000L).filter(_ % 1000 != 0).sum)
  }

  test("DV read on a PARTITIONED table keeps partition values") {
    // regression: DvParquetFileFormat's strip projection truncated at
    // requiredSchema.length, dropping the partition columns the base
    // reader appends AFTER the row-index column — downstream read the
    // partition ordinals off the narrower UnsafeRow as garbage bytes.
    // Unpartitioned DV tables never hit it.
    val path = tablePath("dsv2dvpartread")
    (0 until 4).foreach { i =>
      LakeWriter.write(
        Seq.tabulate(3)(j => (i * 3L + j, s"row${i * 3 + j}", i % 2))
          .toDF("id", "name", "p").coalesce(1),
        path, partitionBy = if (i == 0) Seq("p") else Nil,
        properties = if (i == 0)
          Map("graft.enableDeletionVectors" -> "true") else Map.empty)
    }
    LakeTable.forPath(spark, path).delete("id % 3 = 1")
    val rows = spark.read.format("lake").load(path)
      .orderBy("id").collect().toSeq
    assert(rows.map(_.getLong(0)) === (0L until 12L).filter(_ % 3 != 1))
    assert(rows.forall(r => r.getInt(2) === (r.getLong(0) / 3 % 2).toInt),
      s"partition values corrupted: $rows")
    // projecting ONLY the partition column survives too
    assert(spark.read.format("lake").load(path)
      .where("p = 1").count() === 4L)
  }

  test("COUNT(*) answers from log metadata without scanning files") {
    import org.apache.spark.sql.functions.{count, lit}
    val path = tablePath("dsv2metacount")
    LakeWriter.write((1L to 500L).toDF("id").repartition(4), path,
      properties = Map("graft.enableDeletionVectors" -> "true"))
    // DV delete: live rows = numRecords - dvCardinality per file
    LakeTable.forPath(spark, path).delete("id <= 100")

    val q = spark.read.format("lake").load(path)
      .agg(count(lit(1)).as("n"))
    assert(q.as[Long].head() === 400L)
    val scans = q.queryExecution.executedPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.isEmpty,
      s"metadata-only count still scanned: ${q.queryExecution.executedPlan}")
    // same through the .count() API shape
    assert(spark.read.format("lake").load(path).count() === 400L)

    // toDF (the engine-attached DV filter shape) is ALSO metadata-only:
    // the rule verifies the filter's file->DV map against the snapshot
    val tq = LakeTable.forPath(spark, path).toDF
      .agg(count(lit(1)).as("n"))
    assert(tq.as[Long].head() === 400L)
    assert(tq.queryExecution.executedPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f }.isEmpty,
      "toDF count on a DV table should be metadata-only")
    assert(LakeTable.forPath(spark, path).toDF.count() === 400L)

    // a FILTER stops the rewrite: the scan path answers, correctly
    val filtered = spark.read.format("lake").load(path).where("id > 300")
    assert(filtered.count() === 200L)
    assert(filtered.queryExecution.executedPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f }.nonEmpty,
      "filtered count must keep the scan")
    // grouped and distinct counts keep the scan too
    assert(spark.read.format("lake").load(path)
      .agg(org.apache.spark.sql.functions.countDistinct($"id"))
      .as[Long].head() === 400L)
  }

  test("rebuildStats backfills foreign entries; skipping + meta count") {
    import org.apache.spark.sql.functions.{count, lit}
    // a "legacy/foreign" log: real parquet files, AddFiles with NO
    // stats — min/max skipping and the metadata COUNT(*) rewrite are
    // both disabled until the stats backfill
    val path = tablePath("dsv2stats")
    (1L to 100L).toDF("id").coalesce(1)
      .write.parquet(s"$path/lo")
    (101L to 200L).toDF("id").coalesce(1)
      .write.parquet(s"$path/hi")
    val root = java.nio.file.Paths.get(path)
    val adds = LakeWriter.walkParquet(root).map { f =>
      AddFile(root.relativize(f).toString, Map.empty,
        java.nio.file.Files.size(f), -1L, Map.empty, Map.empty, Map.empty)
    }
    val log = new LakeLog(path)
    log.commit(0L, Seq(
      CommitInfo(System.currentTimeMillis(), "CONVERT", Map.empty),
      Metadata("id BIGINT", Nil, System.currentTimeMillis())) ++ adds)

    val before = spark.read.format("lake").load(path)
    assert(before.count() === 200L) // scan path (rule bails, correctly)
    assert(scannedFiles(before.where("id > 150")) === 2L,
      "no stats: nothing should prune yet")

    val t = LakeTable.forPath(spark, path)
    assert(t.rebuildStats() === 2)
    assert(t.rebuildStats() === 0) // idempotent
    val snap = LakeTable.forPath(spark, path).snapshot()
    assert(snap.files.forall(_.numRecords >= 0))

    val after = spark.read.format("lake").load(path)
    assert(scannedFiles(after.where("id > 150")) === 1L,
      "backfilled min/max stats should prune")
    val q = after.agg(count(lit(1)).as("n"))
    assert(q.as[Long].head() === 200L)
    assert(q.queryExecution.executedPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f }.isEmpty,
      "metadata-only count should fire once every file is counted")
    // the stats commit is metadata-only: the change feed skips it
    assert(t.changes(snap.version).count() === 0L)

    // SQL route: a second foreign table through ANALYZE TABLE
    val path2 = tablePath("dsv2stats-sql")
    (1L to 50L).toDF("id").coalesce(1).write.parquet(s"$path2/f")
    val root2 = java.nio.file.Paths.get(path2)
    val adds2 = LakeWriter.walkParquet(root2).map { f =>
      AddFile(root2.relativize(f).toString, Map.empty,
        java.nio.file.Files.size(f), -1L, Map.empty, Map.empty, Map.empty)
    }
    new LakeLog(path2).commit(0L, Seq(
      CommitInfo(System.currentTimeMillis(), "CONVERT", Map.empty),
      Metadata("id BIGINT", Nil, System.currentTimeMillis())) ++ adds2)
    LakeSql.sql(spark, s"ANALYZE TABLE `$path2` COMPUTE DELTA STATISTICS")
    assert(LakeTable.forPath(spark, path2).snapshot()
      .files.forall(_.numRecords >= 0))
  }

  test("null partition values (Hive sentinel) read back as null") {
    val path = tablePath("dsv2null")
    Seq((1L, "a"), (2L, null.asInstanceOf[String]))
      .toDF("id", "p").coalesce(1)
      .write.format("lake").partitionBy("p").save(path)
    val t = LakeTable.forPath(spark, path)
    val got = t.toDF.orderBy("id").select("p").as[String].collect()
    assert(got === Array("a", null))
    // IS NULL predicate finds the sentinel-partition file
    assert(t.toDF.where("p IS NULL").count() === 1L)
  }

  test("generated-column partition pruning: ts filters prune p_day") {
    // Delta's generated-column pruning rule: p_day is GENERATED AS
    // CAST(ts AS DATE) and is the partition column; filters on ts —
    // which the user actually writes — must prune p_day partitions
    // the query never mentions.
    val path = tablePath("genprune")
    val df = spark.range(600).select(
      $"id",
      org.apache.spark.sql.functions.expr(
        "timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, " +
          "CAST(id / 100 AS INT), 0, CAST(id % 100 AS INT), 0)")
        .as("ts")).coalesce(1)
    LakeWriter.write(df, path, partitionBy = Seq("p_day"),
      properties = Map("graft.generated.p_day" -> "CAST(ts AS DATE)"))
    val t = spark.read.format("lake").load(path)
    val total = scannedFiles(t)
    assert(total === 6L, s"expected one file per day, got $total")

    // equality on the SOURCE column: exactly one partition's file read
    val needle = java.sql.Timestamp.valueOf("2024-01-03 00:05:00")
    val eq = t.filter($"ts" === needle)
    assert(eq.count() === 1L)
    assert(scannedFiles(eq) === 1L, "ts equality should prune to one day")

    // range: only the two trailing days
    val range = t.filter(
      $"ts" >= java.sql.Timestamp.valueOf("2024-01-05 00:00:00"))
    assert(range.count() === 200L)
    assert(scannedFiles(range) === 2L)
    // strict < keeps the boundary partition (the cast collapses the
    // day; conservative closed bound) but prunes later days
    val lt = t.filter(
      $"ts" < java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))
    assert(lt.count() === 100L)
    assert(scannedFiles(lt) <= 2L)

    // IN on source timestamps across two days
    val in = t.filter($"ts".isin(
      java.sql.Timestamp.valueOf("2024-01-01 00:07:00"),
      java.sql.Timestamp.valueOf("2024-01-06 00:09:00")))
    assert(in.count() === 2L)
    assert(scannedFiles(in) === 2L)
  }

  test("string-cast generated columns derive NO range pruning " +
    "(lexicographic order is not date order)") {
    // p_day = CAST(src AS DATE) from a STRING source: string ordering
    // is lexicographic, so src > '2020-09-1' matches '2020-1-5' (char
    // '1' > '0' at position 5) even though it parses to an EARLIER
    // date. A derived p_day >= 2020-09-01 would wrongly prune that
    // row's partition — the monotone() allowlist must reject the
    // string→date cast so ranges on src derive nothing.
    val path = tablePath("genstrprune")
    val df = Seq(
      (1L, "2020-1-5"),   // parses to 2020-01-05; lexic. > '2020-09-1'
      (2L, "2020-09-1"),  // boundary value itself
      (3L, "2020-10-15"), // both orders agree
      (4L, "2019-12-31")  // both orders exclude
    ).toDF("id", "src").repartition(4, $"src")
    LakeWriter.write(df, path, partitionBy = Seq("p_day"),
      properties = Map("graft.generated.p_day" -> "CAST(src AS DATE)"))
    val t = spark.read.format("lake").load(path)
    val total = scannedFiles(t)
    assert(total === 4L)

    // lexicographic comparison on the source: ids 1 and 3 match.
    // The buggy string→date range derivation pruned the 2020-01-05
    // partition (its date < 2020-09-01) and lost id 1.
    val range = t.filter($"src" > "2020-09-1")
    assert(range.select("id").as[Long].collect().sorted === Array(1L, 3L))
    // min/max STRING stats legitimately prune the two files whose
    // lexicographic range can't match ('2019-12-31', '2020-09-1');
    // the derived-date bug would have dropped a third, leaving 1.
    assert(scannedFiles(t.filter($"src" > "2020-09-1")) === 2L)

    // equality derivation is still legal for any deterministic g
    val eq = t.filter($"src" === "2020-10-15")
    assert(eq.count() === 1L)
    assert(scannedFiles(t.filter($"src" === "2020-10-15")) === 1L)
  }

  test("narrowing numeric casts derive NO range pruning (wraparound)") {
    // p = CAST(src AS INT) from a LONG source narrows: values beyond
    // 2^31 wrap (non-ANSI cast), so the mapping is not
    // order-preserving: src = 2^32+5 lands in partition p = 5, yet the
    // buggy derivation turned `src > 500` into `p >= 500` and pruned
    // that row's partition. monotone() must reject long→int. The
    // wraparound row is written under a non-ANSI child session (ANSI
    // would throw on the overflow instead of wrapping).
    val ns = spark.newSession()
    ns.conf.set("spark.sql.ansi.enabled", "false")
    val path = tablePath("gennarrow")
    val df = {
      import ns.implicits._
      Seq((1L, 100L), (2L, (1L << 32) + 5L), (3L, 30000L))
        .toDF("id", "src").repartition(3, $"src")
    }
    LakeWriter.write(df, path, partitionBy = Seq("p"),
      properties = Map("graft.generated.p" -> "CAST(src AS INT)"))
    val t = spark.read.format("lake").load(path)
    assert(scannedFiles(t) === 3L)

    // the wrapped row (src = 2^32+5, partition p = 5) must survive a
    // range filter on src — the buggy p >= 500 derivation dropped it
    val range = t.filter($"src" > 500L)
    assert(range.select("id").as[Long].collect().sorted === Array(2L, 3L))
    // min/max LONG stats prune the src=100 file; nothing else may go
    assert(scannedFiles(t.filter($"src" > 500L)) === 2L)
    // equality (no monotonicity needed) still prunes to one file
    assert(scannedFiles(t.filter($"src" === 30000L)) === 1L)
  }

  test("property: derived pruning never drops rows (boundary sweep)") {
    // ScalaCheck sweep over boundary timestamps (epoch, pre-1970,
    // month/year edges, leap day) × comparison ops: the result of a
    // filter through generated-column pruning must equal the answer
    // computed in memory from the full data. Pruning bugs at scale are
    // silent wrong answers — this pins the planner rule's soundness.
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val path = tablePath("genpropsweep")
    val days = Seq("1969-12-28", "1969-12-31", "1970-01-01",
      "2023-12-31", "2024-01-01", "2024-02-29", "2024-03-01",
      "2024-12-31")
    val times = Seq("00:00:00", "00:00:01", "12:00:00", "23:59:59")
    val rows: Seq[(Long, java.sql.Timestamp)] =
      for ((d, di) <- days.zipWithIndex; (tm, ti) <- times.zipWithIndex)
        yield ((di * 10 + ti).toLong,
          java.sql.Timestamp.valueOf(s"$d $tm"))
    LakeWriter.write(rows.toDF("id", "ts").coalesce(1), path,
      partitionBy = Seq("p_day"),
      properties = Map("graft.generated.p_day" -> "CAST(ts AS DATE)"))
    val t = spark.read.format("lake").load(path)
    assert(scannedFiles(t) === days.size.toLong)

    val litGen: Gen[java.sql.Timestamp] = for {
      d <- Gen.oneOf(days ++ Seq("1970-01-02", "2024-06-15"))
      tm <- Gen.oneOf(times :+ "23:59:58")
    } yield java.sql.Timestamp.valueOf(s"$d $tm")
    val opGen: Gen[String] = Gen.oneOf("<", "<=", ">", ">=", "=")
    def holds(op: String, ts: java.sql.Timestamp,
        v: java.sql.Timestamp): Boolean = op match {
      case "<" => ts.compareTo(v) < 0
      case "<=" => ts.compareTo(v) <= 0
      case ">" => ts.compareTo(v) > 0
      case ">=" => ts.compareTo(v) >= 0
      case "=" => ts.compareTo(v) == 0
    }
    val prop = Prop.forAll(litGen, opGen) { (v, op) =>
      val got = t.filter(s"ts $op timestamp'$v'")
        .select("id").as[Long].collect().sorted
      val want = rows.collect {
        case (id, ts) if holds(op, ts, v) => id }.sorted.toArray
      got.sameElements(want)
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, s"boundary sweep failed: ${res.status}")
  }

  test("MIN/MAX/COUNT(col) answer from log stats without scanning") {
    import org.apache.spark.sql.functions._
    val path = tablePath("dsv2minmax")
    val df = spark.range(1, 1001).toDF("id")
      .withColumn("name", concat(lit("u"), format_string("%04d", $"id")))
      .withColumn("ts",
        expr("timestampadd(SECOND, id, timestamp'2024-01-01 00:00:00')"))
      .withColumn("d", expr("date_add(date'2024-01-01', cast(id AS int))"))
      .withColumn("x", $"id" * 1.5)
      .withColumn("allnull", lit(null).cast("string"))
    LakeWriter.write(df.repartition(4), path)
    val t = spark.read.format("lake").load(path)

    // force execution, then check the RENDERED final plan: AQE query
    // stages have no children, so a node-collect can miss scans that
    // sit inside a materialized stage — the tree rendering shows all
    def planOf(q: org.apache.spark.sql.DataFrame): String = {
      q.collect()
      q.queryExecution.executedPlan.toString
    }
    def noScan(q: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val p = planOf(q)
      assert(!p.contains("FileScan"), s"$label should be metadata-only: $p")
    }
    def hasScan(q: org.apache.spark.sql.DataFrame, label: String): Unit =
      assert(planOf(q).contains("FileScan"), s"$label must keep the scan")

    // the full supported mix in ONE aggregate, all from the log
    val q = t.agg(min("id").as("mn"), max("id").as("mx"),
      min("name").as("nmn"), max("name").as("nmx"),
      min("ts").as("tmn"), max("ts").as("tmx"),
      min("d").as("dmn"), max("d").as("dmx"),
      count(lit(1)).as("n"), count($"name").as("cn"),
      min("allnull").as("an"), count($"allnull").as("can"))
    val r = q.head()
    assert(r.getLong(0) === 1L && r.getLong(1) === 1000L)
    assert(r.getString(2) === "u0001" && r.getString(3) === "u1000")
    assert(r.getTimestamp(4).toInstant ===
      java.time.Instant.parse("2024-01-01T00:00:01Z"))
    assert(r.getTimestamp(5).toInstant ===
      java.time.Instant.parse("2024-01-01T00:16:40Z"))
    assert(r.getDate(6).toLocalDate ===
      java.time.LocalDate.parse("2024-01-02"))
    assert(r.getDate(7).toLocalDate ===
      java.time.LocalDate.parse("2026-09-27"))
    assert(r.getLong(8) === 1000L && r.getLong(9) === 1000L)
    assert(r.isNullAt(10) && r.getLong(11) === 0L)
    noScan(q, "supported mix")
    // a projection-with-rename between agg and scan still resolves
    val qp = t.select($"id".as("renamed")).agg(max("renamed").as("m"))
    assert(qp.head().getLong(0) === 1000L)
    noScan(qp, "renamed projection")

    // DOUBLE bails (NaN ordering), answers correctly via the scan
    val qd = t.agg(min("x").as("m"))
    assert(qd.head().getDouble(0) === 1.5)
    hasScan(qd, "double min")
    // a real filter bails
    val qf = t.where("id > 500").agg(max("id").as("m"))
    assert(qf.head().getLong(0) === 1000L)
    hasScan(qf, "filtered max")
    // min over a derived expression bails
    val qe = t.agg(min($"id" + 1).as("m"))
    assert(qe.head().getLong(0) === 2L)
    hasScan(qe, "derived-expression min")

    // partition columns answer from partition VALUES (no footer stats)
    val ppath = tablePath("dsv2minmaxpart")
    df.select($"id", $"d", $"name").write.format("lake")
      .partitionBy("d").save(ppath)
    val pt = spark.read.format("lake").load(ppath)
    val pq = pt.agg(min("d").as("dmn"), max("d").as("dmx"),
      count($"d").as("cd"))
    val pr = pq.head()
    assert(pr.getDate(0).toLocalDate ===
      java.time.LocalDate.parse("2024-01-02"))
    assert(pr.getDate(1).toLocalDate ===
      java.time.LocalDate.parse("2026-09-27"))
    assert(pr.getLong(2) === 1000L)
    noScan(pq, "partition-column min/max")

    // partition-only FILTERS answer from metadata too — the predicate
    // is determined by the partition tuple, so the evaluation is
    // exact, not may-match pruning; verify against the plain frame
    val fq = pt.where("d >= date'2026-09-01'")
      .agg(count(lit(1)).as("n"), min("id").as("mn"), max("d").as("mx"))
    val fExp = df.where("d >= date'2026-09-01'")
      .agg(count(lit(1)), min("id"), max("d")).head()
    assert(fq.head() === fExp)
    noScan(fq, "partition-filtered aggregate")
    // filter + grouping compose
    val fg = pt.where("d < date'2024-02-01'")
      .groupBy("d").agg(count(lit(1)).as("n"))
    assert(fg.count() ===
      df.where("d < date'2024-02-01'").select("d").distinct().count())
    noScan(fg, "partition-filtered group")
    // a filter touching a DATA column keeps the scan
    val fd = pt.where("d >= date'2026-09-01' AND id > 990")
      .agg(count(lit(1)).as("n"))
    assert(fd.head().getLong(0) ===
      df.where("d >= date'2026-09-01' AND id > 990").count())
    hasScan(fd, "data-column filter")

    // a deletion vector poisons min/max (the deleted row WAS the max)
    // but count(*) still nets exactly
    val dpath = tablePath("dsv2minmaxdv")
    LakeWriter.write(df.select("id", "name").repartition(2), dpath,
      properties = Map("graft.enableDeletionVectors" -> "true"))
    LakeTable.forPath(spark, dpath).delete("id = 1000")
    val dt = spark.read.format("lake").load(dpath)
    val dq = dt.agg(max("id").as("m"))
    assert(dq.head().getLong(0) === 999L)
    hasScan(dq, "max over DV table")
    val dc = dt.agg(count(lit(1)).as("n"))
    assert(dc.head().getLong(0) === 999L)
    noScan(dc, "count(*) over DV table")

    // grouped by partition column: per-partition rows + min/max from
    // the log (the "rows per day" dashboard query)
    val gq = pt.groupBy("d").agg(count(lit(1)).as("n"), max("id").as("m"))
    val gRows = gq.collect()
    assert(gRows.length === 1000) // 1000 distinct dates
    assert(gRows.forall(_.getLong(1) === 1L))
    noScan(gq, "grouped partition count")
    // grouping on a DATA column keeps the scan
    val gd = t.groupBy("name").agg(count(lit(1)).as("n"))
    assert(gd.count() === 1000L)
    hasScan(gd, "grouped data-column count")
    // null partitions form their own group, answered from metadata
    val npath = tablePath("dsv2minmaxnullpart")
    spark.range(0, 10).toDF("id")
      .withColumn("p", when($"id" < 3, lit(null).cast("string"))
        .otherwise(concat(lit("g"), $"id" % 2)))
      .write.format("lake").partitionBy("p").save(npath)
    val nt = spark.read.format("lake").load(npath)
    val nq = nt.groupBy("p").agg(count(lit(1)).as("n"), min("id").as("mn"))
    val nRows = nq.collect().map(r =>
      (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    assert(nRows === Set((None, 3L, 0L), (Some("g0"), 3L, 4L),
      (Some("g1"), 4L, 3L)))
    noScan(nq, "null-partition group")
    // IS NULL / IS NOT NULL partition filters evaluate exactly
    val isn = nt.where("p IS NULL").agg(count(lit(1)).as("n"))
    assert(isn.head().getLong(0) === 3L)
    noScan(isn, "IS NULL partition filter")
    val nn = nt.where("p IS NOT NULL")
      .groupBy("p").agg(count(lit(1)).as("n"))
    assert(nn.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      === Set(("g0", 3L), ("g1", 4L)))
    noScan(nn, "IS NOT NULL filter + group")

    // a foreign log whose partition value does not CAST under the
    // column type: the scan nulls those rows, so the rewrite must
    // bail (never guess) — COUNT(p)/filters answer from the scan
    val xpath = tablePath("dsv2minmaxforeign")
    spark.range(0, 7).toDF("id").coalesce(1)
      .write.parquet(s"$xpath/p=notanumber")
    val xroot = java.nio.file.Paths.get(xpath)
    val xadds = LakeWriter.walkParquet(xroot).map { f =>
      val (rows, mins, maxs, nulls) =
        ParquetFooters.stats(spark, f.toString)
      AddFile(xroot.relativize(f).toString,
        Map("p" -> "notanumber"), java.nio.file.Files.size(f),
        rows, mins, maxs, nulls)
    }
    val xlog = new LakeLog(xpath)
    xlog.commit(0L, Seq(
      CommitInfo(System.currentTimeMillis(), "CONVERT", Map.empty),
      Metadata("id BIGINT, p INT", Seq("p"),
        System.currentTimeMillis())) ++ xadds)
    val xt = spark.read.format("lake").load(xpath)
    val xq = xt.agg(count($"p").as("n"))
    assert(xq.head().getLong(0) === 0L) // scan: cast('notanumber') IS NULL
    hasScan(xq, "uncastable foreign partition value")

    // column mapping: stats live under the PHYSICAL name; min/max on
    // the renamed logical column must still answer from metadata
    val mpath = tablePath("dsv2minmaxmap")
    LakeWriter.write(df.select("id", "name").repartition(2), mpath,
      properties = Map(ColumnMapping.MODE_PROP -> "name"))
    LakeTable.forPath(spark, mpath).renameColumn("id", "ident")
    val mt = spark.read.format("lake").load(mpath)
    val mq = mt.agg(max("ident").as("m"), count($"ident").as("c"))
    assert(mq.head().getLong(0) === 1000L)
    assert(mq.head().getLong(1) === 1000L)
    noScan(mq, "max over mapped rename")
  }

  test("grouped metadata rewrite merges partition renderings that " +
      "parse to the same typed value") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a converted/foreign table can carry MIXED raw renderings of the
    // same typed partition value ('1' vs '01' for an INT column); a
    // real scan casts both to 1 and returns ONE group — the
    // metadata-only grouped rewrite must merge them the same way,
    // never emit duplicate groups keyed by raw string
    val path = tablePath("dsv2groupmixed")
    spark.range(0, 4).toDF("id").coalesce(1).write.parquet(s"$path/p=1")
    spark.range(10, 13).toDF("id").coalesce(1).write.parquet(s"$path/p=01")
    spark.range(20, 22).toDF("id").coalesce(1).write.parquet(s"$path/p=2")
    val t = LakeTable.convertToLake(spark, path, "p INT").toDF
    val q = t.groupBy("p").agg(count(lit(1)).as("n"), min("id").as("mn"),
      max("id").as("mx"))
    val rows = q.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(rows === Set((1, 7L, 0L, 12L), (2, 2L, 20L, 21L)),
      "mixed renderings of p=1 must merge into one group")
    // still answered from metadata (merging must not force a scan)
    q.collect()
    assert(!q.queryExecution.executedPlan.toString.contains("FileScan"),
      "merged grouped aggregate should stay metadata-only")
    // ungrouped COUNT(p): both files' rows are non-null under the cast
    val c = t.agg(count($"p").as("n"))
    assert(c.head().getLong(0) === 9L)
  }

  test("metadata-only DELETE handles null partitions correctly") {
    val path = tablePath("dsv2nulldel")
    Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, null.asInstanceOf[String]))
      .toDF("id", "p")
      .write.format("lake").partitionBy("p").save(path)
    val t = LakeTable.forPath(spark, path)
    // the sentinel string must NOT match the null-partition files
    t.delete("p = '__HIVE_DEFAULT_PARTITION__'")
    assert(t.toDF.count() === 3L)
    // ... but IS NULL must (metadata-only partition path)
    t.delete("p IS NULL")
    assert(t.toDF.select("id").as[Long].collect() === Array(1L))
  }
}

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

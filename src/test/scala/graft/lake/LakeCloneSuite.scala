package graft.lake

import graft.SparkSuite
import java.nio.file.{Files, Paths}

/** SHALLOW CLONE: zero-copy table copies referencing the source's
  * files absolutely; copy-on-write DML; vacuum never crosses the
  * clone's root.
  */
class LakeCloneSuite extends SparkSuite {
  import spark.implicits._

  private def seed = (1L to 100L).map(i => (i, s"k$i", i * 1.0))
    .toDF("id", "k", "v").coalesce(2)

  test("clone reads the source's data without copying any file") {
    val src = tablePath("clsrc1")
    val dst = tablePath("cldst1")
    LakeWriter.write(seed, src)
    val clone = LakeTable.forPath(spark, src).shallowCloneTo(dst)

    assert(clone.toDF.count() === 100L)
    assert(clone.toDF.agg(org.apache.spark.sql.functions.sum("v"))
      .as[Double].head() === (1 to 100).map(_.toDouble).sum)
    // no parquet under the clone dir — only the log
    assert(LakeWriter.walkParquet(Paths.get(dst)).isEmpty)
    // schema + partitioning carried over
    assert(clone.snapshot().schema ===
      LakeTable.forPath(spark, src).snapshot().schema)
  }

  test("appends and DML on the clone never touch the source") {
    val src = tablePath("clsrc2")
    val dst = tablePath("cldst2")
    LakeWriter.write(seed, src)
    val srcFiles = LakeWriter.walkParquet(Paths.get(src)).map(_.toString)
    val clone = LakeTable.forPath(spark, src).shallowCloneTo(dst)

    LakeWriter.write(Seq((101L, "x", 0.5)).toDF("id", "k", "v"), dst)
    assert(clone.toDF.count() === 101L)
    assert(LakeTable.forPath(spark, src).toDF.count() === 100L)

    // copy-on-write delete: rewritten data lands in the clone's dir;
    // untouched files legitimately remain absolute source references
    clone.delete("id <= 50")
    assert(clone.toDF.count() === 51L)
    assert(LakeTable.forPath(spark, src).toDF.count() === 100L)
    srcFiles.foreach(f => assert(Files.exists(Paths.get(f))))
    assert(clone.snapshot().files.exists(!_.path.startsWith("/")))
    // and the mixed local/absolute file set reads consistently
    assert(clone.toDF.select("id").as[Long].collect().sorted
      === ((51L to 101L).toArray))
  }

  test("vacuum on the clone never deletes the source's files") {
    val src = tablePath("clsrc3")
    val dst = tablePath("cldst3")
    LakeWriter.write(seed, src)
    val srcFiles = LakeWriter.walkParquet(Paths.get(src)).map(_.toString)
    val clone = LakeTable.forPath(spark, src).shallowCloneTo(dst)
    clone.delete("id <= 99") // tombstones the absolute source refs

    spark.conf.set(LakeTable.RETENTION_CHECK_KEY, "false")
    val deleted = try clone.vacuum(0.0)
    finally spark.conf.unset(LakeTable.RETENTION_CHECK_KEY)
    assert(deleted.forall(!_.startsWith("/")))
    srcFiles.foreach(f => assert(Files.exists(Paths.get(f))))
    assert(LakeTable.forPath(spark, src).toDF.count() === 100L)
    assert(clone.toDF.count() === 1L)
  }

  test("deep clone is fully independent of the source") {
    val src = tablePath("clsrc5")
    val dst = tablePath("cldst5")
    LakeWriter.write(seed, src)
    LakeTable.forPath(spark, src).delete("id > 90") // v1: stats + tombstones
    val clone = LakeTable.forPath(spark, src).deepCloneTo(dst)
    assert(clone.toDF.count() === 90L)
    // files physically copied under the clone root, none absolute
    assert(LakeWriter.walkParquet(Paths.get(dst)).nonEmpty)
    assert(clone.snapshot().files.forall(!_.path.startsWith("/")))
    // stats carried over: skipping works without re-reading footers
    assert(clone.snapshot().files.forall(f =>
      f.minValues.contains("id") && f.numRecords > 0))
    // the source can disappear entirely; the clone still reads
    LakeWriter.deleteRecursively(Paths.get(src))
    assert(LakeTable.forPath(spark, dst).toDF.count() === 90L)
  }

  test("deep clone of a SHALLOW clone localizes absolute references") {
    val src = tablePath("clsrc6")
    val mid = tablePath("clmid6")
    val dst = tablePath("cldst6")
    LakeWriter.write(seed, src)
    LakeTable.forPath(spark, src).shallowCloneTo(mid) // absolute refs
    val deep = LakeTable.forPath(spark, mid).deepCloneTo(dst)
    assert(deep.snapshot().files.forall(!_.path.startsWith("/")))
    LakeWriter.deleteRecursively(Paths.get(src))
    assert(LakeTable.forPath(spark, dst).toDF.count() === 100L)
  }

  test("DEEP CLONE via SQL registers and reads") {
    val src = tablePath("clsrc7")
    LakeWriter.write(seed, src)
    LakeCatalog.register(spark, "clone_src7", src)
    val dst = tablePath("cldst7")
    LakeSql.sql(spark,
      s"CREATE TABLE clone_dst7 DEEP CLONE clone_src7 LOCATION '$dst'")
    assert(LakeCatalog.table(spark, "clone_dst7").toDF.count() === 100L)
    val hist = LakeCatalog.table(spark, "clone_dst7").history()
      .filter("operation = 'CLONE'").count()
    assert(hist === 1L)
    LakeCatalog.drop(spark, "clone_dst7")
    LakeCatalog.drop(spark, "clone_src7")
  }

  test("changes() on a clone reports v0 as inserts; SQL route works") {
    val src = tablePath("clsrc4")
    LakeWriter.write(seed, src)
    LakeCatalog.register(spark, "clone_src4", src)
    val dst = tablePath("cldst4")
    LakeSql.sql(spark,
      s"CREATE TABLE clone_dst4 SHALLOW CLONE clone_src4 LOCATION '$dst'")
    val clone = LakeCatalog.table(spark, "clone_dst4")
    val ch = clone.changes(0)
    assert(ch.filter("_change_type = 'insert'").count() === 100L)
    // and a clone is streamable from version 0
    val out = tablePath("cldst4-stream")
    val q = spark.readStream.format("lake").load(dst)
      .writeStream.format("lake")
      .option("checkpointLocation", tmpDir("cl-ck"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(out)
    q.awaitTermination(120000)
    assert(LakeTable.forPath(spark, out).toDF.count() === 100L)
  }

  test("clones carry deletion vectors: shallow resolves, deep copies") {
    // round-10 fix: sidecars are part of a file's state — a shallow
    // clone that absolutized only the data path left dvPath pointing
    // under the CLONE's root, crashing every read of a soft-deleted
    // file; a deep clone copied data files but no sidecars
    val src = tablePath("clonedv-src")
    LakeWriter.write((1L to 100L).toDF("id").coalesce(1), src,
      properties = Map(LakeTable.PROP_ENABLE_DV -> "true"))
    LakeTable.forPath(spark, src).delete("id <= 10")

    val shallow = tablePath("clonedv-shallow")
    LakeTable.forPath(spark, src).shallowCloneTo(shallow)
    val sSnap = new LakeLog(shallow).snapshot()
    assert(sSnap.files.exists(_.dvPath.isDefined))
    assert(sSnap.files.flatMap(_.dvPath)
      .forall(p => java.nio.file.Paths.get(p).isAbsolute),
      "shallow clone must absolutize dv sidecar references")
    assert(LakeTable.forPath(spark, shallow).toDF.count() === 90L)
    assert(LakeTable.forPath(spark, shallow).toDF
      .filter($"id" <= 10L).count() === 0L,
      "soft-deleted rows must stay deleted through the clone")

    val deep = tablePath("clonedv-deep")
    LakeTable.forPath(spark, src).deepCloneTo(deep)
    // fully independent: drop the source wholesale, the deep clone
    // still applies its own copied DVs
    LakeWriter.deleteRecursively(java.nio.file.Paths.get(src))
    Snapshot.clearCacheForTest()
    assert(LakeTable.forPath(spark, deep).toDF.count() === 90L)
    assert(LakeTable.forPath(spark, deep).toDF
      .filter($"id" <= 10L).count() === 0L)
  }

  test("shallow clone of a bloom-indexed table keeps skipping") {
    val src = tablePath("clonebloom-src")
    LakeWriter.write(
      spark.range(2000L).select($"id",
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("p"), $"id").as("s"))
        .repartition(4, $"id"),
      src, properties = Map(
        BloomIndex.PROP_COLUMNS -> "id",
        BloomIndex.PROP_NUM_ITEMS -> "10000"))
    val dest = tablePath("clonebloom-dest")
    LakeTable.forPath(spark, src).shallowCloneTo(dest)
    val before = BloomIndex.skippedFiles.get()
    val rows = LakeTable.forPath(spark, dest).toDF
      .filter($"id" === 777L).collect()
    val skipped = BloomIndex.skippedFiles.get() - before
    assert(rows.map(_.getLong(0)).toSeq === Seq(777L))
    assert(skipped >= 2,
      "absolutized bloom sidecars must keep skipping through the clone")
  }
}

package graft.lake

import graft.SparkSuite
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime

/** COPY INTO: idempotent incremental file ingest with a per-file Txn
  * ledger (skip already-loaded, pick up new and replaced files, FORCE
  * reload, SQL surface, schema discipline for text formats).
  */
class LakeCopyIntoSuite extends SparkSuite {
  import spark.implicits._

  /** Write `df` as exactly one parquet file named `name` under `dir`. */
  private def writeOne(df: org.apache.spark.sql.DataFrame,
      dir: String, name: String): Unit = {
    val staging = tmpDir("copy-src-staging")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = Files.list(Paths.get(staging)).iterator()
    val src = Iterator.continually(part)
      .takeWhile(_.hasNext).map(_.next())
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.createDirectories(Paths.get(dir))
    Files.move(src, Paths.get(dir, name), StandardCopyOption.REPLACE_EXISTING)
  }

  private def metrics(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
    val r = df.collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("copy into: loads once, second run is a no-op") {
    val src = tmpDir("copy-src")
    writeOne(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), src, "f1.parquet")
    val path = tablePath("copy1")
    val t = LakeTable.forPath(spark, path)
    assert(metrics(t.copyInto(src)) === ((1L, 0L, 2L)))
    assert(t.toDF.count() === 2)
    assert(metrics(t.copyInto(src)) === ((0L, 1L, 0L)))
    assert(t.toDF.count() === 2)
    assert(t.history().filter("operation = 'COPY INTO'").count() === 1)
  }

  test("copy into: only new files load on the next run") {
    val src = tmpDir("copy-src")
    writeOne(Seq((1L, "a")).toDF("id", "v"), src, "f1.parquet")
    val path = tablePath("copy2")
    val t = LakeTable.forPath(spark, path)
    assert(metrics(t.copyInto(src)) === ((1L, 0L, 1L)))
    writeOne(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), src, "f2.parquet")
    assert(metrics(t.copyInto(src)) === ((1L, 1L, 2L)))
    assert(t.toDF.as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("copy into: a file replaced in place (newer mtime) reloads") {
    val src = tmpDir("copy-src")
    writeOne(Seq((1L, "a")).toDF("id", "v"), src, "f1.parquet")
    val path = tablePath("copy3")
    val t = LakeTable.forPath(spark, path)
    t.copyInto(src)
    // replace with new content and a strictly newer mtime
    writeOne(Seq((9L, "z")).toDF("id", "v"), src, "f1.parquet")
    val f = Paths.get(src, "f1.parquet")
    Files.setLastModifiedTime(f,
      FileTime.fromMillis(System.currentTimeMillis() + 5000))
    assert(metrics(t.copyInto(src)) === ((1L, 0L, 1L)))
    // ingest-only semantics: the old rows remain, the replacement appends
    assert(t.toDF.as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (9L, "z")))
  }

  test("copy into: FORCE reloads everything and stays idempotent after") {
    val src = tmpDir("copy-src")
    writeOne(Seq((1L, "a")).toDF("id", "v"), src, "f1.parquet")
    val path = tablePath("copy4")
    val t = LakeTable.forPath(spark, path)
    t.copyInto(src)
    assert(metrics(t.copyInto(src, force = true)) === ((1L, 0L, 1L)))
    assert(t.toDF.count() === 2) // duplicated by design under FORCE
    // force stamped load-time; a plain re-run still skips
    assert(metrics(t.copyInto(src)) === ((0L, 1L, 0L)))
  }

  test("copy into: schema mismatch is rejected (enforcement, not merge)") {
    val src = tmpDir("copy-src")
    writeOne(Seq((1L, "a")).toDF("id", "v"), src, "f1.parquet")
    val path = tablePath("copy5")
    val t = LakeTable.forPath(spark, path)
    t.copyInto(src)
    val src2 = tmpDir("copy-src2")
    writeOne(Seq((1L, "a", 3.0)).toDF("id", "v", "extra"), src2, "g.parquet")
    val e = intercept[Exception] { t.copyInto(src2) }
    assert(e.getMessage.toLowerCase.contains("schema"))
  }

  test("copy into: json reads with the TABLE's schema once it exists") {
    val src = tmpDir("copy-src")
    writeOne(Seq((1L, "a")).toDF("id", "v"), src, "f1.parquet")
    val path = tablePath("copy6")
    val t = LakeTable.forPath(spark, path)
    t.copyInto(src)
    val jsonDir = tmpDir("copy-json")
    Files.writeString(Paths.get(jsonDir, "j1.json"),
      """{"id": 5, "v": "j"}""" + "\n")
    assert(metrics(t.copyInto(jsonDir, format = "json")) === ((1L, 0L, 1L)))
    assert(t.toDF.as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (5L, "j")))
  }

  test("copy into: ledger entries under the legacy (pre-size) key still skip") {
    val src = tmpDir("copy-src")
    writeOne(Seq((1L, "a")).toDF("id", "v"), src, "f1.parquet")
    val f = Paths.get(src, "f1.parquet")
    // seed a table whose ledger recorded f1 under the pre-size-keyed
    // identity, as every table ingested before the key change has
    val path = tablePath("copy-legacy")
    LakeWriter.write(Seq((1L, "a")).toDF("id", "v"), path,
      transactions = Seq(
        (s"copy-into:${f.toUri}", Files.getLastModifiedTime(f).toMillis)))
    val t = LakeTable.forPath(spark, path)
    // honored: no silent duplicate re-load of the already-ingested file
    assert(metrics(t.copyInto(src)) === ((0L, 1L, 0L)))
    assert(t.toDF.count() === 1)
    // a genuine replacement (newer mtime) still reloads through it
    writeOne(Seq((9L, "z")).toDF("id", "v"), src, "f1.parquet")
    Files.setLastModifiedTime(f,
      FileTime.fromMillis(System.currentTimeMillis() + 5000))
    assert(metrics(t.copyInto(src)) === ((1L, 0L, 1L)))
  }

  test("copy into: dead source files age out of the checkpointed ledger") {
    val src = tmpDir("copy-src")
    writeOne(Seq((1L, "a")).toDF("id", "v"), src, "old1.parquet")
    writeOne(Seq((2L, "b")).toDF("id", "v"), src, "old2.parquet")
    writeOne(Seq((3L, "c")).toDF("id", "v"), src, "live.parquet")
    // the ledger stamps each file's mtime; dating the doomed files 8
    // days back puts their entries past the 168 h retention horizon
    val old = FileTime.fromMillis(
      System.currentTimeMillis() - 8L * 24 * 3600 * 1000)
    Files.setLastModifiedTime(Paths.get(src, "old1.parquet"), old)
    Files.setLastModifiedTime(Paths.get(src, "old2.parquet"), old)
    val path = tablePath("copy-expiry")
    val t = LakeTable.forPath(spark, path)
    assert(metrics(t.copyInto(src)) === ((3L, 0L, 3L)))
    assert(t.snapshot().transactions.size === 3)
    Files.delete(Paths.get(src, "old1.parquet"))
    Files.delete(Paths.get(src, "old2.parquet"))
    // drive commits to the next checkpoint boundary, where expiry runs
    while (t.log.latestVersion <= 0 ||
        t.log.latestVersion % LakeLog.CHECKPOINT_INTERVAL != 0)
      LakeWriter.write(Seq((100L, "x")).toDF("id", "v"), path,
        mode = "append")
    val txns = LakeTable.forPath(spark, path).snapshot().transactions
    assert(txns.keys.count(_.startsWith("copy-into:")) === 1, txns)
    assert(txns.keys.exists(_.contains("live.parquet")), txns)
    // the survivor still skips on re-COPY (vanished files just aren't
    // listed any more — they count toward nothing)
    assert(metrics(LakeTable.forPath(spark, path).copyInto(src)) ===
      ((0L, 1L, 0L)))
  }

  test("copy into: ledger appId parsing (size-keyed, legacy, non-file)") {
    val p = Paths.get("/tmp/some dir/f1.parquet")
    assert(LakeLog.copyIntoLocalPath(s"copy-into:${p.toUri}:12345")
      === Some(p))
    assert(LakeLog.copyIntoLocalPath(s"copy-into:${p.toUri}") === Some(p))
    assert(LakeLog.copyIntoLocalPath("copy-into:s3://bucket/k:77") === None)
    assert(LakeLog.copyIntoLocalPath("stream-sink-42") === None)
    // ambiguity guard: a legacy key naming a file that itself ends in
    // ':<digits>' yields BOTH readings, so expiry can only fire when
    // every candidate is dead — the live 'part:2020' file keeps its
    // ledger entry even though the size-keyed parse points elsewhere
    val tricky = Paths.get("/tmp/some dir/part:2020")
    val both = LakeLog.copyIntoLocalPaths(s"copy-into:${tricky.toUri}")
    assert(both.contains(tricky), both)
    assert(both.size === 2, both)
  }

  test("SQL: COPY INTO path FROM src FILEFORMAT = PARQUET [FORCE]") {
    val src = tmpDir("copy-src")
    writeOne(Seq((1L, "a")).toDF("id", "v"), src, "f1.parquet")
    val path = tablePath("copy7")
    val m1 = LakeSql.sql(spark,
      s"COPY INTO `$path` FROM '$src' FILEFORMAT = PARQUET").collect()(0)
    assert((m1.getLong(0), m1.getLong(1)) === ((1L, 0L)))
    val m2 = LakeSql.sql(spark,
      s"COPY INTO `$path` FROM '$src' FILEFORMAT = PARQUET").collect()(0)
    assert((m2.getLong(0), m2.getLong(1)) === ((0L, 1L)))
    val m3 = LakeSql.sql(spark,
      s"COPY INTO `$path` FROM '$src' FILEFORMAT = PARQUET FORCE = TRUE")
      .collect()(0)
    assert(m3.getLong(0) === 1L)
    assert(LakeTable.forPath(spark, path).toDF.count() === 2)
  }
}

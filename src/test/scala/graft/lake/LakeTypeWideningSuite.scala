package graft.lake

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** ALTER COLUMN TYPE widening (Delta typeWidening analog): the change
  * is metadata-only, old narrow-typed files upcast at scan time, new
  * files write wide, and the protocol fences unaware engines on BOTH
  * sides.
  */
class LakeTypeWideningSuite extends SparkSuite {
  import spark.implicits._

  test("int->long: old files upcast, new files write wide, DML works") {
    val path = tablePath("widen-intlong")
    LakeWriter.write((1 to 100).map(i => (i, s"n$i"))
      .toDF("id", "name").coalesce(2), path)
    val t = LakeTable.forPath(spark, path)
    val preVersion = t.snapshot().version
    val preFiles = t.snapshot().files.map(_.path).toSet

    t.widenColumn("id", "BIGINT")
    val snap = LakeTable.forPath(spark, path).snapshot()
    // metadata-only: same files, one more version
    assert(snap.version === preVersion + 1)
    assert(snap.files.map(_.path).toSet === preFiles)
    assert(snap.schema("id").dataType ===
      org.apache.spark.sql.types.LongType)
    // protocol fences readers AND writers
    assert(snap.protocol.readerFeatures
      .contains(LakeProtocol.FEATURE_TYPE_WIDENING))
    assert(snap.protocol.writerFeatures
      .contains(LakeProtocol.FEATURE_TYPE_WIDENING))

    // old INT32 files read through the wide schema
    val df = spark.read.format("lake").load(path)
    assert(df.schema("id").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(df.count() === 100L)
    assert(df.agg(sum("id")).head().getLong(0) === 5050L)

    // a genuinely long value appends and reads alongside the old rows
    LakeWriter.write(Seq((Int.MaxValue.toLong + 5L, "big"))
      .toDF("id", "name"), path)
    val all = spark.read.format("lake").load(path)
    assert(all.count() === 101L)
    assert(all.where(s"id = ${Int.MaxValue.toLong + 5L}").count() === 1L)
    // filters cross both narrow and wide files
    assert(all.where("id > 50").count() === 51L)
    // DML over the mixed files
    LakeTable.forPath(spark, path).delete("id <= 10")
    assert(spark.read.format("lake").load(path).count() === 91L)
  }

  test("time travel before the widen reads the narrow schema") {
    val path = tablePath("widen-tt")
    LakeWriter.write((1 to 10).map(i => (i, i.toFloat)).toDF("id", "x"),
      path)
    val t = LakeTable.forPath(spark, path)
    t.widenColumn("x", "DOUBLE")
    assert(LakeTable.forPath(spark, path).snapshot()
      .schema("x").dataType === org.apache.spark.sql.types.DoubleType)
    assert(t.asOf(0).schema("x").dataType ===
      org.apache.spark.sql.types.FloatType)
    assert(t.asOf(0).count() === 10L)
    // post-widen double math over float-file rows
    val s = spark.read.format("lake").load(path)
      .agg(sum($"x")).head().getDouble(0)
    assert(math.abs(s - 55.0) < 1e-9)
  }

  test("float->double widen disables inexact stats pruning") {
    // pre-widen footer stats are Float.toString renderings ("0.1");
    // the upcast double value is 0.10000000149... — an exact-decimal
    // compare against literal 0.1 would wrongly prune the file and
    // silently lose the row. The widen records the column as
    // lossy-stats and the pruner must keep the file.
    val path = tablePath("widen-lossy")
    LakeWriter.write(Seq((1L, 0.1f), (2L, 0.05f)).toDF("id", "x")
      .coalesce(1), path)
    val t = LakeTable.forPath(spark, path)
    t.widenColumn("x", "DOUBLE")
    val snap = LakeTable.forPath(spark, path).snapshot()
    assert(LakeTable.lossyStatsKeys(snap.metadata.properties) === Set("x"))
    // the row whose float-rendered stat equals the literal must survive
    val rows = spark.read.format("lake").load(path)
      .where("x > 0.1").select("id").collect().map(_.getLong(0))
    assert(rows.toSeq === Seq(1L),
      "widened-float range predicate lost the straddling row")
    // DML through the same predicate shape
    LakeTable.forPath(spark, path).delete("x > 0.1")
    assert(spark.read.format("lake").load(path).count() === 1L)
    // integral widening keeps exact stats pruning (no lossy entry)
    val ipath = tablePath("widen-lossy-int")
    LakeWriter.write(Seq((1, 1L)).toDF("a", "b"), ipath)
    LakeTable.forPath(spark, ipath).widenColumn("a", "BIGINT")
    assert(LakeTable.lossyStatsKeys(LakeTable.forPath(spark, ipath)
      .snapshot().metadata.properties).isEmpty)
  }

  test("in-flight stream fails loudly when a column type widens") {
    val src = tablePath("widen-stream-src")
    val dst = tablePath("widen-stream-dst")
    val ckpt = tmpDir("widen-stream-ckpt")
    LakeWriter.write((1 to 20).map(i => (i, s"r$i")).toDF("v", "s"), src)
    def run(): Unit = {
      val q = spark.readStream.format("lake").load(src)
        .writeStream.format("lake")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination(120000)
    }
    run()
    assert(LakeTable.forPath(spark, dst).toDF.count() === 20L)
    // widen + post-widen data: the pinned-schema stream must stop
    // with a CLEAR schema-changed error, not a parquet decode crash
    LakeTable.forPath(spark, src).widenColumn("v", "BIGINT")
    LakeWriter.write(Seq((Int.MaxValue.toLong + 1L, "wide"))
      .toDF("v", "s"), src)
    val e = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException] { run() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("changed type")),
      s"expected a schema-changed error, got: ${messages(e)}")
    // a fresh stream (new checkpoint) adopts the wide schema
    val ckpt2 = tmpDir("widen-stream-ckpt2")
    val dst2 = tablePath("widen-stream-dst2")
    val q2 = spark.readStream.format("lake").load(src)
      .writeStream.format("lake")
      .option("checkpointLocation", ckpt2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(dst2)
    q2.awaitTermination(120000)
    assert(LakeTable.forPath(spark, dst2).toDF.count() === 21L)
  }

  test("RESTORE and CLONE compose with a widen") {
    val path = tablePath("widen-restore")
    LakeWriter.write((1 to 20).map(i => (i, i * 2)).toDF("a", "b"), path)
    val t = LakeTable.forPath(spark, path)
    t.widenColumn("a", "BIGINT")                               // v1
    LakeWriter.write(Seq((Int.MaxValue.toLong + 9L, 0))
      .toDF("a", "b"), path)                                   // v2
    // clone AFTER the widen: the clone carries the wide schema, the
    // typeWidening protocol, and reads the narrow+wide file mix
    val clonePath = tablePath("widen-clone")
    t.shallowCloneTo(clonePath)
    val c = LakeTable.forPath(spark, clonePath)
    assert(c.snapshot().schema("a").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(c.snapshot().protocol.readerFeatures
      .contains(LakeProtocol.FEATURE_TYPE_WIDENING))
    assert(c.toDF.count() === 21L)
    assert(c.toDF.where(s"a = ${Int.MaxValue.toLong + 9L}").count() === 1L)
    // restore the SOURCE to the pre-widen version: schema reverts to
    // INT, the post-widen file drops out, protocol stays ratcheted
    // (features never downgrade), and reads work
    LakeTable.forPath(spark, path).restoreTo(0L)
    val restored = LakeTable.forPath(spark, path).snapshot()
    assert(restored.schema("a").dataType ===
      org.apache.spark.sql.types.IntegerType)
    assert(spark.read.format("lake").load(path).count() === 20L)
    assert(restored.protocol.readerFeatures
      .contains(LakeProtocol.FEATURE_TYPE_WIDENING))
    // the clone is unaffected by the source restore
    assert(c.toDF.count() === 21L)
  }

  test("non-widening changes are refused; partition columns refused") {
    val path = tablePath("widen-reject")
    Seq((1L, 1, "a")).toDF("id", "v", "p")
      .write.format("lake").partitionBy("p").save(path)
    val t = LakeTable.forPath(spark, path)
    intercept[IllegalArgumentException](t.widenColumn("id", "INT"))
    intercept[IllegalArgumentException](t.widenColumn("v", "STRING"))
    intercept[IllegalArgumentException](t.widenColumn("p", "BINARY"))
    intercept[IllegalArgumentException](t.widenColumn("nope", "BIGINT"))
    // nothing committed by the failures
    assert(t.snapshot().version === 0L)
  }

  test("VARIANT columns: write, DML, schema enforcement, checkpoint") {
    val path = tablePath("variant-core")
    val df = (1 to 30).map(i => (i.toLong, s"""{"k": $i, "s": "v$i"}"""))
      .toDF("id", "js")
      .select($"id", expr("parse_json(js)").as("v"))
    LakeWriter.write(df.coalesce(2), path)
    val t = LakeTable.forPath(spark, path)
    assert(t.snapshot().schema("v").dataType ===
      org.apache.spark.sql.types.VariantType)
    // typed path extraction through the lake read
    val got = spark.read.format("lake").load(path)
      .select($"id", expr("variant_get(v, '$.k', 'long')").as("k"))
      .where("k % 3 = 0")
    assert(got.count() === 10L)
    // DML over variant rows: UPDATE rewrites files carrying variant
    t.update("id = 1", Map("v" -> "parse_json('{\"k\": 100}')"))
    assert(spark.read.format("lake").load(path)
      .where("variant_get(v, '$.k', 'long') = 100").count() === 1L)
    // schema enforcement: a frame with a non-variant v must refuse
    intercept[Exception] {
      LakeWriter.write(Seq((99L, "nope")).toDF("id", "v"), path)
    }
    // variant DDL survives a checkpoint + replay
    (1 to 12).foreach { i =>
      LakeWriter.write(
        Seq((100L + i, s"""{"k": ${100 + i}}""")).toDF("id", "js")
          .select($"id", expr("parse_json(js)").as("v")), path)
    }
    val snap = LakeTable.forPath(spark, path).snapshot()
    assert(snap.schema("v").dataType ===
      org.apache.spark.sql.types.VariantType)
    assert(spark.read.format("lake").load(path).count() === 42L)
    // time travel reads pre-update variant content
    assert(LakeTable.forPath(spark, path).asOf(0)
      .where("variant_get(v, '$.k', 'long') = 1").count() === 1L)
  }

  test("SQL route + checkpoint round-trip + stats skipping survive") {
    val path = tablePath("widen-sql")
    LakeWriter.write((1 to 50).map(i => (i, i * 2)).toDF("a", "b")
      .repartition(4), path)
    LakeSql.sql(spark, s"ALTER TABLE `$path` ALTER COLUMN a TYPE BIGINT")
    val t = LakeTable.forPath(spark, path)
    assert(t.snapshot().schema("a").dataType ===
      org.apache.spark.sql.types.LongType)
    // push the widened protocol + schema through a checkpoint
    (1 to 12).foreach { i =>
      LakeWriter.write(Seq((1000L + i, i)).toDF("a", "b"), path)
    }
    val snap = LakeTable.forPath(spark, path).snapshot()
    assert(snap.schema("a").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(snap.protocol.readerFeatures
      .contains(LakeProtocol.FEATURE_TYPE_WIDENING))
    assert(spark.read.format("lake").load(path).count() === 62L)
    // min/max stats (stored as plain ints) still prune under the
    // wide type: a selective long filter must not read all files
    val q = spark.read.format("lake").load(path).where("a = 1005")
    assert(q.count() === 1L)
    // metadata-only aggregates still fire post-widen
    val m = spark.read.format("lake").load(path)
      .agg(max("a").as("m"))
    assert(m.head().getLong(0) === 1012L)
    m.collect()
    assert(!m.queryExecution.executedPlan.toString.contains("FileScan"),
      "metadata max should survive the widen")
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.classic.graftshim.StreamingShim
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.types.StructType

import graft.lake.{AddFile, LakeLog, RemoveFile}

/** Version-based offset: "all appends through log version N". */
final case class LakeStreamOffset(version: Long) extends OffsetV1 {
  override def json(): String = version.toString
}

/** `spark.readStream.format("lake")` — incremental consumption of a
  * lake table's appends, the engine's Delta-streaming-source analog.
  *
  * Offsets are log versions: batch (start, end] reads exactly the
  * AddFiles committed in those versions, so every appended row is
  * delivered once regardless of file layout, compaction timing (see
  * options), or concurrent writers. Restart recovery replays from the
  * checkpointed version — combined with the Txn-idempotent lake sink
  * this gives exactly-once end to end.
  *
  * Options:
  *  - `startingVersion` (long, default: all existing data) — first
  *    version whose files are delivered;
  *  - `ignoreDeletes` (bool) — tolerate delete-only commits (their
  *    removes are skipped; nothing is re-delivered);
  *  - `ignoreChanges` (bool) — additionally tolerate rewrites
  *    (UPDATE/MERGE/OPTIMIZE); their AddFiles ARE delivered, which
  *    re-emits the untouched rows they carry (the Delta contract —
  *    downstream must dedupe on key). Without these, a non-append
  *    commit fails the stream: an append-only source must not
  *    silently drop or duplicate.
  *
  * 100 TB shape: getOffset is one log-tail stat; getBatch ships only
  * the new files' paths into a parquet scan (pruning, vectorized read,
  * whole-stage codegen all apply — the shim wraps the SAME planned
  * scan, it does not re-implement reading).
  */
final class LakeStreamSource(
    spark: SparkSession,
    tablePath: String,
    options: Map[String, String]) extends Source {

  private val log = new LakeLog(tablePath)
  override val schema: StructType = log.snapshot().schema

  private val startingVersion: Long =
    options.get("startingVersion").map(_.toLong).getOrElse(0L)
  private val ignoreDeletes =
    options.get("ignoreDeletes").exists(_.toBoolean)
  private val ignoreChanges =
    options.get("ignoreChanges").exists(_.toBoolean)

  override def getOffset: Option[OffsetV1] = {
    val latest = log.latestVersion
    if (latest < 0) None else Some(LakeStreamOffset(latest))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val fromExclusive = start.map(versionOf).getOrElse(startingVersion - 1)
    val toInclusive = versionOf(end)
    val adds = Seq.newBuilder[AddFile]
    ((fromExclusive + 1) to toInclusive).foreach { v =>
      val actions = log.readVersion(v)
      val removes = actions.collect { case r: RemoveFile => r }
      val versionAdds = actions.collect { case a: AddFile => a }
      if (removes.nonEmpty && !ignoreChanges) {
        if (versionAdds.isEmpty || !ignoreDeletes) {
          throw new IllegalStateException(
            s"lake streaming source at $tablePath found a non-append " +
            s"commit at version $v (${removes.size} file removals). " +
            "Set ignoreDeletes=true to skip delete-only commits, or " +
            "ignoreChanges=true to also pass rewrites through " +
            "(re-emits rewritten files' rows).")
        }
      }
      // For rewrites under ignoreChanges, Delta semantics: deliver the
      // commit's AddFiles as-is. For delete-only commits nothing is
      // delivered. Plain appends deliver their AddFiles.
      if (removes.isEmpty || ignoreChanges) adds ++= versionAdds
    }
    val files = adds.result()
    if (files.isEmpty) {
      StreamingShim.streamingDataFrame(spark,
        spark.sparkContext.emptyRDD, schema)
    } else {
      val batch = spark.read
        .option("basePath", tablePath)
        .schema(schema)
        .parquet(files.map(f => s"$tablePath/${f.path}"): _*)
      StreamingShim.streamingDataFrame(spark,
        batch.queryExecution.toRdd, schema)
    }
  }

  private def versionOf(o: OffsetV1): Long = o match {
    case LakeStreamOffset(v) => v
    case other => other.json().trim.toLong // SerializedOffset on restart
  }

  override def commit(end: OffsetV1): Unit = ()

  override def stop(): Unit = ()
}

/** `df.writeStream.format("lake")` — micro-batch appends with the
  * idempotent Txn action, so a batch replayed after a crash between
  * lake commit and checkpoint advance is skipped (exactly-once). The
  * txn appId comes from `txnAppId` (preferred) or the checkpoint
  * location; with neither, writes are plain at-least-once appends.
  */
final class LakeStreamSink(
    tablePath: String,
    partitionColumns: Seq[String],
    options: Map[String, String])
    extends org.apache.spark.sql.execution.streaming.Sink {

  private val txnAppId: Option[String] =
    options.get("txnAppId").orElse(options.get("checkpointLocation"))

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batchDF = StreamingShim.batchDataFrame(data)
    graft.lake.LakeWriter.write(
      batchDF, tablePath,
      partitionBy = partitionColumns,
      mergeSchema = options.get("mergeSchema").exists(_.toBoolean),
      operation = "STREAMING UPDATE",
      operationParameters = Map("batchId" -> batchId.toString),
      transaction = txnAppId.map(_ -> batchId))
    ()
  }

  override def toString: String = s"LakeStreamSink[$tablePath]"
}

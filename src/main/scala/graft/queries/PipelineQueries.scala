package graft.queries

import org.apache.spark.sql.functions._
import graft.pipeline._
import graft.lake.LakeTable

/** Gate query running the full reference pipeline spine (etl/04:11-47):
  * fixture landing table → micro-batch JSON ingest → bronze with
  * ingestion metadata → silver with quarantine repair. The fixture is
  * closed-form (`HealthFixtures.landingEvents`: steps =
  * 1000 + 37·idx mod 4000 over a (hour, device) grid), so the silver
  * aggregate has a DuckDB oracle that regenerates the expected result
  * from the same constants — any fault in the spine (batch draining,
  * JSON round-trip, clean/quarantine split, uuid→owner repair) shifts
  * the counts or sums and fails the hash compare.
  */
object PipelineQueries {

  val all: Seq[QueryDef] = Seq(
    QueryDef("pipeline_medallion",
      (s, dir) => {
        val sf = new java.io.File(dir).getName
        val root = java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"), "graft_pipeline", sf)
        graft.lake.LakeWriter.deleteRecursively(root)
        val (landing, raw, bronze, silver, user) = (
          s"$root/landing", s"$root/raw", s"$root/bronze",
          s"$root/silver", s"$root/user")
        val ingest = new Ingest(landing, raw)
        ingest.prepareActivityData(s, hours = 24)
        val pipe = new Pipeline(raw, bronze, silver, user,
          new Operations(Operations.fixedClock("2020-03-01 00:00:00")))
        pipe.writeUserDimension(s)
        ingest.ingestClassicData(s, hours = 16, batchTag = "b1")
        pipe.runBatch(s)
        LakeTable.forPath(s, silver).toDF
          .groupBy("device_id", "p_eventdate")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("steps")).cast("long").as("total_steps"))
      },
      // The ingested slice is hours 0-15 × devices 1-10; every dirty
      // (uuid-device) event must come back repaired to its owner's
      // numeric id, or a device's n_rows drops below 16.
      Some("""WITH seed AS (
             |  SELECT h, d, 1000 + (37 * (h * 10 + d)) % 4000 AS steps
             |  FROM range(0, 16) t1(h), range(1, 11) t2(d))
             |SELECT CAST(d AS INTEGER) AS device_id,
             |  DATE '2020-01-01' AS p_eventdate,
             |  COUNT(*) AS n_rows,
             |  CAST(SUM(steps) AS BIGINT) AS total_steps
             |FROM seed GROUP BY 1, 2""".stripMargin)),

    // Lake table as a STREAMING SOURCE (round 2): version-offset
    // incremental consumption, lake-to-lake via format("lake") on both
    // ends, two upstream commits drained by AvailableNow. The copied
    // content aggregates straight off `documents`, so this streaming
    // path is DuckDB-hash-checked, not rows-only.
    QueryDef("streaming_lake_source",
      (s, dir) => QueryDef.pinnedShufflePartitions(s) {
        val sf = new java.io.File(dir).getName
        val root = java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"), "graft_stream_src", sf)
        graft.lake.LakeWriter.deleteRecursively(root)
        val (src, dst, ckpt) = (s"$root/src", s"$root/dst", s"$root/ckpt")
        val docs = QueryDef.table(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
        graft.lake.LakeWriter.write(docs.filter(col("doc_id") % 2 === 0), src)
        graft.lake.LakeWriter.write(docs.filter(col("doc_id") % 2 === 1), src)
        val q = s.readStream.format("lake").load(src)
          .writeStream.format("lake")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start(dst)
        q.awaitTermination(120000)
        graft.lake.LakeTable.forPath(s, dst).toDF
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("total_chars"))
      },
      Some("""SELECT lang, COUNT(*) AS n_docs,
             |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
             |FROM documents GROUP BY lang""".stripMargin)),

    // Streaming curation (round 11): the quality-filter stage of a
    // training-data pipeline run AS A STREAM — documents arrive as
    // lake commits, every micro-batch computes the Gopher rule
    // columns (pure codegen'd row math, so the operators compose
    // into Structured Streaming unchanged) and only passing docs
    // reach the sink. Oracle: the same rules + filter replayed in
    // DuckDB over the whole corpus.
    QueryDef("streaming_curation",
      (s, dir) => QueryDef.pinnedShufflePartitions(s) {
        val sf = new java.io.File(dir).getName
        val root = java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"), "graft_stream_curate", sf)
        graft.lake.LakeWriter.deleteRecursively(root)
        val (src, dst, ckpt) = (s"$root/src", s"$root/dst", s"$root/ckpt")
        val docs = QueryDef.table(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        graft.lake.LakeWriter.write(docs.filter(col("doc_id") % 2 === 0),
          src)
        graft.lake.LakeWriter.write(docs.filter(col("doc_id") % 2 === 1),
          src)
        val curated = graft.ops.TextOps.gopherQuality(
            s.readStream.format("lake").load(src), "text", "doc_id")
          .filter(col("gopher_pass"))
          .withColumn("n_words", col("n_words").cast("long"))
          .withColumn("stopword_hits", col("stopword_hits").cast("long"))
          .drop("gopher_pass")
        val q = curated.writeStream.format("lake")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start(dst)
        q.awaitTermination(120000)
        graft.lake.LakeTable.forPath(s, dst).toDF
      },
      Some(s"""${OpsQueries.GOPHER_METRICS_SQL}
             |SELECT * FROM m
             |WHERE ${OpsQueries.GOPHER_PASS_SQL}""".stripMargin)),

    // Typed stateful sessionization (KeyValueGroupedDataset /
    // flatMapGroups — SURVEY §2.10 custom state): 30-minute
    // inactivity-gap sessions per user over events, hash-checked
    // against the classic gaps-and-islands SQL in DuckDB.
    QueryDef("sessionize_events",
      (s, dir) => graft.streaming.LakeStreaming
        .sessionize(QueryDef.events(s, dir), gapMinutes = 30)
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), round(col("total_value"), 4).as("total_value")),
      Some("""WITH marked AS (
             |  SELECT user_id, ts, value,
             |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |         <= INTERVAL 30 MINUTES THEN 0 ELSE 1 END AS new_sess
             |  FROM events),
             |sess AS (
             |  SELECT user_id, ts, value,
             |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM marked)
             |SELECT user_id, MIN(ts) AS session_start,
             |  MAX(ts) AS session_end, COUNT(*) AS n_events,
             |  ROUND(SUM(value), 4) AS total_value
             |FROM sess GROUP BY user_id, sid""".stripMargin)),

    // Watermarked windowed streaming aggregation, DuckDB-oracled: the
    // events table streamed through the file source, 5-minute tumbling
    // windows per event type, drained with AvailableNow into a lake
    // sink. Tumbling windows are time_bucket in DuckDB, so the whole
    // streaming pipeline (source replay, watermark state, window
    // close, sink commit) is hash-checked, not rows-only.
    QueryDef("streaming_windowed_counts",
      (s, dir) => QueryDef.pinnedShufflePartitions(s) {
        val sf = new java.io.File(dir).getName
        val root = java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"), "graft_stream_win", sf)
        graft.lake.LakeWriter.deleteRecursively(root)
        // the stream's declared schema must match the parquet file's
        // physical types, which the driver regenerates per round (ts
        // has been TIMESTAMP(NANOS)-as-long and TIMESTAMP(MICROS)) —
        // derive it from the file and normalize ts type-adaptively
        val fileSchema = s.read
          .option("pathGlobFilter", "events.parquet").parquet(dir).schema
        val events = QueryDef.normalizeTs(s.readStream
          .schema(fileSchema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(dir))
        val windowed = graft.streaming.LakeStreaming
          .windowedEventCounts(events)
        // complete mode: append-mode watermarking would (correctly)
        // hold back the final, never-closed windows — the gate wants
        // the full aggregation state, overwritten per micro-batch
        val outPath = s"$root/out"
        val q = windowed
          .select(col("window.start").as("w_start"),
            col("event_type"), col("n"), col("total_value"))
          .writeStream
          .outputMode("complete")
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            graft.lake.LakeWriter.write(batch, outPath, mode = "overwrite")
            ()
          }
          .start()
        q.awaitTermination(120000)
        graft.lake.LakeTable.forPath(s, outPath).toDF
          .select(col("w_start"), col("event_type"),
            col("n"), round(col("total_value"), 4).as("total_value"))
      },
      Some("""SELECT time_bucket(INTERVAL 5 MINUTES, ts) AS w_start,
             |  event_type, COUNT(*) AS n,
             |  ROUND(SUM(value), 4) AS total_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // Declarative streaming sessionization (round 12): the built-in
    // `session_window` aggregate — gap-merged session state in the
    // state store, closed by watermark — drained with AvailableNow
    // into a lake sink and hash-checked against gaps-and-islands SQL.
    // Note the boundary semantics divergence from sessionize_events:
    // session_window merges an event iff it lands STRICTLY inside
    // last+gap (an exactly-30-minutes-later event opens a NEW
    // session), and session_end is last event + gap — the oracle
    // encodes both, so a drift in either contract hash-mismatches.
    QueryDef("streaming_session_window",
      (s, dir) => QueryDef.pinnedShufflePartitions(s) {
        val sf = new java.io.File(dir).getName
        val root = java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"), "graft_stream_sess", sf)
        graft.lake.LakeWriter.deleteRecursively(root)
        val fileSchema = s.read
          .option("pathGlobFilter", "events.parquet").parquet(dir).schema
        val events = QueryDef.normalizeTs(s.readStream
          .schema(fileSchema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(dir))
        val sessions = graft.streaming.LakeStreaming
          .sessionWindowCounts(events, gapMinutes = 30)
        // complete mode for the same reason as the windowed gate: the
        // gate wants every session, including ones the watermark
        // would still be holding open in append mode
        val outPath = s"$root/out"
        val q = sessions.writeStream
          .outputMode("complete")
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            graft.lake.LakeWriter.write(batch, outPath, mode = "overwrite")
            ()
          }
          .start()
        q.awaitTermination(120000)
        graft.lake.LakeTable.forPath(s, outPath).toDF
          .select(col("user_id"), col("session_start"),
            col("session_end"), col("n_events"),
            round(col("total_value"), 4).as("total_value"))
      },
      Some("""WITH marked AS (
             |  SELECT user_id, ts, value,
             |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |         < INTERVAL 30 MINUTES THEN 0 ELSE 1 END AS new_sess
             |  FROM events),
             |sess AS (
             |  SELECT user_id, ts, value,
             |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM marked)
             |SELECT user_id, MIN(ts) AS session_start,
             |  MAX(ts) + INTERVAL 30 MINUTES AS session_end,
             |  COUNT(*) AS n_events,
             |  ROUND(SUM(value), 4) AS total_value
             |FROM sess GROUP BY user_id, sid""".stripMargin)),

    // Streaming exact dedup: the same events file staged TWICE in the
    // landing dir simulates at-least-once redelivery (a connector
    // replaying a file after a crash). `dropDuplicates` on the event
    // key holds the seen-key set in streaming state — with
    // maxFilesPerTrigger=1 the replay arrives in a LATER micro-batch,
    // so suppression crosses batch boundaries through the state store,
    // not within-batch distinct. Unbounded state is the point here
    // (replay can be arbitrarily late); bounded-lateness pipelines use
    // dropDuplicatesWithinWatermark instead. Oracle: the dedup must
    // reconstruct exactly the single-delivery aggregate.
    QueryDef("streaming_dedup",
      (s, dir) => QueryDef.pinnedShufflePartitions(s) {
        import java.nio.file.{Files, Paths}
        val sf = new java.io.File(dir).getName
        val root = java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"), "graft_stream_dedup", sf)
        graft.lake.LakeWriter.deleteRecursively(root)
        val landing = root.resolve("landing")
        Files.createDirectories(landing)
        Files.copy(Paths.get(dir, "events.parquet"),
          landing.resolve("a.parquet"))
        Files.copy(Paths.get(dir, "events.parquet"),
          landing.resolve("b.parquet"))
        val outPath = s"$root/out"
        val q = s.readStream
          .schema(s.read.parquet(landing.toString).schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(landing.toString)
          .dropDuplicates("event_id")
          .writeStream
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            graft.lake.LakeWriter.write(
              batch.select("event_id", "event_type", "value"), outPath)
            ()
          }
          .start()
        q.awaitTermination(120000)
        // exact integer sum (value at 1e-4 grain): float SUM order
        // differs between engines at this group size
        graft.lake.LakeTable.forPath(s, outPath).toDF
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(round(col("value") * 10000).cast("long"))
              .as("value_sum_e4"))
      },
      Some("""SELECT event_type, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(ROUND(value * 10000, 0) AS BIGINT)) AS BIGINT)
             |    AS value_sum_e4
             |FROM events GROUP BY 1""".stripMargin)),

    // Streaming NEAR-dup ingest: continuous document arrival with
    // near-duplicate suppression, where the dedup state is NOT the
    // Spark state store but the persisted minhash SIGNATURE lake table
    // ([[graft.ops.DedupOps.incrementalMinhashDedup]]) — state
    // restarts with the table, is shared across writers, and holds
    // ~256 B/doc regardless of text size. Batch 1 (odd docs, %4=1)
    // dedups against the seeded store and itself; its survivors'
    // signatures land in the store, so batch 2 (%4=3 + planted exact
    // copies of STORE docs) is suppressed against history AND batch
    // 1's survivors — cross-batch suppression flows through the lake
    // table append, not the checkpoint. The oracle replays both
    // batches sequentially in DuckDB bit math (signatures, banding,
    // est-Jaccard, keep-first, the store growth between batches).
    QueryDef("streaming_neardup_ingest",
      (s, dir) => QueryDef.pinnedShufflePartitions(s) {
        import java.nio.file.{Files, Paths}
        val sf = new java.io.File(dir).getName
        val root = Paths.get(
          sys.props("java.io.tmpdir"), "graft_stream_neardup", sf)
        graft.lake.LakeWriter.deleteRecursively(root)
        val landing = root.resolve("landing")
        Files.createDirectories(landing)
        val d = QueryDef.table(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        // one parquet FILE per intended micro-batch (coalesce(1) +
        // copy out of the staging dir), mtimes forced increasing so
        // the file source's oldest-first order IS the batch order
        def stageOne(df: org.apache.spark.sql.DataFrame, name: String,
            mtime: Long): Unit = {
          val tmp = root.resolve(s"stage_$name")
          df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = new java.io.File(tmp.toString).listFiles()
            .find(_.getName.endsWith(".parquet")).get.toPath
          Files.copy(part, landing.resolve(name))
          Files.setLastModifiedTime(landing.resolve(name),
            java.nio.file.attribute.FileTime.fromMillis(mtime))
          graft.lake.LakeWriter.deleteRecursively(tmp)
        }
        val planted = d.filter(col("doc_id") % 40 === 0)
          .select((col("doc_id") + 4000001L).as("doc_id"), col("text"))
        stageOne(d.filter("doc_id % 4 = 1"), "a.parquet", 1000000000000L)
        stageOne(d.filter("doc_id % 4 = 3").unionByName(planted),
          "b.parquet", 1000000060000L)
        val storePath = s"$root/store"
        graft.ops.DedupOps.buildMinhashStore(
          d.filter("doc_id % 2 = 0"), "text", "doc_id", storePath)
        val outPath = s"$root/out"
        val q = s.readStream
          .schema(d.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(landing.toString)
          .writeStream
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
              _: Long) =>
            val kept = graft.ops.DedupOps.incrementalMinhashDedup(
              batch, "text", "doc_id", storePath, minJaccard = 0.5)
            graft.lake.LakeWriter.write(kept, outPath)
            ()
          }
          .start()
        q.awaitTermination(120000)
        val out = graft.lake.LakeTable.forPath(s, outPath).toDF
        // exact copies of store docs share their source's signature:
        // every store-based drop reason transfers, so none can survive
        val survivors = out.filter(col("id") >= 4000000L).count()
        require(survivors == 0L,
          s"$survivors planted store-copies survived streaming dedup")
        out
      },
      Some(s"""WITH corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 4000001, text FROM documents
             |  WHERE doc_id % 40 = 0),
             |${DuckSql.minhashSigCtes("corpus")},
             |banded AS (SELECT doc_id, b,
             |    array_to_string(list_slice(sig, b*4+1, b*4+4), ',') AS bs
             |  FROM msig, (SELECT unnest(range(0,8)) AS b) bb),
             |est AS MATERIALIZED (SELECT x.doc_id AS id_a, y.doc_id AS id_b,
             |    len(list_filter(range(1, 33),
             |      i -> x.sig[i] = y.sig[i])) / 32.0 AS e
             |  FROM (SELECT DISTINCT a.doc_id, c.doc_id AS other
             |        FROM banded a JOIN banded c
             |          ON a.b = c.b AND a.bs = c.bs
             |         AND a.doc_id <> c.doc_id) cand
             |  JOIN msig x ON x.doc_id = cand.doc_id
             |  JOIN msig y ON y.doc_id = cand.other),
             |dup1s AS (SELECT DISTINCT id_a AS id FROM est
             |  WHERE id_a % 4 = 1 AND id_a < 4000000
             |    AND id_b % 2 = 0 AND id_b < 4000000 AND e >= 0.5),
             |dup1b AS (SELECT DISTINCT id_b AS id FROM est
             |  WHERE id_a % 4 = 1 AND id_a < 4000000
             |    AND id_b % 4 = 1 AND id_b < 4000000
             |    AND id_a < id_b AND e >= 0.5),
             |kept1 AS (SELECT doc_id AS id FROM corpus
             |  WHERE doc_id % 4 = 1 AND doc_id < 4000000
             |    AND doc_id NOT IN (SELECT id FROM dup1s)
             |    AND doc_id NOT IN (SELECT id FROM dup1b)),
             |dup2h AS (SELECT DISTINCT id_a AS id FROM est
             |  WHERE ((id_a % 4 = 3 AND id_a < 4000000)
             |         OR id_a >= 4000000)
             |    AND ((id_b % 2 = 0 AND id_b < 4000000)
             |         OR id_b IN (SELECT id FROM kept1))
             |    AND e >= 0.5),
             |dup2b AS (SELECT DISTINCT id_b AS id FROM est
             |  WHERE ((id_a % 4 = 3 AND id_a < 4000000)
             |         OR id_a >= 4000000)
             |    AND ((id_b % 4 = 3 AND id_b < 4000000)
             |         OR id_b >= 4000000)
             |    AND id_a < id_b AND e >= 0.5),
             |kept2 AS (SELECT doc_id AS id FROM corpus
             |  WHERE ((doc_id % 4 = 3 AND doc_id < 4000000)
             |         OR doc_id >= 4000000)
             |    AND doc_id NOT IN (SELECT id FROM dup2h)
             |    AND doc_id NOT IN (SELECT id FROM dup2b))
             |SELECT id FROM kept1 UNION ALL SELECT id FROM kept2"""
        .stripMargin)),

    // Structured Streaming ingest (SURVEY §2.10): raw JSON-lines files
    // streamed into a lake table with AvailableNow + foreachBatch.
    // The bronze content is fully closed-form — the ingested slice is
    // hours 0-7 × devices 1-10 with steps = 1000 + 37·idx mod 4000,
    // and the dirty rows' uuid device ids are UUIDv3 (= MD5 with
    // version/variant nibbles patched), reproducible in DuckDB from
    // md5() — so the whole streaming spine (file-source replay, JSON
    // round-trip, bronze metadata, txn-idempotent sink commits) is
    // hash-checked, not rows-only.
    QueryDef("streaming_ingest",
      (s, dir) => QueryDef.pinnedShufflePartitions(s) {
        val sf = new java.io.File(dir).getName
        val root = java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"), "graft_streaming", sf)
        graft.lake.LakeWriter.deleteRecursively(root)
        val (landing, raw, bronze) =
          (s"$root/landing", s"$root/raw", s"$root/bronze")
        val ingest = new Ingest(landing, raw)
        ingest.prepareActivityData(s, hours = 24)
        ingest.ingestClassicData(s, hours = 8, batchTag = "s1")
        val q = graft.streaming.LakeStreaming.streamRawToLake(
          s, raw, bronze, s"$root/ckpt")
        q.awaitTermination(120000)
        LakeTable.forPath(s, bronze).toDF
          .withColumn("event", from_json(col("value"),
            org.apache.spark.sql.types.StructType.fromDDL(
              "time TIMESTAMP, name STRING, device_id STRING, steps INTEGER")))
          .groupBy(col("event.device_id").as("device_id"), col("status"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("event.steps")).cast("long").as("total_steps"))
      },
      // uuidFor(d) = java.util.UUID.nameUUIDFromBytes("graft-user-d"):
      // md5 with hex char 13 forced to '3' (version) and char 17
      // mapped (n & 3) | 8 (variant) — the translate() below.
      Some("""WITH seed AS (
             |  SELECT h, d, h * 10 + d AS idx,
             |    1000 + (37 * (h * 10 + d)) % 4000 AS steps
             |  FROM range(0, 8) t1(h), range(1, 11) t2(d)),
             |uu AS (
             |  SELECT d, md5('graft-user-' || CAST(d AS VARCHAR)) AS hx
             |  FROM range(1, 11) t(d)),
             |uuids AS (
             |  SELECT d, substr(hx, 1, 8) || '-' || substr(hx, 9, 4) ||
             |    '-3' || substr(hx, 14, 3) || '-' ||
             |    translate(substr(hx, 17, 1),
             |      '0123456789abcdef', '89ab89ab89ab89ab') ||
             |    substr(hx, 18, 3) || '-' || substr(hx, 21, 12) AS u
             |  FROM uu)
             |SELECT CASE WHEN seed.idx % 7 = 0 THEN uuids.u
             |            ELSE CAST(seed.d AS VARCHAR) END AS device_id,
             |  'new' AS status, COUNT(*) AS n_rows,
             |  CAST(SUM(seed.steps) AS BIGINT) AS total_steps
             |FROM seed JOIN uuids ON uuids.d = seed.d
             |GROUP BY 1, 2""".stripMargin))
  )
}

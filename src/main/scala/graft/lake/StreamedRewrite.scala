package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}

/** Bounded-driver copy-on-write rewrites (VERDICT r18 #2).
  *
  * The classic rewrite DML shape collects the touched file paths to
  * the driver (`touchedPaths`), materializes their AddFiles in one
  * subset snapshot, rewrites them in one pass, and commits
  * removes + adds from driver-resident lists. O(touched) everywhere —
  * fine at any realistic selectivity, but a worst-case bulk MERGE /
  * UPDATE / DELETE on a 10⁷-file table drags ~10⁷ path strings plus
  * their interned AddFiles (~7 GB) through the driver.
  *
  * Above [[LakeTable.STREAMED_REWRITE_MIN_FILES]] touched files the
  * rewrite goes CHUNKED instead:
  *
  *  1. the DISTINCT touched-path frame stays distributed (persisted,
  *     counted — the count is the routing decision);
  *  2. the rewrite processes bounded path chunks: per chunk, the
  *     AddFiles arrive via the columnar index's path-filtered
  *     distributed fetch (`plan.subset`), the chunk's rows are
  *     rewritten and staged, and the resulting AddFile/CdcFile
  *     actions SPILL to a driver-local file — the driver holds
  *     O(chunk) paths + AddFiles at any moment, never O(touched);
  *  3. the commit streams: tombstones re-derive from the persisted
  *     path frame chunk by chunk, and the staged actions replay from
  *     the spill line by line
  *     ([[LakeWriter.commitStreamedExactConflicts]] keeps the classic
  *     per-path conflict semantics by streaming OUR paths against the
  *     interleaved commits' — small — touched sets).
  *
  * Chunk membership is `pmod(xxhash64(path), numChunks)` — a
  * deterministic, data-independent split, so re-deriving a chunk (or
  * the tombstone stream, or a commit retry) always yields the same
  * partition of the touched set.
  */
private[lake] object StreamedRewrite {

  /** High-water mark of simultaneously driver-resident touched paths
    * across all chunked rewrites — MetaScaleBench requires this stays
    * at O(chunk) while the touched count is table-sized.
    */
  private[graft] val peakDriverPaths =
    new java.util.concurrent.atomic.AtomicLong

  /** Count of rewrites that took the chunked path (test hook). */
  private[graft] val chunkedRewrites =
    new java.util.concurrent.atomic.AtomicLong

  /** Test hook: runs after every chunk is staged and spilled,
    * immediately before the streamed commit — the crash window the
    * spill sweep exists for (StoreContractSuite kills here and
    * asserts the table is untouched and the staged files are gone).
    */
  private[graft] var onBeforeStreamedCommit: () => Unit = () => ()

  private def notePeak(n: Long): Unit = {
    var cur = peakDriverPaths.get()
    while (n > cur && !peakDriverPaths.compareAndSet(cur, n))
      cur = peakDriverPaths.get()
  }

  /** Chunked access to the persisted distinct touched-path frame. */
  final class TouchedChunks private[StreamedRewrite] (
      table: LakeTable, pathsDF: DataFrame, val count: Long) {
    val numChunks: Int = math.max(1,
      ((count + LakeTable.REWRITE_CHUNK_FILES - 1) /
        LakeTable.REWRITE_CHUNK_FILES).toInt)

    private def chunk(i: Int): Seq[String] = {
      val rows = pathsDF
        .filter(pmod(xxhash64(col("__graft_touched")),
          lit(numChunks.toLong)) === i.toLong)
        .collect()
      notePeak(rows.length.toLong)
      rows.map(r => table.relativize(r.getString(0))).toSeq
    }

    /** Run `f` over every NON-EMPTY chunk's relativized paths, one
      * resident at a time (hash chunking can leave a chunk empty when
      * the chunk count is close to the path count — the suite's
      * shrunk-budget shape; a rewrite over zero files is a no-op).
      */
    def foreachChunk(f: (Int, Seq[String]) => Unit): Unit =
      (0 until numChunks).foreach { i =>
        val c = chunk(i)
        if (c.nonEmpty) f(i, c)
      }

    /** All touched paths as a chunk-buffered stream (the tombstone
      * source; resident window = one chunk).
      */
    def pathIterator(): Iterator[String] =
      (0 until numChunks).iterator.flatMap(chunk)

    /** Predicate selecting chunk `i`'s rows of a frame keyed by the
      * RAW scan-reported file URI — the same hash that defines path
      * chunk membership, so a row lands with exactly its file's chunk.
      */
    def memberOf(pathCol: org.apache.spark.sql.Column, i: Int)
        : org.apache.spark.sql.Column =
      pmod(xxhash64(pathCol), lit(numChunks.toLong)) === i.toLong

    def unpersist(): Unit = { pathsDF.unpersist(false); () }
  }

  /** Spill file for the staged actions of an in-flight chunked
    * rewrite: AddFile/CdcFile JSON lines on the driver's local disk —
    * O(1) heap while writing, O(line) while replaying into the
    * commit.
    */
  final class ActionSpill {
    private val file = java.nio.file.Files.createTempFile(
      "graft-rewrite-spill-", ".jsonl")
    private val out = java.nio.file.Files.newBufferedWriter(
      file, java.nio.charset.StandardCharsets.UTF_8)
    private var closed = false
    private var count = 0L

    def append(actions: Seq[Action]): Unit = synchronized {
      require(!closed, "spill already sealed")
      actions.foreach { a =>
        out.write(Action.toJson(a)); out.newLine(); count += 1
      }
    }

    def size: Long = synchronized(count)

    private def seal(): Unit = synchronized {
      if (!closed) { out.close(); closed = true }
    }

    /** Replay the spilled actions (seals the spill first). Re-invocable
      * — each call opens its own reader (commit retries re-pull the
      * bulk stream); the reader closes at exhaustion, and a deleted
      * still-open spill is harmless on POSIX.
      */
    def iterator(): Iterator[Action] = {
      seal()
      import scala.jdk.CollectionConverters._
      val reader = java.nio.file.Files.newBufferedReader(
        file, java.nio.charset.StandardCharsets.UTF_8)
      new Iterator[Action] {
        private val it = reader.lines().iterator().asScala
        def hasNext: Boolean = {
          val h = it.hasNext
          if (!h) reader.close()
          h
        }
        def next(): Action = Action.fromJson(it.next())
      }
    }

    /** Failure sweep: delete every staged file the spill references
      * (data, bloom sidecars, cdc) — the streamed twin of
      * [[LakeWriter.sweepStaged]]. Never throws.
      *
      * `dvOnly` is for a spill holding merge-on-read actions
      * (RemoveFiles + DV re-adds): a DV re-add's `path` is a LIVE
      * pre-existing data file — only its freshly staged DV sidecar
      * may be deleted on failure.
      */
    def sweep(tablePath: String, dvOnly: Boolean = false): Unit = {
      try iterator().foreach { a =>
        val rels: Seq[String] = a match {
          case add: AddFile if dvOnly => add.dvPath.toSeq
          case add: AddFile => add.path +: add.bloomPath.toSeq
          case c: CdcFile => Seq(c.path)
          case _ => Nil
        }
        rels.foreach { rel =>
          try {
            DataStore.current.deleteIfExists(
              java.nio.file.Paths.get(tablePath, rel)); ()
          } catch { case _: java.io.IOException => () }
        }
      } catch { case _: Throwable => () }
    }

    def delete(): Unit = {
      seal()
      try { java.nio.file.Files.deleteIfExists(file); () }
      catch { case _: java.io.IOException => () }
    }
  }

  /** Touched-path discovery with the scale split. `rawPathsDF` is a
    * one-column frame of scan-reported file URIs (possibly with
    * duplicates — distinct happens here). Left = the classic
    * driver-resident list (exactly the pre-split behavior, including
    * for every Classic-plan table, whose snapshot is driver-resident
    * anyway); Right = the chunked view, taken only when the live set
    * AND the touched count both clear
    * [[LakeTable.STREAMED_REWRITE_MIN_FILES]].
    */
  def split(table: LakeTable, plan: DmlPlan, rawPathsDF: DataFrame)
      : Either[Seq[String], TouchedChunks] = {
    val big = plan.isInstanceOf[DmlPlan.Columnar] &&
      plan.liveFileCountHint >= LakeTable.STREAMED_REWRITE_MIN_FILES
    val named = rawPathsDF.toDF("__graft_touched")
    if (!big) {
      // a table below the threshold cannot exceed it: keep the exact
      // single-job collect of the classic path
      Left(named.distinct().collect()
        .map(r => table.relativize(r.getString(0))).toSeq)
    } else {
      val distinct = named.distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = distinct.count()
      if (n < LakeTable.STREAMED_REWRITE_MIN_FILES) {
        val r = distinct.collect()
          .map(r => table.relativize(r.getString(0))).toSeq
        distinct.unpersist(false)
        Left(r)
      } else {
        chunkedRewrites.incrementAndGet()
        Right(new TouchedChunks(table, distinct, n))
      }
    }
  }
}

package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE INTO for lake tables, with the reference's builder shape
  * (`etl/02:501-506`, `rapid:416-420`, `util:68-73`):
  *
  * {{{
  * LakeTable.forPath(spark, path).as("t")
  *   .merge(sourceDF.as("s"), "t.value = s.value")
  *   .whenMatchedUpdate(Map("status" -> "s.status"))
  *   .whenNotMatchedInsert(Map("value" -> "s.value", ...))
  *   .execute()
  * }}}
  *
  * Algorithm (SURVEY §7.3, mirroring the Delta MERGE strategy):
  *  1. inner/semi join source × target to find *touched files*;
  *  2. full-outer join source × (rows of touched files only), classify
  *     each row matched / target-only / source-only, apply the clause
  *     list in order (first clause whose condition holds wins);
  *  3. atomically commit RemoveFile(touched) + AddFile(rewritten).
  *
  * The join condition is an arbitrary expression — non-equi and RLIKE
  * conditions (J5, `etl/05:100-107`) plan as broadcast-nested-loop
  * joins automatically. A target row matched by more than one source
  * row errors when update/delete clauses exist (Delta semantics,
  * `etl/02:250-252` relies on it).
  *
  * `WHEN NOT MATCHED BY SOURCE` clauses (Delta parity) act on target
  * rows with no source match — the table-sync idiom
  * (matched-update + not-matched-insert + by-source-delete) in one
  * atomic commit. Their file-touch set comes from an anti-join, and
  * their expressions must resolve against the target alone.
  */
final class LakeMergeBuilder private[lake] (
    table: LakeTable,
    targetAlias: Option[String],
    source: DataFrame,
    condition: String) {

  private sealed trait MatchedClause {
    def cond: Option[String]
  }
  private case class UpdateClause(cond: Option[String],
      set: Map[String, String]) extends MatchedClause
  private case class DeleteClause(cond: Option[String]) extends MatchedClause
  private case class InsertClause(cond: Option[String],
      values: Map[String, String])

  private var matchedClauses = Vector.empty[MatchedClause]
  private var insertClauses = Vector.empty[InsertClause]
  private var bySourceClauses = Vector.empty[MatchedClause]
  private var schemaEvolution = false
  private var txn: Option[(String, Long)] = None

  /** Idempotent-writer watermark riding the MERGE commit (the same
    * Delta `txn` action [[LakeWriter.write]] supports for appends):
    * when `(appId, version)` is already recorded in the table's
    * transactions, the whole merge is a silent no-op. This is what
    * makes a foreachBatch MERGE sink exactly-once — a restarted
    * streaming query replaying an already-committed micro-batch must
    * not re-apply it (deletes would no-op but a re-run of
    * aggregating/expression SETs could diverge, and the replay would
    * burn a rewrite commit either way). Re-checked on every commit
    * retry: if a concurrent twin of the same app lands the txn while
    * this merge stages, the commit aborts and the merge returns
    * quietly instead of double-applying.
    */
  def withTransaction(appId: String, version: Long): LakeMergeBuilder = {
    txn = Some((appId, version))
    this
  }

  /** Enable automatic schema evolution (Delta's
    * `withSchemaEvolution()` / SQL `MERGE WITH SCHEMA EVOLUTION`):
    * source columns absent from the target are added to the table —
    * nullable, in ONE metadata commit — before the merge runs, so
    * `UPDATE SET *` / `INSERT *` carry them through. Existing rows
    * read NULL for the new columns (same read-schema mechanics as
    * ALTER TABLE ADD COLUMN). Explicit set/values maps keep the
    * all-columns-explicit discipline against the WIDENED schema.
    */
  def withSchemaEvolution(): LakeMergeBuilder = {
    schemaEvolution = true
    this
  }

  def whenMatchedUpdate(set: Map[String, String]): LakeMergeBuilder =
    whenMatchedUpdate(null, set)

  def whenMatchedUpdate(condition: String,
      set: Map[String, String]): LakeMergeBuilder = {
    matchedClauses :+= UpdateClause(Option(condition), set)
    this
  }

  /** UPDATE SET * — every target column from the like-named source
    * column, qualified by the source alias when given.
    */
  def whenMatchedUpdateAll(): LakeMergeBuilder = {
    matchedClauses :+= UpdateClause(None, null)
    this
  }

  /** UPDATE SET * guarded by a clause condition. */
  def whenMatchedUpdateAll(condition: String): LakeMergeBuilder = {
    matchedClauses :+= UpdateClause(Option(condition), null)
    this
  }

  def whenMatchedDelete(): LakeMergeBuilder = whenMatchedDelete(null)

  def whenMatchedDelete(condition: String): LakeMergeBuilder = {
    matchedClauses :+= DeleteClause(Option(condition))
    this
  }

  def whenNotMatchedInsert(values: Map[String, String]): LakeMergeBuilder =
    whenNotMatchedInsert(null, values)

  def whenNotMatchedInsert(condition: String,
      values: Map[String, String]): LakeMergeBuilder = {
    insertClauses :+= InsertClause(Option(condition), values)
    this
  }

  /** INSERT * — every target column from the like-named source column. */
  def whenNotMatchedInsertAll(): LakeMergeBuilder = {
    insertClauses :+= InsertClause(None, null)
    this
  }

  /** WHEN NOT MATCHED BY SOURCE ... UPDATE — acts on TARGET rows with
    * no matching source row (Delta's by-source clauses; the standard
    * table-sync idiom is matched-update + not-matched-insert +
    * by-source-delete). Set expressions and the clause condition may
    * reference target columns only: source columns are definitionally
    * NULL for these rows, so a source reference would silently
    * null-poison the update — rejected up front in [[execute]].
    */
  def whenNotMatchedBySourceUpdate(
      set: Map[String, String]): LakeMergeBuilder =
    whenNotMatchedBySourceUpdate(null, set)

  def whenNotMatchedBySourceUpdate(condition: String,
      set: Map[String, String]): LakeMergeBuilder = {
    require(set != null, "BY SOURCE update requires an explicit set map " +
      "(UPDATE SET * is undefined when there is no source row)")
    bySourceClauses :+= UpdateClause(Option(condition), set)
    this
  }

  /** WHEN NOT MATCHED BY SOURCE ... DELETE. */
  def whenNotMatchedBySourceDelete(): LakeMergeBuilder =
    whenNotMatchedBySourceDelete(null)

  def whenNotMatchedBySourceDelete(condition: String): LakeMergeBuilder = {
    bySourceClauses :+= DeleteClause(Option(condition))
    this
  }

  def execute(): Unit = {
    require(matchedClauses.nonEmpty || insertClauses.nonEmpty ||
      bySourceClauses.nonEmpty,
      "merge needs at least one WHEN MATCHED / WHEN NOT MATCHED / " +
      "WHEN NOT MATCHED BY SOURCE clause")
    if (schemaEvolution) {
      // metadata-light: the widen decision needs the schema only
      val tgt = org.apache.spark.sql.types.StructType.fromDDL(
        Snapshot.replayMeta(table.log, table.log.latestVersion)
          ._1.schemaDDL).fieldNames
        .map(_.toLowerCase).toSet
      val newCols = source.schema.fields
        .filterNot(f => tgt.contains(f.name.toLowerCase))
        .map(f => f.name -> f.dataType.sql).toSeq
      if (newCols.nonEmpty) table.addColumns(newCols)
    }
    val SRC = "__graft_src_present"

    def aliasTgt(df: DataFrame): DataFrame =
      targetAlias.map(df.as(_)).getOrElse(df)
    // Marker column added *after* the caller's .as(alias) — projections
    // preserve attribute qualifiers, so "s.col" still resolves.
    // Cached: the source participates in up to three jobs (touched-file
    // semi-join, rewrite join, insert anti-join); without caching an
    // expensive source plan would be recomputed each time.
    val src = source.withColumn(SRC, lit(true))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try executeWith(aliasTgt, src)
    catch {
      // a concurrent twin of the same app committed this txn while we
      // were staging: its effect IS this merge's effect — success
      case _: TxnAlreadyCommittedException => ()
      // the twin's commit can also surface as a REWRITE conflict
      // (both merges touch the same files, and the file-conflict
      // check fires before any closure re-check can) — same verdict
      // iff the txn is now recorded; a conflict with any OTHER
      // writer stays loud. Metadata-light: the watermark check needs
      // txns only, never the file list.
      case e: ConflictingCommitException
          if txn.exists { case (a, v) =>
            Snapshot.replayMetaTxns(table.log, table.log.latestVersion)
              ._4.get(a).exists(_ >= v) } => ()
    }
    finally { src.unpersist(false); () }
  }

  private def executeWith(
      aliasTgt: DataFrame => DataFrame, src: DataFrame): Unit = {
    // The rewritten data and the persisted CDC derive from the SAME
    // frame; when any clause expression (or the source plan) is
    // non-deterministic, that frame is materialized to scratch parquet
    // ONCE so a second evaluation can't diverge rand()/uuid()/
    // current_timestamp between the data files and the CDC files
    // (cache blocks are best-effort; a parquet stage is not).
    // Deterministic merges — the common case — keep today's plan
    // shape: re-evaluation is byte-identical by definition.
    val scratches = scala.collection.mutable.Buffer.empty[java.nio.file.Path]
    def materializeIfNonDeterministic(df: DataFrame): DataFrame =
      if (df.queryExecution.analyzed.exists(
          _.expressions.exists(!_.deterministic))) {
        val dir = java.nio.file.Paths.get(table.tablePath,
          s".staging-mrg-${java.util.UUID.randomUUID()}")
        df.write.mode("overwrite").parquet(dir.toString)
        scratches += dir
        table.spark.read.parquet(dir.toString)
      } else df
    try executeStaged(aliasTgt, src, materializeIfNonDeterministic)
    finally scratches.foreach(LakeWriter.deleteRecursively)
  }

  private def executeStaged(
      aliasTgt: DataFrame => DataFrame, src: DataFrame,
      materializeIfNonDeterministic: DataFrame => DataFrame): Unit = {
    val spark = table.spark
    // DML plan (VERDICT r14 #2): under the columnar conf the
    // touched-file discovery, the insert anti-join, and the touched
    // AddFile fetch all run through the distributed checkpoint scan —
    // a MERGE against a 10⁷-file table never materializes the live
    // list on the driver; only the touched subset does.
    val plan = table.dmlPlan()
    // idempotence: this app already committed through this version —
    // the merge's effect is in the table, replaying it would not be
    if (txn.exists { case (a, v) =>
        plan.transactions.get(a).exists(_ >= v) })
      return
    // insert-only merges are appends; matched / by-source clauses
    // rewrite rows
    if (matchedClauses.nonEmpty || bySourceClauses.nonEmpty)
      LakeTable.assertNotAppendOnly(plan.metadata,
        "MERGE with matched clauses", table.tablePath)
    val fields = plan.schema.fields.toSeq
    val condExpr = expr(condition)
    val FILE = "__graft_file"
    val RID = "__graft_rid"
    val SRC = "__graft_src_present"
    val IDXC = "__graft_clause"
    val MATCHED = "__graft_matched"
    val DVFILE = "__graft_dv_file"
    val DVIDX = "__graft_dv_idx"
    // Merge-on-read MERGE (deletion-vector tables): clause-hit rows
    // are soft-deleted via DV sidecars and only the UPDATED versions
    // and inserts are written — write volume O(clause-hit rows)
    // instead of O(touched files).
    val dvMode = LakeTable.dvEnabled(plan.metadata)
    // Row-tracked tables ([[RowTracking]]): target-derived rewrite
    // rows (updates AND untouched keep-side rows) carry their ids
    // into the new files; merge-INSERTED rows are new logical rows
    // and read fresh ids from the new file's baseRowId block (their
    // materialized id is null, so the read-side coalesce falls
    // through to base + row_index).
    val rt = RowTracking.enabled(plan.metadata.properties)

    // Single-evaluation discipline: each side's combined frame feeds up
    // to three consumers (dup fail-fast, table rewrite, CDC). A
    // non-deterministic frame is staged to parquet (durable, so rand()/
    // uuid() can't diverge between consumers); a deterministic one is
    // cached so the target×source join runs once per MERGE instead of
    // once per consumer — a lost block recomputes byte-identically by
    // definition. MEMORY_AND_DISK, not UPDATE's DISK_ONLY: merge
    // rewrite frames are hot for milliseconds between the dup check
    // and the two writes, per-block spill already bounds memory use
    // under pressure, and the A/B on the 4-merge medallion measured
    // DISK_ONLY ~8% slower (5.34 vs 4.95 s min-of-6).
    val caches = scala.collection.mutable.Buffer.empty[DataFrame]
    def evaluateOnce(df: DataFrame): DataFrame = {
      val out = materializeIfNonDeterministic(df)
      if (out eq df) {
        out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        caches += out
      }
      out
    }

    def qualTgt(name: String): Column =
      col(targetAlias.map(a => s"$a.`$name`").getOrElse(s"`$name`"))
    val sourceAliasName: Option[String] = sourceAliasOf(source)
    def qualSrc(name: String): Column =
      col(sourceAliasName.map(a => s"$a.`$name`").getOrElse(s"`$name`"))
    def clauseCond(c: Option[String]): Column =
      c.map(expr).getOrElse(lit(true))

    // Explicit insert maps must supply EVERY table column — the
    // reference's discipline (`rapid:610-629` redefines the insert map
    // after schema evolution rather than relying on null-fill), which
    // SURVEY §7.9 requires replicating. This intentionally diverges
    // from Delta's silent null-fill: a merge written before an ALTER
    // TABLE ADD COLUMN fails loudly here, before any job runs, instead
    // of quietly writing nulls. Intentional nulls stay expressible
    // (`CAST(NULL AS ...)`), and INSERT * (`whenNotMatchedInsertAll`)
    // is unaffected.
    insertClauses.withFilter(_.values != null).foreach { cl =>
      val missing = fields.map(_.name).filterNot(cl.values.contains)
      if (missing.nonEmpty) throw new IllegalArgumentException(
        "MERGE insert clause must supply every table column " +
        s"(missing: ${missing.mkString(", ")}). After schema " +
        "evolution, redefine the insert map explicitly — use " +
        "CAST(NULL AS <type>) for intentional nulls, or " +
        "whenNotMatchedInsertAll() / INSERT * for like-named " +
        "source columns.")
    }

    // BY SOURCE clause expressions must resolve against the target
    // alone — a source-column reference would be silently NULL for
    // every not-matched row. Analyzed (not executed) on the driver
    // against the target plan; unresolvable ⇒ loud failure before any
    // job runs.
    if (bySourceClauses.nonEmpty) {
      // analysis only — an empty frame with the table schema resolves
      // identically and costs no planning against the file index
      val tgtOnly = aliasTgt(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        plan.schema))
      val exprs = bySourceClauses.flatMap {
        case UpdateClause(c, set) => c.toSeq ++ set.values
        case DeleteClause(c) => c.toSeq
      }
      exprs.foreach { e =>
        try tgtOnly.select(expr(e)).queryExecution.analyzed
        catch { case ex: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"WHEN NOT MATCHED BY SOURCE expression '$e' must " +
            "reference target columns only (source columns are NULL " +
            s"for by-source rows): ${ex.getMessage}")
        }
      }
    }

    // ---- rewrite side: touched files → left-outer rewrite ---------------
    // Phase 1: find the files that must be rewritten. Matched clauses
    // touch files containing >=1 join match (semi-join); by-source
    // clauses touch files containing >=1 row with NO match where some
    // clause condition holds (anti-join). Only those files are
    // rewritten — an unconditional by-source clause degrades to
    // all-files-with-unmatched-rows, which is what the semantics
    // require.
    try {
    // the with-meta frame (not toDF): `_metadata` is materialized as
    // a real column so file identity survives the deletion-vector
    // anti-join/union on DV-carrying tables.
    val withFile = aliasTgt(
      plan.withMetaDF.withColumn(FILE, col("_metadata.file_path")))
    val bySourceHit: Column = bySourceClauses
      .map(cl => clauseCond(cl.cond))
      .reduceOption(_ || _).getOrElse(lit(false))

    // ---- clause machinery, shared by the classic single-pass rewrite
    // and the chunked path (all pure Column builders) -------------------
    val matched = col(SRC).isNotNull
    // One ordered clause list drives the whole rewrite: matched
    // clauses guard on `matched`, by-source clauses on `!matched`
    // (a target row is exactly one of the two, so the relative order
    // across the groups never changes an outcome — within each group
    // first-hit wins, Delta semantics).
    val allClauses = matchedClauses ++ bySourceClauses
    def clauseGuard(i: Int): Column =
      if (i < matchedClauses.size) matched else !matched
    // 0 = no clause applies (keep row as-is); i >= 1 = clause i-1 wins.
    val clauseIdx = allClauses.zipWithIndex.foldLeft(
      when(lit(false), lit(0))) { case (acc, (cl, i)) =>
        acc.when(clauseGuard(i) && clauseCond(cl.cond), lit(i + 1))
    }.otherwise(lit(0))
    val deleteIdxs = allClauses.zipWithIndex.collect {
      case (_: DeleteClause, i) => i + 1
    }
    val keep =
      if (deleteIdxs.isEmpty) lit(true)
      else !col(IDXC).isin(deleteIdxs: _*)
    val updateIdxs = allClauses.zipWithIndex.collect {
      case (_: UpdateClause, i) => i + 1
    }
    // clause-applied new value for a field: the winning update
    // clause's expression, the original target value otherwise
    def newValue(f: org.apache.spark.sql.types.StructField): Column = {
      val updates = allClauses.zipWithIndex.collect {
        case (UpdateClause(_, set), i) =>
          val e = if (set == null) qualSrc(f.name)
            else set.get(f.name).map(expr).getOrElse(qualTgt(f.name))
          (i + 1, e)
      }
      updates.foldLeft(when(lit(false), lit(null))) { case (acc, (i, e)) =>
        acc.when(col(IDXC) === i, e)
      }.otherwise(qualTgt(f.name)).cast(f.dataType)
    }
    def newName(n: String) = s"_graft_mrg_$n"
    // newSide: CDC postimages (table columns only); newSideData:
    // the rows actually written, carrying the row id on tracked
    // tables
    def newSide(df: DataFrame): DataFrame =
      df.select(fields.map(f => col(s"`${newName(f.name)}`").as(f.name)): _*)
    def newSideData(df: DataFrame): DataFrame =
      df.select(fields.map(f => col(s"`${newName(f.name)}`").as(f.name)) ++
        (if (rt) Seq(col(s"`${RowTracking.COL}`")) else Nil): _*)
    def oldSide(df: DataFrame): DataFrame =
      df.select(fields.map(f => col(s"`${f.name}`")): _*)
    // Delta semantics: error if one target row matches several source
    // rows while the outcome would be nondeterministic — any update,
    // or a conditional delete. An unconditional delete is unambiguous
    // (deleting a row twice is still deleting it), which the GDPR
    // RLIKE-delete (etl/05:100-107) depends on: one record can match
    // several deletion patterns.
    val ambiguous = matchedClauses.exists {
      case _: UpdateClause => true
      case DeleteClause(c) => c.isDefined
    }

    /** Touched rows of `relPaths` with (RID, DV identity) columns. */
    def tgtTouchedFor(snapT: Snapshot, relPaths: Seq[String]): DataFrame =
      aliasTgt(
        table.readFilesWithMeta(snapT, relPaths, withRowIds = rt)
        .withColumn(RID, concat_ws("#",
          col("_metadata.file_path"), col("_metadata.row_index")))
        .withColumn(DVFILE, col("_metadata.file_path"))
        .withColumn(DVIDX, col("_metadata.row_index"))
        .drop(graft.sources.LakeDataSource.META))

    def joinedFor(tgtTouched: DataFrame): DataFrame =
      if (matchedClauses.nonEmpty)
        tgtTouched.join(src, condExpr, "left_outer")
      else {
        // By-source-only merge: no clause reads source values, so
        // only a match FLAG is needed. A plain left-outer would
        // duplicate a target row that matches k source rows (every
        // copy kept, clause 0); semi-join + RID equi-join keeps
        // exactly one copy per target row. (With matched clauses
        // present the duplicate either errors via the multi-match
        // check or is deleted, so this case is the only exposure.)
        val matchedRids = tgtTouched.join(src, condExpr, "left_semi")
          .select(col(RID)).withColumn(SRC, lit(true))
        tgtTouched.join(matchedRids, Seq(RID), "left_outer")
      }

    /** The combined frame: (old values, clause-applied new values,
      * matched flag, winning clause index) — the duplicate-match
      * fail-fast, the rewritten data, the CDC preimage and the CDC
      * postimage are all column-subsets of it.
      */
    def combinedRawFor(joined: DataFrame): DataFrame =
      joined.withColumn(IDXC, clauseIdx).select(
        fields.map(f => qualTgt(f.name).cast(f.dataType).as(f.name)) ++
        fields.map(f => newValue(f).as(newName(f.name))) ++
        Seq(col(RID), matched.as(MATCHED), col(IDXC)) ++
        (if (rt)
          Seq(qualTgt(RowTracking.COL).as(RowTracking.COL)) else Nil) ++
        (if (dvMode) Seq(col(DVFILE), col(DVIDX)) else Nil): _*)

    // ---- touched-file discovery, with the chunked-rewrite split --------
    val matchedPathsDF: Option[DataFrame] =
      if (matchedClauses.isEmpty || plan.isEmpty) None
      else Some(withFile.join(src, condExpr, "left_semi").select(col(FILE)))
    val bySourcePathsDF: Option[DataFrame] =
      if (bySourceClauses.isEmpty || plan.isEmpty) None
      else Some(withFile.join(src, condExpr, "left_anti")
        .filter(bySourceHit).select(col(FILE)))
    val touchedSplit: Either[Seq[String], StreamedRewrite.TouchedChunks] =
      (matchedPathsDF.toSeq ++ bySourcePathsDF.toSeq)
        .reduceOption(_.union(_)) match {
        case None => Left(Nil)
        case Some(df) => StreamedRewrite.split(table, plan, df)
      }

    // ---- not-matched side builder (shared): anti-join → inserts --------
    def insertsFrame(evalOnce: DataFrame => DataFrame): Option[DataFrame] =
      if (insertClauses.isEmpty) None else {
        val unmatched =
          if (plan.isEmpty) src
          else src.join(aliasTgt(plan.toDF), condExpr, "left_anti")
        val insertIdx = insertClauses.zipWithIndex.foldLeft(
          when(lit(false), lit(0))) { case (acc, (cl, i)) =>
            acc.when(clauseCond(cl.cond), lit(i + 1))
        }.otherwise(lit(0))
        // evaluated once: the same rows feed the table write AND the
        // CDC insert records, without re-running the anti-join
        Some(evalOnce(
          unmatched.withColumn(IDXC, insertIdx)
            .filter(col(IDXC) > 0)
            .select(fields.map { f =>
              val values = insertClauses.zipWithIndex.map { case (cl, i) =>
                val e = if (cl.values == null) qualSrc(f.name)
                  else cl.values.get(f.name).map(expr).getOrElse(lit(null))
                (i + 1, e)
              }
              values.foldLeft(when(lit(false), lit(null))) {
                case (acc, (i, e)) => acc.when(col(IDXC) === i, e)
              }.otherwise(lit(null)).cast(f.dataType).as(f.name)
            }: _*)))
      }

    /** CHUNKED merge rewrite ([[StreamedRewrite]], non-DV): one
      * bounded path chunk at a time — per chunk, the combined frame
      * evaluates once (chunk-local cache, or parquet scratch when
      * non-deterministic), feeds the dup fail-fast + data stage + CDC
      * stage, and the staged actions spill. Inserts compute ONCE from
      * the full-table anti-join (their semantics are global, not
      * per-chunk), and the commit streams tombstones + spilled
      * actions under the exact per-path conflict check. A RID (file,
      * row) lives in exactly one chunk, so the per-chunk dup count is
      * exact.
      */
    def chunkedMergeRewrite(
        chunks: StreamedRewrite.TouchedChunks): Unit = {
      val spill = new StreamedRewrite.ActionSpill
      // merge-on-read: per-chunk DV descriptors (full-dead removes +
      // DV re-adds) spill separately — their sweep must only delete
      // the staged DV sidecars, never the live data files they re-add
      val dvSpill: Option[StreamedRewrite.ActionSpill] =
        if (dvMode) Some(new StreamedRewrite.ActionSpill) else None
      var dvAddCount = 0L
      val now = System.currentTimeMillis()
      val cdf = LakeTable.cdfEnabled(plan.metadata)
      try {
        try {
          chunks.foreachChunk { (_, chunk) =>
            val snapC = plan.subset(chunk)
            val combinedRaw =
              combinedRawFor(joinedFor(tgtTouchedFor(snapC, chunk)))
            val combined = materializeIfNonDeterministic(combinedRaw)
            val cached = combined eq combinedRaw
            if (cached)
              combined.persist(
                org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            try {
              val dupTask =
                if (!ambiguous) None
                else Some(LakeWriter.inParallel("graft-merge-dup-check") {
                  combined.filter(col(MATCHED)).groupBy(col(RID))
                    .count().filter(col("count") > 1).limit(1).count()
                })
              // copy-on-write rewrites the chunk's surviving rows;
              // merge-on-read appends only the update-clause rows
              // (clause hits are soft-deleted via the chunk's DVs)
              val rewrittenRows: Option[DataFrame] =
                if (!dvMode) Some(newSideData(combined.filter(keep)))
                else if (updateIdxs.isEmpty) None
                else Some(newSideData(
                  combined.filter(col(IDXC).isin(updateIdxs: _*))))
              rewrittenRows.foreach { rr =>
                if (plan.metadata.constraints.nonEmpty)
                  LakeWriter.enforceConstraints(rr.drop(RowTracking.COL),
                    plan.metadata.constraints, table.tablePath)
              }
              val cdcDirC = LakeWriter.newCdcDir(table.tablePath)
              val cdcTaskC =
                if (!cdf) None
                else Some(LakeWriter.inParallel("graft-merge-cdc-stage") {
                  val pre = oldSide(combined.filter(col(IDXC) > 0))
                    .withColumn("_change_type", lit("delete"))
                  val cdcDf =
                    if (updateIdxs.isEmpty) pre
                    else pre.unionByName(
                      newSide(combined.filter(col(IDXC).isin(updateIdxs: _*)))
                        .withColumn("_change_type", lit("insert")))
                  LakeWriter.stageCdc(cdcDf, table.tablePath, cdcDirC)
                })
              rewrittenRows.foreach { rr =>
                spill.append(LakeWriter.stageAndAdopt(rr,
                  table.tablePath, plan.partitionColumns,
                  ColumnMapping.overrides(plan.metadata),
                  plan.metadata.properties))
              }
              cdcTaskC.foreach(t => spill.append(LakeWriter.awaitTask(t)))
              // the dup verdict lands BEFORE DV staging (classic
              // order): duplicate RIDs would write duplicate DV
              // indices and fail inside the staging job instead of
              // with the canonical error
              dupTask.foreach { t =>
                if (LakeWriter.awaitTask(t) > 0)
                  throw new IllegalStateException(
                    "MERGE failed: a target row was matched by multiple " +
                    "source rows with update/delete clauses present; " +
                    "merge results would be nondeterministic. " +
                    "Deduplicate the source on the merge key.")
              }
              dvSpill.foreach { ds =>
                dvAddCount += table.stageDvChunkToSpill(snapC, chunk,
                  combined.filter(col(IDXC) > 0)
                    .select(col(DVFILE), col(DVIDX)), ds)
              }
            } finally if (cached) { combined.unpersist(false); () }
          }
          // inserts: once, global anti-join semantics
          insertsFrame(df => {
            val out = materializeIfNonDeterministic(df)
            if (out eq df) out.persist(
              org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            out
          }).foreach { ins =>
            try {
              if (plan.metadata.constraints.nonEmpty)
                LakeWriter.enforceConstraints(ins,
                  plan.metadata.constraints, table.tablePath)
              val cdcDirI = LakeWriter.newCdcDir(table.tablePath)
              val cdcTaskI =
                if (!cdf) None
                else Some(LakeWriter.inParallel("graft-merge-cdc-stage") {
                  LakeWriter.stageCdc(
                    ins.withColumn("_change_type", lit("insert")),
                    table.tablePath, cdcDirI)
                })
              spill.append(LakeWriter.stageAndAdopt(ins, table.tablePath,
                plan.partitionColumns,
                ColumnMapping.overrides(plan.metadata),
                plan.metadata.properties))
              cdcTaskI.foreach(t => spill.append(LakeWriter.awaitTask(t)))
            } finally { ins.unpersist(false); () }
          }
          val params = Map("condition" -> condition,
            "matchedClauses" -> matchedClauses.size.toString,
            "notMatchedClauses" -> insertClauses.size.toString,
            "notMatchedBySourceClauses" -> bySourceClauses.size.toString,
            "streamedRewrite" -> "true") ++
            (if (dvMode) Map("deletionVectors" -> dvAddCount.toString)
             else Map.empty)
          StreamedRewrite.onBeforeStreamedCommit()
        LakeWriter.commitStreamedExactConflicts(table.log, plan.version,
            () => chunks.pathIterator()) { _ =>
            table.assertMetadataUnchangedAt(plan.version, plan.metadata,
              "MERGE")
            txn.foreach { case (a, v) =>
              if (table.log.latestVersion > plan.version &&
                  Snapshot.replayMetaTxns(table.log,
                    table.log.latestVersion)._4.get(a).exists(_ >= v))
                throw new TxnAlreadyCommittedException(a, v)
            }
            Seq(CommitInfo(now, "MERGE", params)) ++
              txn.map { case (a, v) => Txn(a, v) }
          } { () =>
            // merge-on-read supersedes touched entries in place (DV
            // re-adds; full-dead files became removes at DV staging) —
            // only copy-on-write tombstones every touched path
            (dvSpill match {
              case Some(ds) => ds.iterator()
              case None =>
                chunks.pathIterator().map(p => RemoveFile(p, now): Action)
            }) ++ spill.iterator()
          }
          ()
        } catch { case e: Throwable =>
          spill.sweep(table.tablePath)
          dvSpill.foreach(_.sweep(table.tablePath, dvOnly = true))
          throw e
        }
      } finally {
        spill.delete()
        dvSpill.foreach(_.delete())
        chunks.unpersist()
      }
    }

    touchedSplit match {
      case Right(chunks) =>
        chunkedMergeRewrite(chunks)
        return
      case Left(_) => ()
    }
    val touched: Seq[String] = touchedSplit.left.getOrElse(Nil)
    // rewrite phase anchors on the TOUCHED-subset snapshot — under a
    // columnar plan this is the only point AddFiles reach the driver
    val snap = plan.subset(touched)

    var cdcMatched: Option[DataFrame] = None
    var dvPairs: Option[DataFrame] = None
    val dvRelsWritten =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    var dupCheck: Option[java.util.concurrent.FutureTask[Long]] = None
    val rewritten: Option[DataFrame] = if (touched.isEmpty) None else {
      // ONE combined frame; evaluateOnce (stage-to-parquet or cache)
      // guarantees the target×source join runs a single time for all
      // four consumers.
      val combined = evaluateOnce(
        combinedRawFor(joinedFor(tgtTouchedFor(snap, touched))))

      // The dup check is an agg over the shared combined frame (no
      // second join evaluation), launched on its own thread so it
      // OVERLAPS the rewrite write — both consumers materialize the
      // same cache blocks under Spark's block locks. The result is
      // awaited before anything is committed; on a dup the staged
      // (still unreferenced) files are deleted and the operation
      // fails exactly as an eager check would.
      if (ambiguous)
        dupCheck = Some(LakeWriter.inParallel("graft-merge-dup-check") {
          combined.filter(col(MATCHED)).groupBy(col(RID))
            .count().filter(col("count") > 1).limit(1).count()
        })

      // persisted CDC for the matched side: every clause-hit row's
      // preimage as delete; update-clause rows also emit a postimage
      // insert (the same representation changes() uses everywhere)
      val pre = oldSide(combined.filter(col(IDXC) > 0))
        .withColumn("_change_type", lit("delete"))
      cdcMatched = Some(
        if (updateIdxs.isEmpty) pre
        else pre.unionByName(
          newSide(combined.filter(col(IDXC).isin(updateIdxs: _*)))
            .withColumn("_change_type", lit("insert"))))

      if (dvMode) {
        // every clause-hit row (update or delete) is soft-deleted;
        // update clauses additionally append their new version below
        dvPairs = Some(combined.filter(col(IDXC) > 0)
          .select(col(DVFILE), col(DVIDX)))
        if (updateIdxs.isEmpty) None
        else Some(newSideData(combined.filter(col(IDXC).isin(updateIdxs: _*))))
      } else Some(newSideData(combined.filter(keep)))
    }

    // ---- not-matched side: anti-join → inserts ---------------------------
    val inserts: Option[DataFrame] = insertsFrame(evaluateOnce)

    val output = (rewritten, inserts) match {
      // allowMissingColumns: on tracked tables the rewrite side
      // carries the id column and the insert side deliberately lacks
      // it (fresh rows get fresh ids) — it null-fills
      case (Some(r), Some(i)) =>
        Some(r.unionByName(i, allowMissingColumns = true))
      case (r, i) => r.orElse(i)
    }
    // The CDC write overlaps the data write on its own thread — the
    // two stage to disjoint scratch dirs and share the same cached
    // frames, so wall time is max(data, cdc) instead of the sum.
    val cdcInserts = inserts.map(
      _.withColumn("_change_type", lit("insert")))
    val cdcDf =
      if (!LakeTable.cdfEnabled(plan.metadata)) None
      else (cdcMatched.toSeq ++ cdcInserts.toSeq)
        .reduceOption(_.unionByName(_))
    // The scratch dir is allocated HERE, not inside the task, so the
    // failure sweep below can remove it even if the stage died mid-write.
    val cdcDir = cdcDf.map(_ => LakeWriter.newCdcDir(table.tablePath))
    val cdcTask = cdcDf.map(df =>
      LakeWriter.inParallel("graft-merge-cdc-stage") {
        LakeWriter.stageCdc(df, table.tablePath, cdcDir.get)
      })
    // Everything staged below is unreferenced by the log until the
    // final commit, so ANY failure past this point — the data write,
    // the overlapped CDC stage, the duplicate-match verdict, or the
    // commit itself — must sweep the staged files back out; otherwise
    // they sit as untracked debris until a vacuum ages them past the
    // mtime horizon. (Now-empty cdc-/partition dirs are left for
    // vacuum's bottom-up sweep; removing an empty dir never loses
    // data.)
    var adds: Seq[AddFile] = Nil
    var cdc: Seq[CdcFile] = Nil
    try {
      adds = output match {
        case Some(df) =>
          if (snap.metadata.constraints.nonEmpty)
            LakeWriter.enforceConstraints(df.drop(RowTracking.COL),
              snap.metadata.constraints, table.tablePath)
          LakeWriter.stageAndAdopt(df, table.tablePath,
            snap.partitionColumns, ColumnMapping.overrides(snap.metadata),
            snap.metadata.properties)
        case None => Nil
      }
      cdc = cdcTask.map(LakeWriter.awaitTask(_)).getOrElse(Nil)
      // Await the overlapped duplicate-match verdict before the commit.
      dupCheck.foreach { f =>
        if (LakeWriter.awaitTask(f) > 0)
          throw new IllegalStateException(
            "MERGE failed: a target row was matched by multiple source " +
            "rows with update/delete clauses present; merge results " +
            "would be nondeterministic. Deduplicate the source on the " +
            "merge key.")
      }
      val params = Map("condition" -> condition,
        "matchedClauses" -> matchedClauses.size.toString,
        "notMatchedClauses" -> insertClauses.size.toString,
        "notMatchedBySourceClauses" -> bySourceClauses.size.toString)
      if (dvMode) {
        // merge-on-read commit: DV re-adds supersede the touched
        // files' entries in place (clause-hit rows soft-deleted),
        // full-dead files drop out, and only updated/inserted rows
        // were staged as new files.
        val (removes, dvAdds, conflictPaths) = dvPairs match {
          case Some(p) =>
            table.stageDeletionVectors(snap, touched, p, dvRelsWritten)
          case None => (Nil, Nil, Nil)
        }
        val now = System.currentTimeMillis()
        LakeWriter.commitWithRetry(table.log, snap.version,
          conflictPaths) { _ =>
          // Same metadata conflict rule as commitRewrite: a racing
          // mapped RENAME/ADD COLUMN invalidates files staged under
          // the read snapshot's mapping epoch. Metadata-light reads —
          // the conflict check must not itself replay the file list.
          if (table.log.latestVersion > snap.version &&
              Snapshot.replayMeta(table.log, table.log.latestVersion)
                ._1 != snap.metadata)
            throw new ConflictingCommitException(
              s"table metadata of ${table.tablePath} changed " +
              s"concurrently with this MERGE (read version " +
              s"${snap.version}); re-run the operation")
          txn.foreach { case (a, v) =>
            if (table.log.latestVersion > snap.version &&
                Snapshot.replayMetaTxns(table.log,
                  table.log.latestVersion)._4.get(a).exists(_ >= v))
              throw new TxnAlreadyCommittedException(a, v)
          }
          Seq(CommitInfo(now, "MERGE",
            params + ("deletionVectors" -> dvAdds.size.toString))) ++
            removes ++ dvAdds ++ adds ++ cdc ++
            txn.map { case (a, v) => Txn(a, v) }
        }
        ()
      } else
        table.commitRewrite(snap, touched, adds, "MERGE", params, cdc,
          txn)
    } catch { case e: Throwable =>
      dvRelsWritten.forEach { rel =>
        try {
          DataStore.current.deleteIfExists(
            java.nio.file.Paths.get(table.tablePath, rel)); ()
        } catch { case _: java.io.IOException => () }
      }
      LakeWriter.sweepStaged(table.tablePath, adds, cdcTask, cdcDir)
      throw e
    }
    } finally caches.foreach(_.unpersist(false))
  }

  /** Best-effort recovery of the source DataFrame's alias (set by
    * `df.as("s")`) so UPDATE/INSERT * can qualify source columns.
    */
  private def sourceAliasOf(df: DataFrame): Option[String] = {
    df.queryExecution.logical.collectFirst {
      case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
        s.alias
    }
  }
}

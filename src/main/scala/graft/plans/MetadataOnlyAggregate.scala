package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, ExprId, Literal, NamedExpression, Not}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.{AddFile, ColumnMapping, DvRowDeleted, LakeLog,
  LakeWriter, PathMapPayload}
import graft.sources.{DvParquetFileFormat, LakeFileIndex}

/** Metadata-only aggregates (Delta's OptimizeMetadataOnlyQuery
  * analog, widened): an unfiltered `COUNT(*)` / `MIN(col)` /
  * `MAX(col)` / `COUNT(col)` over a lake relation is answered from
  * the transaction log — footer row counts, per-file min/max stats
  * and null counts the snapshot already holds — instead of scanning
  * the table. At 100 TB that turns the most common data-exploration
  * queries there are ("how many rows", "what date range does this
  * table cover") from full-table scans into a driver-side metadata
  * fold the snapshot has already paid for.
  *
  * Strictly guarded, bail-to-scan on anything uncertain:
  *  - no grouping, and EVERY aggregate in the list is one of
  *    `count(non-null literal)` (what `count(*)`/`count(1)` analyze
  *    to), `count(col)`, `min(col)`, `max(col)` — not DISTINCT, no
  *    FILTER clause;
  *  - nothing between the aggregate and the relation but
  *    deterministic projections (they cannot change cardinality; the
  *    aggregated column is resolved through them by exprId) and AT
  *    MOST the engine's own deletion-vector filter
  *    (`Not(DvRowDeleted(...))` — the shape `LakeTable.toDF` attaches
  *    on DV-carrying snapshots), verified against the snapshot's own
  *    file→DV map before it is trusted;
  *  - DELETION VECTORS: `count(*)` nets them exactly
  *    (Σ numRecords − Σ dvCardinality) when the scan nets them
  *    ([[DvParquetFileFormat]]) or the verified DV filter is present;
  *    a RAW relation over a DV snapshot counts physical rows and
  *    must NOT be answered with the live count. MIN/MAX/COUNT(col)
  *    bail whenever ANY file carries a DV — a deleted row may be the
  *    extreme value (or change the column's null count) and the log
  *    cannot know;
  *  - MIN/MAX/COUNT(col) types are restricted to the encodings
  *    [[graft.lake.ParquetFooters]] records exactly: integral, DATE
  *    (days), TIMESTAMP/TIMESTAMP_NTZ (micros), STRING (full value —
  *    the footer reader never truncates), DECIMAL (scaled). FLOAT and
  *    DOUBLE are excluded on purpose: parquet footer stats ignore
  *    NaN, but Spark's MIN/MAX order NaN above every value — a
  *    stats-answered max over a NaN-carrying file would be wrong;
  *  - every file must either carry min/max stats for the column, or
  *    be provably all-null for it (nullCounts(col) == numRecords) —
  *    all-null files contribute nothing to MIN/MAX and zero to
  *    COUNT(col). A file with neither (converted/foreign files,
  *    pre-evolution files) bails — the scan is the only truth;
  *  - partition columns (absent from the data files, so no footer
  *    stats) answer from their partition VALUES instead, null
  *    partitions excluded per MIN/MAX/COUNT null semantics.
  *
  * Two widenings of the basic form, same guards:
  *  - GROUP BY over partition columns only ("rows per day"): files
  *    bucket by partition tuple, each bucket answers like a table of
  *    its own; zero-live-row buckets emit no group; null and the
  *    legacy Hive sentinel collapse to the null group;
  *  - WHERE over partition columns only: the predicate is evaluated
  *    EXACTLY per file by substituting the file's typed partition
  *    values (three-valued semantics, NULL excludes) — this is a
  *    determination, not the scan path's conservative may-match
  *    pruning, so the rewrite stays answer-exact. Any reference to a
  *    data column, subquery, or unparseable legacy value bails.
  */
object MetadataOnlyAggregate extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Seq(), aggExprs, child, _)
        if aggExprs.nonEmpty && aggExprs.forall(supportedShape) =>
      answer(aggExprs, child) match {
        case Some(row) =>
          LocalRelation(aggExprs.map(_.toAttribute), Seq(row))
        case None => agg
      }
    // grouped form: GROUP BY over PARTITION columns only ("rows per
    // day" — the standing dashboard query of every partitioned
    // table). Files bucket by partition tuple; each bucket answers
    // like an unfiltered table of its own.
    case agg @ Aggregate(groupingExprs, aggExprs, child, _)
        if groupingExprs.nonEmpty &&
          groupingExprs.forall(_.isInstanceOf[AttributeReference]) &&
          aggExprs.nonEmpty &&
          aggExprs.forall(e => supportedShape(e) || groupingRef(e)) =>
      answerGrouped(
        groupingExprs.map(_.asInstanceOf[AttributeReference]),
        aggExprs, child) match {
        case Some(rows) =>
          LocalRelation(aggExprs.map(_.toAttribute), rows)
        case None => agg
      }
  }

  /** Output column that is just a grouping attribute (optionally
    * re-aliased) — `SELECT p, count(*) ... GROUP BY p` carries `p`
    * through the aggregate list.
    */
  private def groupingRef(ne: NamedExpression): Boolean = ne match {
    case _: AttributeReference => true
    case Alias(_: AttributeReference, _) => true
    case _ => false
  }

  // ---------------------------------------------------------------
  // shape recognition
  // ---------------------------------------------------------------

  private def supportedShape(ne: NamedExpression): Boolean = ne match {
    case Alias(ae: AggregateExpression, _)
        if !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case Count(Seq(Literal(v, _)))         => v != null
        case Count(Seq(_: AttributeReference)) => true
        case Min(_: AttributeReference)        => true
        case Max(_: AttributeReference)        => true
        case _                                 => false
      }
    case _ => false
  }

  /** What the plan below the aggregate proved: the lake index, how
    * deletion vectors are handled, the exprId→relation-column-name
    * map threaded through the intervening projections, and any
    * partition-column-only filters (exactly evaluable per file from
    * its partition tuple — partition values DETERMINE such a
    * predicate, so this is not the conservative may-match pruning of
    * the scan path).
    */
  private final case class Below(
      idx: LakeFileIndex,
      dvNetted: Boolean, // scan or verified filter nets DV-deleted rows
      names: Map[ExprId, String],
      // each filter paired with the name map AT ITS OWN LEVEL — a
      // projection above may drop or rename the filtered column, so
      // the top-level map cannot resolve its attributes
      partFilters: Seq[(org.apache.spark.sql.catalyst.expressions
        .Expression, Map[ExprId, String])] = Nil)

  private def walk(p: LogicalPlan): Option[Below] = p match {
    case Project(projectList, child)
        if projectList.forall(_.deterministic) =>
      walk(child).map { b =>
        val names = projectList.flatMap {
          case a: AttributeReference =>
            b.names.get(a.exprId).map(a.exprId -> _)
          case al @ Alias(ar: AttributeReference, _) =>
            b.names.get(ar.exprId).map(al.exprId -> _)
          case _ => None // deterministic expr: cardinality-safe, but
                         // an aggregate over it cannot resolve
        }.toMap
        b.copy(names = names)
      }
    case Filter(Not(dv: DvRowDeleted), child) =>
      walk(child).filter(b => !b.dvNetted && dvMapMatches(dv, b.idx))
        .map(_.copy(dvNetted = true))
    case Filter(cond, child)
        if cond.deterministic &&
          cond.find(_.isInstanceOf[org.apache.spark.sql.catalyst
            .expressions.PlanExpression[_]]).isEmpty =>
      walk(child).filter { b =>
        // every referenced attribute must be a partition column
        val partCols = b.idx.snap.partitionColumns.toSet
        cond.references.toSeq.forall(a =>
          b.names.get(a.exprId).exists(partCols.contains))
      }.map(b =>
        b.copy(partFilters = b.partFilters :+ ((cond, b.names))))
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation => h.location match {
        case idx: LakeFileIndex =>
          Some(Below(idx,
            h.fileFormat.isInstanceOf[DvParquetFileFormat],
            l.output.map(a => a.exprId -> a.name).toMap))
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  // ---------------------------------------------------------------
  // evaluation
  // ---------------------------------------------------------------

  /** Everything one evaluation needs, plus the EFFECTIVE file subset
    * (partition-filtered when the plan had partition-only filters).
    */
  private final case class Ctx(
      below: Below,
      hasDvs: Boolean,
      physFor: Map[String, String],
      partCols: Set[String],
      schemaByName: Map[String, StructField],
      files: Seq[AddFile])

  /** Validate the plan below the aggregate and build the shared
    * context. None = bail to the scan.
    */
  private def contextOf(child: LogicalPlan): Option[Ctx] = {
    val below = walk(child).getOrElse(return None)
    val idx = below.idx
    val files = idx.snap.files
    val hasDvs = files.exists(_.dvPath.isDefined)
    // a raw scan over a DV snapshot sees physical rows — even
    // count(*) must not be answered with the live count
    if (hasDvs && !below.dvNetted) return None
    if (!files.forall(_.numRecords >= 0L)) return None
    val schemaByName = idx.snap.schema.fields.map(f => f.name -> f).toMap
    // partition-only filters evaluate EXACTLY per file — the
    // partition tuple determines the predicate; any file whose
    // predicate can't be evaluated (unparseable legacy value,
    // unresolvable attribute, eval error) bails the whole rewrite
    val kept = below.partFilters.foldLeft(files) { case (fs, (cond, names)) =>
      fs.filter { f =>
        evalPartFilter(cond, names, f, schemaByName) match {
          case Some(b) => b
          case None => return None
        }
      }
    }
    Some(Ctx(below, hasDvs,
      ColumnMapping.overrides(idx.snap.metadata),
      idx.snap.partitionColumns.toSet, schemaByName, kept))
  }

  /** Exact three-valued evaluation of a partition-only predicate
    * against one file's partition tuple: substitute each attribute
    * with the file's (typed) partition value and fold constants.
    * Some(false) for a NULL result (the rows are excluded, like any
    * WHERE); None = cannot evaluate, bail.
    */
  private def evalPartFilter(
      cond: org.apache.spark.sql.catalyst.expressions.Expression,
      names: Map[ExprId, String], f: AddFile,
      schemaByName: Map[String, StructField]): Option[Boolean] = {
    var ok = true
    val sub = cond.transform {
      case a: AttributeReference =>
        val lit: Option[Literal] = for {
          n <- names.get(a.exprId)
          fld <- schemaByName.get(n)
          if fld.dataType == a.dataType
          v <- f.partitionValues.get(n) match {
            case None => None
            case Some(x) if x == null || x == LakeWriter.HIVE_NULL =>
              Some(null)
            case Some(x) => parsePartition(x, a.dataType)
          }
        } yield Literal(v, a.dataType)
        lit.getOrElse { ok = false; a }
    }
    if (!ok) None
    else try sub.eval(null) match {
      case b: Boolean => Some(b)
      case null => Some(false)
      case _ => None
    } catch { case _: Exception => None }
  }

  /** One aggregate function over one file subset. None = bail. */
  private def evalAgg(ae: AggregateExpression, files: Seq[AddFile],
      ctx: Ctx): Option[Any] = ae.aggregateFunction match {
    case Count(Seq(Literal(_, _))) =>
      Some(files.map(f => f.numRecords -
        (if (ctx.hasDvs) f.dvCardinality else 0L)).sum)
    case Count(Seq(a: AttributeReference)) if !ctx.hasDvs =>
      for {
        n <- ctx.below.names.get(a.exprId)
        f <- ctx.schemaByName.get(n)
        v <- countCol(n, f.dataType, files, ctx.physFor, ctx.partCols)
      } yield v
    case Min(a: AttributeReference) if !ctx.hasDvs =>
      for {
        n <- ctx.below.names.get(a.exprId)
        f <- ctx.schemaByName.get(n)
        if f.dataType == a.dataType
        v <- extremum(n, f.dataType, files, ctx.physFor, ctx.partCols,
          wantMin = true)
      } yield v
    case Max(a: AttributeReference) if !ctx.hasDvs =>
      for {
        n <- ctx.below.names.get(a.exprId)
        f <- ctx.schemaByName.get(n)
        if f.dataType == a.dataType
        v <- extremum(n, f.dataType, files, ctx.physFor, ctx.partCols,
          wantMin = false)
      } yield v
    case _ => None
  }

  private def answer(aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[InternalRow] = {
    val ctx = contextOf(child).getOrElse(return None)
    val files = ctx.files
    val values = aggExprs.map {
      case Alias(ae: AggregateExpression, _) =>
        evalAgg(ae, files, ctx).getOrElse(return None)
      case _ => return None
    }
    Some(InternalRow.fromSeq(values))
  }

  /** Grouped form: every grouping attribute must be a partition
    * column; files bucket by their partition tuple and each bucket
    * evaluates like a table of its own. Groups whose buckets hold
    * zero live rows are omitted (SQL emits no group for no rows).
    */
  private def answerGrouped(groupAttrs: Seq[AttributeReference],
      aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[Seq[InternalRow]] = {
    val ctx = contextOf(child).getOrElse(return None)
    val files = ctx.files
    val groupCols: Seq[(ExprId, String, DataType)] = groupAttrs.map { a =>
      val n = ctx.below.names.get(a.exprId).getOrElse(return None)
      if (!ctx.partCols.contains(n)) return None
      if (!ctx.schemaByName.get(n).exists(_.dataType == a.dataType))
        return None
      (a.exprId, n, a.dataType)
    }
    // bucket by the PARSED (typed) partition tuple, not the raw
    // strings: the scan groups on the cast value, and two renderings
    // that parse equal ('1' vs '01', legacy day-int vs ISO date —
    // both deliberately accepted by parsePartition) must land in ONE
    // group, exactly as a real scan merges them. Null and the Hive
    // sentinel collapse to the same null group. Boxed equality is the
    // right merge relation here (NaN groups with NaN, as SQL GROUP BY
    // does).
    val buckets = files.groupBy(f => groupCols.map { case (_, n, dt) =>
      f.partitionValues.get(n) match {
        case None => return None // un-tracked partition value: bail
        case Some(v) if v == null || v == LakeWriter.HIVE_NULL => null
        case Some(v) => parsePartition(v, dt).getOrElse(return None)
      }
    })
    val rows = buckets.toSeq.flatMap { case (typedKey, bucket) =>
      val live = bucket.map(f => f.numRecords -
        (if (ctx.hasDvs) f.dvCardinality else 0L)).sum
      if (live == 0L) None // zero-row bucket: SQL emits no group
      else {
        val parsed: Map[ExprId, Any] =
          groupCols.zip(typedKey).map { case ((id, _, _), v) =>
            id -> v
          }.toMap
        val values = aggExprs.map {
          case Alias(ae: AggregateExpression, _) =>
            evalAgg(ae, bucket, ctx).getOrElse(return None)
          case a: AttributeReference =>
            parsed.get(a.exprId).getOrElse(return None)
          case Alias(ar: AttributeReference, _) =>
            parsed.get(ar.exprId).getOrElse(return None)
          case _ => return None
        }
        Some(InternalRow.fromSeq(values))
      }
    }
    Some(rows)
  }

  /** COUNT(col): Σ (numRecords − nullCount) — needs an exact null
    * count for every file. Partition columns count every row of each
    * non-null partition's files instead (the value is rowwise
    * constant) — but only after the raw value PARSES under the
    * column's type: the scan nulls an uncastable legacy value, so
    * counting its rows as non-null would overcount. Unparseable →
    * bail. None = bail.
    */
  private def countCol(n: String, dt: DataType, files: Seq[AddFile],
      physFor: Map[String, String], partCols: Set[String]): Option[Long] = {
    if (partCols.contains(n)) {
      var total = 0L
      for (f <- files) {
        f.partitionValues.get(n).getOrElse(return None) match {
          case null | LakeWriter.HIVE_NULL => () // null rows: uncounted
          case v => parsePartition(v, dt) match {
            case Some(_) => total += f.numRecords
            case None => return None
          }
        }
      }
      Some(total)
    } else {
      val key = physFor.getOrElse(n, n)
      var total = 0L
      for (f <- files) {
        val nulls = f.nullCounts.get(key).getOrElse(return None)
        // a recorded count outside [0, numRecords] is corrupt or the
        // parquet "unset" sentinel (-1) from a foreign file adopted
        // before the footer guard existed — bail to the scan rather
        // than silently over/under-count
        if (nulls < 0L || nulls > f.numRecords) return None
        total += f.numRecords - nulls
      }
      Some(total)
    }
  }

  /** MIN or MAX of `n` from per-file stats (or partition values).
    * Some(null) is a real answer — every row is null. None = bail.
    */
  private def extremum(n: String, dt: DataType, files: Seq[AddFile],
      physFor: Map[String, String], partCols: Set[String],
      wantMin: Boolean): Option[Any] = {
    val ord = orderingFor(dt).getOrElse(return None)
    var best: Option[Any] = None
    def consider(v: Any): Unit = best match {
      case Some(b) =>
        val c = ord.compare(v, b)
        if (if (wantMin) c < 0 else c > 0) best = Some(v)
      case None => best = Some(v)
    }
    if (partCols.contains(n)) {
      for (f <- files) {
        val raw = f.partitionValues.get(n).getOrElse(return None)
        if (raw != null && raw != LakeWriter.HIVE_NULL)
          consider(parsePartition(raw, dt).getOrElse(return None))
      }
    } else {
      val key = physFor.getOrElse(n, n)
      for (f <- files) {
        (f.minValues.get(key), f.maxValues.get(key)) match {
          case (Some(lo), Some(hi)) =>
            consider(parseStat(if (wantMin) lo else hi, dt)
              .getOrElse(return None))
          case _ =>
            // no stats: only safe if the file is provably all-null
            if (!f.nullCounts.get(key).contains(f.numRecords)) return None
        }
      }
    }
    Some(best.orNull)
  }

  /** Catalyst-internal ordering for the supported stat types. None
    * for anything else (notably FLOAT/DOUBLE — NaN, see scaladoc).
    */
  private def orderingFor(dt: DataType): Option[Ordering[Any]] = {
    def long(f: Any => Long): Ordering[Any] = Ordering.by(f)
    dt match {
      case ByteType    => Some(long(_.asInstanceOf[Byte].toLong))
      case ShortType   => Some(long(_.asInstanceOf[Short].toLong))
      case IntegerType | DateType =>
        Some(long(_.asInstanceOf[Int].toLong))
      case LongType | TimestampType | TimestampNTZType =>
        Some(long(_.asInstanceOf[Long]))
      case StringType =>
        Some(Ordering.by((v: Any) => v.asInstanceOf[UTF8String]))
      case _: DecimalType =>
        Some(Ordering.by((v: Any) =>
          v.asInstanceOf[org.apache.spark.sql.types.Decimal]))
      case _ => None
    }
  }

  /** Stats string (the [[graft.lake.ParquetFooters]] rendering: raw
    * ints for integral/date/micros, scaled decimal, full UTF8 string)
    * → Catalyst internal value of `dt`. None = unparseable, bail.
    */
  private def parseStat(s: String, dt: DataType): Option[Any] =
    try dt match {
      case ByteType        => Some(s.toByte)
      case ShortType       => Some(s.toShort)
      case IntegerType     => Some(s.toInt)
      case DateType        => Some(s.toInt)
      case LongType        => Some(s.toLong)
      case TimestampType | TimestampNTZType => Some(s.toLong)
      case StringType      => Some(UTF8String.fromString(s))
      case d: DecimalType  =>
        val dec = Decimal(BigDecimal(s))
        if (dec.changePrecision(d.precision, d.scale)) Some(dec) else None
      case _ => None
    } catch { case _: NumberFormatException => None }

  /** Hive partition-value string → internal value, via the EXACT
    * lenient Cast the scan path types partition values with
    * (`LakeFileIndex.partitionRow`) — answer-exactness demands the
    * rewrite see the same typed value the scan would, including for
    * odd legacy renderings (a day-int string for a DATE column casts
    * the same way on both paths). A cast that yields null for a
    * non-null raw string returns None — the scan would read null
    * where the log shows a value; bail rather than model it.
    * Timestamps are not attempted (rendering varies by writer).
    */
  private def parsePartition(s: String, dt: DataType): Option[Any] =
    dt match {
      case ByteType | ShortType | IntegerType | LongType | StringType |
           DateType | _: DecimalType =>
        Option(org.apache.spark.sql.catalyst.expressions.Cast(
          Literal(UTF8String.fromString(s), StringType), dt,
          Option(conf.sessionLocalTimeZone), ansiEnabled = false)
          .eval(null))
      case _ => None
    }

  /** The DV filter is trusted only if its file→DV map is exactly the
    * one this snapshot would build — a handcrafted DvRowDeleted over
    * a different table must not let the rewrite misattribute counts.
    */
  private def dvMapMatches(dv: DvRowDeleted, idx: LakeFileIndex): Boolean =
    try {
      val bytes = dv.third.eval(null).asInstanceOf[Array[Byte]]
      val decoded = PathMapPayload.decodePayload(bytes)
      val tablePath = idx.snap.log.tablePath
      val expected = idx.snap.files.filter(_.dvPath.isDefined).map { f =>
        (LakeLog.resolveFile(tablePath, f.path).toString,
          LakeLog.resolveFile(tablePath, f.dvPath.get).toString)
      }.toMap
      decoded.size == expected.size && expected.forall {
        case (k, v) => decoded.get(k) == v
      }
    } catch { case _: Exception => false }
}

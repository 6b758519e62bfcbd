package graft.lake

import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference,
  EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, IsNotNull,
  IsNull, LessThan, LessThanOrEqual, Literal, StartsWith}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute

/** Log-level file pruning: decide from AddFile metadata alone which
  * files can possibly contain rows matching a predicate. This is the
  * table format's contribution to scan performance (SURVEY §4 "data
  * skipping"); Spark's partition pruning and parquet row-group pushdown
  * still apply afterwards. Always conservative: unknown predicate
  * shapes keep the file.
  */
object FilePruner {

  private def parse(filter: String): Expression =
    org.apache.spark.sql.SparkSession.active
      .sessionState.sqlParser.parseExpression(filter)

  /** Files that may satisfy `filter` (partition values + min/max). */
  def prune(snap: Snapshot, filter: String): Seq[AddFile] =
    pruneWithExpressions(snap, Seq(parse(filter)))

  /** Same, for already-parsed (possibly resolved) predicates — the
    * planner-integration entry point used by `LakeFileIndex.listFiles`.
    */
  def pruneWithExpressions(
      snap: Snapshot, filters: Seq[Expression]): Seq[AddFile] = {
    if (filters.isEmpty) return snap.files
    val conjuncts = filters.flatMap(splitConjuncts)
    val schemaByName = snap.schema.fields.map(f => f.name -> f.dataType).toMap
    val partCols = snap.partitionColumns.toSet
    // AddFile min/max stats are keyed by the PHYSICAL column names the
    // footers carry; predicates arrive under logical names — translate
    // at lookup so skipping keeps working across renames
    val physFor = ColumnMapping.overrides(snap.metadata)
    // columns whose pre-widen float stats compare inexactly against
    // double literals (see LakeTable.PROP_LOSSY_STATS): min/max must
    // not prune on them — null counts stay usable
    val lossy = LakeTable.lossyStatsKeys(snap.metadata.properties)
    snap.files.filter { f =>
      conjuncts.forall(c =>
        mayMatch(c, f, schemaByName, partCols, physFor, lossy))
    }
  }

  /** Column reference in either pre-resolution (string filter) or
    * post-resolution (planner pushdown) form.
    */
  private object Attr {
    def unapply(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name)
      case a: AttributeReference  => Some(a.name)
      case _ => None
    }
  }

  /** If `filter` references only partition columns, the EXACT matching
    * file set (predicate evaluated per-file on its partition values via
    * a local DataFrame, so full Spark expression semantics apply).
    * Otherwise None. Enables metadata-only DELETE.
    */
  def partitionOnlyMatches(snap: Snapshot, filter: String,
      sparkOpt: Option[org.apache.spark.sql.SparkSession] = None)
      : Option[Seq[AddFile]] = {
    matchingIndices(snap.partitionColumns, snap.schema, filter,
      snap.files.map(_.partitionValues), sparkOpt)
      .map { matching =>
        snap.files.zipWithIndex.collect {
          case (f, i) if matching.contains(i) => f
        }
      }
  }

  /** If `filter` references only partition columns, the EXACT matching
    * partition-value maps out of `tuples` (one per table PARTITION —
    * the O(partitions) twin of [[partitionOnlyMatches]], for callers
    * that must never hold O(files) driver state). None otherwise.
    */
  def matchingPartitionTuples(partitionColumns: Seq[String],
      schema: org.apache.spark.sql.types.StructType, filter: String,
      tuples: Seq[Map[String, String]],
      sparkOpt: Option[org.apache.spark.sql.SparkSession] = None)
      : Option[Set[Map[String, String]]] =
    matchingIndices(partitionColumns, schema, filter, tuples, sparkOpt)
      .map { matching =>
        tuples.zipWithIndex.collect {
          case (t, i) if matching.contains(i) => t
        }.toSet
      }

  /** Shared exact evaluator: indices of the partition-value maps that
    * satisfy `filter` (full Spark expression semantics via a local
    * DataFrame), or None when `filter` is not partition-only.
    */
  private def matchingIndices(partitionColumns: Seq[String],
      schema: org.apache.spark.sql.types.StructType, filter: String,
      values: Seq[Map[String, String]],
      sparkOpt: Option[org.apache.spark.sql.SparkSession])
      : Option[Set[Int]] = {
    if (partitionColumns.isEmpty) return None
    val refs = parse(filter).collect {
      case a: UnresolvedAttribute => a.name
    }
    if (refs.isEmpty || !refs.forall(partitionColumns.contains)) return None

    // callers on the DML path thread their own session; the active
    // session is only the fallback for ad-hoc/test use
    val spark =
      sparkOpt.getOrElse(org.apache.spark.sql.SparkSession.active)
    import spark.implicits._
    val partFields = schema.fields
      .filter(f => partitionColumns.contains(f.name))
    val rowsDF = values.zipWithIndex.map { case (pv, i) =>
      (i, partitionColumns.map { c =>
        pv.get(c) match {
          case None | Some(null) | Some(LakeWriter.HIVE_NULL) => null
          case Some(v) => v
        }
      })
    }.toDF("__idx", "__values")
    var typed = rowsDF
    partFields.zipWithIndex.foreach { case (f, _) =>
      val pos = partitionColumns.indexOf(f.name)
      // try_cast: a malformed legacy value must not abort the scan
      // under ANSI mode — it just falls out of the metadata-only path
      typed = typed.withColumn(f.name,
        expr(s"try_cast(__values[$pos] AS ${f.dataType.sql})"))
    }
    Some(typed.filter(filter).select("__idx")
      .collect().map(_.getInt(0)).toSet)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** The conjuncts of `filters` that survive a java-serialization
    * round trip — the subset a DISTRIBUTED pruning pass may ship to
    * executors. Catalyst expression trees are serializable case
    * classes in the shapes [[mayMatch]] understands (attributes,
    * literals, comparisons); planner-injected runtime shapes (dynamic
    * pruning subqueries) are not, and dropping a conjunct is always
    * CONSERVATIVE here (a kept file is re-tested exactly on the
    * driver).
    */
  private[graft] def serializableConjuncts(
      filters: Seq[Expression]): Seq[Expression] =
    filters.flatMap(splitConjuncts).filter { c =>
      try {
        val bos = new java.io.ByteArrayOutputStream()
        new java.io.ObjectOutputStream(bos).writeObject(c)
        true
      } catch { case _: Throwable => false }
    }

  /** Serializable per-file form of [[pruneWithExpressions]]'s test,
    * for evaluation INSIDE executor tasks (the columnar file index's
    * distributed candidate pass). Same conservative semantics: every
    * argument is plain data, [[mayMatch]] touches no session state.
    */
  private[graft] def mayMatchFn(
      conjuncts: Seq[Expression], types: Map[String, DataType],
      partCols: Set[String], physFor: Map[String, String],
      lossyStats: Set[String]): AddFile => Boolean = {
    // bind everything into local vals so the returned closure captures
    // data only, never this object or a session
    val (cs, ts, pc, pf, ls) = (conjuncts, types, partCols, physFor,
      lossyStats)
    (f: AddFile) => cs.forall(c => mayMatch(c, f, ts, pc, pf, ls))
  }

  /** Conservative per-file test of one conjunct against stats. */
  private def mayMatch(
      e: Expression, f: AddFile,
      types: Map[String, DataType], partCols: Set[String],
      physFor: Map[String, String] = Map.empty,
      lossyStats: Set[String] = Set.empty): Boolean = {
    def bound(name: String): Option[(String, String)] = {
      if (partCols.contains(name))
        // null partition values (stored as null; legacy logs may carry
        // the Hive sentinel) have no orderable bound — keep the file
        // (partition columns are always identity-mapped)
        f.partitionValues.get(name)
          .filter(v => v != null && v != LakeWriter.HIVE_NULL)
          .map(v => (v, v))
      else {
        val statsKey = physFor.getOrElse(name, name)
        if (lossyStats.contains(statsKey)) None // widened float: inexact
        else for {
          lo <- f.minValues.get(statsKey)
          hi <- f.maxValues.get(statsKey)
        } yield (lo, hi)
      }
    }
    def cmpTo(name: String, lit: Any): Option[(Int, Int)] = {
      // (cmp(min, lit), cmp(max, lit)) under the column's type ordering
      for {
        (lo, hi) <- bound(name)
        dt <- types.get(name)
        l <- cmp(lo, lit, dt)
        h <- cmp(hi, lit, dt)
      } yield (l, h)
    }
    e match {
      case EqualTo(Attr(n), Literal(v, _)) =>
        cmpTo(n, v).forall { case (l, h) => l <= 0 && h >= 0 }
      case EqualTo(Literal(v, _), Attr(n)) =>
        cmpTo(n, v).forall { case (l, h) => l <= 0 && h >= 0 }
      case GreaterThan(Attr(n), Literal(v, _)) =>
        cmpTo(n, v).forall { case (_, h) => h > 0 }
      case GreaterThanOrEqual(Attr(n), Literal(v, _)) =>
        cmpTo(n, v).forall { case (_, h) => h >= 0 }
      case LessThan(Attr(n), Literal(v, _)) =>
        cmpTo(n, v).forall { case (l, _) => l < 0 }
      case LessThanOrEqual(Attr(n), Literal(v, _)) =>
        cmpTo(n, v).forall { case (l, _) => l <= 0 }
      case GreaterThan(Literal(v, _), a @ Attr(_)) =>
        mayMatch(LessThan(a, Literal(v)), f, types, partCols, physFor,
          lossyStats)
      case LessThan(Literal(v, _), a @ Attr(_)) =>
        mayMatch(GreaterThan(a, Literal(v)), f, types, partCols, physFor,
          lossyStats)
      // IN: the file survives iff ANY listed value can be in range —
      // each value checks like an EqualTo; an unparseable value (or a
      // column with no stats) keeps the file. A NULL in the list can
      // never make the predicate TRUE (three-valued logic), so nulls
      // are dropped before the range test — they must not reach cmp()
      case In(Attr(n), values) if values.forall(_.isInstanceOf[Literal]) =>
        values.exists { case Literal(v, _) =>
          v != null &&
            cmpTo(n, v).forall { case (l, h) => l <= 0 && h >= 0 } }
      // large IN lists arrive optimizer-converted to InSet
      case InSet(Attr(n), hset) =>
        hset.exists(v => v != null &&
          cmpTo(n, v).forall { case (l, h) => l <= 0 && h >= 0 })
      // IS NULL prunes files whose footer counted ZERO nulls for the
      // column; partition columns check their (single) value instead
      case IsNull(Attr(n)) =>
        if (partCols.contains(n))
          f.partitionValues.get(n)
            .forall(v => v == null || v == LakeWriter.HIVE_NULL)
        else
          f.nullCounts.get(physFor.getOrElse(n, n)).forall(_ > 0)
      // IS NOT NULL prunes all-null files (every row counted null);
      // conservative when numRecords is unknown (< 0)
      case IsNotNull(Attr(n)) =>
        if (partCols.contains(n))
          f.partitionValues.get(n)
            .exists(v => v != null && v != LakeWriter.HIVE_NULL) ||
          !f.partitionValues.contains(n)
        else
          !(f.numRecords > 0 && f.nullCounts
            .get(physFor.getOrElse(n, n)).contains(f.numRecords))
      // prefix match: strings starting with `p` form the range
      // [p, successor(p)); overlap test against [min, max]. The
      // planner pushes StartsWith (LikeSimplification has run); a
      // string filter parses as Like, prefix-shaped iff the only
      // wildcard is one trailing unescaped %
      case StartsWith(Attr(n), Literal(p, StringType)) if p != null =>
        prefixMayMatch(p.toString, n, bound)
      case like: org.apache.spark.sql.catalyst.expressions.Like =>
        (like.left, like.right) match {
          case (Attr(n), Literal(p, StringType))
              if p != null && p.toString.length > 1 &&
                p.toString.endsWith("%") &&
                !p.toString.dropRight(1)
                  .exists(c => c == '%' || c == '_' || c == '\\') =>
            prefixMayMatch(p.toString.dropRight(1), n, bound)
          case _ => true
        }
      case _ => true // unknown shape: keep the file
    }
  }

  private def prefixMayMatch(prefix: String, n: String,
      bound: String => Option[(String, String)]): Boolean =
    bound(n) match {
      case None => true
      case Some((lo, hi)) =>
        hi.compareTo(prefix) >= 0 &&
        prefixSuccessor(prefix).forall(succ => lo.compareTo(succ) < 0)
    }

  /** Smallest string strictly greater than every string with this
    * prefix: increment the last non-￿ char and truncate. None if
    * the prefix is all ￿ (then nothing bounds it above).
    */
  private def prefixSuccessor(prefix: String): Option[String] = {
    val idx = prefix.lastIndexWhere(_ != '￿')
    if (idx < 0) None
    else Some(prefix.substring(0, idx) + (prefix.charAt(idx) + 1).toChar)
  }

  /** Compare a stats string against a literal under `dt`'s ordering.
    * None (no pruning) when the comparison isn't cleanly defined.
    */
  private def cmp(statsValue: String, litValue: Any, dt: DataType)
      : Option[Int] = {
    try dt match {
      case _: IntegerType | _: LongType | _: ShortType | _: ByteType =>
        Some(BigDecimal(statsValue).compare(BigDecimal(litValue.toString)))
      case _: DoubleType | _: FloatType | _: DecimalType =>
        Some(BigDecimal(statsValue).compare(BigDecimal(litValue.toString)))
      // stats hold the parquet physical int (days / epoch-micros —
      // ParquetFooters records only those units), and Catalyst's
      // internal literal for Date/Timestamp(NTZ) IS that same int, so
      // the comparison is numeric. A non-numeric side (e.g. a
      // partition value stored as a date STRING) parses to
      // NumberFormatException below → None → keep the file.
      case _: DateType | _: TimestampType | _: TimestampNTZType =>
        Some(BigDecimal(statsValue).compare(BigDecimal(litValue.toString)))
      case _: StringType => litValue match {
        case s: org.apache.spark.unsafe.types.UTF8String =>
          Some(statsValue.compareTo(s.toString))
        case s: String => Some(statsValue.compareTo(s))
        case _ => None
      }
      case _ => None
    } catch { case _: NumberFormatException => None }
  }
}

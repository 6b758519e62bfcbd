package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** [[ParquetFileFormat]] for column-mapped lake tables: the relation
  * advertises LOGICAL column names, the files store PHYSICAL ones
  * ([[graft.lake.ColumnMapping]]), and this class is the single
  * translation point — the data schema, required (pruned) schema and
  * pushed-down filters are renamed logical→physical before the stock
  * parquet reader is built. Nothing is translated on the way back:
  * downstream operators consume scan output POSITIONALLY, and the
  * physical required schema preserves the logical field order, so the
  * rows line up with the logical attributes as-is.
  *
  * Pushdown survives translation (same `PushedFilters`, just under
  * physical names); a filter shape the translator does not know is
  * dropped from the pushdown list only — Spark always re-evaluates
  * data filters above a file scan, so dropping is correctness-neutral.
  */
class MappedParquetFileFormat(
    val physicalFor: Map[String, String]) extends ParquetFileFormat {

  private def phys(name: String): String =
    physicalFor.getOrElse(name, name)

  private def physSchema(s: StructType): StructType =
    StructType(s.fields.map(f => f.copy(name = phys(f.name))))

  protected final def translate(f: Filter): Option[Filter] = f match {
    case sources.EqualTo(a, v) => Some(sources.EqualTo(phys(a), v))
    case sources.EqualNullSafe(a, v) =>
      Some(sources.EqualNullSafe(phys(a), v))
    case sources.GreaterThan(a, v) => Some(sources.GreaterThan(phys(a), v))
    case sources.GreaterThanOrEqual(a, v) =>
      Some(sources.GreaterThanOrEqual(phys(a), v))
    case sources.LessThan(a, v) => Some(sources.LessThan(phys(a), v))
    case sources.LessThanOrEqual(a, v) =>
      Some(sources.LessThanOrEqual(phys(a), v))
    case sources.In(a, vs) => Some(sources.In(phys(a), vs))
    case sources.IsNull(a) => Some(sources.IsNull(phys(a)))
    case sources.IsNotNull(a) => Some(sources.IsNotNull(phys(a)))
    case sources.StringStartsWith(a, v) =>
      Some(sources.StringStartsWith(phys(a), v))
    case sources.StringEndsWith(a, v) =>
      Some(sources.StringEndsWith(phys(a), v))
    case sources.StringContains(a, v) =>
      Some(sources.StringContains(phys(a), v))
    case sources.Not(c) => translate(c).map(sources.Not)
    case sources.And(l, r) =>
      for { lt <- translate(l); rt <- translate(r) }
        yield sources.And(lt, rt)
    case sources.Or(l, r) =>
      for { lt <- translate(l); rt <- translate(r) }
        yield sources.Or(lt, rt)
    case sources.AlwaysTrue() | sources.AlwaysFalse() => Some(f)
    case _ => None // pushdown-only: the post-scan Filter still applies
  }

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] =
    super.buildReaderWithPartitionValues(
      sparkSession,
      physSchema(dataSchema),
      partitionSchema, // partition columns are always identity-mapped
      physSchema(requiredSchema),
      filters.flatMap(translate),
      options,
      hadoopConf)

  // distinct mappings must never compare equal (plan/scan reuse);
  // the class check keeps a bloom-skipping subclass instance from
  // comparing equal to a plain mapped format with the same mapping
  override def equals(other: Any): Boolean = other match {
    case m: MappedParquetFileFormat =>
      m.getClass == getClass && m.physicalFor == physicalFor
    case _ => false
  }
  override def hashCode(): Int = physicalFor.hashCode()
}

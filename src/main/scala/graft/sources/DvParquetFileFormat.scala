package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference,
  UnsafeProjection}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.lake.{DvRowDeleted, PathMapPayload}

/** Parquet format that applies DELETION VECTORS inside the scan —
  * the read path for `spark.read.format("lake")` on DV-carrying
  * snapshots, where no DataFrame-level filter can be attached (the
  * DataSource contract returns a bare relation; `LakeTable.toDF`
  * reaches the same semantics via [[graft.lake.DvRowDeleted]] on
  * `_metadata.row_index`).
  *
  * Mechanism: the reader requests Spark's parquet ROW-INDEX column
  * (the `ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME` contract
  * that backs `_metadata.row_index` — exact under predicate pushdown
  * and row-group skipping), drops rows whose index is in the file's
  * decoded deletion vector, and strips the extra column before
  * handing rows downstream. The driver ships only the file→DV-path
  * map ([[PathMapPayload]]); executors decode each sidecar once into
  * a compressed [[graft.lake.RowIndexSet]] behind the process-wide
  * [[DvRowDeleted]] cache. Row-level filtering is incompatible with
  * handing whole ColumnarBatches up, so batch support is off for
  * these scans — the price of correctness on the minority of
  * snapshots that carry DVs.
  *
  * Extends [[BloomParquetFileFormat]] so a snapshot with BOTH bloom
  * sidecars and DVs gets file skipping AND row filtering (an empty
  * bloom payload degrades to the plain reader path).
  */
final class DvParquetFileFormat(
    physicalFor: Map[String, String],
    bloomPayload: Array[Byte],
    val dvPayload: Array[Byte])
    extends BloomParquetFileFormat(physicalFor, bloomPayload) {

  override def supportBatch(
      sparkSession: SparkSession, dataSchema: StructType): Boolean = false

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    // NULLABLE is load-bearing: the column is absent from the file,
    // and the parquet reader only tolerates (then row-index-fills) a
    // missing column that is optional — a required one throws at init.
    // When the query itself asked for `_metadata.row_index`, Spark has
    // ALREADY appended the temporary column — reuse it (and keep it
    // in the output) instead of requesting a duplicate name.
    val idxName = ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME
    val existing = requiredSchema.fieldNames.indexOf(idxName)
    val (augmented, idxOrdinal, strip) =
      if (existing >= 0) (requiredSchema, existing, false)
      else (requiredSchema.add(StructField(
        idxName, LongType, nullable = true)),
        requiredSchema.length, true)
    val base = super.buildReaderWithPartitionValues(
      sparkSession, dataSchema, partitionSchema, augmented,
      filters, options, hadoopConf)
    val applier = new DvRowApplier(
      dvPayload, requiredSchema, partitionSchema, idxOrdinal, strip)
    file => applier(base(file), file)
  }

  override def equals(other: Any): Boolean = other match {
    case d: DvParquetFileFormat =>
      super.equals(other) &&
        java.util.Arrays.equals(d.dvPayload, dvPayload)
    case _ => false
  }
  override def hashCode(): Int =
    super.hashCode() * 31 + java.util.Arrays.hashCode(dvPayload)
}

/** The serialized-into-the-task part: decodes the file→DV map once
  * per task, filters each file's rows by the row-index column at
  * `idxOrdinal`, and — when the column was appended by the format
  * rather than requested by the query — projects it away. DV-free
  * files skip the membership test but still strip when needed.
  */
private final class DvRowApplier(
    payload: Array[Byte], out: StructType, partition: StructType,
    idxOrdinal: Int, stripIdx: Boolean) extends Serializable {

  @transient private lazy val dvFor: java.util.HashMap[String, String] =
    PathMapPayload.decodePayload(payload)

  // Input layout when the format appended the index column:
  // [required..., rowIdx, partitionCols...] — the base reader appends
  // partition values AFTER the augmented required schema. The strip
  // must skip ONLY the index ordinal and KEEP the partition columns;
  // truncating at `out.length` would drop them, and downstream
  // consumers reading the partition ordinals off the narrower
  // UnsafeRow see adjacent garbage bytes.
  @transient private lazy val strip: UnsafeProjection =
    UnsafeProjection.create(
      Array.tabulate(out.length)(i =>
        BoundReference(i, out(i).dataType, out(i).nullable)) ++
      Array.tabulate(partition.length)(j =>
        BoundReference(out.length + 1 + j, partition(j).dataType,
          partition(j).nullable)))

  def apply(rows: Iterator[InternalRow],
      file: PartitionedFile): Iterator[InternalRow] = {
    val dvPath = dvFor.get(file.filePath.toPath.toUri.getPath)
    val kept =
      if (dvPath == null) rows
      else {
        val dv = DvRowDeleted.indexSet(dvPath)
        rows.filter(r => !dv.contains(r.getLong(idxOrdinal)))
      }
    if (stripIdx) kept.map(strip) else kept
  }
}

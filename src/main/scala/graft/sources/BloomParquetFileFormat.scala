package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

import graft.lake.{BloomIndex, PathMapPayload}

/** Parquet format for bloom-indexed lake tables ([[BloomIndex]]):
  * before opening a file whose AddFile carries a bloom sidecar, the
  * READER FUNCTION checks the scan's pushed equality/IN conjuncts
  * against the sidecar and returns an empty iterator when the file
  * provably contains no matching value — whole-file skipping for
  * needle-in-haystack point lookups that min/max stats cannot prune
  * (every file of an unsorted table spans the full id range).
  *
  * Skipping is executor-side BY DESIGN: the driver ships only the
  * (data file → sidecar) path map via [[PathMapPayload]] (inline
  * below the broadcast threshold, a riding Broadcast above — the
  * [[graft.lake.DvRowDeleted]] rule), and each task decodes its own
  * files' sidecars once behind [[BloomIndex]]'s process-wide soft-ref
  * cache. At 10⁶ files the driver never reads a single sidecar at
  * planning time; a scan task pays one cached sidecar read per file
  * it was already going to open.
  *
  * Correctness posture: a bloom can only say "definitely absent" —
  * a hit (or a missing/corrupt/unreadable sidecar, or a filter shape
  * the index does not understand) falls through to the stock reader,
  * and Spark re-evaluates data filters above the scan regardless, so
  * skipping is never load-bearing for row-level semantics. DV re-adds
  * keep the file's original bloom: deletion removes values, never
  * adds them, so the sidecar stays conservative-correct.
  *
  * Extends [[MappedParquetFileFormat]] (identity mapping when the
  * table is not column-mapped): sidecars store PHYSICAL column names
  * — they are built from staged physical files — so the pushed
  * filters are translated logical→physical before matching, exactly
  * as they are for the reader itself.
  */
class BloomParquetFileFormat(
    physicalFor: Map[String, String],
    val bloomPayload: Array[Byte])
    extends MappedParquetFileFormat(physicalFor) {

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    val base = super.buildReaderWithPartitionValues(
      sparkSession, dataSchema, partitionSchema, requiredSchema,
      filters, options, hadoopConf)
    // physical-name conjuncts, matching the sidecars' column names
    val reqs = BloomIndex.equalityRequirements(filters.flatMap(translate))
    if (reqs.isEmpty) base
    else {
      val skipper = new BloomFileSkipper(bloomPayload, reqs)
      file =>
        if (skipper.excluded(file)) {
          BloomIndex.skippedFiles.incrementAndGet()
          Iterator.empty
        } else base(file)
    }
  }

  override def equals(other: Any): Boolean = other match {
    case b: BloomParquetFileFormat =>
      b.physicalFor == physicalFor &&
        java.util.Arrays.equals(b.bloomPayload, bloomPayload)
    case _ => false
  }
  override def hashCode(): Int =
    physicalFor.hashCode() * 31 + java.util.Arrays.hashCode(bloomPayload)
}

/** The serialized-into-the-task part of the skip: holds the payload
  * bytes and the pushed conjuncts; decodes the (file → sidecar) map
  * once per deserialized instance (once per task — O(entries) string
  * decode, or one broadcast fetch) and consults [[BloomIndex]]'s
  * executor-wide sidecar cache per file.
  */
private final class BloomFileSkipper(
    payload: Array[Byte],
    reqs: Seq[(String, Seq[Any])]) extends Serializable {

  @transient private lazy val bloomFor: java.util.HashMap[String, String] =
    PathMapPayload.decodePayload(payload)

  def excluded(file: PartitionedFile): Boolean = {
    // map keys are the plain absolute paths our LakeFileIndex lists;
    // SparkPath round-trips url-encoding, so normalize via the URI
    val path = file.filePath.toPath.toUri.getPath
    bloomFor.get(path) match {
      case null => false
      case sidecar => BloomIndex.excludes(sidecar, reqs)
    }
  }
}

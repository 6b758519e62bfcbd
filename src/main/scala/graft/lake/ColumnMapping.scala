package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Column mapping (Delta `columnMapping.mode=name` analog): each
  * logical column owns a stable PHYSICAL name that is what actually
  * lands in parquet files, so RENAME COLUMN is a metadata-only commit
  * — the O(table) identity rewrite becomes O(1), and existing files
  * (and time travel across the rename) stay readable because their
  * physical names never change.
  *
  * Representation: the metadata property [[TABLE_PROP]] stores ONLY
  * the non-identity logical→physical entries (JSON object); every
  * column absent from it is identity-mapped. Enabling the mode on an
  * existing table is therefore a pure property flip — all current
  * columns keep their names physically — and entries appear only when
  * a rename moves a logical name off its physical one, or a column is
  * ADDED post-enable (fresh `col-<uuid>` physical name, so a
  * re-added name can never resurrect bytes an earlier same-named
  * column left in old files — the hazard the unmapped path guards
  * with drop tombstones).
  *
  * Invariant: PARTITION columns are always identity-mapped (their
  * names are baked into file paths); renaming them is rejected and
  * they all exist before mapping can be enabled.
  *
  * Scale shape: the mapping rides the metadata action (O(renamed
  * columns) bytes), writes rename-project once per commit, reads
  * translate names inside the scan builder — no per-row cost
  * anywhere.
  */
object ColumnMapping {

  val MODE_PROP = "graft.columnMapping.mode"
  val TABLE_PROP = "graft.columnMapping.physical"

  def enabled(meta: Metadata): Boolean =
    meta.properties.get(MODE_PROP).contains("name")

  def enabled(props: Map[String, String]): Boolean =
    props.get(MODE_PROP).contains("name")

  /** The non-identity logical→physical entries; empty when the mode
    * is off (every lookup must go through [[physicalName]]'s
    * identity default).
    */
  def overrides(meta: Metadata): Map[String, String] =
    if (!enabled(meta)) Map.empty
    else decode(meta.properties.getOrElse(TABLE_PROP, "{}"))

  def physicalName(logical: String, ov: Map[String, String]): String =
    ov.getOrElse(logical, logical)

  /** Fresh physical name for a column added while mapping is on. */
  def freshPhysical(): String =
    "col-" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  /** Rename a frame's columns logical→physical for the physical
    * write. One projection (not chained withColumnRenamed, which can
    * collide transiently when renames permuted names).
    */
  def toPhysical(df: DataFrame, ov: Map[String, String]): DataFrame =
    if (ov.isEmpty || !df.columns.exists(ov.contains)) df
    else df.select(df.columns.map(c =>
      col(s"`$c`").as(ov.getOrElse(c, c))).toSeq: _*)

  def encode(ov: Map[String, String]): String = {
    implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
    org.json4s.jackson.Serialization.write(ov)
  }

  def decode(json: String): Map[String, String] = {
    implicit val formats: org.json4s.Formats = org.json4s.DefaultFormats
    org.json4s.jackson.JsonMethods.parse(json).extract[Map[String, String]]
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gate query: a Spark implementation and (when
  * SQL-expressible) an equivalent DuckDB oracle over the same parquet
  * tables. Column names/aliases MUST match between the two — the
  * driver sorts columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Load a driver test table, e.g. `table(spark, dir, "lineitem")`. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events` with `ts` normalized to a session-TZ µs TIMESTAMP,
    * whatever physical type the driver generated this round:
    * TIMESTAMP(NANOS) reads as a LONG of epoch-nanos
    * (`spark.sql.legacy.parquet.nanosAsLong=true`, set in
    * [[graft.GraftSession]]; the values are µs-precision so `div 1000`
    * loses nothing), TIMESTAMP(MICROS) reads as TIMESTAMP_NTZ and only
    * needs the NTZ→TZ cast (wall-clock-preserving — the session TZ is
    * pinned to UTC, matching DuckDB's TIMESTAMP read).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeTs(table(spark, sfDir, "events"))

  /** Type-adaptive `ts` normalization shared by the batch and
    * streaming events readers.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Fresh per-(sf, gate) scratch dir for gates that persist lake
    * state — deleted up front so every run starts clean.
    */
  def scratch(name: String, sfDir: String): String = {
    val sf = new java.io.File(sfDir).getName
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_lake", sf, name)
    graft.lake.LakeWriter.deleteRecursively(dir)
    dir.toString
  }
}

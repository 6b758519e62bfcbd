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

  /** `events` with its ns-precision `ts` normalized to a µs TIMESTAMP.
    * The files store TIMESTAMP(NANOS) which Spark only reads as a LONG
    * of epoch-nanos (`spark.sql.legacy.parquet.nanosAsLong=true`, set in
    * [[graft.GraftSession]]); the underlying values are µs-precision, so
    * `div 1000` loses nothing and matches DuckDB's TIMESTAMP read.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    table(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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

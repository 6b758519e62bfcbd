package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by module registries:
  *  - [[graft.queries.CoreQueries]] — SURVEY §2 relational inventory
  *  - [[graft.queries.LakeQueries]] — versioned-table DML (SURVEY §2.9)
  */
object SparkEntry {

  private def registry: Seq[QueryDef] =
    CoreQueries.all ++ LakeQueries.all ++ OpsQueries.all ++
      PipelineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** Stable execution order for Bench (registry order). */
  def queryOrder: Seq[String] = registry.map(_.name)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

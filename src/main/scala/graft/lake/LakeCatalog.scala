package graft.lake

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.SparkSession

/** Engine-level name → path catalog for lake tables (SURVEY §1.4):
  * the equivalent of the reference's metastore registration
  * (`CREATE TABLE ... USING DELTA LOCATION`, K6). Registered names are
  * exposed to Spark SQL as temp views refreshed on demand by
  * [[LakeSql]], so plain DQL over lake tables "just works".
  */
object LakeCatalog {

  private val tables = TrieMap.empty[String, String]

  /** K6 — register (or re-register) a name for a lake path. */
  def register(spark: SparkSession, name: String, path: String): Unit = {
    require(LakeTable.isLakeTable(path),
      s"$path is not a lake table (no ${LakeLog.LOG_DIR})")
    tables.put(normalize(name), path)
    refreshView(spark, name)
  }

  /** K8 — drop the registration (data/log untouched). */
  def drop(spark: SparkSession, name: String): Unit = {
    tables.remove(normalize(name))
    spark.catalog.dropTempView(name)
    ()
  }

  def pathOf(name: String): Option[String] = tables.get(normalize(name))

  def table(spark: SparkSession, name: String): LakeTable =
    LakeTable.forPath(spark, pathOf(name).getOrElse(
      throw new IllegalArgumentException(
        s"lake table not registered: $name")))

  def registeredNames: Seq[String] = tables.keys.toSeq.sorted

  /** Re-publish the current snapshot of `name` as a temp view. Names
    * that are not valid view identifiers (e.g. backticked names with
    * spaces) stay resolvable through the catalog but are not SQL-view
    * addressable — skip rather than fail the operation that triggered
    * the refresh.
    */
  def refreshView(spark: SparkSession, name: String): Unit =
    pathOf(name).foreach { p =>
      try LakeTable.forPath(spark, p).toDF.createOrReplaceTempView(name)
      catch {
        case _: org.apache.spark.sql.AnalysisException => ()
      }
    }

  /** Refresh views for every registered table referenced in `sqlText`. */
  def refreshReferenced(spark: SparkSession, sqlText: String): Unit = {
    val lower = sqlText.toLowerCase
    tables.keys.foreach { n =>
      if (lower.contains(n)) refreshView(spark, n)
    }
  }

  private def normalize(name: String): String =
    name.toLowerCase.stripPrefix("`").stripSuffix("`")
}

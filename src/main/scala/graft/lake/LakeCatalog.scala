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
  /** Error conditions Spark raises for a name that cannot be a temp
    * view identifier — the only failures refreshView may swallow.
    */
  private val InvalidViewNameConditions = Set(
    "_LEGACY_ERROR_TEMP_1321",            // invalid chars / spaces
    "TEMP_VIEW_NAME_TOO_MANY_NAME_PARTS") // a.b.c.d

  def refreshView(spark: SparkSession, name: String): Unit =
    pathOf(name).foreach { p =>
      try LakeTable.forPath(spark, p).toDF.createOrReplaceTempView(name)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if InvalidViewNameConditions(String.valueOf(e.getCondition)) =>
          () // name not view-addressable; catalog lookup still works
        // any other analysis failure would leave a silently stale
        // view behind — let it surface
      }
    }

  private val IdentTokenRe = """`[^`]+`|[A-Za-z_][A-Za-z0-9_.]*""".r

  /** Refresh views for every registered table referenced in `sqlText`.
    * Matches whole identifiers (including dotted/backticked forms and
    * their parts), not substrings — a statement mentioning `tx` must
    * not refresh a table named `t`, or every statement churns
    * O(tables) snapshot replays.
    */
  def refreshReferenced(spark: SparkSession, sqlText: String): Unit = {
    if (tables.isEmpty) return
    val tokens = IdentTokenRe.findAllIn(sqlText).flatMap { t =>
      val base = t.toLowerCase.stripPrefix("`").stripSuffix("`")
      Iterator(base) ++ base.split('.').iterator
    }.toSet
    tables.keys.foreach(n => if (tokens(n)) refreshView(spark, n))
  }

  private def normalize(name: String): String =
    name.toLowerCase.stripPrefix("`").stripSuffix("`")
}

package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL front-end for the lake verb set (SURVEY §7.4, phase 2): a
  * statement pre-processor that recognizes the four Delta-verb shapes
  * the reference uses —
  *
  *   - `MERGE INTO t USING s ON cond WHEN ...`        (etl/05:100-138)
  *   - `SELECT ... FROM t VERSION AS OF n`            (etl/05:161-209)
  *   - `DESCRIBE HISTORY t`                           (etl/05:142-148)
  *   - `VACUUM t [RETAIN n HOURS]`                    (etl/05:300,334)
  *
  * plus lake DDL (`CREATE TABLE name USING lake LOCATION p`,
  * `DROP TABLE name`, `INSERT INTO t SELECT ...`, `DELETE FROM t`) —
  * routes them to the programmatic API, and hands everything else to
  * `spark.sql` with the referenced lake temp views refreshed first.
  */
object LakeSql {

  private val MERGE_RE =
    ("""(?is)\s*MERGE\s+INTO\s+([\w.`]+)(?:\s+AS\s+(\w+)|\s+(\w+))?""" +
      """\s+USING\s+([\w.`]+)(?:\s+AS\s+(\w+)|\s+(\w+))?""" +
      """\s+ON\s+(.+?)\s*(WHEN\s+.+)""").r
  private val WHEN_SPLIT_RE =
    """(?is)WHEN\s+(NOT\s+MATCHED|MATCHED)(?:\s+AND\s+(.+?))?\s+THEN\s+""" +
      """(UPDATE\s+SET\s+.+?|DELETE|INSERT\s*\*|INSERT\s*\(.+?\)\s*VALUES\s*\(.+?\))""" +
      """\s*(?=WHEN\s|$)"""
  private val VERSION_AS_OF_RE =
    """(?is)(.*\bFROM\s+)([\w.`]+)\s+VERSION\s+AS\s+OF\s+(\d+)(.*)""".r
  private val DESCRIBE_HISTORY_RE =
    """(?is)\s*DESCRIBE\s+HISTORY\s+([\w.`/]+)\s*""".r
  private val VACUUM_RE =
    """(?is)\s*VACUUM\s+([\w.`/]+)(?:\s+RETAIN\s+([\d.]+)\s+HOURS?)?\s*""".r
  private val CREATE_LAKE_RE =
    ("""(?is)\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.`]+)\s+""" +
      """USING\s+(?:lake|delta)\s+LOCATION\s+'([^']+)'\s*""").r
  private val CTAS_LAKE_RE =
    ("""(?is)\s*CREATE\s+(?:OR\s+REPLACE\s+)?TABLE\s+([\w.`]+)\s+""" +
      """USING\s+(?:lake|delta)\s+LOCATION\s+'([^']+)'\s+AS\s+(SELECT.+)""").r
  private val CONVERT_RE =
    ("""(?is)\s*CONVERT\s+TO\s+(?:LAKE|DELTA)\s+(?:parquet\s*\.\s*)?""" +
      """[`']([^'`]+)[`']\s*(?:PARTITIONED\s+BY\s*\((.+?)\))?\s*""").r
  private val DROP_TABLE_RE =
    """(?is)\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?([\w.`]+)\s*""".r
  private val INSERT_SELECT_RE =
    """(?is)\s*INSERT\s+INTO\s+([\w.`]+)\s+(SELECT\s+.+)""".r
  private val DELETE_FROM_RE =
    """(?is)\s*DELETE\s+FROM\s+([\w.`]+)(?:\s+WHERE\s+(.+))?\s*""".r
  private val RESTORE_RE =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?([\w.`/]+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*""".r

  /** Execute a SQL statement, lake-aware. Returns a DataFrame (empty
    * for DML, matching `spark.sql` conventions).
    */
  def sql(spark: SparkSession, sqlText: String): DataFrame = sqlText match {
    case MERGE_RE(tgt, a1, a2, src, a3, a4, cond, clauses) =>
      runMerge(spark, clean(tgt), Option(a1).orElse(Option(a2)),
        clean(src), Option(a3).orElse(Option(a4)), cond, clauses)
      emptyDF(spark)

    case DESCRIBE_HISTORY_RE(t) =>
      resolve(spark, clean(t)).history()

    case VACUUM_RE(t, retain) =>
      val table = resolve(spark, clean(t))
      val deleted = Option(retain) match {
        case Some(h) => table.vacuum(h.toDouble)
        case None => table.vacuum()
      }
      import spark.implicits._
      deleted.toDF("path")

    case CTAS_LAKE_RE(name, location, select) =>
      val df = sql(spark, select)
      LakeWriter.write(df, location, mode = "overwrite",
        operation = "CREATE TABLE AS SELECT")
      LakeCatalog.register(spark, clean(name), location)
      emptyDF(spark)

    case CREATE_LAKE_RE(name, location) =>
      LakeCatalog.register(spark, clean(name), location)
      emptyDF(spark)

    case CONVERT_RE(path, partDDL) =>
      LakeTable.convertToLake(spark, path,
        Option(partDDL).map(_.trim).getOrElse(""))
      emptyDF(spark)

    case DROP_TABLE_RE(name) if LakeCatalog.pathOf(clean(name)).isDefined =>
      LakeCatalog.drop(spark, clean(name))
      emptyDF(spark)

    case INSERT_SELECT_RE(t, select) if isLake(t) =>
      val df = sql(spark, select) // recurse: SELECT may time-travel
      val path = LakeCatalog.pathOf(clean(t)).get
      LakeWriter.write(df, path, operation = "INSERT")
      LakeCatalog.refreshView(spark, clean(t))
      emptyDF(spark)

    case RESTORE_RE(t, version) =>
      resolve(spark, clean(t)).restoreTo(version.toLong)
      LakeCatalog.refreshView(spark, clean(t))
      emptyDF(spark)

    case DELETE_FROM_RE(t, where) if isLake(t) =>
      val table = resolve(spark, clean(t))
      table.delete(Option(where).getOrElse("true"))
      LakeCatalog.refreshView(spark, clean(t))
      emptyDF(spark)

    case _ =>
      // time-travel scans can appear inside larger SELECTs
      VERSION_AS_OF_RE.findFirstMatchIn(sqlText) match {
        case Some(m) if isLake(m.group(2)) =>
          val name = clean(m.group(2))
          val version = m.group(3).toLong
          val viewName = s"${name}__v$version"
          LakeCatalog.table(spark, name).asOf(version)
            .createOrReplaceTempView(viewName)
          runSelect(spark,
            m.group(1) + viewName + m.group(4))
        case _ => runSelect(spark, sqlText)
      }
  }

  /** Plain statement: refresh referenced lake views, let Spark run it. */
  private def runSelect(spark: SparkSession, text: String): DataFrame = {
    LakeCatalog.refreshReferenced(spark, text)
    spark.sql(text)
  }

  private def runMerge(
      spark: SparkSession, tgtName: String, tgtAlias: Option[String],
      srcName: String, srcAlias: Option[String],
      cond: String, clausesText: String): Unit = {
    LakeCatalog.refreshReferenced(spark, srcName)
    val srcDF0 =
      LakeCatalog.pathOf(srcName) match {
        case Some(p) => LakeTable.forPath(spark, p).toDF
        case None => spark.table(srcName)
      }
    val srcDF = srcDF0.as(srcAlias.getOrElse(srcName))
    var builder = LakeCatalog.table(spark, tgtName)
      .as(tgtAlias.getOrElse(tgtName))
      .merge(srcDF, cond)

    val whenRe = WHEN_SPLIT_RE.r
    val matches = whenRe.findAllMatchIn(clausesText).toSeq
    require(matches.nonEmpty, s"MERGE has no parseable WHEN clauses: $clausesText")
    matches.foreach { m =>
      val matchedKind = m.group(1).toUpperCase.replaceAll("\\s+", " ")
      val clauseCond = Option(m.group(2)).map(_.trim).orNull
      val action = m.group(3).trim
      val actionUpper = action.toUpperCase
      if (matchedKind == "MATCHED") {
        if (actionUpper == "DELETE")
          builder = builder.whenMatchedDelete(clauseCond)
        else if (actionUpper.startsWith("UPDATE"))
          builder = builder.whenMatchedUpdate(clauseCond,
            parseSetMap(action.replaceAll("(?is)^UPDATE\\s+SET\\s+", "")))
        else throw new IllegalArgumentException(
          s"unsupported WHEN MATCHED action: $action")
      } else {
        if (actionUpper.startsWith("INSERT *") || actionUpper == "INSERT*")
          builder = builder.whenNotMatchedInsertAll()
        else {
          val ins = """(?is)INSERT\s*\((.+?)\)\s*VALUES\s*\((.+)\)""".r
          action match {
            case ins(cols, vals) =>
              val names = splitTop(cols).map(clean)
              val exprs = splitTop(vals)
              builder = builder.whenNotMatchedInsert(clauseCond,
                names.zip(exprs).toMap)
            case _ => throw new IllegalArgumentException(
              s"unsupported WHEN NOT MATCHED action: $action")
          }
        }
      }
    }
    builder.execute()
    LakeCatalog.refreshView(spark, tgtName)
  }

  private def parseSetMap(setText: String): Map[String, String] =
    splitTop(setText).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      clean(k.trim) -> v.trim
    }.toMap

  /** Split on commas at paren/quote depth zero. */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var inStr = false
    val cur = new StringBuilder
    s.foreach {
      case '\'' => inStr = !inStr; cur += '\''
      case '(' if !inStr => depth += 1; cur += '('
      case ')' if !inStr => depth -= 1; cur += ')'
      case ',' if depth == 0 && !inStr =>
        out += cur.toString.trim; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString.trim
    out.result()
  }

  /** Resolve a registered name or a literal path to a LakeTable. */
  private def resolve(spark: SparkSession, nameOrPath: String): LakeTable =
    LakeCatalog.pathOf(nameOrPath) match {
      case Some(p) => LakeTable.forPath(spark, p)
      case None if LakeTable.isLakeTable(nameOrPath) =>
        LakeTable.forPath(spark, nameOrPath)
      case None => throw new IllegalArgumentException(
        s"not a registered lake table or lake path: $nameOrPath")
    }

  private def isLake(name: String): Boolean =
    LakeCatalog.pathOf(clean(name)).isDefined

  private def clean(name: String): String =
    name.trim.toLowerCase.stripPrefix("`").stripSuffix("`")

  private def emptyDF(spark: SparkSession): DataFrame =
    spark.emptyDataFrame
}

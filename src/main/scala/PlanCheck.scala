import org.apache.spark.sql.functions._
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("plancheck")
    val path = "/tmp/bloomdbg" + System.nanoTime()
    graft.lake.LakeWriter.write(
      spark.range(400L).select(col("id"),
        expr("date_add(date'2020-01-01', CAST(id AS INT))").as("d"))
        .repartition(4, col("id")),
      path, properties = Map(
        graft.lake.BloomIndex.PROP_COLUMNS -> "d",
        graft.lake.BloomIndex.PROP_NUM_ITEMS -> "10000"))
    val t = graft.lake.LakeTable.forPath(spark, path)
    val q = t.toDF.filter(col("d") === java.sql.Date.valueOf("2020-08-15"))
    q.collect()
    println(q.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("PushedFilters") || l.contains("Scan")).mkString("\n").take(2000))
    spark.stop()
  }
}

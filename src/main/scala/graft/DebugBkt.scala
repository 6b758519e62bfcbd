package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.lake.{LakeTable, LakeWriter}
import graft.queries.QueryDef.{table, scratch}
object DebugBkt {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val spark = GraftSession.enable(GraftSession.configure(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    val lp = scratch("dbg_bkt2", dir)
    val props = Map(LakeTable.PROP_BUCKET_BY -> "k",
      LakeTable.PROP_BUCKET_COUNT -> "8")
    LakeWriter.write(table(s, dir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_quantity")),
      lp, properties = props)
    val lake = s.read.format("lake").load(lp)
    val chained = lake.repartition(1).repartition(8, col("k"))
    println("rdd partitions: " + chained.rdd.getNumPartitions)
    chained.collect()
    println(chained.queryExecution.executedPlan.toString.take(2500))
    spark.stop()
  }
}

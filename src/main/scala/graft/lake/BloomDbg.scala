package graft.lake
import org.apache.spark.sql.functions._
object BloomDbg {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("dbg")
    import spark.implicits._
    val path = "/tmp/metacount" + System.nanoTime()
    LakeWriter.write((1L to 500L).toDF("id").repartition(4), path,
      properties = Map("graft.enableDeletionVectors" -> "true"))
    LakeTable.forPath(spark, path).delete("id <= 100")
    val snap = LakeTable.forPath(spark, path).snapshot()
    snap.files.foreach(f => println(s"FILE ${f.path} n=${f.numRecords} dv=${f.dvCardinality} dvPath=${f.dvPath}"))
    println("METARULE_COUNT=" + spark.read.format("lake").load(path).count())
    println("SCAN_COUNT=" + spark.read.format("lake").load(path).where("id > 0").count())
    spark.stop()
  }
}

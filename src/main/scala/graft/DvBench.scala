package graft
import org.apache.spark.sql.functions._
import graft.lake.{LakeTable, LakeWriter}
object DvBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("dvbench")
    val sf = "/root/testdata/sf0.1"
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
        "l_extendedprice", "l_shipdate", "l_discount", "l_tax")
    def bytesUnder(p: String): Long = {
      val root = java.nio.file.Paths.get(p)
      val s = java.nio.file.Files.walk(root)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum
      finally s.close()
    }
    def run(name: String, props: Map[String, String]): Unit = {
      val path = s"/tmp/dvbench/$name"
      graft.lake.LakeWriter.deleteRecursively(java.nio.file.Paths.get(path))
      LakeWriter.write(l.repartition(16), path, properties = props)
      val before = bytesUnder(path)
      val t0 = System.nanoTime()
      LakeTable.forPath(spark, path).delete("l_quantity = 25.0") // ~2% of rows
      val sec = (System.nanoTime() - t0) / 1e9
      val after = bytesUnder(path)
      val rows = LakeTable.forPath(spark, path).toDF.count()
      println(f"$name%-6s delete=${sec}%6.2f s  bytesWritten=${(after - before).max(0) / 1024}%8d KiB  rowsLeft=$rows")
    }
    run("cow", Map.empty)
    run("dv", Map(LakeTable.PROP_ENABLE_DV -> "true"))
    spark.stop()
  }
}

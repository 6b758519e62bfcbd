package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: executes every SparkEntry query once, in
  * registry order, against SPARK_GRAFT_SF_DIR, and prints ONE JSON
  * line {"metric":...,"value":...,"queries":{name:sec,...}}. A small
  * warmup action first so JIT/codegen startup isn't billed to the
  * first query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: a scan+agg touches codegen, parquet reader, shuffle paths
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()

    val queries = SparkEntry.queries
    val results = SparkEntry.queryOrder.map { name =>
      val t0 = System.nanoTime()
      val ok =
        try { queries(name)(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-28s ${sec}%8.2f s")
      name -> (if (ok) sec else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

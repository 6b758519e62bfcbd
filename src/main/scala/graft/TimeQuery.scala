package graft

import org.apache.spark.sql.SparkSession

/** Time one gate query N times: runMain graft.TimeQuery <name> [sfDir] [n] */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.local("graft-time")
    val fn = SparkEntry.queries(name)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val c = fn(spark, sfDir).count()
      println(f"[time] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
    }
    spark.stop()
  }
}

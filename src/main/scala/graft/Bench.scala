package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: executes every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints the canonical ONE-JSON-line result
  * {"metric":"total",...} as the LAST stdout line.
  *
  * Each query runs `SPARK_GRAFT_BENCH_RUNS` times (default 2) and
  * reports the MIN — streaming gates mix stream/JVM startup into their
  * first pass, and a single-pass number can show a phantom regression
  * that is pure noise. A second JSON line {"metric":"spread",...}
  * (printed BEFORE the canonical line) carries max-min per query so
  * round-over-round comparisons can tell signal from variance.
  *
  * Optional args: query names to run (default: all), for focused
  * profiling of one gate.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // min-of-3 by default: this VM shows intermittent host-level
    // stalls (observed 3x inflation windows); two samples are not
    // enough to reliably dodge one, and the spread line reports the
    // variance either way.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: a scan+agg touches codegen, parquet reader, shuffle
    // paths. Non-fatal — if the data dir itself is broken, every query
    // fails below and the canonical line still reports it.
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }

    // Calibration: the same fixed scan+agg timed (min-of-3, after the
    // warmup has paid codegen/reader init) BEFORE and AFTER the query
    // loop. The query is constant across rounds, so its time moves only
    // with the host. A before/after ratio over 2x marks the snapshot
    // CONTENDED: round-4's recorded streaming numbers were host-stall
    // artifacts (3x inflation, x8 run-to-run spread) that min-of-N
    // cannot dodge when the stall spans the whole bench window — this
    // field makes such a snapshot self-identifying instead of
    // masquerading as a regression.
    def calibrate(): Double = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try spark.read.parquet(s"$sfDir/lineitem.parquet")
          .groupBy("l_returnflag").count().collect()
        catch { case _: Throwable => }
        (System.nanoTime() - t0) / 1e9
      }
      times.min
    }
    val calBefore = calibrate()

    // Self-test hook: comma-separated query names forced to fail, so
    // the loud-failure contract (non-zero exit + "failed" field) can
    // be exercised without breaking a real query.
    val forceFail = sys.env.get("SPARK_GRAFT_BENCH_FORCE_FAIL")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])

    val queries = SparkEntry.queries
    val names =
      if (args.nonEmpty) SparkEntry.queryOrder.filter(args.toSet)
      else SparkEntry.queryOrder
    val results = names.map { name =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try {
            if (forceFail(name))
              throw new RuntimeException("forced failure (self-test)")
            queries(name)(spark, sfDir).count(); true
          }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        if (ok) sec else -1.0
      }
      val best =
        if (times.exists(_ < 0)) -1.0 else times.min
      val spread =
        if (times.exists(_ < 0)) -1.0 else times.max - times.min
      System.err.println(
        f"[bench] $name%-28s ${best}%8.2f s  (±$spread%.2f over $runs runs)")
      (name, best, spread)
    }
    def jsonMap(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // A failed query must be LOUD: it is excluded from the sum (a -1
    // would fake a speedup the other way), but the canonical line
    // names it in "failed" and the process exits non-zero, so a crash
    // can never read as a faster total.
    val failed = results.filter(_._2 < 0).map(_._1)
    val total = results.map(_._2).filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val calAfter = calibrate()
    val calRatio = math.max(calBefore, calAfter) /
      math.max(math.min(calBefore, calAfter), 1e-9)
    val contended = calRatio > 2.0
    System.err.println(
      f"[bench] calibration before=$calBefore%.3f s after=$calAfter%.3f s " +
      f"ratio=$calRatio%.2f contended=$contended")
    println(s"""{"metric":"spread","unit":"sec","runs":$runs,"queries":${
      jsonMap(results.map(r => r._1 -> r._3))}}""")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${
      jsonMap(results.map(r => r._1 -> r._2))},"failed":$failedJson,${""
      }"calibration":{"before":$calBefore,"after":$calAfter,${""
      }"ratio":${f"$calRatio%.3f"},"contended":$contended},"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(
        s"[bench] FAILED queries (${failed.size}): ${failed.mkString(", ")}")
      sys.exit(1)
    }
  }
}

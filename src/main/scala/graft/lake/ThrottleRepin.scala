package graft.lake

/** Quiet-disk re-pin of the three round-19 10⁷ legs whose wall
  * numbers were taken in this host's documented post-heavy-I/O
  * throttle phase (VERDICT r19 "What's missing" #3): columnar
  * `addsForPaths` (332 s), LakeWriter overwrite (229 s), and
  * stream-init chunk 1 (364 s). Each leg is copied VERBATIM from
  * [[MetaScaleBench]] / [[MetaScaleResume]] (same requires, same
  * cache clears) but parameterized by an explicit log VERSION so it
  * can run against the PRESERVED round-19 fixture directory instead
  * of rebuilding — the fixture's post-run state (v112 pre-overwrite,
  * v114 restore, v121 streamed delete) pins every leg's exact input,
  * and the measurement process itself does none of the 7 GB of
  * writes that throttled the original run.
  *
  * Run (one leg per JVM, 48g per the documented 10⁷ heap
  * conditions, `sync; echo 3 > /proc/sys/vm/drop_caches` between
  * legs for genuine cold-and-quiet reads):
  * `SPARK_DRIVER_MEM=48g sbt "runMain graft.lake.ThrottleRepin
  * <dir> <nFiles> <leg> <version>"` with leg ∈
  * `addsforpaths` (version = pre-overwrite), `streaminit`
  * (version = the restore's own version), `overwrite` (version
  * ignored; requires a ~nFiles-live latest state — restore there
  * first). Results in SCALE.md (Round-20).
  */
object ThrottleRepin {
  private def rssMb(): Long = {
    val s = scala.io.Source.fromFile("/proc/self/status")
    try s.getLines().find(_.startsWith("VmRSS"))
      .map(_.split("\\s+")(1).toLong / 1024).getOrElse(-1L)
    finally s.close()
  }

  private def timed[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    printf("%-40s %8.2f s   rss=%d MB%n", label,
      (System.nanoTime() - t0) / 1e9, rssMb())
    r
  }

  def main(args: Array[String]): Unit = {
    val Array(dir, nFilesS, leg, versionS) = args.padTo(4, "-1")
    val nFiles = nFilesS.toInt
    val version = versionS.toLong
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("ThrottleRepin").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val log = new LakeLog(dir)
    require(log.exists, s"$dir is not a lake table")
    Snapshot.clearCacheForTest()
    graft.sources.ColumnarLakeFileIndex.clearCacheForTest()

    leg match {
      case "addsforpaths" =>
        // MetaScaleBench:139-184 at an explicit (pre-overwrite)
        // version: columnar build, partition listFiles, DML
        // discovery, and the touched-subset fetch under test.
        val colIdx = timed("columnar index build (cold)") {
          graft.sources.ColumnarLakeFileIndex
            .tryBuild(spark, log, version).get
        }
        import org.apache.spark.sql.catalyst.expressions.{
          AttributeReference, EqualTo => CEq, Literal => CLit}
        import org.apache.spark.sql.types.IntegerType
        val pAttr = AttributeReference("p", IntegerType)()
        timed("columnar listFiles p = 500") {
          val dirs = colIdx.listFiles(Seq(CEq(pAttr, CLit(500))), Nil)
          val n = dirs.map(_.files.size).sum
          require(n == nFiles / 1000, s"columnar partition prune listed $n")
        }
        locally {
          val fr0 = Snapshot.fullReplays.get()
          val plan = new DmlPlan.Columnar(
            LakeTable.forPath(spark, dir), colIdx)
          val touched = timed("columnar DML discovery p = 500") {
            val t = plan.partitionOnlyMatches("p = 500")
            require(t.exists(_.size == nFiles / 1000),
              s"partition-only DELETE discovery found ${t.map(_.size)}")
            t.get
          }
          timed("columnar addsForPaths (touched subset)") {
            val sub = plan.subset(touched)
            require(sub.files.size == nFiles / 1000,
              s"subset fetched ${sub.files.size}")
          }
          require(Snapshot.fullReplays.get() == fr0,
            "columnar DML planning replayed the full file list")
        }

      case "streaminit" =>
        // MetaScaleBench:414-463 with the restore version passed in:
        // the rate-limited stream's first two chunks over the
        // restored 10⁷-file state — getBatch is read-only, so the
        // fixture is untouched.
        import org.apache.spark.sql.execution.streaming.SerializedOffset
        def usedHeap(): Long = {
          (1 to 3).foreach { _ => System.gc(); Thread.sleep(100) }
          val rt = Runtime.getRuntime
          rt.totalMemory() - rt.freeMemory()
        }
        val chunkFiles = math.max(nFiles / 10, 1)
        val src = new graft.sources.LakeStreamSource(spark, dir,
          Map("maxFilesPerTrigger" -> chunkFiles.toString))
        val fr0 = Snapshot.fullReplays.get()
        val h0 = usedHeap()
        timed("stream init chunk 1 (cold)") {
          src.getBatch(Some(SerializedOffset(s"$version#0")),
            SerializedOffset(s"$version#$chunkFiles"))
        }
        timed("stream init chunk 2 (warm)") {
          src.getBatch(Some(SerializedOffset(s"$version#$chunkFiles")),
            SerializedOffset(s"$version#${2L * chunkFiles}"))
        }
        Snapshot.clearCacheForTest()
        graft.sources.ColumnarLakeFileIndex.clearCacheForTest()
        val dh = usedHeap() - h0
        printf("  stream chunk-state heap delta: %.1f MB%n", dh / 1e6)
        require(Snapshot.fullReplays.get() == fr0,
          "chunked initial snapshot replayed the full file list")
        require(dh < math.max(192L * 1024 * 1024, nFiles.toLong * 320),
          s"chunked initial snapshot held $dh bytes on the driver")

      case "restore" =>
        // bring the fixture's latest state back to `version` (the
        // post-cadence 10⁷-live state) so the overwrite leg sees the
        // round-19 shape; streamed, bonus datum
        timed(s"RESTORE to v$version (streamed)") {
          val fr0 = Snapshot.fullReplays.get()
          LakeTable.forPath(spark, dir).restoreTo(version)
          require(Snapshot.fullReplays.get() == fr0,
            "streamed RESTORE replayed the full file list")
        }

      case "overwrite" =>
        // MetaScaleBench:296-317 against the current latest state
        val dataCols = Seq("id", "k1", "k2", "qty", "price", "disc",
          "tax", "flag", "status", "shipdate", "commitdate")
        timed(s"LakeWriter overwrite of ${nFiles / 1000}k-file (cold)") {
          import org.apache.spark.sql.functions.lit
          val df = dataCols.drop(1)
            .foldLeft(spark.range(100).toDF("id"))(
              (d, c) => d.withColumn(c, lit(c)))
            .withColumn("p", lit(0))
          val fr0 = Snapshot.fullReplays.get()
          LakeWriter.write(df, dir, mode = "overwrite")
          require(Snapshot.fullReplays.get() == fr0,
            "overwrite tombstones replayed the full file list")
          ()
        }
        locally {
          val finalV = log.latestVersion
          val removes = log.readVersion(finalV)
            .count(_.isInstanceOf[RemoveFile])
          println(s"  overwrite tombstoned $removes files at v$finalV")
          require(removes >= nFiles,
            s"overwrite tombstoned only $removes of $nFiles+ live files")
        }

      case other => sys.error(s"unknown leg: $other")
    }
    spark.stop()
  }
}

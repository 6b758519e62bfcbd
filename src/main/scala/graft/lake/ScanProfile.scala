package graft.lake

/** A/B diagnostic for the checkpoint-scan decode paths (round 18):
  * the SAME synthetic state checkpointed in both layouts — classic
  * multi-part parquet vs manifest + sidecar slices — then the decode
  * passes every columnar read rides, timed with the page cache warmed
  * first so the comparison isolates CPU/decode shape from this host's
  * known disk-throttle phases (the r17 10⁷ summary-pass number mixed
  * the two).
  *
  * Passes per layout, min of 3 after one warm-up:
  *  - FULL single-part decode (one thread): the per-task cost the
  *    candidate scans pay.
  *  - LITE single-part decode: the projected read the summary and
  *    path projections pay (stats column chunks never read).
  *  - FULL all-parts Spark job (local[8]): the listFiles shape.
  *  - LITE all-parts Spark job: the summary/projection shape.
  */
object ScanProfile {
  private def timed3[A](label: String)(body: => A): A = {
    var best = Long.MaxValue
    var out: Option[A] = None
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      val r = body
      val dt = System.nanoTime() - t0
      if (i > 1 && dt < best) best = dt // first pass = warm-up
      if (out.isEmpty) out = Some(r)
    }
    printf("%-44s %8.2f s (min of 3, warm)%n", label, best / 1e9)
    out.get
  }

  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(2000000)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("ScanProfile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val perCommit = 100000
    val dataCols = Seq("id", "k1", "k2", "qty", "price", "disc", "tax",
      "flag", "status", "shipdate", "commitdate")
    val schemaDDL = "id BIGINT, " +
      dataCols.drop(1).map(c => s"$c STRING").mkString(", ") + ", p INT"
    def addFor(i: Int): AddFile = {
      val mins = dataCols.map {
        case "id" => "id" -> (i.toLong * 100).toString
        case c => c -> s"${c}_${i % 7}min"
      }.toMap
      val maxs = dataCols.map {
        case "id" => "id" -> (i.toLong * 100 + 99).toString
        case c => c -> s"${c}_${i % 7}max"
      }.toMap
      AddFile(s"p=${i % 1000}/f$i.parquet",
        Map("p" -> (i % 1000).toString),
        1024L * 1024 * 100, 100L, mins, maxs,
        dataCols.map(_ -> 0L).toMap)
    }
    Seq(false, true).foreach { incremental =>
      val layout = if (incremental) "manifest" else "classic"
      println(s"=== layout: $layout, $nFiles files ===")
      val prev = LakeLog.INCREMENTAL_CHECKPOINTS
      LakeLog.INCREMENTAL_CHECKPOINTS = incremental
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-scanprofile-$layout").toString
      try {
        val log = new LakeLog(dir)
        log.commit(0L, Seq(
          CommitInfo(1L, "CREATE", Map.empty),
          Metadata(schemaDDL, Seq("p"), 1L),
          Protocol()))
        val nCommits = (nFiles + perCommit - 1) / perCommit
        (1 to nCommits).foreach { cNum =>
          val lo = (cNum - 1) * perCommit
          val hi = math.min(cNum * perCommit, nFiles)
          log.commit(cNum.toLong,
            CommitInfo(cNum + 1L, "APPEND", Map.empty) +:
              (lo until hi).map(addFor(_): Action))
        }
        // pad to the cadence so a checkpoint lands at the tip
        ((nCommits + 1) to (((nCommits / 10) + 1) * 10)).foreach { v =>
          log.commit(v.toLong, Seq(
            CommitInfo(v + 1L, "APPEND", Map.empty),
            AddFile(s"p=0/t$v.parquet", Map("p" -> "0"), 1024L, 1L,
              Map("id" -> "0"), Map("id" -> "0"), Map("id" -> 0L))))
        }
        val latest = log.latestVersion
        val (ckptV, files0) =
          log.latestCheckpointFilesAtOrBefore(latest).get
        val isManifest = files0.headOption.exists(
          _.getFileName.toString.endsWith(".checkpoint.manifest.json"))
        val parts = if (isManifest) files0.drop(1) else files0
        println(s"  checkpoint v$ckptV: ${parts.size} $layout parts, " +
          f"${parts.map(p => java.nio.file.Files.size(p)).sum / 1e6}%.0f MB")
        // COLD pass (opt-in via the `cold` arg, VERDICT r18 #7): the
        // manifest layout's real-world cost is the cache-aged carried
        // slice — SCALE.md's honest structural note — so regression
        // triage needs a cold datum next to the warm ones. Root-only
        // (drops the whole page cache); single sample each, measured
        // BEFORE any warm read of the parts.
        if (args.contains("cold")) {
          def dropPageCache(): Boolean =
            try {
              java.nio.file.Files.write(
                java.nio.file.Paths.get("/proc/sys/vm/drop_caches"),
                "3\n".getBytes("UTF-8"))
              true
            } catch { case _: Throwable => false }
          if (!dropPageCache())
            println("  (cold passes skipped: cannot drop the page cache)")
          else {
            def timed1[A](label: String)(body: => A): Unit = {
              val t0 = System.nanoTime()
              body
              printf("%-44s %8.2f s (single, COLD)%n", label,
                (System.nanoTime() - t0) / 1e9)
            }
            timed1("LITE decode, all parts, spark job, cold") {
              val rs = parts.map(log.store.fileReader)
              spark.sparkContext.parallelize(rs, rs.size)
                .map(r => CheckpointParquet.readAddsLite(r).size).sum()
            }
            dropPageCache()
            timed1("FULL decode, all parts, spark job, cold") {
              val rs = parts.map(log.store.fileReader)
              spark.sparkContext.parallelize(rs, rs.size)
                .map(r => CheckpointParquet.read(r)
                  .count(_.isInstanceOf[AddFile])).sum()
            }
          }
        }
        // warm the page cache so decode shape, not today's disk phase,
        // is what the clocks see
        parts.foreach(p => java.nio.file.Files.readAllBytes(p))
        val oneReader = log.store.fileReader(parts.head)
        timed3("FULL decode, one part, one thread") {
          CheckpointParquet.read(oneReader).size
        }
        timed3("FULL decode via Group API (reference)") {
          CheckpointParquet.readViaGroups(parts.head).size
        }
        timed3("LITE decode, one part, one thread") {
          CheckpointParquet.readAddsLite(oneReader).size
        }
        val readers = parts.map(log.store.fileReader)
        timed3("FULL decode, all parts, spark job") {
          spark.sparkContext.parallelize(readers, readers.size)
            .map(r => CheckpointParquet.read(r)
              .count(_.isInstanceOf[AddFile])).sum()
        }
        timed3("FULL via Groups, all parts, spark job") {
          val ps = parts.map(_.toString)
          spark.sparkContext.parallelize(ps, ps.size)
            .map(p => CheckpointParquet
              .readViaGroups(java.nio.file.Paths.get(p))
              .count(_.isInstanceOf[AddFile])).sum()
        }
        timed3("LITE decode, all parts, spark job") {
          spark.sparkContext.parallelize(readers, readers.size)
            .map(r => CheckpointParquet.readAddsLite(r).size).sum()
        }
      } finally {
        LakeLog.INCREMENTAL_CHECKPOINTS = prev
        LakeWriter.deleteRecursively(java.nio.file.Paths.get(dir))
      }
    }
    spark.stop()
  }
}

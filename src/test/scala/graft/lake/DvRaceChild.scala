package graft.lake

/** Spawned as a SEPARATE JVM by LakeConcurrencySuite's deletion-vector
  * race test: performs `count` optimistic DV supersessions of ONE
  * shared data file. Each iteration replays the current snapshot, and
  * commits a re-add of the file with `dvCardinality = current + 1`
  * through [[LakeWriter.commitWithRetry]] with the file in its
  * conflict set — exactly the shape a merge-on-read DELETE commits.
  * A writer whose base was superseded concurrently must observe
  * [[ConflictingCommitException]] and retry FROM A FRESH SNAPSHOT; if
  * the re-add conflict rule ever misses cross-process, two writers
  * chain off the same base and a cardinality increment is lost, which
  * the parent asserts against.
  *
  * No SparkSession — the protocol under test is driver-side log code,
  * and a bare-JVM child keeps startup near-zero so processes overlap.
  */
object DvRaceChild {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val tag = args(1)
    val count = args(2).toInt
    val filePath = args(3)
    val log = new LakeLog(path)
    val go = java.nio.file.Paths.get(path, "_race_go")
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (!java.nio.file.Files.exists(go)) {
      if (System.nanoTime() > deadline) {
        System.err.println(s"$tag: go-marker never appeared")
        sys.exit(3)
      }
      Thread.sleep(5)
    }
    var i = 0
    var attempts = 0
    while (i < count) {
      attempts += 1
      if (attempts > count * 1000) {
        System.err.println(s"$tag: livelock after $attempts attempts")
        sys.exit(2)
      }
      val base = log.snapshot() // fresh replay every attempt
      val cur = base.files.find(_.path == filePath).getOrElse {
        System.err.println(s"$tag: shared file vanished"); sys.exit(4)
      }
      try {
        LakeWriter.commitWithRetry(log, base.version, Seq(filePath)) { _ =>
          Seq(
            CommitInfo(System.currentTimeMillis(), "DVRACE",
              Map("writer" -> tag, "seq" -> i.toString)),
            cur.copy(
              dvPath = Some(s"_deletion_vectors/race-$tag-$i.bin"),
              dvCardinality = cur.dvCardinality + 1))
        }
        i += 1
      } catch {
        case _: ConflictingCommitException => () // superseded; re-read
      }
    }
  }
}

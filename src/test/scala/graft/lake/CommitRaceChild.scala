package graft.lake

/** Spawned as a SEPARATE JVM by LakeConcurrencySuite's cross-process
  * test: performs `count` CommitInfo-only commits tagged
  * (writer=tag, seq=i) against the lake log at args(0), racing the
  * parent and sibling processes through the exclusive-createLink
  * commit path with optimistic re-read-and-retry on version conflict.
  *
  * No SparkSession — the atomic primitive under test is the log
  * protocol itself, and a bare-JVM child keeps startup near-zero so
  * the processes genuinely overlap.
  */
object CommitRaceChild {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val tag = args(1)
    val count = args(2).toInt
    val log = new LakeLog(path)
    // start-line barrier: wait for the parent's go-marker so all
    // processes hammer the log simultaneously instead of serially
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
      val next = log.latestVersion + 1
      try {
        log.commit(next, Seq(CommitInfo(System.currentTimeMillis(),
          "RACE", Map("writer" -> tag, "seq" -> i.toString))))
        i += 1
      } catch {
        case _: ConcurrentWriteException => () // lost the race; retry
      }
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory so every entry point (Verify, Bench,
  * tests, user code) runs with identical, scale-aware settings.
  */
object GraftSession {

  /** Apply the engine's standard configs to any builder. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // driver testdata stores TIMESTAMP(NANOS); Spark has no ns type —
    // read as epoch-nano LONG and normalize in QueryDef.events.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Scan-parallelism floor (guide §6): the split planner charges
    // every file `openCostInBytes` (default 4 MB) and never splits
    // below it, so a sub-4 MB file is ONE task no matter how many
    // cores sit idle — and map-heavy legs upstream of the first
    // exchange (tokenize+md5 featurize, media decode, cosine sweeps)
    // serialize on one core. 16 KB hands control to the
    // scale-ADAPTIVE floor max(openCost, totalBytes/minPartitionNum)
    // (minPartitionNum defaults to the session's default parallelism,
    // maxPartitionBytes still caps splits at 128 MB at real scale).
    // At 100 TB the charged open cost is noise; for many-small-file
    // tables a lower cost packs MORE files per split — fewer, larger
    // tasks, the §6 direction. Env-overridable for cluster tuning.
    .config("spark.sql.files.openCostInBytes",
      sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", (16 * 1024).toString))
    .config("spark.sql.parquet.compression.codec", "snappy")
    .config("spark.ui.enabled", "false")

  /** Post-creation setup a Builder cannot express: the engine's
    * optimizer rules (metadata-only COUNT(*)/MIN/MAX over lake
    * relations). Idempotent — safe on a session already enabled.
    */
  def enable(s: SparkSession): SparkSession = {
    if (!s.experimental.extraOptimizations
        .contains(graft.plans.MetadataOnlyAggregate))
      s.experimental.extraOptimizations ++=
        Seq(graft.plans.MetadataOnlyAggregate)
    s
  }

  /** Local session sized from env (SPARK_GRAFT_CPUS, default all cores). */
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val s = enable(configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate())
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

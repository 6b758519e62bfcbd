package graft.pipeline

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.lake.{LakeTable, LakeWriter}

/** Port of `includes/utilities.py` — the simulated Kafka feed
  * (SURVEY §2 S8): a landing lake table is drained in deterministic
  * hourly micro-batches; each batch is written as one JSON-lines
  * `.txt` file into the raw path and the consumed rows are
  * MERGE-deleted from the landing table (the "offset commit",
  * util:45-75).
  */
final class Ingest(landingPath: String, rawPath: String) {

  /** util:27-42 — seed the landing table from fixture events. CDF is
    * off: the landing table is internal micro-batch state whose change
    * feed nothing consumes, so its per-ingest MERGE-delete should not
    * pay a CDC staging write (Delta's own default for
    * `delta.enableChangeDataFeed` is false for the same reason).
    */
  def prepareActivityData(spark: SparkSession, hours: Int = 48): Unit = {
    LakeWriter.write(
      HealthFixtures.landingEvents(spark, hours),
      landingPath, mode = "overwrite",
      properties = Map(LakeTable.PROP_ENABLE_CDF -> "false"))
  }

  /** util:45-75 — take the next `10 * hours` rows in (month, day, hour)
    * order (O1 top-K), emit one JSON file, MERGE-delete them from
    * landing. `batchTag` replaces the reference's wall-clock filename
    * so runs are deterministic.
    */
  def ingestClassicData(spark: SparkSession, hours: Int = 1,
      batchTag: String = "batch"): Path = {
    val landing = LakeTable.forPath(spark, landingPath)
    val nextBatch = landing.toDF
      .orderBy(col("month"), col("day"), col("hour"), col("device_id"))
      .limit(10 * hours)
      .cache()
    try {
      val stagingDir = Paths.get(rawPath, s".json-$batchTag")
      nextBatch.toJSON.coalesce(1).write.mode("overwrite")
        .text(stagingDir.toString)
      val part = Files.list(stagingDir).iterator()
      var src: Path = null
      while (part.hasNext) {
        val p = part.next()
        if (p.getFileName.toString.startsWith("part-")) src = p
      }
      require(src != null, s"no part file written under $stagingDir")
      val target = Paths.get(rawPath, s"$batchTag.txt")
      Files.createDirectories(target.getParent)
      Files.move(src, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      LakeWriter.deleteRecursively(stagingDir)

      landing.as("ingest")
        .merge(nextBatch.as("next"),
          "ingest.name = next.name AND ingest.time = next.time")
        .whenMatchedDelete()
        .execute()
      target
    } finally { nextBatch.unpersist(); () }
  }
}

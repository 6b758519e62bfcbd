package graft.pipeline

import org.apache.spark.sql.SparkSession
import graft.lake.LakeWriter

/** Port of `04_main.py` — the composed raw→bronze→silver batch run
  * with the quarantine/repair loop (SURVEY §3.1). One call = one
  * micro-batch pass over the medallion tables.
  */
final class Pipeline(
    val rawPath: String,
    val bronzePath: String,
    val silverPath: String,
    val userPath: String,
    val ops: Operations = new Operations()) {

  /** Seed the user dimension (user:88-89, overwrite semantics K2). */
  def writeUserDimension(spark: SparkSession): Unit =
    LakeWriter.write(HealthFixtures.users(spark), userPath,
      mode = "overwrite")

  /** etl/04:11-47 — one full batch: ingest raw → bronze append →
    * bronze-to-silver with clean/quarantine split → status MERGEs →
    * quarantine repair → final status MERGE.
    */
  def runBatch(spark: SparkSession): Unit = {
    // raw → bronze. Bronze CDF is off: its change feed has no
    // consumer (the silver path reads by status), so the three
    // status MERGEs per batch skip the CDC staging write each —
    // Delta's own enableChangeDataFeed default for the same reason.
    val rawDF = ops.readBatchRaw(spark, rawPath)
    val transformedRaw = ops.transformRaw(rawDF)
    ops.batchWriter(transformedRaw, "p_ingestdate", properties =
      Map(graft.lake.LakeTable.PROP_ENABLE_CDF -> "false"))(bronzePath)

    // bronze → silver
    val bronzeDF = ops.readBatchBronze(spark, bronzePath)
    val transformedBronze = ops.transformBronze(bronzeDF)
    val (clean, quarantine) = ops.generateCleanAndQuarantine(transformedBronze)

    ops.batchWriter(clean, "p_eventdate",
      excludeColumns = Seq("value"))(silverPath)
    ops.updateBronzeTableStatus(spark, bronzePath, clean, "loaded")
    ops.updateBronzeTableStatus(spark, bronzePath, quarantine, "quarantined")

    // quarantine repair (etl/03)
    val repaired = ops.repairQuarantinedRecords(spark, bronzePath, userPath)
    ops.batchWriter(repaired, "p_eventdate",
      excludeColumns = Seq("value"))(silverPath)
    ops.updateBronzeTableStatus(spark, bronzePath, repaired, "loaded")
  }
}

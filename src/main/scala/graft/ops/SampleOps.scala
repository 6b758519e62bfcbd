package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * Random sampling (`df.sample`) is useless at corpus scale: it is not
  * reproducible across runs/engines, not consistent across tables (the
  * sampled `documents` rows do not line up with their `embeddings`
  * rows), and not auditable. Everything here samples by a cryptographic
  * hash of a stable key instead, so:
  *
  *  - the same key is always in or out — reruns, other engines (any
  *    md5), and other tables keyed by the same id agree;
  *  - no shuffle for the uniform sample (a codegen'd filter at scan
  *    speed, filter pushed to each partition independently);
  *  - one shuffle on the stratum key for stratified top-N.
  */
object SampleOps {

  /** Hex-prefix hash of the key — the sampling coordinate in [0, 1)
    * as a lexicographic position over 2-hex-digit prefixes.
    */
  private def hashCoord(key: Column): Column =
    substring(md5(key.cast("string")), 1, 2)

  /** Deterministic ~`pct256`/256 uniform sample: keeps rows whose
    * md5(key) first byte is below the threshold. `pct256 = 26` keeps
    * ~10.2% of keys, exactly reproducible anywhere md5 exists.
    */
  def hashSample(df: DataFrame, keyCol: String, pct256: Int): DataFrame = {
    require(pct256 >= 0 && pct256 <= 256, s"pct256 out of range: $pct256")
    if (pct256 == 256) df // keep-everything: "100" would compare as text
    else df.filter(hashCoord(col(keyCol)) < lit(f"$pct256%02x"))
  }

  /** Per-group quota sampling — the "data mixing weights" pass: each
    * group (domain/source/language) gets its own deterministic keep
    * rate out of 256 (e.g. web 10%, books 100%, low-quality crawl 2%).
    * Groups absent from `quotas` are DROPPED — an unlisted domain
    * silently sampled at some default is how unvetted data leaks into
    * a training mix. Zero shuffle: the per-group threshold is a
    * codegen'd CASE over the group column, the keep test the same
    * md5 coordinate as [[hashSample]] — so quota samples of DIFFERENT
    * tables keyed by the same id stay consistent per group.
    */
  def quotaSample(
      df: DataFrame, groupCol: String, keyCol: String,
      quotas: Map[String, Int]): DataFrame = {
    quotas.values.foreach(q =>
      require(q >= 0 && q <= 256, s"quota out of range: $q"))
    val threshold = quotas.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("string")) { case (acc, (g, q)) =>
        when(col(groupCol) === g,
          lit(if (q >= 256) "zz" else f"$q%02x")).otherwise(acc)
      }
    // NULL threshold (unlisted group) fails the comparison -> dropped;
    // "zz" sorts above every hex coordinate -> keep-all
    df.filter(hashCoord(col(keyCol)) < threshold)
  }

  /** Deterministic stratified sample: the `perStratum` rows of each
    * stratum with the smallest md5(key) (ties broken by key). One
    * shuffle on the stratum column; per-group state is the top-N heap
    * Spark keeps for the rank window, so skewed strata don't OOM.
    */
  def stratifiedSample(
      df: DataFrame, stratumCol: String, keyCol: String,
      perStratum: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perStratum)
      .drop("__rn")
  }
}

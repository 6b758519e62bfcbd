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

  /** Token-budget domain mixing (the DoReMi-style resampling pass a
    * pretraining mix needs): given a TARGET share per domain and a
    * total token budget, derive each domain's keep rate
    * `rate_d = min(1, budget * share_d / tokens_d)` from the MEASURED
    * token totals, then select documents deterministically by md5
    * coordinate at 1/65536 grain. Never upsamples (a rate capping at
    * 1 keeps the whole domain — repetition policy is a separate,
    * explicit choice); domains absent from `targetShares` are
    * DROPPED, the [[quotaSample]] rule — an unlisted source silently
    * leaking into a training mix is the failure mode this guards.
    *
    * 100 TB shape: the totals aggregation is one partial-agg shuffle
    * collapsing to O(domains) rows; the rates ride back as a
    * broadcast join; selection is a codegen'd per-row filter at scan
    * speed. Selection is reproducible anywhere md5 exists, and
    * consistent across tables keyed by the same id (the
    * [[hashSample]] coordinate, widened to 4 hex digits so derived
    * rates round at 2^-16, not 2^-8).
    */
  def tokenBudgetMix(
      df: DataFrame, domainCol: String, keyCol: String,
      nTokensCol: String, targetShares: Map[String, Double],
      budgetTokens: Long): DataFrame = {
    require(targetShares.nonEmpty, "targetShares must not be empty")
    targetShares.foreach { case (d, s) =>
      require(s >= 0, s"negative target share for domain $d: $s")
    }
    require(budgetTokens >= 0, s"negative token budget: $budgetTokens")
    val shareExpr = targetShares.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("double")) { case (acc, (d, s)) =>
        when(col(domainCol) === d, lit(s)).otherwise(acc)
      }
    val rates = df.groupBy(col(domainCol))
      .agg(sum(col(nTokensCol)).cast("double").as("__dom_tokens"))
      // the null guard matters: least() SKIPS nulls, so without it an
      // unlisted domain's null share would yield least(1.0, null) = 1.0
      // — the whole domain silently kept, the exact leak this op exists
      // to prevent
      .withColumn("__rate",
        when(shareExpr.isNotNull,
          least(lit(1.0),
            (lit(budgetTokens.toDouble) * shareExpr) / col("__dom_tokens"))))
      .filter(col("__rate").isNotNull) // unlisted domain -> dropped
      .select(col(domainCol), col("__rate"))
    // 4-hex-digit coordinate vs floor(rate * 65536); rate >= 1 keeps
    // all ('zzzz' sorts above every hex coordinate)
    val threshold = when(col("__rate") >= 1.0, lit("zzzz"))
      .otherwise(format_string("%04x",
        floor(col("__rate") * lit(65536.0)).cast("int")))
    df.join(broadcast(rates), domainCol)
      .filter(substring(md5(col(keyCol).cast("string")), 1, 4) < threshold)
      .drop("__rate")
  }

  /** Deterministic global shuffle for training export: every row gets
    * a (shard, pos) coordinate — shard = md5-derived hash of the id
    * mod `nShards`, pos = the 0-based rank of the id's md5 coordinate
    * within its shard. The "shuffled corpus" is the rows read in
    * (shard, pos) order; training runs need that order REPRODUCIBLE
    * (resume mid-epoch, re-run a job, compare loss curves), and md5
    * keying gives the same permutation from the same ids in any
    * engine, independent of storage or insertion order.
    *
    * 100 TB shape: NO global sort — one hash shuffle co-locates each
    * shard, then each shard ranks its own corpus/nShards rows (the
    * same sharded posture as [[graft.ops.TextOps.packOffsets]]);
    * shards are the training loader's parallel read unit, so nothing
    * ever orders the full corpus through one task. Selecting only
    * (id, shard, pos) keeps payload columns out of the shuffle — the
    * caller joins the coordinates back or writes them alongside.
    */
  def shuffleToShards(
      df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards=$nShards must be >= 1")
    val coord = md5(col(keyCol).cast("string"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__coord"), col(keyCol))
    df.select(col(keyCol),
        coord.as("__coord"),
        (conv(substring(coord, 1, 8), 16, 10).cast("long")
          % nShards).as("shard"))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .drop("__coord")
  }
}

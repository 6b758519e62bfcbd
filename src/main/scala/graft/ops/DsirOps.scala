package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection — importance resampling toward a target
  * corpus via hashed n-gram features (Xie, Santurkar, Ma & Liang,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023). The question every pre-training mix has to answer —
  * "which of these 10 billion raw documents look like the data we
  * actually want?" — reduced to a bag-of-hashed-ngrams likelihood
  * ratio: score each raw document by Σ_features ln(p̂_target(b) /
  * p̂_raw(b)) over its hashed unigram+bigram buckets, then sample
  * documents with probability ∝ exp(weight) via deterministic
  * Gumbel-top-k.
  *
  * Shape for 100 TB: the two bucket-distribution estimates are
  * partial-agg aggregations collapsing each corpus to `buckets` rows
  * (kilobytes); the per-document scoring pass explodes features
  * map-side, hits the BROADCAST log-ratio table, and re-aggregates on
  * the doc id — so the corpus shuffles exactly once, as compact
  * (id, contribution) scalars, never as text. Selection adds a
  * TakeOrdered top-k. Nothing anywhere is corpus-sized on the driver.
  *
  * Reproducibility: bucketing is the first 8 hex chars of md5
  * (cross-engine: `('0x' || substr(md5(f), 1, 8))::BIGINT % B` in
  * DuckDB is bit-identical), and the Gumbel noise is derived from
  * md5(id) — the whole selection is a pure function of the data, so
  * re-runs (and other engines) reproduce it exactly.
  */
object DsirOps {

  /** Hashed feature bucket: first 8 md5 hex chars as an int, mod B. */
  private def bucketOf(feat: Column, buckets: Int): Column =
    conv(substring(md5(feat), 1, 8), 16, 10).cast("long") % buckets

  /** Deterministic uniform in (0,1) from the row key (same md5
    * coordinate family as [[SampleOps]], widened to 32 bits).
    */
  private def unitCoord(key: Column): Column =
    (conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double") + 0.5) / 4294967296.0

  /** (id, bucket, occurrence count) — the corpus collapsed to its
    * per-doc hashed-feature histogram in ONE pass (explode + one
    * partial-agg shuffle on (id, bucket)). The token array is
    * materialized into a column FIRST: `element_at` on the raw
    * `split(...)` expression re-evaluates the split inside the
    * bigram lambda per element — measured quadratic in doc length
    * (2× wall on the gate corpus) — while an attribute reference is
    * an O(1) array access.
    */
  private def docBuckets(df: DataFrame, textCol: String, idCol: String,
      buckets: Int): DataFrame = {
    val t = col("__t")
    // bigrams as "w1 w2"; guarded — sequence(1, 0) would DESCEND
    val bigrams = when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1), i =>
        concat(element_at(t, i), lit(" "), element_at(t, i + 1))))
      .otherwise(array().cast("array<string>"))
    df.select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
      .select(col(idCol), explode(concat(t, bigrams)).as("__feat"))
      .select(col(idCol), bucketOf(col("__feat"), buckets).as("__b"))
      .groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
  }

  /** Per-document importance log-weights of `raw` toward `target`:
    * Σ over the doc's feature occurrences of
    * ln(p̂_t(b)) − ln(p̂_r(b)), with add-λ smoothing over B buckets
    * (p̂(b) = (c(b) + λ) / (total + λB)). Returns
    * (idCol, n_feats, log_weight) — log_weight rounded to 4 decimals
    * for cross-engine comparison, like [[TextOps.unigramSurprisal]].
    */
  def dsirWeights(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, buckets: Int = 8192,
      smoothing: Double = 1.0,
      scratchDir: Option[String] = None,
      scratchMinDocs: Long = 1000000L): DataFrame =
    dsirWeightsImpl(raw, Left(target), textCol, idCol, buckets,
      smoothing, scratchDir, scratchMinDocs)

  /** [[dsirWeights]] when the target corpus is a PREDICATE-SELECTED
    * SUBSET of `raw` (the dominant production shape: "docs that look
    * like our curated slice", selected by language/source/label).
    * Featurization is a deterministic pure function of the text, so
    * the target histogram equals the raw per-doc histogram restricted
    * to target ids — derived here by a semi-join of the staged raw
    * histogram against the target's id set instead of a second
    * tokenize + md5-bucket pass over the target's text. Weights are
    * bit-identical to `dsirWeights(raw, raw.filter(pred), ...)`
    * (OpsSuite pins this); the saving is one full featurize of the
    * target slice — at 100 TB, reading ids+predicate columns instead
    * of re-reading and re-hashing the target's text.
    */
  def dsirWeightsForSubset(raw: DataFrame, targetPred: Column,
      textCol: String, idCol: String, buckets: Int = 8192,
      smoothing: Double = 1.0,
      scratchDir: Option[String] = None,
      scratchMinDocs: Long = 1000000L): DataFrame =
    dsirWeightsImpl(raw,
      Right(raw.filter(targetPred).select(col(idCol))),
      textCol, idCol, buckets, smoothing, scratchDir, scratchMinDocs)

  private def dsirWeightsImpl(raw: DataFrame,
      target: Either[DataFrame, DataFrame], textCol: String,
      idCol: String, buckets: Int,
      smoothing: Double,
      scratchDir: Option[String],
      scratchMinDocs: Long): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(smoothing > 0, "add-lambda smoothing must be positive")
    // the raw histogram feeds BOTH the distribution estimate and the
    // per-doc scoring join — stage it so the corpus featurize pass
    // runs once, not once per consumer, and RELEASE it before
    // returning (the result below is materialized first). Bounded by
    // docs × min(features-per-doc, B) rows of three longs. Two
    // stagings:
    //  - small corpora: executor-cache persist (MEMORY_AND_DISK,
    //    evictable, recomputes byte-identically);
    //  - at scale (scratchDir set AND >= scratchMinDocs docs): a
    //    scratch LAKE TABLE — write once, read twice, delete after.
    //    A 100 TB corpus's histogram is cluster-cache-sized; spilling
    //    it through the table layer costs one extra write/read of
    //    compact scalars instead of pinning the cache, and the commit
    //    is atomic so a concurrent reader never sees a partial stage.
    // Both paths produce IDENTICAL weights (OpsSuite pins this): the
    // staging only changes WHERE the histogram lives.
    //
    // The threshold probe is one extra corpus count — skipped when
    // scratchMinDocs <= 0 (caller asserting scale explicitly), which
    // is what a 100 TB pipeline should pass rather than paying a scan
    // to learn what it already knows.
    val spillTo = scratchDir.filter(_ =>
      scratchMinDocs <= 0L || raw.count() >= scratchMinDocs)
    val (rawB, release): (DataFrame, () => Unit) = spillTo match {
      case Some(dir) =>
        // unique per-call leaf: two concurrent calls sharing a
        // scratchDir must not overwrite or delete each other's stage
        val path = s"$dir/dsir_raw_hist-${java.util.UUID.randomUUID()}"
        graft.lake.LakeWriter.write(
          docBuckets(raw, textCol, idCol, buckets), path,
          mode = "overwrite", operation = "DSIR SCRATCH")
        (graft.lake.LakeTable.forPath(raw.sparkSession, path).toDF,
          () => graft.lake.LakeWriter.deleteRecursively(
            java.nio.file.Paths.get(path)))
      case None =>
        val c = docBuckets(raw, textCol, idCol, buckets)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (c, () => { c.unpersist(false); () })
    }
    try {
    val rawCnt = rawB.groupBy("__b").agg(sum("__c").as("__cr"))
    val tgtCnt = (target match {
      case Left(t) => docBuckets(t, textCol, idCol, buckets)
      case Right(ids) => rawB.join(ids, Seq(idCol), "left_semi")
    }).groupBy("__b").agg(sum("__c").as("__ct"))
    // totals as a one-row cross join (no driver collect); every bucket
    // a raw doc can hit is present in rawCnt by construction, so the
    // left join only ever smooths the TARGET side
    val totals = rawCnt.agg(sum("__cr").as("__tr"))
      .crossJoin(tgtCnt.agg(sum("__ct").as("__tt")))
    val lam = lit(smoothing)
    val lamB = lit(smoothing * buckets)
    val ratio = rawCnt
      .join(tgtCnt, Seq("__b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("__b"),
        (log((coalesce(col("__ct"), lit(0L)) + lam) /
             (coalesce(col("__tt"), lit(0L)) + lamB)) -
         log((col("__cr") + lam) / (col("__tr") + lamB))).as("__lr"))
    // materialize (and lineage-truncate) the per-doc result — the
    // smallest frame in the pipeline, one row per document — while
    // the histogram is still cached, then release the histogram. The
    // returned frame is therefore already computed; callers ranking
    // or sampling from it repeatedly pay nothing extra.
    rawB
      .join(broadcast(ratio), "__b")
      .groupBy(col(idCol))
      .agg(sum("__c").as("n_feats"),
        round(sum(col("__c") * col("__lr")), 4).as("log_weight"))
      .localCheckpoint(true)
    } finally release()
  }

  /** Importance resampling: k documents drawn without replacement with
    * probability ∝ exp(log_weight / temperature), via Gumbel-top-k
    * (Vieira 2014): key = log_weight/T − ln(−ln(u)), u the md5(id)
    * coordinate — deterministic, so the "random" sample is exactly
    * reproducible anywhere. temperature → 0 approaches hard top-k by
    * weight; 1.0 is the paper's sampling.
    */
  def dsirResample(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, k: Int, buckets: Int = 8192,
      smoothing: Double = 1.0, temperature: Double = 1.0): DataFrame =
    dsirResampleFromWeights(
      dsirWeights(raw, target, textCol, idCol, buckets, smoothing),
      idCol, k, temperature)

  /** The ranking half alone, over precomputed [[dsirWeights]] output —
    * weights are the expensive leg (two corpus featurize passes), so
    * callers drawing several samples (or re-ranking at another
    * temperature) reuse them.
    */
  def dsirResampleFromWeights(weights: DataFrame, idCol: String,
      k: Int, temperature: Double = 1.0): DataFrame = {
    require(k > 0, "k must be positive")
    require(temperature > 0, "temperature must be positive")
    val gumbel = -log(-log(unitCoord(col(idCol))))
    weights
      .withColumn("gumbel_key",
        round(col("log_weight") / temperature + gumbel, 4))
      .orderBy(desc("gumbel_key"), col(idCol))
      .limit(k)
  }
}

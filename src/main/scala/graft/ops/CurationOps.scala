package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The full pre-training corpus-curation pass, composed from the
  * individually-gated operators: language filter → quality filter →
  * exact dedup (keep lowest id) → deterministic hash downsample.
  *
  * 100 TB shape: stages 1–2 are codegen'd narrow maps fused into the
  * scan; stage 3 is the pipeline's ONE shuffle (hash-partition by
  * content fingerprint, rank-pushed-down keep-first); stage 4 is a
  * zero-shuffle filter. One scan, one shuffle, end to end — the whole
  * pass is exactly as expensive as its dedup.
  */
object CurationOps {

  /** @param langs       keep docs whose [[TextOps.langId]] guess is in
    *                    this set
    * @param minQuality  keep docs with [[TextOps.qualityScore]] >= this
    * @param samplePct256 md5-threshold downsample (of 256) on the
    *                    SURVIVING keep-ids; 256 keeps everything
    */
  def curate(
      df: DataFrame, textCol: String, idCol: String, nCharsCol: String,
      langs: Seq[String], minQuality: Double,
      samplePct256: Int = 256): DataFrame = {
    // No evaluation barrier needed: lang_guess is the native
    // codegen'd LangGuess expression (one static call per inlining
    // site), so CollapseProject duplicating it into the dedup window
    // and the final filter costs a few extra string splits — not the
    // 4.4-s re-inlining of five interpreted lambdas that once forced
    // a persist() here (and leaked cache for the session lifetime).
    // The fingerprint is materialized and TEXT IS DROPPED before the
    // dedup window (round 10): with text still in scope, Catalyst's
    // CollapseProject recomputes the scoring expressions after the
    // window, which forces the full document text through the window's
    // exchange — at 100 TB the shuffle would carry the corpus instead
    // of five scalar columns. Projecting first pins each text
    // expression to exactly one map-side evaluation and shrinks the
    // shuffle rows to (id, lang, tokens, quality, fingerprint).
    val scored = TextOps.langId(df, textCol)
      .withColumn("n_tokens", TextOps.tokenCount(col(textCol)))
      .withColumn("quality",
        TextOps.qualityScore(col(textCol), col(nCharsCol)))
      .filter(col("lang_guess").isin(langs: _*) &&
        col("quality") >= minQuality)
      .withColumn("__fp", TextOps.fingerprint(col(textCol)))
      .select(col(idCol), col("lang_guess"), col("n_tokens"),
        col("quality"), col("__fp"))
    val w = Window
      .partitionBy(col("__fp"))
      .orderBy(col(idCol))
    val deduped = scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__fp")
    SampleOps.hashSample(deduped, idCol, samplePct256)
      .select(col(idCol), col("lang_guess"), col("n_tokens"),
        col("quality"))
  }
}

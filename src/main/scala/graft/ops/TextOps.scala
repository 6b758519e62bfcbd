package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language identification and
  * document fingerprinting. All are pure `functions._` compositions —
  * codegen'd, no UDFs, no shuffles beyond what the caller aggregates —
  * so they stream through a 100 TB corpus at scan speed.
  */
object TextOps {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: words plus punctuation marks plus
    * an extra token per 6 characters of long words (approximates how a
    * byte-pair vocabulary fragments rare long words — calibration
    * constant, not a real tokenizer).
    */
  def bpeTokenEstimate(text: Column): Column = {
    val words = tokenCount(text)
    val puncts = size(split(text, "[\\p{Punct}]")) - 1
    val chars = length(text)
    (words + puncts + (chars / lit(24))).cast("long")
  }

  /** Quality score in [0,1]: penalizes very short/very long docs, very
    * short mean word length (gibberish) and high punctuation density.
    * Deterministic, SQL-expressible (oracle-parity friendly).
    */
  def qualityScore(text: Column, nChars: Column): Column = {
    val nTokens = tokenCount(text).cast("double")
    val meanWordLen = (nChars - nTokens + lit(1)) / nTokens
    val lengthScore = least(nTokens / lit(50.0), lit(1.0))
    val wordLenScore =
      when(meanWordLen >= 3.0 && meanWordLen <= 10.0, 1.0).otherwise(0.5)
    val punctRatio = (size(split(text, "[\\p{Punct}]")) - 1).cast("double") /
      greatest(nTokens, lit(1.0))
    val punctScore = when(punctRatio <= 0.3, 1.0).otherwise(0.5)
    round(lengthScore * wordLenScore * punctScore, 4)
  }

  /** Tiny per-language stopword profiles (top function words). Used by
    * [[langIdScores]]; a real deployment would ship larger profiles —
    * the *operator shape* (score = stopword-hit ratio per language,
    * argmax with deterministic tiebreak) is what scales.
    */
  val stopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "es"),
    "de" -> Seq("der", "die", "das", "und", "zu", "in", "ist", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "que", "en", "un", "est"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "不"))

  /** Per-language stopword-hit counts as columns `score_<lang>`. */
  def langIdScores(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    stopwordProfiles.toSeq.sortBy(_._1).foldLeft(df) {
      case (acc, (lang, words)) =>
        acc.withColumn(s"score_$lang",
          size(filter(toks, t => t.isin(words: _*))))
    }
  }

  /** Language guess: argmax stopword-hit count, ties broken by
    * alphabetical language code; "und" (undetermined) when no hits.
    */
  def langId(df: DataFrame, textCol: String, out: String = "lang_guess")
      : DataFrame = {
    val scored = langIdScores(df, textCol)
    val langs = stopwordProfiles.keys.toSeq.sorted
    val best = langs.foldLeft(struct(lit(-1).as("s"), lit("und").as("l"))) {
      case (acc, lang) =>
        when(col(s"score_$lang") > acc.getField("s"),
          struct(col(s"score_$lang").as("s"), lit(lang).as("l")))
          .otherwise(acc)
    }
    scored.withColumn(out,
      when(best.getField("s") <= 0, "und").otherwise(best.getField("l")))
      .drop(langs.map(l => s"score_$l"): _*)
  }

  /** Stable 128-bit content fingerprint (md5 of normalized text) for
    * exact-dup detection; md5 so external engines can reproduce it.
    */
  def fingerprint(text: Column): Column =
    md5(encode(lower(trim(regexp_replace(text, "\\s+", " "))), "UTF-8"))

  /** 64-bit rolling-style fingerprint for sharded dedup at scale
    * (xxhash64 — cheap, codegen'd, well-distributed).
    */
  def fingerprint64(text: Column): Column =
    xxhash64(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** Winnowing (MOSS) fingerprints — see
    * [[graft.functions.WinnowFingerprints]]: any shared token run of
    * length >= n + window - 1 produces an identical fingerprint in
    * both documents.
    */
  def winnowingFingerprints(
      text: Column, n: Int = 3, window: Int = 4): Column =
    graft.functions.WinnowFingerprints(text, n, window)

  /** Passage-overlap pairs: documents sharing >= `minShared` winnowing
    * fingerprints. Detects CONTAMINATION — a copied passage inside an
    * otherwise-different document — which whole-document similarity
    * (Jaccard/MinHash/SimHash) dilutes to invisibility. Inverted-index
    * join on fingerprints: cost Σk² over fingerprint frequencies,
    * never all-pairs; shuffles carry only (fingerprint, id) longs.
    */
  def passageOverlapPairs(
      df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, window: Int = 4, minShared: Int = 2): DataFrame = {
    val docs = df.select(col(idCol).as("__id"),
      winnowingFingerprints(col(textCol), n, window).as("__fp"))
    val e = docs.select(col("__id"), explode(col("__fp")).as("__f"))
    e.as("a").join(e.as("b"),
        col("a.__f") === col("b.__f") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .agg(count(lit(1)).as("shared_fingerprints"))
      .filter(col("shared_fingerprints") >= minShared)
  }
}

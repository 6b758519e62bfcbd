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

  /** Whitespace token count — `size(split(text, "\\s+"))` computed by
    * the [[graft.functions.TextStats]] byte scan (byte-identical, no
    * regex, no fragment array; consumers that also take
    * [[qualityScore]] share the scan via codegen subexpression
    * elimination).
    */
  def tokenCount(text: Column): Column =
    graft.functions.TextStats.tokenCount(text)

  /** BPE-ish subword count estimate: words plus punctuation marks plus
    * an extra token per 6 characters of long words (approximates how a
    * byte-pair vocabulary fragments rare long words — calibration
    * constant, not a real tokenizer).
    */
  def bpeTokenEstimate(text: Column): Column = {
    // both counts from the single-pass byte scan (TextStats) — see
    // qualityScore for the regex-cost rationale
    val stats = graft.functions.TextStats(text)
    val words = shiftright(stats, 32).cast("int")
    val puncts = stats.bitwiseAND(0xffffffffL).cast("int")
    val chars = length(text)
    (words + puncts + (chars / lit(24))).cast("long")
  }

  /** Quality score in [0,1]: penalizes very short/very long docs, very
    * short mean word length (gibberish) and high punctuation density.
    * Deterministic, SQL-expressible (oracle-parity friendly).
    */
  def qualityScore(text: Column, nChars: Column): Column = {
    // ONE byte scan supplies both counts ([[graft.functions.TextStats]]
    // — byte-identical to the size(split(...)) regex formulation this
    // replaces, see its scaladoc). The packed-long stat is referenced
    // several times below; each reference is the same deterministic
    // scalar call, so codegen subexpression elimination collapses them
    // — the five per-row regex passes of the old form were the single
    // hottest expression of the sf0.1 curation pipeline.
    val stats = graft.functions.TextStats(text)
    val nTokens = shiftright(stats, 32).cast("double")
    val meanWordLen = (nChars - nTokens + lit(1)) / nTokens
    val lengthScore = least(nTokens / lit(50.0), lit(1.0))
    val wordLenScore =
      when(meanWordLen >= 3.0 && meanWordLen <= 10.0, 1.0).otherwise(0.5)
    val punctRatio = stats.bitwiseAND(0xffffffffL).cast("double") /
      greatest(nTokens, lit(1.0))
    val punctScore = when(punctRatio <= 0.3, 1.0).otherwise(0.5)
    round(lengthScore * wordLenScore * punctScore, 4)
  }

  /** Gopher quality rules (Rae et al., "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", 2021,
    * §A1.1 — the rule set most open curation pipelines start from):
    * per-document word count bounds, mean word length bounds,
    * symbol-to-word ratio, alphabetic-word fraction, and a
    * stopword-presence check, plus the conjunction `gopher_pass`.
    * Every rule is a codegen'd column expression over ONE whitespace
    * split — no UDFs, no shuffle, SQL-expressible for oracle parity
    * (ratios rounded to 4 decimals).
    */
  def gopherQuality(df: DataFrame, textCol: String, idCol: String)
      : DataFrame = {
    val words = filter(tokens(col(textCol)), w => length(w) > 0)
    val nWords = size(words).cast("double")
    val meanLen = round(aggregate(words, lit(0L),
      (acc, w) => acc + length(w)).cast("double") / nWords, 4)
    // Gopher's symbol set: '#' and ellipsis; occurrences counted via
    // replace-length deltas (identical in any engine)
    val hashes = length(col(textCol)) -
      length(regexp_replace(col(textCol), "#", ""))
    val dots = (length(col(textCol)) -
      length(regexp_replace(col(textCol), "\\.\\.\\.", ""))) / 3
    val symbolRatio = round((hashes + dots).cast("double") / nWords, 4)
    val alphaFrac = round(
      size(filter(words, w => w.rlike("[a-zA-Z]"))).cast("double") /
        nWords, 4)
    val gopherStops = Seq("the", "be", "to", "of", "and",
      "that", "have", "with")
    val stopHits = size(filter(words,
      w => lower(w).isin(gopherStops.map(x => x: Any): _*)))
    df.select(col(idCol),
        size(words).as("n_words"),
        meanLen.as("mean_word_len"),
        symbolRatio.as("symbol_word_ratio"),
        alphaFrac.as("alpha_word_frac"),
        stopHits.as("stopword_hits"))
      .withColumn("gopher_pass",
        col("n_words") >= 50 && col("n_words") <= 100000 &&
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
        col("symbol_word_ratio") <= 0.1 &&
        col("alpha_word_frac") >= 0.8 &&
        col("stopword_hits") >= 2)
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
    *
    * Computed by the native codegen'd [[graft.functions.LangGuess]]
    * expression (one tokenize pass, all profiles at once); the
    * composable [[langIdScores]] fold it replaces carried five
    * interpreted higher-order lambdas that CollapseProject re-inlined
    * into every downstream consumer.
    */
  def langId(df: DataFrame, textCol: String, out: String = "lang_guess")
      : DataFrame =
    df.withColumn(out,
      graft.functions.LangGuess(df.sparkSession, col(textCol)))

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

  /** Email/phone patterns for PII scrubbing. Kept to syntax both Java
    * regex and RE2-family engines agree on (no lookarounds), so the
    * redaction is reproducible outside Spark.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\b[0-9]{3}-[0-9]{4}\\b"

  /** PII scrub: counts and masks email addresses and phone-shaped
    * digit groups. Pure codegen'd regexes — a narrow map over the
    * corpus, no shuffle; at 100 TB this runs at scan speed and is the
    * canonical pre-training hygiene pass.
    */
  def redactPii(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(emailPattern), lit(0))))
      .withColumn("n_phones",
        size(regexp_extract_all(col(textCol), lit(phonePattern), lit(0))))
      .withColumn(textCol,
        regexp_replace(
          regexp_replace(col(textCol), emailPattern, "<EMAIL>"),
          phonePattern, "<PHONE>"))

  /** Repetition / boilerplate stats per document: the fraction of
    * tokens that are repeats of an earlier token (high ⇒ boilerplate,
    * keyword stuffing, generation loops). Narrow map, no shuffle.
    */
  def repetitionStats(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.withColumn("n_tokens", size(toks))
      .withColumn("n_distinct", size(array_distinct(toks)))
      .withColumn("dup_ratio",
        round(lit(1.0) - col("n_distinct") / col("n_tokens"), 4))
  }

  /** The full Gopher repetition battery (Rae et al. 2021 §A1.1):
    * duplicate line/paragraph fractions (count + character forms),
    * top-{2,3,4}-gram character fractions, and duplicate-{5..10}-gram
    * positional-coverage character fractions — the repetition half of
    * the Gopher quality rules, complementing [[gopherQuality]]'s
    * structural half and [[repetitionStats]]'s token-level ratio.
    * One codegen'd single-pass expression per row
    * ([[graft.functions.RepetitionSignals]]), no shuffle; fractions
    * rounded to 4 like every quality column.
    */
  def gopherRepetition(df: DataFrame, textCol: String): DataFrame = {
    val spark = df.sparkSession
    val sig = graft.functions.RepetitionSignals(spark, col(textCol))
    val flat = graft.functions.RepetitionSignals.fieldNames.map(f =>
      round(col("_rs").getField(f), 4).as(f))
    df.withColumn("_rs", sig).select(col("*") +: flat: _*).drop("_rs")
  }

  /** Corpus-level heavy hitters: the `k` most frequent word n-grams
    * with a deterministic tiebreak (ngram ascending). The aggregation
    * is partial (map-side combine) and the top-k is
    * `TakeOrderedAndProject` — per-partition heaps, driver merges k
    * rows — so neither the shuffle nor the driver ever sees the full
    * n-gram vocabulary ranked.
    */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    val toks = tokens(col(textCol))
    df.filter(size(toks) >= n)
      .select(explode(
        graft.functions.StringShingles(col(textCol), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("ngram").asc)
      .limit(k)
  }

  /** Per-document mean unigram surprisal (-ln p(token) averaged over
    * the doc, p from the corpus itself) — the language-model
    * perplexity proxy for statistical quality filtering: gibberish and
    * rare-token spam score HIGH, formulaic boilerplate scores LOW,
    * complementing the heuristic [[qualityScore]].
    *
    * Shape for 100 TB: pass 1 aggregates the unigram table (output is
    * vocab-sized, tiny next to the corpus) and broadcasts it; pass 2
    * explodes tokens, hits the broadcast table, and re-aggregates per
    * doc — so the corpus shuffles ONCE (on the doc id, compact
    * (id, surprisal) pairs), never on tokens.
    */
  def unigramSurprisal(df: DataFrame, textCol: String, idCol: String)
      : DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
    val freq = toks.groupBy("__tok").agg(count(lit(1)).as("__cnt"))
    val total = freq.agg(sum("__cnt").as("__total"))
    toks
      .join(broadcast(freq), "__tok")
      .crossJoin(broadcast(total))
      .withColumn("__s", -log(col("__cnt") * lit(1.0) / col("__total")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("__s")), 4).as("avg_surprisal"))
  }

  /** Interpolated bigram language-model scoring (the CCNet-style
    * perplexity filter one step up from [[unigramSurprisal]]):
    * per-doc average negative log of
    * `λ·p(w₂|w₁) + (1−λ)·p(w₂)` over consecutive token pairs, with
    * both distributions estimated from the corpus itself (p(w₂|w₁) =
    * C(w₁w₂)/C(w₁), MLE with unigram interpolation as the smoothing).
    * Low scores = text the corpus's own statistics predict well;
    * high = improbable token transitions — the gibberish/boilerplate
    * signal LM-perplexity bucketing keys on.
    *
    * Shape for 100 TB: the corpus explodes once to bigram scalars;
    * the BIGRAM count table joins on its own (w₁w₂) key as a plain
    * shuffle join (a web-scale bigram table is NOT broadcastable),
    * while the unigram table — dictionary-sized — broadcasts for both
    * of its lookups, exactly as [[unigramSurprisal]] does; then one
    * groupBy on the doc id. Everything shuffled is compact
    * (token, count) pairs.
    *
    * Returns (idCol, n_bigrams, avg_neg_log) rounded to 4 — the whole
    * estimate is count arithmetic, so a DuckDB oracle replays it.
    */
  def bigramSurprisal(df: DataFrame, textCol: String, idCol: String,
      lambda: Double = 0.75): DataFrame = {
    require(lambda > 0 && lambda < 1, "lambda must be in (0, 1)")
    val t = col("__t")
    val withToks = df.select(col(idCol), tokens(col(textCol)).as("__t"))
    val bigrams = withToks
      .filter(size(t) >= 2)
      .select(col(idCol), explode(transform(sequence(lit(1), size(t) - 1),
        i => struct(element_at(t, i).as("w1"),
          element_at(t, i + 1).as("w2")))).as("__b"))
      .select(col(idCol), col("__b.w1").as("__w1"), col("__b.w2").as("__w2"))
    val uni = withToks.select(explode(t).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__cu"))
    val total = uni.agg(sum("__cu").as("__total"))
    val bi = bigrams.groupBy("__w1", "__w2").agg(count(lit(1)).as("__cb"))
    val lam = lit(lambda)
    bigrams
      .join(bi, Seq("__w1", "__w2"))
      .join(broadcast(
        uni.select(col("__w").as("__w1"), col("__cu").as("__c1"))),
        Seq("__w1"))
      .join(broadcast(
        uni.select(col("__w").as("__w2"), col("__cu").as("__c2"))),
        Seq("__w2"))
      .crossJoin(broadcast(total))
      .withColumn("__s", -log(
        lam * (col("__cb") * lit(1.0) / col("__c1")) +
          (lit(1.0) - lam) * (col("__c2") * lit(1.0) / col("__total"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("__s")), 4).as("avg_neg_log"))
  }

  /** Okapi BM25 scores for a bag-of-terms query against every document
    * (k1 = 1.2, b = 0.75, idf = ln(1 + (N-df+0.5)/(df+0.5))).
    *
    * Shape for 100 TB: one narrow pass computes per-doc term
    * frequencies as array lookups (no explode of the corpus); the
    * per-term document frequencies and the average length are a few
    * scalar aggregates broadcast back as a literal-free cross join of
    * ONE row — the corpus is scanned twice, shuffled never.
    */
  def bm25(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = tokens(col(textCol))
    val termsSorted = terms.sorted
    def tf(t: String): Column = size(filter(toks, x => x === lit(t)))
    val tfs = df.select(col(idCol) +: size(toks).as("dl") +:
      termsSorted.map(t => tf(t).as(s"tf_$t")): _*)
    val aggs = tfs.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl") +: termsSorted.map(t =>
        sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t")): _*)
    val scored = tfs.crossJoin(broadcast(aggs))
    val score = termsSorted.map { t =>
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df_$t") + 0.5) / (col(s"df_$t") + 0.5))
      val tfc = col(s"tf_$t").cast("double")
      idf * tfc * (k1 + 1.0) /
        (tfc + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    scored.select(col(idCol), round(score, 4).as("bm25"))
  }

  /** Token-window chunking: windows of `size` tokens every `stride`
    * tokens, the canonical context-length split for training. The last
    * window is the shortest suffix still starting inside the doc; every
    * token lands in at least one chunk. Narrow flatMap — rows explode
    * ~size/stride ×, but nothing shuffles; at 100 TB this is the
    * map-side of whatever writer follows it.
    */
  def chunkTokens(df: DataFrame, textCol: String, idCol: String,
      size_ : Int, stride: Int): DataFrame = {
    // stride > size_ would leave tokens between windows uncovered (and
    // drive chunk_len non-positive), violating the every-token
    // guarantee above — reject the configuration at call time.
    require(size_ > 0 && stride > 0 && stride <= size_,
      s"chunkTokens requires 0 < stride <= size (got size=${size_}, " +
        s"stride=$stride)")
    val toks = tokens(col(textCol))
    val n = size(toks)
    val kMax = floor((greatest(n - size_, lit(0)) + (stride - 1))
      / lit(stride)).cast("int")
    df.select(col(idCol), toks.as("__toks"), n.as("__n"),
        explode(sequence(lit(0), kMax)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * stride + 1).as("chunk_start"),
        least(lit(size_), col("__n") - col("chunk_idx") * stride)
          .as("chunk_len"),
        md5(encode(concat_ws(" ",
          slice(col("__toks"), col("chunk_idx") * stride + 1, lit(size_))),
          "UTF-8")).as("chunk_md5"))
  }

  /** Global token offsets + context-block spans — the pretraining
    * "concatenate and slice" packing layout: all documents' tokens are
    * laid out contiguously in `idCol` order and cut into fixed
    * `blockTokens` blocks; each doc's offset is the exclusive prefix
    * sum of token counts before it.
    *
    * The prefix sum is computed the way it must be at 100 TB — NOT as
    * one global-order window (a single-partition sort): docs hash into
    * `shards` ranges by id, a window sums WITHIN each shard, and the
    * tiny per-shard totals (one row per shard) come to the driver to
    * form each shard's base offset, broadcast back as a literal map.
    * Two narrow passes + one shard-local window; nothing global ever
    * sorts. Requires ids be range-shardable (monotonic id order =
    * shard order, here id div docsPerShard).
    *
    * Output: id, n_tokens, offset, first_block, last_block.
    */
  def packOffsets(df: DataFrame, textCol: String, idCol: String,
      blockTokens: Int, docsPerShard: Long = 1000000L): DataFrame = {
    val n = size(tokens(col(textCol)))
    // integral `div`, NOT double `/`: ids above 2^53 would round
    // through the double and could land boundary ids in the wrong
    // shard, breaking the monotonic shard-order assumption
    val base = df.select(col(idCol), n.as("n_tokens"),
      expr(s"CAST(`$idCol` AS BIGINT) div ${docsPerShard}L").as("__shard"))
    val spark = df.sparkSession
    import spark.implicits._
    val shardTotals = base.groupBy("__shard")
      .agg(sum("n_tokens").as("__t"))
      .orderBy("__shard")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // exclusive prefix over the (tiny, one-per-shard) totals —
    // broadcast back as a join, never a codegen'd literal chain
    val bases: Seq[(Long, Long)] = {
      var acc = 0L
      shardTotals.toSeq.map { case (s, t) =>
        val b = (s, acc); acc += t; b
      }
    }
    val baseDf = broadcast(bases.toDF("__shard", "__base"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__shard").orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    base.join(baseDf, "__shard")
      .withColumn("offset",
        col("__base") + coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("first_block",
        floor(col("offset") / blockTokens).cast("long"))
      .withColumn("last_block",
        floor((col("offset") + col("n_tokens") - 1) / blockTokens)
          .cast("long"))
      .drop("__shard", "__base")
  }

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
    * join on fingerprints; shuffles carry only (fingerprint, id) longs.
    *
    * Hot-posting guard (round 10, mirroring [[graft.ops.DedupOps]]'
    * `ngramJaccardPairs` hot/cold split): the naive self-join is Σk²
    * over fingerprint frequencies, so ONE boilerplate passage shared
    * by 10⁵ documents makes a single posting list quadratic. Here
    * only COLD fingerprints (posting length <= `hotThreshold`)
    * generate candidate pairs — bounded at `hotThreshold`·postings
    * join rows — while hot fingerprints ride per-document
    * (fingerprint -> occurrences) maps and are counted EXACTLY, via a
    * map intersection, for every pair the cold path surfaced.
    *
    * Semantics: a reported pair's `shared_fingerprints` is the exact
    * full overlap count (occurrence-pair semantics, identical to the
    * unguarded join), but a pair sharing ONLY hot fingerprints is not
    * reported. That is deliberate contamination semantics, not an
    * approximation bound: a fingerprint appearing in more than
    * `hotThreshold` documents is boilerplate (licenses, headers,
    * templates) — sharing nothing but boilerplate is exactly what
    * this detector must NOT flag. On an unskewed corpus the hot
    * relation is empty, the left joins broadcast nothing, and the
    * result is bit-identical to the unguarded join.
    */
  def passageOverlapPairs(
      df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, window: Int = 4, minShared: Int = 2,
      hotThreshold: Int = 4096): DataFrame = {
    val docs = df.select(col(idCol).as("__id"),
      winnowingFingerprints(col(textCol), n, window).as("__fp"))
    val e = docs.select(col("__id"), explode(col("__fp")).as("__f"))
    // The hot SET is derived with a partial aggregation — map-side
    // combine collapses each task's postings to its distinct
    // fingerprints before the shuffle, and the filter leaves only
    // fingerprints in more than `hotThreshold` postings: near-zero
    // rows on any unskewed corpus, metadata-sized even under skew
    // (bounded by total postings / hotThreshold). The round-10 window
    // variant (count over partitionBy(__f)) shuffled AND sorted every
    // exploded posting to learn the same thing, doubling the query in
    // the common case. Everything stays in ONE lazy plan — the hot
    // aggregation, the broadcast splits, and the self-join are
    // independent stage subtrees the scheduler overlaps, which beats
    // an eager collect-then-plan split on wall-clock (measured: the
    // doc scan has few partitions, so sequential passes idle cores).
    val hotFps = e.groupBy(col("__f"))
      .agg(count(lit(1)).as("__k"))
      .filter(col("__k") > hotThreshold)
      .select(col("__f"))
    val cold = e.join(broadcast(hotFps), Seq("__f"), "left_anti")
    val hot = e.join(broadcast(hotFps), Seq("__f"), "left_semi")
    // per-doc multiset of hot fingerprints (fingerprint -> count):
    // empty relation on an unskewed corpus
    val hotMaps = hot.groupBy(col("__id"), col("__f"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("__id"))
      .agg(map_from_entries(collect_list(struct(col("__f"), col("__c"))))
        .as("__hot"))
    cold.as("a").join(cold.as("b"),
        col("a.__f") === col("b.__f") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .agg(count(lit(1)).as("__cold"))
      .join(hotMaps.select(col("__id").as("id_a"), col("__hot").as("__hot_a")),
        Seq("id_a"), "left")
      .join(hotMaps.select(col("__id").as("id_b"), col("__hot").as("__hot_b")),
        Seq("id_b"), "left")
      // exact hot-overlap contribution: Σ over shared hot fingerprints
      // of count_a * count_b — the same occurrence-pair arithmetic the
      // join performs for cold fingerprints
      .withColumn("shared_fingerprints",
        col("__cold") +
          when(col("__hot_a").isNull || col("__hot_b").isNull, lit(0L))
            .otherwise(aggregate(map_entries(col("__hot_a")), lit(0L),
              (acc, kv) => acc + kv.getField("value") *
                coalesce(element_at(col("__hot_b"), kv.getField("key")),
                  lit(0L)))))
      .filter(col("shared_fingerprints") >= minShared)
      .select(col("id_a"), col("id_b"), col("shared_fingerprints"))
  }

  /** Benchmark DECONTAMINATION: drop every corpus document sharing at
    * least `minShared` winnowing fingerprints with the reference set
    * (an eval benchmark, a heldout split) — the training-data hygiene
    * step that keeps test passages out of the training corpus. Same
    * guarantee as [[passageOverlapPairs]]: any copied run of
    * `n + window - 1` tokens produces a shared fingerprint, so a
    * document quoting a benchmark question cannot slip through on
    * whole-document dissimilarity.
    *
    * Scale shape — the asymmetry is the point: the reference is
    * benchmark-sized (MBs) against a corpus of TBs, so its distinct
    * fingerprint set rides a BROADCAST and the corpus pays ONE
    * winnowing scan. Postings that hit the broadcast set (rare by
    * construction) aggregate to per-doc counts — a shuffle of (id,
    * count) longs for candidate docs only — and the final anti-join
    * keys on ids alone, with the contaminated side small enough for
    * AQE to broadcast. Nothing corpus-sized shuffles.
    *
    * Returns the KEPT corpus rows, schema unchanged.
    */
  def decontaminateAgainst(
      corpus: DataFrame, textCol: String, idCol: String,
      reference: DataFrame, refTextCol: String,
      n: Int = 3, window: Int = 4, minShared: Int = 2): DataFrame = {
    val refFps = reference
      .select(explode(
        winnowingFingerprints(col(refTextCol), n, window)).as("__f"))
      .distinct()
    val contaminated = corpus
      .select(col(idCol).as("__did"),
        explode(winnowingFingerprints(col(textCol), n, window)).as("__f"))
      .join(broadcast(refFps), Seq("__f"), "left_semi")
      .groupBy(col("__did"))
      .agg(count(lit(1)).as("__shared"))
      .filter(col("__shared") >= minShared)
    corpus.join(contaminated,
      corpus(idCol) === contaminated("__did"), "left_anti")
  }
}

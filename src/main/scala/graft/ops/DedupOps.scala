package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * around shuffle-on-key partition parallelism so it holds at 100 TB:
  *
  *  - exact: hash-groupBy on a content fingerprint (one shuffle);
  *  - MinHash + LSH: shingle → k minhashes → band buckets → join only
  *    within buckets (candidate generation never goes all-pairs);
  *  - SimHash: 64-bit sign-sum signature, bucket by signature;
  *  - n-gram Jaccard: exact verification of candidate pairs;
  *  - embedding cosine: near-dup by vector similarity (see
  *    [[SimilarityOps]] for the bucketed scale path).
  *
  * Everything is built-in `functions._` (higher-order array functions,
  * hash/xxhash64) — codegen'd, no Python/Scala UDFs in the hot path.
  */
object DedupOps {

  /** Exact dedup: keep the lowest-id row per identical (normalized)
    * text. One hash-partition shuffle on the fingerprint; no sort.
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = TextOps.fingerprint(col(textCol))
    df.withColumn("__fp", fp)
      .groupBy(col("__fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
      .drop("__fp")
  }

  /** Corpus-wide segment-level dedup (CCNet/RefinedWeb-style
    * boilerplate removal, applied to fixed-width word segments rather
    * than newline paragraphs — the corpus here is single-line): each
    * document is cut into consecutive `segWords`-word segments and a
    * segment OCCURRENCE survives iff it is the FIRST occurrence of
    * that segment's text anywhere in the corpus, "first" meaning the
    * lexicographically least (doc_id, seg_idx). Repeated licenses,
    * headers, and navigation chrome collapse to one copy corpus-wide
    * while every document keeps its unique prose.
    *
    * Scale shape: the only shuffle carries (fingerprint, doc_id,
    * seg_idx) scalars — never segment text — and the keep-first winner
    * per fingerprint is a partial-aggregated `min(struct)` (map-side
    * combine collapses each task's duplicates before the exchange; the
    * struct buffer makes the aggregate sort-based, so the sorts are
    * agg-internal over the compact keys — never a global sort). No
    * window, no join-back: the aggregated row already IS the output
    * row. At 100 TB this is one hash-partitioned exchange of ~16-byte
    * keys, the same shape as [[exactDedup]].
    *
    * Returns (doc_id, seg_idx, seg_md5) — the surviving occurrences.
    */
  def segmentDedup(df: DataFrame, textCol: String, idCol: String,
      segWords: Int = 16): DataFrame = {
    require(segWords > 0, s"segWords must be positive (got $segWords)")
    val toks = TextOps.tokens(col(textCol))
    // ceil(len / segWords) segments; split() never yields an empty
    // array (empty text -> [""]), so every doc has >= 1 segment —
    // matching DuckDB's string_split/range arithmetic in the oracle.
    val nSeg = floor((size(toks) + (segWords - 1)) / lit(segWords))
      .cast("int")
    df.select(col(idCol).as("doc_id"), toks.as("__toks"),
        explode(sequence(lit(0), nSeg - 1)).as("seg_idx"))
      .select(col("doc_id"), col("seg_idx"),
        md5(encode(concat_ws(" ",
          slice(col("__toks"), col("seg_idx") * segWords + 1,
            lit(segWords))), "UTF-8")).as("__fp"))
      .groupBy(col("__fp"))
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("__w"))
      .select(col("__w.doc_id").as("doc_id"),
        col("__w.seg_idx").as("seg_idx"), col("__fp").as("seg_md5"))
  }

  /** Exact-substring dedup at ~`minTokens`-token granularity (Lee et
    * al. 2022, "Deduplicating Training Data Makes Language Models
    * Better" — the ExactSubstr posture, windowed formulation): any
    * `minTokens`-token run appearing more than once in the corpus is
    * removed from every occurrence EXCEPT the first (ordered by
    * (id, pos)); overlapping removed windows per doc merge into
    * maximal spans. Returns one row per removed span:
    * (doc_id, span_start, span_end) — token offsets, end exclusive.
    *
    * Distribution shape (the reason this is not a suffix array): one
    * corpus scan emits per-position window fingerprints
    * (md5 of the space-joined window — O(tokens) rows of SCALARS,
    * text itself never shuffles); one fingerprint-partitioned window
    * marks non-first occurrences; one id-partitioned window merges
    * intervals. Same O(corpus) total work as the published suffix
    * automaton, but in three shuffle-on-key stages a 1000-executor
    * cluster runs without any driver-side index.
    */
  def exactSubstringSpans(df: DataFrame, textCol: String, idCol: String,
      minTokens: Int = 50): DataFrame =
    exactSubstringSpansOfTokens(
      df.select(col(idCol).cast("long").as("id"),
        nonEmptyTokens(col(textCol)).as("toks")),
      minTokens)

  /** [[exactSubstringSpans]] over a pre-tokenized (id, toks) frame —
    * the entry point for callers that synthesize or transform token
    * streams before deduplication.
    */
  def exactSubstringSpansOfTokens(t: DataFrame, minTokens: Int)
      : DataFrame = {
    require(minTokens > 0, s"minTokens must be positive (got $minTokens)")
    val k = minTokens
    import org.apache.spark.sql.expressions.Window
    // Fingerprints shuffle as 16-byte BINARY (unhex of the md5 hex),
    // not 32-char hex strings: the fp column is the dominant shuffle
    // payload at corpus scale and never appears in the output, so
    // halving its width is free. md5 (vs xxhash64) is kept so the
    // DuckDB oracle can replay the identical fingerprint stream.
    val wins = t.select(col("id"), col("toks"),
        size(col("toks")).as("n"))
      .where(col("n") >= k)
      .select(col("id"), posexplode(expr(
        s"transform(sequence(0, n - $k), i -> " +
          s"unhex(md5(encode(concat_ws(' ', slice(toks, i + 1, $k)), " +
          "'UTF-8'))))")))
      .toDF("id", "pos", "fp")
    // both analytics share ONE window spec → one shuffle + no sort
    val byFp = Window.partitionBy("fp")
    val removals = wins
      .withColumn("c", count(lit(1)).over(byFp))
      .withColumn("wmin", min(struct(col("id"), col("pos"))).over(byFp))
      .where(col("c") >= 2 &&
        !(col("id") === col("wmin.id") && col("pos") === col("wmin.pos")))
      .select(col("id"), col("pos"))
    // gaps-and-islands interval union per doc: a window is a new
    // island iff it starts past every earlier window's end
    val byDoc = Window.partitionBy("id").orderBy("pos")
    val prevMax = max(col("pos") + k)
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    removals
      .withColumn("ni",
        when(prevMax.isNull || col("pos") > prevMax, 1).otherwise(0))
      .withColumn("island", sum(col("ni"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("id"), col("island"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + k).cast("long").as("span_end"))
      .select(col("id").as("doc_id"), col("span_start"), col("span_end"))
  }

  /** Apply [[exactSubstringSpans]]: splice the removed spans out of
    * each doc's token stream and re-join. Docs without spans pass
    * through verbatim (modulo tokenization). The spans frame is
    * grouped per doc and joined back — span counts are tiny relative
    * to the corpus, so this is a broadcast-ish join plus one
    * higher-order filter per row, no extra shuffle of the text.
    */
  def removeSpans(df: DataFrame, textCol: String, idCol: String,
      spans: DataFrame): DataFrame = {
    val grouped = spans.groupBy(col("doc_id").as("__sid"))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("__spans"))
    df.withColumn("__toks", nonEmptyTokens(col(textCol)))
      .join(grouped, col(idCol).cast("long") === col("__sid"), "left")
      .withColumn(textCol, concat_ws(" ", expr(
        "filter(__toks, (w, i) -> __spans IS NULL OR " +
          "NOT exists(__spans, s -> " +
          "i >= s.span_start AND i < s.span_end))")))
      .drop("__toks", "__spans", "__sid")
  }

  /** Whitespace tokens with empties dropped — span OFFSETS must not
    * shift with leading/trailing whitespace, so the substring-dedup
    * family tokenizes through this (not raw split, whose first
    * element is "" on leading whitespace).
    */
  private[ops] def nonEmptyTokens(text: Column): Column =
    filter(split(text, "\\s+"), w => length(w) > 0)

  /** Word n-gram shingles (space-joined) of `text`. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextOps.tokens(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** MinHash signature over a precomputed shingle-array column: for
    * each of `numHashes` seeded hash functions, the min over the set.
    * Per-row array math — no explode, no shuffle; one array traversal
    * updates all `numHashes` minima ([[graft.functions.MinHashSig]]).
    */
  def minhashSignature(shingleArr: Column, numHashes: Int = 32): Column =
    graft.functions.MinHashSig(shingleArr, numHashes)

  /** MinHash + LSH near-dup candidate pairs verified by true n-gram
    * Jaccard. `bands` × `rowsPerBand` must equal the signature length.
    *
    * Scale shape (what survives 100 TB):
    *  1. shingle each doc ONCE (O(docs), not O(pairs) or O(hashes));
    *  2. band the signature and explode only (id, band, bucket) —
    *     candidate generation shuffles compact keys, never text;
    *  3. dedupe candidate id-pairs, then fetch the two shingle arrays
    *     back by id-join and verify with exact Jaccard.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= minJaccard.
    */
  def minhashLshPairs(
      df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 32, bands: Int = 8,
      shingleN: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // shingles hashed to LONGs once (native single-pass expression):
    // signatures and verification both run on long arrays (cheap
    // hashing/equality; 64-bit collisions are negligible at any
    // realistic corpus size)
    // The shingled frame feeds three consumers (banding, and both
    // sides of the verification join); without a cache each re-runs
    // tokenize+hash over the full corpus. MEMORY_AND_DISK, not
    // MEMORY_ONLY: under memory pressure an evicted MEMORY_ONLY block
    // silently recomputes its whole lineage per consumer (r15 bench
    // showed ~5x run-to-run swings from exactly this), while a
    // spilled block costs one bounded disk read. At real scale a
    // pipeline would stage this frame explicitly, but a cache keeps
    // the operator self-contained (and Spark dedupes the entry by
    // plan identity across repeated calls).
    val docs = df.select(col(idCol).as("__id"),
      graft.functions.HashedShingles(col(textCol), shingleN).as("__sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withSig = docs
      .withColumn("__sig", minhashSignature(col("__sh"), numHashes))
    val banded = withSig.select(col("__id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(concat_ws(",",
            slice(col("__sig"), b * r + lit(1), lit(r))), b).as("bucket"))))
        .as("__b"))
      .select(col("__id"),
        col("__b.band").as("__band"), col("__b.bucket").as("__bucket"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.__band") === col("b.__band") &&
        col("a.__bucket") === col("b.__bucket") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val sa = docs.select(col("__id").as("id_a"), col("__sh").as("sh_a"))
    val sb = docs.select(col("__id").as("id_b"), col("__sh").as("sh_b"))
    cand.join(sa, "id_a").join(sb, "id_b")
      .withColumn("jaccard", jaccardFromShingles(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Build (or rebuild) a persisted MinHash SIGNATURE STORE for
    * incremental near-dup dedup: one lake table of (id, sig) — the
    * 32-long minhash signature per document, nothing else. This is the
    * signatures-only posture near-dup ingest runs at corpus scale
    * (Broder 1997's estimator; the batch operator
    * [[minhashLshPairs]] verifies with exact Jaccard because it holds
    * the shingles anyway — a PERSISTED store must not retain
    * O(corpus text) state, and the signature store is a fixed ~256
    * bytes/doc regardless of document length).
    *
    * One scan of `df` (shingle + sign in a single codegen'd pass),
    * one lake write. Banding is NOT materialized: probes re-derive
    * (band, bucket) from `sig` with a map over the store scan —
    * storing the 8× exploded bucket rows would trade 8× store size
    * for no asymptotic probe win.
    */
  def buildMinhashStore(
      df: DataFrame, textCol: String, idCol: String, storePath: String,
      numHashes: Int = 32, shingleN: Int = 3,
      mode: String = "overwrite"): Unit = {
    val sigs = df.select(col(idCol).cast("long").as("id"),
      minhashSignature(
        graft.functions.HashedShingles(col(textCol), shingleN),
        numHashes).as("sig"))
    graft.lake.LakeWriter.write(sigs, storePath, mode = mode,
      operation = "BUILD MINHASH STORE")
  }

  /** Incremental NEAR-dup dedup of a new batch against a persisted
    * signature store ([[buildMinhashStore]]) — the daily-ingest twin
    * of the exact-fingerprint flow, for duplicates that are not
    * byte-identical (re-crawls, boilerplate variants). Cost is
    * O(batch) text scanned once + joins against O(store) COMPACT
    * signatures; the historical corpus's text is never re-read.
    *
    *  1. sign the batch (one shingle+minhash pass over batch text);
    *  2. band both sides' signatures (store side: a map over the
    *     (id, sig) scan, no text) and join on (band, bucket) —
    *     candidate generation shuffles scalar longs only;
    *  3. verify candidates with the SIGNATURE-ESTIMATED Jaccard
    *     (matching-component fraction — Broder's unbiased estimator;
    *     the store holds no shingles to verify exactly, by design);
    *  4. drop a batch doc if it estimates >= `minJaccard` against any
    *     store doc, or against any LOWER-id batch doc (pessimistic
    *     keep-first: no sequential kept-chain dependency, so the pass
    *     stays one shuffle — same posture as [[segmentDedup]]);
    *  5. append the SURVIVORS' signatures to the store atomically
    *     (`appendKept`), so the next batch deduplicates against
    *     history + this batch.
    *
    * Returns the kept ids (one `id` column). The kept frame is
    * persisted before the append so the store write and the caller's
    * consumption share one computation.
    */
  def incrementalMinhashDedup(
      incoming: DataFrame, textCol: String, idCol: String,
      storePath: String, numHashes: Int = 32, bands: Int = 8,
      shingleN: Int = 3, minJaccard: Double = 0.5,
      appendKept: Boolean = true): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val spark = incoming.sparkSession
    def banded(sigs: DataFrame): DataFrame = sigs.select(col("id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(concat_ws(",",
            slice(col("sig"), b * r + lit(1), lit(r))), b).as("bucket"))))
        .as("__b"))
      .select(col("id"), col("__b.band").as("band"),
        col("__b.bucket").as("bucket"))
    // est-Jaccard of two aligned signatures: matching-minima fraction
    def estJ(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).cast("double") / numHashes
    val newSigs = incoming.select(col(idCol).cast("long").as("id"),
      minhashSignature(
        graft.functions.HashedShingles(col(textCol), shingleN),
        numHashes).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val storeSigs = graft.lake.LakeTable.forPath(spark, storePath).toDF
      .select(col("id"), col("sig"))
    val newBanded = banded(newSigs)
    // vs store: any (band, bucket) collision, then estimate on sigs
    val candStore = newBanded.as("n").join(banded(storeSigs).as("o"),
        col("n.band") === col("o.band") &&
        col("n.bucket") === col("o.bucket"))
      .select(col("n.id").as("nid"), col("o.id").as("oid"))
      .dropDuplicates("nid", "oid")
    val dupVsStore = candStore
      .join(newSigs.select(col("id").as("nid"), col("sig").as("nsig")), "nid")
      .join(storeSigs.select(col("id").as("oid"), col("sig").as("osig")),
        "oid")
      .filter(estJ(col("nsig"), col("osig")) >= minJaccard)
      .select(col("nid").as("id")).distinct()
    // in-batch: lower id wins, unconditionally (pessimistic keep-first)
    val candBatch = newBanded.as("a").join(newBanded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("aid"), col("b.id").as("bid"))
      .dropDuplicates("aid", "bid")
    val dupInBatch = candBatch
      .join(newSigs.select(col("id").as("aid"), col("sig").as("asig")), "aid")
      .join(newSigs.select(col("id").as("bid"), col("sig").as("bsig")), "bid")
      .filter(estJ(col("asig"), col("bsig")) >= minJaccard)
      .select(col("bid").as("id")).distinct()
    val kept = newSigs
      .join(dupVsStore.unionByName(dupInBatch).distinct(), Seq("id"),
        "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Cache lifetime: materialize `kept` (the append, or a count when
    // the caller opted out of it) so `newSigs` can be released HERE —
    // kept's cached blocks no longer depend on it. `kept` itself must
    // outlive the return (the caller consumes the projection below),
    // so it is released on the NEXT call against the same store: in
    // the steady state — a foreachBatch loop calling this per
    // micro-batch — at most one batch's signature blocks stay cached
    // instead of accumulating for the job's lifetime.
    if (appendKept) {
      graft.lake.LakeWriter.write(kept.select(col("id"), col("sig")),
        storePath, mode = "append", operation = "APPEND MINHASH STORE")
    } else {
      kept.count()
    }
    newSigs.unpersist(false)
    Option(lastIncrementalKept.put(storePath, kept))
      .foreach(_.unpersist(false))
    kept.select(col("id"))
  }

  /** Per-store handle to the previous [[incrementalMinhashDedup]]
    * batch's persisted survivor frame, released when the next batch
    * supersedes it (see the cache-lifetime note in the method).
    */
  private val lastIncrementalKept =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** EXACT all-pairs n-gram Jaccard above a threshold, computed
    * sub-quadratically: inverted-index (share-a-shingle) candidate
    * generation + per-pair intersection counting.
    *
    * Identical result to a naive all-pairs join for any
    * `minJaccard > 0` — a pair with J > 0 shares at least one shingle,
    * so candidate generation is lossless — but the cost is
    * Σ_shingle k² (k = docs containing that shingle) instead of
    * O(docs²).
    *
    * The index is ADAPTIVE, split by posting length at `hotThreshold`:
    *
    *  - COLD shingles (posting length ≤ `hotThreshold`): the direct
    *    path — explode to (shingle, id), self-join per shingle bucket,
    *    then ONE groupBy counts each pair's shared-cold-shingle count
    *    (no per-pair array work). The pair's full intersection is that
    *    count plus an `array_intersect` of the two docs' (usually
    *    empty) hot-shingle arrays.
    *  - HOT shingles (stop-phrase skew, huge k): EXACT prefix
    *    filtering (Bayardo et al., "Scaling Up All Pairs", WWW'07) —
    *    order each doc's shingles by ascending frequency, index only
    *    the first |A|−⌈t·|A|⌉+1, and of those only the hot ones (a
    *    pair sharing any cold shingle is already covered by the cold
    *    path; a pair sharing ONLY hot shingles must, by the prefix
    *    theorem, share a hot shingle inside both prefixes). Candidates
    *    are verified with an exact set intersection.
    *
    * Both paths are exact, so their union (deduplicated) equals the
    * naive all-pairs join for ANY threshold: `hotThreshold =
    * Int.MaxValue` degenerates to the pure direct path,
    * `hotThreshold = 0` to pure prefix filtering.
    *
    * 100 TB shape: shuffles key on shingle hash then (id_a, id_b) —
    * compact longs, never text. The Σk² term is bounded by
    * `hotThreshold`·postings on the cold side, and on the hot side
    * arises only for docs whose frequency-ordered prefix reaches into
    * hot territory — i.e. docs composed almost entirely of
    * stop-phrases, exactly the ones that are near-dups of each other.
    * On an unskewed corpus the hot branch's build sides are empty and
    * AQE eliminates the joins, so the plan collapses to the direct
    * path plus one window count.
    */
  def ngramJaccardPairs(
      df: DataFrame, textCol: String, idCol: String,
      groupCol: String = null, n: Int = 3,
      minJaccard: Double = 0.2,
      hotThreshold: Int = 64): DataFrame = {
    require(minJaccard > 0, "minJaccard must be > 0 for lossless " +
      "share-a-shingle candidate generation")
    val grp = Option(groupCol)
    // Cached (evictable): consumed by the posting explode and both
    // sides of the hot-path verification join — see the minhash cache
    // note above for the lifecycle rationale.
    val docs = df.select(
      (col(idCol).as("__id") +: grp.map(col(_).as("__g")).toSeq) :+
        graft.functions.HashedShingles(col(textCol), n).as("__sh"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exploded = docs.select(
      (Seq(col("__id"), size(col("__sh")).as("__sz")) ++
        grp.map(_ => col("__g")).toSeq) :+ explode(col("__sh")).as("__s"): _*)
    // Posting length per shingle (per group — pairs never cross
    // groups) via ONE shuffle-on-shingle window; the window's sort
    // order doubles as the cold self-join's SMJ order, so the join
    // below adds no exchange and no re-sort.
    val postingKeys = col("__s") +: grp.map(_ => col("__g")).toSeq
    // Cached too: four consumers (both cold self-join sides, the hot
    // filter, the prefix index) read the windowed postings; exchange
    // reuse would dedupe the shuffle but each consumer would still
    // re-run the window count over the full posting list.
    val withF = exploded.withColumn("__f",
      count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(postingKeys: _*)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def pairJoin(index: DataFrame): DataFrame = {
      val joinCond = grp.foldLeft(
        col("a.__s") === col("b.__s") && col("a.__id") < col("b.__id"))(
        (c, _) => c && col("a.__g") === col("b.__g"))
      index.as("a").join(index.as("b"), joinCond)
        .select(col("a.__id").as("id_a"), col("a.__sz").as("sz_a"),
          col("b.__id").as("id_b"), col("b.__sz").as("sz_b"))
    }
    // ---- cold path: direct group-count intersection ----
    val cold = withF.filter(col("__f") <= hotThreshold)
    val hot = withF.filter(col("__f") > hotThreshold)
    // per-doc hot-shingle sets (empty relation on an unskewed corpus)
    val hotArrs = hot.groupBy(col("__id"))
      .agg(collect_list(col("__s")).as("__hot"))
    val coldScored = pairJoin(cold)
      .groupBy(col("id_a"), col("sz_a"), col("id_b"), col("sz_b"))
      .agg(count(lit(1)).as("__c_cold"))
      .join(hotArrs.select(col("__id").as("id_a"), col("__hot").as("__hot_a")),
        Seq("id_a"), "left")
      .join(hotArrs.select(col("__id").as("id_b"), col("__hot").as("__hot_b")),
        Seq("id_b"), "left")
      .withColumn("__c", col("__c_cold") +
        when(col("__hot_a").isNull || col("__hot_b").isNull, lit(0))
          .otherwise(size(array_intersect(col("__hot_a"), col("__hot_b")))))
      .withColumn("jaccard",
        col("__c") / (col("sz_a") + col("sz_b") - col("__c")))
      .select(col("id_a"), col("id_b"), col("jaccard"))
    // ---- hot path: prefix-filtered candidates over hot shingles ----
    // Only docs containing a hot shingle can be in a hot-only pair;
    // on an unskewed corpus this semi-join's build side is empty and
    // AQE eliminates the whole branch. (The ids come from hotArrs —
    // already distinct-by-construction — instead of a fresh
    // hot.distinct(), saving one recompute of the windowed postings.)
    val hotDocIds = hotArrs.select(col("__id"))
    val prefixIdx = withF.join(hotDocIds, Seq("__id"), "left_semi")
      .groupBy(
        (Seq(col("__id"), col("__sz")) ++ grp.map(_ => col("__g"))): _*)
      .agg(sort_array(collect_list(struct(col("__f"), col("__s"))))
        .as("__fs"))
      .withColumn("__plen",
        (col("__sz") - ceil(lit(minJaccard) * col("__sz")) + 1)
          .cast("int"))
      .select(
        (Seq(col("__id"), col("__sz")) ++ grp.map(_ => col("__g"))) :+
          explode(transform(
            filter(slice(col("__fs"), lit(1), col("__plen")),
              fs => fs.getField("__f") > hotThreshold),
            fs => fs.getField("__s"))).as("__s"): _*)
    val cand = pairJoin(prefixIdx).dropDuplicates("id_a", "id_b")
    val sa = docs.select(col("__id").as("id_a"), col("__sh").as("sh_a"))
    val sb = docs.select(col("__id").as("id_b"), col("__sh").as("sh_b"))
    val hotScored = cand.join(sa, "id_a").join(sb, "id_b")
      .withColumn("jaccard", jaccardFromShingles(col("sh_a"), col("sh_b")))
      .select(col("id_a"), col("id_b"), col("jaccard"))
    // Both paths are exact, so overlapping pairs carry identical
    // jaccard values and dropDuplicates is value-safe.
    coldScored.unionByName(hotScored)
      .filter(col("jaccard") >= minJaccard)
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Exact n-gram (shingle-set) Jaccard similarity of two texts.
    * NOTE: computes shingles per evaluation — when scoring many pairs,
    * precompute `array_distinct(shingles(text))` per row once and use
    * [[jaccardFromShingles]] instead (O(docs) shingling, not O(pairs)).
    */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column =
    jaccardFromShingles(
      array_distinct(shingles(a, n)), array_distinct(shingles(b, n)))

  /** Jaccard of two precomputed distinct-shingle arrays. */
  def jaccardFromShingles(sa: Column, sb: Column): Column = {
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = (size(sa) + size(sb)).cast("double") - inter
    when(union === 0, 1.0).otherwise(inter / union)
  }

  /** 64-bit SimHash: sign-sum over token hashes (with multiplicity —
    * frequency-weighted, the classic Charikar form), one bit per
    * position. Near-dups land on equal (or low-Hamming) signatures.
    * Both passes are single-pass native expressions
    * ([[graft.functions.HashedShingles]] n=1 non-distinct feeds
    * [[graft.functions.SimHash64]]); shuffle happens only when the
    * caller groups by signature.
    *
    * Token hash family is FNV-1a 64 (vs the earlier interpreted
    * `transform(tokens, xxhash64)`): byte-replayable in any engine —
    * the correctness driver's DuckDB oracle re-derives signatures
    * bit-for-bit — and codegen'd end-to-end. Consumers rely only on
    * the simhash property, not specific signature values.
    */
  def simhash(text: Column): Column =
    graft.functions.SimHash64(
      graft.functions.HashedShingles(text, 1, distinct = false))

  /** Group docs by identical SimHash → (simhash, doc count, ids). */
  def simhashGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.withColumn("__sh", simhash(col(textCol)))
      .groupBy(col("__sh").as("simhash"))
      .agg(count(lit(1)).as("n_docs"),
        sort_array(collect_list(col(idCol))).as("ids"))

  /** Near-duplicate pairs by SimHash Hamming distance, found WITHOUT
    * all-pairs comparison: band the 64-bit signature into 4 × 16-bit
    * chunks and join on chunk equality. Pigeonhole: two signatures
    * within Hamming distance 3 differ in at most 3 chunks, so they
    * MUST agree on at least one — banding has guaranteed (not
    * probabilistic) recall for `maxHamming <= 3`. Join keys are
    * (band, 16-bit chunk): compact, shuffle-friendly; candidate volume
    * concentrates only where real near-dup mass exists.
    */
  def simhashNearPairs(
      df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame =
    simhashNearPairsFromSigs(
      df.select(col(idCol), simhash(col(textCol)).as("__simhash")),
      "__simhash", idCol, maxHamming)

  /** Same, over a precomputed 64-bit signature column. */
  def simhashNearPairsFromSigs(
      df: DataFrame, sigCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val bands = 4
    require(maxHamming >= 0 && maxHamming < bands,
      s"4x16-bit banding guarantees recall only for maxHamming <= 3, " +
        s"got $maxHamming")
    val sigs = df.select(col(idCol).as("__id"), col(sigCol).as("__sig"))
    val banded = sigs.select(col("__id"), col("__sig"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("__sig"), b * 16)
            .bitwiseAND(lit(0xFFFFL)).as("chunk"))): _*)).as("__b"))
      .select(col("__id"), col("__sig"),
        col("__b.band").as("__band"), col("__b.chunk").as("__chunk"))
    banded.as("a").join(banded.as("b"),
        col("a.__band") === col("b.__band") &&
        col("a.__chunk") === col("b.__chunk") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        bit_count(col("a.__sig").bitwiseXOR(col("b.__sig"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding cosine near-dup pairs above `minCos`, bucketed by a
    * random-hyperplane LSH prefix so the join never goes all-pairs at
    * scale (see [[SimilarityOps.hyperplaneBucket]]).
    */
  def embeddingNearDupPairs(
      df: DataFrame, vecCol: String, idCol: String,
      minCos: Double = 0.95, lshBits: Int = 8): DataFrame = {
    val withBucket = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__bucket",
        SimilarityOps.hyperplaneBucket(col("__v"), lshBits))
    val a = withBucket.as("a")
    val b = withBucket.as("b")
    a.join(b, col("a.__bucket") === col("b.__bucket") &&
        col("a.__id") < col("b.__id"))
      .withColumn("cos",
        SimilarityOps.cosine(col("a.__v"), col("b.__v")))
      .filter(col("cos") >= minCos)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        round(col("cos"), 4).as("cos"))
  }

  /** Semantic dedup (SemDeDup — Abbas et al., "SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication", 2023):
    * k-means clusters the embedding space, and only WITHIN a cluster
    * are pairwise cosines computed; pairs at or above `tau` are
    * semantic duplicates, their connected components collapse to the
    * minimum-id representative, and every other member is reported
    * dropped. Catches paraphrases and re-renderings that share no
    * n-grams — the regime where [[minhashLshPairs]] / [[simhash]] are
    * blind — at the price of an embedding model upstream.
    *
    * Scale shape, and why clustering (not LSH) is the candidate
    * generator here: SemDeDup's insight is that k grows WITH the
    * corpus (k ≈ N / targetClusterSize), so per-cluster pairwise work
    * stays O(N · targetClusterSize) total — linear in N for a fixed
    * cluster-size budget, embarrassingly parallel across clusters.
    * The plan is one broadcast-assign shuffle (centroids are
    * metadata-sized), one self-join co-partitioned on the cluster id
    * (never all-pairs), then [[connectedComponents]]' O(log n) star
    * rounds. Nothing corpus-quadratic exists at any k.
    *
    * Returns (id, rep_id): the DROPPED members only, each with the
    * representative that survives for it. Anti-join the input on `id`
    * to materialize the kept corpus.
    */
  def semanticDedup(
      df: DataFrame, idCol: String, vecCol: String,
      tau: Double = 0.95, nClusters: Int = 16,
      kmeansIters: Int = 2): DataFrame =
    connectedComponents(
      semanticDupPairs(df, idCol, vecCol, tau, nClusters, kmeansIters))
      .filter(col("id") =!= col("cluster"))
      .select(col("id"), col("cluster").as("rep_id"))

  /** The candidate stage of [[semanticDedup]], exposed for inspection:
    * the (a, b) pairs with within-cluster cosine at or above `tau`
    * (a < b). One broadcast of the metadata-sized centroid set, one
    * id-keyed assignment shuffle, one cluster-co-partitioned
    * self-join — nothing corpus-quadratic at any k.
    */
  def semanticDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      tau: Double = 0.95, nClusters: Int = 16,
      kmeansIters: Int = 2): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0, 1] (got $tau)")
    val c = df.select(col(idCol).as("__id"), col(vecCol).as("__cv"))
    val centroids = broadcast(
      SimilarityOps.kmeansCentroids(c, nClusters, kmeansIters))
    // nearest-centroid assignment: broadcast nested-loop against the
    // metadata-sized centroid set, then ONE shuffle keyed on __id
    val assigned = c.crossJoin(centroids)
      .withColumn("__sim", SimilarityOps.cosine(col("__cv"), col("__cent")))
      .groupBy("__id")
      .agg(max_by(col("__cid"), col("__sim")).as("__cid"),
        first(col("__cv")).as("__cv"))
    val a = assigned.as("a")
    val b = assigned.as("b")
    a.join(b, col("a.__cid") === col("b.__cid") &&
        col("a.__id") < col("b.__id"))
      .filter(SimilarityOps.cosine(col("a.__cv"), col("b.__cv")) >= tau)
      .select(col("a.__id").as("a"), col("b.__id").as("b"))
  }

  /** Connected components over a dup-pair edge list — the clustering
    * step every near-dup pipeline needs after candidate pairs: A~B and
    * B~C put A, B, C in ONE cluster even though (A, C) was never
    * emitted as a pair, and the cluster's canonical representative is
    * its minimum id ("keep the lowest id, drop the rest").
    *
    * Algorithm: alternating large-star / small-star edge rewrites
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014) — each round is one groupBy-min plus one join over the
    * CURRENT edge set, and the edge set converges to per-component
    * stars in O(log n) rounds, versus O(diameter) for naive label
    * propagation (a 1M-node chain needs ~20 rounds here, 1M there).
    * Per round everything shuffles on node id; no driver-side graph
    * state, no collect. Each round's result is localCheckpoint'ed to
    * cut the growing lineage; re-running the whole job on block loss
    * is the documented trade (acceptable for a maintenance op).
    *
    * Skew note: the final star concentrates each component's edges on
    * its root's partition — a 10M-doc duplicate cluster makes one
    * heavy key. That is inherent to emitting (root, member) output at
    * all; intermediate rounds keep degrees balanced because
    * large-star splits high-degree nodes' edges across their
    * neighborhoods.
    *
    * Returns (id, cluster): every node that appears in an edge, with
    * its component's minimum id.
    */
  def connectedComponents(
      edges0: DataFrame, aCol: String = "a", bCol: String = "b",
      maxIterations: Int = 30,
      smallGraphEdges: Long = 2_000_000L): DataFrame = {
    import org.apache.spark.sql.functions.{min => fmin}
    // canonical undirected edges (u < v), self-loops dropped
    var edges = edges0.select(
        least(col(aCol), col(bCol)).cast("long").as("u"),
        greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)
    // Adaptive small-graph fast path (same pattern as the ngram
    // hot/cold split): each distributed round costs a fixed several
    // hundred ms of job overhead, so a pair set that fits comfortably
    // on the driver — the common case even for large corpora, since
    // EDGES are near-dup pairs, not documents — is solved with one
    // collect + union-find and one parallelize. The distributed
    // star rounds below are the ≥millions-of-pairs path.
    val edgeCount = edges.count()
    if (edgeCount <= smallGraphEdges) {
      val spark = edges0.sparkSession
      import spark.implicits._
      val local = edges.as[(Long, Long)].collect()
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      local.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      return parent.keys.toSeq.map(k => (k, find(k)))
        .toDF("id", "cluster")
    }
    def symmetric(e: DataFrame): DataFrame =
      e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
    // min(Γ(u) ∪ {u}) per node
    def minsOf(sym: DataFrame): DataFrame =
      sym.groupBy("u").agg(fmin(col("v")).as("__mv"))
        .select(col("u"), least(col("__mv"), col("u")).as("m"))
    // Fixpoint detection by (count, hash-xor) signature: the star
    // rewrites are deterministic and monotone toward the fixpoint, so
    // an unchanged signature means an unchanged edge set (modulo a
    // ~2^-64 hash-collision chance; the alternative exact except()
    // would cost two extra shuffles per round). XOR, not sum: the
    // edges are distinct, xor is order-insensitive, and it cannot
    // overflow under ANSI mode.
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L))).head
      (r.getLong(0), r.getLong(1))
    }
    var sig = signature(edges)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      // large-star: every neighbor LARGER than u links to u's min
      val symL = symmetric(edges)
      val large = symL.join(minsOf(symL), "u")
        .where(col("v") > col("u"))
        .select(col("m").as("u"), col("v"))
        .filter(col("u") =!= col("v")).distinct()
        .localCheckpoint(true)
      // small-star: every neighbor AT MOST u (plus u itself) links to
      // u's min
      val symS = symmetric(large)
      val minsS = minsOf(symS)
      val small = symS.join(minsS, "u")
        .where(col("v") < col("u"))
        .select(col("m").as("u"), col("v"))
        .union(minsS.select(col("m").as("u"), col("u").as("v")))
        .filter(col("u") =!= col("v")).distinct()
        .localCheckpoint(true)
      val newSig = signature(small)
      converged = newSig == sig
      sig = newSig
      edges = small
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIterations rounds " +
        "(large-star/small-star converges in O(log n); this graph " +
        "would need > 2^30 nodes — likely a bug or corrupt edge ids)")
    // fixpoint = per-component stars rooted at the minimum id
    edges.select(col("v").as("id"), col("u").as("cluster"))
      .union(edges.select(col("u").as("id"), col("u").as("cluster")))
      .distinct()
  }
}

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

  /** Word n-gram shingles (space-joined) of `text`. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextOps.tokens(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min over the doc's shingle set. Computed per-row with array
    * functions — no explode, no shuffle.
    */
  def minhashSignature(text: Column, numHashes: Int = 32, shingleN: Int = 3)
      : Column = {
    val sh = shingles(text, shingleN)
    val hashes = (0 until numHashes).map { seed =>
      array_min(transform(sh, s => xxhash64(lit(seed), s)))
    }
    array(hashes: _*)
  }

  /** MinHash + LSH near-dup candidate pairs verified by true n-gram
    * Jaccard. `bands` × `rowsPerBand` must equal the signature length.
    * Scale shape: explode only `bands` rows per doc, shuffle on the
    * band key, self-join inside buckets only.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= minJaccard.
    */
  def minhashLshPairs(
      df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 32, bands: Int = 8,
      shingleN: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val withSig = df.select(col(idCol).as("__id"), col(textCol).as("__text"))
      .withColumn("__sig", minhashSignature(col("__text"), numHashes, shingleN))
    val banded = withSig.select(col("__id"), col("__text"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(concat_ws(",",
            slice(col("__sig"), b * r + lit(1), lit(r))), b).as("bucket"))))
        .as("__b"))
      .select(col("__id"), col("__text"),
        col("__b.band").as("__band"), col("__b.bucket").as("__bucket"))
    val a = banded.as("a")
    val b = banded.as("b")
    val cand = a.join(b,
        col("a.__band") === col("b.__band") &&
        col("a.__bucket") === col("b.__bucket") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.__text").as("text_a"), col("b.__text").as("text_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .withColumn("jaccard", ngramJaccard(
        col("text_a"), col("text_b"), shingleN))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Exact n-gram (shingle-set) Jaccard similarity of two texts. */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column = {
    val sa = array_distinct(shingles(a, n))
    val sb = array_distinct(shingles(b, n))
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = (size(sa) + size(sb)).cast("double") - inter
    when(union === 0, 1.0).otherwise(inter / union)
  }

  /** 64-bit SimHash: sign-sum over token hashes, one bit per position.
    * Near-dups land on equal (or low-Hamming) signatures. Per-row array
    * math only — shuffle happens when the caller groups by signature.
    */
  def simhash(text: Column): Column = {
    val toks = TextOps.tokens(text)
    val hashes = transform(toks, t => xxhash64(t))
    val bits = (0 until 64).map { i =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L)
          .otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Group docs by identical SimHash → (simhash, doc count, ids). */
  def simhashGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.withColumn("__sh", simhash(col(textCol)))
      .groupBy(col("__sh").as("simhash"))
      .agg(count(lit(1)).as("n_docs"),
        sort_array(collect_list(col(idCol))).as("ids"))

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
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding vocabulary training (Sennrich,
  * Haddow & Birch, "Neural Machine Translation of Rare Words with
  * Subword Units", ACL 2016 — the tokenizer-training step of every
  * LLM data pipeline).
  *
  * Why this scales to a 100 TB corpus: the corpus is scanned exactly
  * ONCE, collapsing to the (word → frequency) table — the classic BPE
  * observation that merge statistics depend only on word frequencies,
  * never on word positions. Distinct words grow sublinearly (a web
  * corpus has ~10⁸ distinct words at any size), so every subsequent
  * iteration is an aggregation over a table orders of magnitude
  * smaller than the input, hash-partitioned by word across the
  * cluster. Each round is: adjacent-pair weighted count (partial agg,
  * one small shuffle) → top-1 to the driver (a single row — the only
  * thing that ever leaves the cluster) → broadcast-free re-map of the
  * symbol arrays. Lineage is cut with a local checkpoint every few
  * rounds so round N's plan does not replay rounds 1..N-1.
  *
  * Determinism: ties on pair frequency break lexicographically on
  * (left, right), so the learned merge sequence is a pure function of
  * the corpus — the gate exploits this by replaying a sequential
  * reference implementation over the same word frequencies and
  * requiring exact equality.
  */
object BpeOps {

  /** End-of-word marker symbol (Sennrich's `</w>`): lets the learned
    * units distinguish word-final from word-internal contexts.
    */
  val EOW = "</w>"

  /** (word → frequency) over whitespace tokens — the one corpus-sized
    * pass; everything after operates on this table.
    */
  def wordFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Learn up to `numMerges` BPE merges. Returns (rank, left, right,
    * freq): at step `rank` the adjacent symbol pair (left, right) was
    * the most frequent (weighted by word frequency) and was fused
    * into the symbol `left + right`. Stops early when the best pair's
    * frequency falls below `minFreq`.
    */
  def trainBpeMerges(df: DataFrame, textCol: String,
      numMerges: Int, minFreq: Long = 2L,
      vocabPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(numMerges >= 0, "numMerges must be >= 0")
    // vocabPartitions: the word table is orders of magnitude smaller
    // than the corpus, and every ROUND pays per-task scheduling
    // overhead — size the table's partitioning to the VOCABULARY
    // (e.g. a few per core), not to the corpus scan that produced it
    val freq0 = wordFrequencies(df, textCol)
    val freq =
      if (vocabPartitions > 0) freq0.repartition(vocabPartitions) else freq0
    var words: Dataset[(Seq[String], Long)] = freq
      .as[(String, Long)]
      .map { case (w, f) => ((w.map(_.toString) :+ EOW): Seq[String], f) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      // weighted adjacent-pair count: partial agg collapses each
      // task's duplicates before the (tiny) shuffle; the driver sees
      // ONE row
      val best = words.flatMap { case (syms, f) =>
        if (syms.length < 2) Iterator.empty
        else syms.iterator.zip(syms.iterator.drop(1))
          .map { case (a, b) => ((a, b), f) }
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((a, b), f) => (a, b, f) }
        .orderBy(desc("_3"), asc("_1"), asc("_2"))
        .limit(1).collect().headOption
      best match {
        case Some((l, r, f)) if f >= minFreq =>
          rank += 1
          merges += ((rank, l, r, f))
          val prev = words
          // localCheckpoint EVERY round, not persist + periodic
          // checkpoint: the eager checkpoint caches the round's
          // result AND truncates the logical plan, so round N's
          // analysis cost stays O(1) instead of O(N) — measured, the
          // growing plan (not the 31-row data) dominated per-round
          // cost from ~round 5 at any corpus size
          words = prev.map { case (syms, fr) => (mergePair(syms, l, r), fr) }
            .localCheckpoint(true)
          prev.unpersist(false)
        case _ => done = true
      }
    }
    words.unpersist(false)
    merges.toSeq.toDF("rank", "left", "right", "freq")
  }

  /** Replace every non-overlapping (l, r) adjacency left-to-right with
    * the fused symbol — the classic BPE merge step.
    */
  private[ops] def mergePair(
      syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toSeq
  }

  /** Sequential reference BPE over a collected (word, freq) table —
    * same tie-break, same stop rule. Exists for VERIFICATION: gates
    * and suites run it on the (tiny, by construction) collected
    * frequency table and require the distributed trainer's merge
    * sequence to match exactly.
    */
  private[graft] def referenceMerges(
      wordFreq: Seq[(String, Long)], numMerges: Int,
      minFreq: Long = 2L): Seq[(Int, String, String, Long)] = {
    var words: Seq[(Seq[String], Long)] =
      wordFreq.map { case (w, f) => (w.map(_.toString) :+ EOW, f) }
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), f) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (f < minFreq) done = true
        else {
          rank += 1
          merges += ((rank, l, r, f))
          words = words.map { case (s, fr) => (mergePair(s, l, r), fr) }
        }
      }
    }
    merges.toSeq
  }

  /** Sequential reference of the greedy lowest-rank-first apply —
    * an independent reimplementation (index-scan + in-place splice
    * vs the UDF's candidate-list + [[mergePair]] rebuild) for
    * DIFFERENTIAL verification: gates and suites encode the same
    * texts both ways and require identical token counts.
    */
  private[graft] def referenceTokenCount(text: String,
      mergeList: Seq[(String, String)]): Int = {
    if (text == null) return 0
    val rankOf = mergeList.zipWithIndex.toMap
    text.split("\\s+").iterator.filter(_.nonEmpty).map { w =>
      val syms = scala.collection.mutable.ArrayBuffer[String](
        (w.map(_.toString) :+ EOW): _*)
      var cont = true
      while (cont && syms.length > 1) {
        var bestRank = Int.MaxValue
        var i = 0
        while (i + 1 < syms.length) {
          rankOf.get((syms(i), syms(i + 1))).foreach { r =>
            if (r < bestRank) bestRank = r
          }
          i += 1
        }
        if (bestRank == Int.MaxValue) cont = false
        else {
          // fuse every non-overlapping occurrence left-to-right,
          // the same step semantics as mergePair
          val (l, r) = mergeList(bestRank)
          var j = 0
          while (j + 1 < syms.length) {
            if (syms(j) == l && syms(j + 1) == r) {
              syms(j) = l + r
              syms.remove(j + 1)
            }
            j += 1
          }
        }
      }
      syms.length
    }.sum
  }

  /** Greedy left-to-right BPE segmentation of `text`'s words with a
    * learned merge list — the APPLY side of the trainer, for token
    * counting with the real learned vocabulary instead of the
    * [[TextOps.bpeTokenEstimate]] calibration constant. Merge ranks
    * ride one broadcast; the corpus pays one map-only pass — a UDF,
    * deliberately: the rank-ordered merge loop is genuinely
    * imperative, and there is no shuffle for codegen to fuse across.
    */
  def applyBpe(df: DataFrame, textCol: String,
      mergeList: Seq[(String, String)], out: String = "bpe_tokens")
      : DataFrame = {
    val spark = df.sparkSession
    val rankOf = mergeList.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(rankOf)
    val segment = udf { (text: String) =>
      if (text == null) 0
      else text.split("\\s+").filter(_.nonEmpty).map { w =>
        var syms: Seq[String] = w.map(_.toString) :+ EOW
        var changed = true
        while (changed && syms.length > 1) {
          // lowest-rank applicable merge first (BPE apply order)
          val cand = syms.iterator.zip(syms.iterator.drop(1))
            .flatMap(p => bc.value.get(p).map(r => (r, p))).toSeq
          if (cand.isEmpty) changed = false
          else {
            val (_, (l, r)) = cand.minBy(_._1)
            syms = mergePair(syms, l, r)
          }
        }
        syms.length
      }.sum
    }
    df.withColumn(out, segment(col(textCol)))
  }
}

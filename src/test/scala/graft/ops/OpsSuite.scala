package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Unit-level checks for the extension operators (the gate covers
  * oracle parity; these pin semantics and quantify ANN recall).
  */
class OpsSuite extends SparkSuite {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("ngram jaccard: identical texts 1.0, disjoint 0.0, known overlap") {
    val df = Seq(
      ("a b c d e", "a b c d e"),
      ("a b c d e", "x y z w v"),
      ("a b c d e f", "b c d e f g")
    ).toDF("t1", "t2")
    val got = df.select(
      round(DedupOps.ngramJaccard(col("t1"), col("t2"), 3), 4).as("j"))
      .as[Double].collect()
    assert(got(0) === 1.0)
    assert(got(1) === 0.0)
    // shingles t1: {abc,bcd,cde,def}, t2: {bcd,cde,def,efg}; J = 3/5
    assert(got(2) === 0.6)
  }

  test("BPE trainer: distributed == sequential reference; apply compresses") {
    val corpus = Seq(
      "low low low low low",
      "lower lower newest newest",
      "newest newest newest widest widest"
    ).toDF("text")
    val got = BpeOps.trainBpeMerges(corpus, "text", numMerges = 10)
      .orderBy("rank").collect().toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val wf = BpeOps.wordFrequencies(corpus, "text")
      .as[(String, Long)].collect().toSeq
    val ref = BpeOps.referenceMerges(wf, 10)
    assert(got === ref)
    assert(got.nonEmpty)
    // highest-frequency first: merges are frequency-sorted per step
    assert(got.head._4 >= got.last._4)
    // apply: after training, frequent whole words segment to few units
    val merges = got.map(t => (t._2, t._3))
    val counts = BpeOps.applyBpe(
      Seq("low newest").toDF("text"), "text", merges)
      .select("bpe_tokens").as[Int].collect()
    // 8 chars + 2 EOW = 10 raw symbols; learned merges must compress
    assert(counts(0) < 10)
  }

  test("BPE encode: distributed UDF matches the sequential reference") {
    // adversarial merge interactions: self-pairs (a,a), chains where a
    // later merge consumes an earlier one's output, and overlapping
    // candidates — the shapes where greedy-apply implementations drift
    val merges = Seq(("a", "a"), ("aa", "a"), ("b", "c"), ("a", "bc"),
      ("d", BpeOps.EOW))
    val texts = Seq("aaaa aaa abc aabc", "bcbc abcd", "dddd xd d", "",
      "aaaaaaa")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = BpeOps.applyBpe(df, "text", merges)
      .select("id", "bpe_tokens").as[(Long, Int)].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === BpeOps.referenceTokenCount(t, merges),
        s"diverged on '$t'")
    }
    // a null text encodes to zero tokens on both paths
    assert(BpeOps.referenceTokenCount(null, merges) === 0)
  }

  test("Gopher rules: each gate trips on its own violation") {
    val good = (("the and of that have with " * 12) +
      "sensible words here okay fine").trim // 77 words, all alpha
    val docs = Seq(
      (1L, good),                                    // passes all
      (2L, "too short but the and"),                 // word count < 50
      (3L, ("### " * 60 + "the and").trim),          // symbol ratio
      (4L, ("123 456 " * 30 + "the and").trim),      // alpha frac
      (5L, ("zz yy xx ww vv " * 12).trim)            // no stopwords
    ).toDF("id", "text")
    val got = graft.ops.TextOps.gopherQuality(docs, "text", "id")
      .select("id", "gopher_pass").as[(Long, Boolean)].collect().toMap
    assert(got(1L) === true)
    assert(got(2L) === false)
    assert(got(3L) === false)
    assert(got(4L) === false)
    assert(got(5L) === false)
  }

  test("Gopher repetition signals: closed-form fixtures per signal") {
    val docs = Seq(
      // 3 lines (one duplicated pair), one paragraph; "a b" and "x y"
      // tie at count 2 for top-2 — lexicographic tiebreak picks "a b"
      (1L, "a b a b c\nx y\nx y"),
      // a verbatim 6-word repeat: every word covered at n=5 and n=6,
      // nothing duplicated at n=7
      (2L, "p q r s t u p q r s t u"),
      // paragraphs: 3 paras, 2 identical; inner lines all distinct
      (3L, "aa bb\ncc\n\ndd ee\n\ndd ee")
    ).toDF("doc_id", "text")
    val got = TextOps.gopherRepetition(docs, "text")
      .collect().map(r => r.getLong(0) -> r).toMap

    def f(id: Long, colName: String): Double =
      got(id).getDouble(got(id).fieldIndex(colName))

    assert(f(1L, "dup_line_frac") === round4(1.0 / 3))
    assert(f(1L, "dup_line_char_frac") === round4(3.0 / 15))
    assert(f(1L, "dup_para_frac") === 0.0)
    // 9 words, 9 chars; "a b" occurs twice: 2*2/9
    assert(f(1L, "top2gram_char_frac") === round4(4.0 / 9))
    assert(f(1L, "top3gram_char_frac") === 0.0)
    assert(f(1L, "dup5gram_char_frac") === 0.0)

    assert(f(2L, "dup5gram_char_frac") === 1.0)
    assert(f(2L, "dup6gram_char_frac") === 1.0)
    assert(f(2L, "dup7gram_char_frac") === 0.0)
    // "p q r s t u" repeats: 2 occurrences x 6 chars over 12
    assert(f(2L, "top2gram_char_frac") === round4(4.0 / 12))

    assert(f(3L, "dup_para_frac") === round4(1.0 / 3))
    // para contents: "aa bb\ncc" (8), "dd ee" (5), "dd ee" (5)
    assert(f(3L, "dup_para_char_frac") === round4(5.0 / 18))
    // lines: ["aa bb","cc","dd ee","dd ee"] — one duplicate of four
    assert(f(3L, "dup_line_frac") === round4(1.0 / 4))
  }

  private def round4(d: Double): Double =
    BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("DSIR: weights separate target-like docs; resample selects them") {
    // two disjoint vocabularies: docs 0-9 speak "alpha", 10-19 "beta";
    // the target is the alpha slice, so alpha docs must score strictly
    // above every beta doc, and a k=8 resample must pick only alphas
    val docs = ((0L until 10L).map(i => (i, s"alpha$i common alpha ax${i % 3} alpha")) ++
      (10L until 20L).map(i => (i, s"beta$i common beta bx${i % 3} beta")))
      .toDF("id", "text")
    val target = docs.filter($"id" < 10)
    val w = graft.ops.DsirOps.dsirWeights(docs, target, "text", "id",
      buckets = 512)
      .select("id", "log_weight").as[(Long, Double)].collect().toMap
    val alphaMin = (0L until 10L).map(w).min
    val betaMax = (10L until 20L).map(w).max
    assert(alphaMin > betaMax,
      s"alpha docs must outscore beta docs: $alphaMin <= $betaMax")
    val sel = graft.ops.DsirOps.dsirResample(docs, target, "text", "id",
      k = 8, buckets = 512, temperature = 0.25)
      .select("id").as[Long].collect().toSet
    assert(sel.size === 8)
    assert(sel.forall(_ < 10L), s"resample leaked beta docs: $sel")
  }

  test("quality classifier separates prose from noise on held-out docs") {
    val real = (0L until 40L).map(i =>
      (i, s"the quick brown fox $i jumps over the lazy dog and runs home", 1.0))
    val junk = (100L until 140L).map(i =>
      (i, Seq.fill(12)(s"zz${i % 3}").mkString(" "), 0.0))
    val all = (real ++ junk).toDF("id", "text", "label")
    val train = all.filter($"id" % 2 === 0)
    val eval = all.filter($"id" % 2 === 1)
    val model = graft.ops.QualityModelOps.trainQualityModel(
      train, "text", "label", numFeatures = 1 << 12, maxIter = 20)
    val scored = graft.ops.QualityModelOps.scoreQuality(eval, model)
      .select("id", "label", "quality_score")
      .as[(Long, Double, Double)].collect()
    assert(scored.nonEmpty)
    assert(scored.forall { case (_, _, s) => s >= 0.0 && s <= 1.0 })
    // every held-out real doc outscores every held-out junk doc
    val realMin = scored.filter(_._2 == 1.0).map(_._3).min
    val junkMax = scored.filter(_._2 == 0.0).map(_._3).max
    assert(realMin > junkMax,
      s"no separation: real min $realMin <= junk max $junkMax")
    // filterByQuality keeps exactly the above-threshold rows
    val kept = graft.ops.QualityModelOps.filterByQuality(
      eval, train, "text", "label", threshold = 0.5)
      .select("id").as[Long].collect().toSet
    assert(kept.forall(_ < 100L), s"junk leaked through the filter: $kept")
  }

  test("DSIR subset path matches the general path bit for bit") {
    // dsirWeightsForSubset derives the target histogram from the one
    // staged raw featurize (semi-join on target ids) instead of a
    // second tokenize+md5 pass; the weights must be IDENTICAL to
    // dsirWeights(raw, raw.filter(pred), ...) — including n_feats and
    // 4-decimal log_weight — on every doc
    val docs = ((0L until 10L).map(i => (i, s"alpha$i common alpha a${i % 3}")) ++
      (10L until 20L).map(i => (i, s"beta$i common beta b${i % 3}")))
      .toDF("id", "text")
    val general = graft.ops.DsirOps.dsirWeights(
      docs, docs.filter($"id" < 10), "text", "id", buckets = 512)
      .select("id", "n_feats", "log_weight")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val subset = graft.ops.DsirOps.dsirWeightsForSubset(
      docs, $"id" < 10, "text", "id", buckets = 512)
      .select("id", "n_feats", "log_weight")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(subset === general)
  }

  test("DSIR scratch-table spill path produces identical weights") {
    // the scale path stages the corpus histogram through a scratch
    // lake table instead of the executor cache; weights must be
    // IDENTICAL either way, and the scratch table must be gone after
    val docs = ((0L until 10L).map(i => (i, s"alpha$i common alpha a${i % 3}")) ++
      (10L until 20L).map(i => (i, s"beta$i common beta b${i % 3}")))
      .toDF("id", "text")
    val target = docs.filter($"id" < 10)
    val cached = graft.ops.DsirOps.dsirWeights(docs, target, "text", "id",
      buckets = 512)
      .select("id", "n_feats", "log_weight")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val dir = tmpDir("dsir-scratch")
    val spilled = graft.ops.DsirOps.dsirWeights(docs, target, "text", "id",
      buckets = 512, scratchDir = Some(dir), scratchMinDocs = 1L)
      .select("id", "n_feats", "log_weight")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(spilled === cached)
    val leftovers = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.startsWith("dsir_raw_hist"))
    assert(leftovers.isEmpty,
      s"scratch histogram table must be deleted after the weights " +
        s"materialize: ${leftovers.mkString(", ")}")
    // below the threshold the scratch dir is ignored (persist path)
    val under = graft.ops.DsirOps.dsirWeights(docs, target, "text", "id",
      buckets = 512, scratchDir = Some(dir),
      scratchMinDocs = 1000000L)
      .select("id", "n_feats", "log_weight")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(under === cached)
  }

  test("segment dedup: keep-first across docs, intra-doc repeats collapse") {
    // segWords=2 → doc 10 segments: [a b][c d][a b]; doc 11: [a b][x y];
    // doc 12: [c d]. Corpus-wide keep-first by (doc_id, seg_idx):
    // "a b" survives only at (10,0); "c d" only at (10,1); "x y" at (11,1).
    val df = Seq(
      (10L, "a b c d a b"),
      (11L, "a b x y"),
      (12L, "c d")
    ).toDF("doc_id", "text")
    val got = DedupOps.segmentDedup(df, "text", "doc_id", segWords = 2)
      .select("doc_id", "seg_idx").as[(Long, Int)].collect().toSet
    assert(got === Set((10L, 0), (10L, 1), (11L, 1)))
    // tail segment shorter than segWords is its own unit: "e" here
    // does not collide with the full "e f" segment elsewhere
    val tails = Seq((1L, "e f"), (2L, "e")).toDF("doc_id", "text")
    val keptTails = DedupOps.segmentDedup(tails, "text", "doc_id", 2)
      .select("doc_id").as[Long].collect().toSet
    assert(keptTails === Set(1L, 2L))
  }

  test("shuffle-to-shards: dense per-shard positions, reproducible") {
    val df = (1L to 200L).toDF("id")
    val got = SampleOps.shuffleToShards(df, "id", 8)
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._1).toSet === (1L to 200L).toSet) // a permutation
    assert(got.forall(r => r._2 >= 0 && r._2 < 8))
    got.groupBy(_._2).foreach { case (shard, rows) =>
      val ps = rows.map(_._3).sorted
      assert(ps.sameElements(0L until rows.length),
        s"shard $shard positions not dense: ${ps.take(5).mkString(",")}")
    }
    val again = SampleOps.shuffleToShards(df, "id", 8)
      .as[(Long, Long, Long)].collect()
    assert(got.toSet === again.toSet, "shuffle order not reproducible")
    // order is a function of the ID, not of input row order
    val reversed = SampleOps.shuffleToShards(
      df.orderBy(col("id").desc), "id", 8)
      .as[(Long, Long, Long)].collect()
    assert(got.toSet === reversed.toSet)
  }

  test("incremental minhash store: store hits drop, batch keep-first, append") {
    val storePath = tmpDir("mh-store")
    // store: one real doc (40 distinct tokens so 3-gram shingles are rich)
    val histText = (1 to 40).map(i => s"hist$i").mkString(" ")
    val freshText = (1 to 40).map(i => s"new$i").mkString(" ")
    val otherText = (1 to 40).map(i => s"other$i").mkString(" ")
    DedupOps.buildMinhashStore(
      Seq((1L, histText)).toDF("doc_id", "text"), "text", "doc_id",
      storePath)
    // batch 1: an exact copy of the store doc (id 10), a fresh doc
    // (id 11), and an in-batch twin of the fresh doc (id 12 > 11)
    val batch1 = Seq(
      (10L, histText), (11L, freshText), (12L, freshText)
    ).toDF("doc_id", "text")
    val kept1 = DedupOps.incrementalMinhashDedup(
      batch1, "text", "doc_id", storePath, minJaccard = 0.5)
      .as[Long].collect().toSet
    assert(kept1 === Set(11L), s"batch 1 kept $kept1")
    // appendKept grew the store: batch 2's copy of the batch-1
    // SURVIVOR must now drop against history, a new doc survives
    val batch2 = Seq(
      (20L, freshText), (21L, otherText)
    ).toDF("doc_id", "text")
    val kept2 = DedupOps.incrementalMinhashDedup(
      batch2, "text", "doc_id", storePath, minJaccard = 0.5)
      .as[Long].collect().toSet
    assert(kept2 === Set(21L), s"batch 2 kept $kept2")
    // near-dup, not just exact: one token changed in 40 still
    // estimates well above 0.5 under this (deterministic) hash family
    val perturbed = histText.replace("hist7", "HIST7")
    val kept3 = DedupOps.incrementalMinhashDedup(
      Seq((30L, perturbed)).toDF("doc_id", "text"),
      "text", "doc_id", storePath, minJaccard = 0.5,
      appendKept = false)
      .as[Long].collect().toSet
    assert(kept3.isEmpty, s"perturbed near-dup survived: $kept3")
    // the store holds SIGNATURES only — fixed-width state, never text
    val store = graft.lake.LakeTable.forPath(spark, storePath).toDF
    assert(store.columns.toSet === Set("id", "sig"))
    assert(store.count() === 3L) // hist + one survivor per batch
  }

  test("exact-substring dedup: keep-first spans, overlap merge, splice") {
    // docs of letter-tokens; k = 4. doc 2 repeats doc 1's tokens 2..7
    // (two overlapping duplicated windows -> ONE merged span), doc 3
    // repeats the same run (still removed: doc 1 holds the first
    // occurrence), doc 4 shares nothing.
    def toks(r: Range, tag: String = ""): String =
      r.map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, "a1 " + toks(0 until 8) + " z1"),
      (2L, "b1 b2 " + toks(2 until 8) + " y1"),
      (3L, "c1 " + toks(2 until 8)),
      (4L, "d1 d2 d3 d4 d5 d6 d7 d8")
    ).toDF("doc_id", "text")
    val spans = DedupOps.exactSubstringSpans(df, "text", "doc_id",
      minTokens = 4)
    val got = spans.as[(Long, Long, Long)].collect().toSet
    // doc 2: tokens 2..7 of its stream are w2..w7 (6 tokens, 3
    // duplicated 4-windows at pos 2,3,4 -> merged [2, 8)); doc 3:
    // w2..w7 start at pos 1 -> [1, 7). doc 1 (first occurrence) and
    // doc 4 lose nothing.
    assert(got === Set((2L, 2L, 8L), (3L, 1L, 7L)))
    // splice: removed spans cut the duplicated run, everything else
    // survives verbatim
    val cleaned = DedupOps.removeSpans(df, "text", "doc_id", spans)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(cleaned(2L) === "b1 b2 y1")
    assert(cleaned(3L) === "c1")
    assert(cleaned(1L) === "a1 " + toks(0 until 8) + " z1")
    assert(cleaned(4L) === "d1 d2 d3 d4 d5 d6 d7 d8")
    // sub-k docs and exact-k docs behave: two identical k-token docs
    // -> second loses its whole stream
    val twins = Seq((7L, "p q r s"), (8L, "p q r s"), (9L, "p q r"))
      .toDF("doc_id", "text")
    val ts = DedupOps.exactSubstringSpans(twins, "text", "doc_id", 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(ts === Set((8L, 0L, 4L)))
  }

  test("semantic dedup: near-identical vectors collapse to min id, distinct survive") {
    // two duplicate groups along different axes + one singleton;
    // within-group cosine ~1, cross-group cosine ~0
    def v(xs: Float*): Seq[Float] = xs
    val rows = Seq(
      (1L, v(1f, 0.01f, 0f, 0f)),
      (2L, v(1f, 0f, 0.01f, 0f)),   // dup of 1
      (5L, v(0.99f, 0.02f, 0f, 0f)), // dup of 1
      (3L, v(0f, 0f, 1f, 0.01f)),
      (4L, v(0f, 0.01f, 1f, 0f)),   // dup of 3
      (9L, v(0f, 1f, 0f, 1f))       // singleton (cos ~0.7 to others at best)
    )
    val df = rows.toDF("id", "vec")
    val dropped = DedupOps.semanticDedup(
        df, "id", "vec", tau = 0.95, nClusters = 2, kmeansIters = 3)
      .as[(Long, Long)].collect().toMap
    assert(dropped === Map(2L -> 1L, 5L -> 1L, 4L -> 3L))
  }

  test("simhash: equal texts collide, different texts differ") {
    val df = Seq("the quick brown fox", "the quick brown fox",
      "entirely different words here").toDF("text")
    val hs = df.select(DedupOps.simhash(col("text"))).as[Long].collect()
    assert(hs(0) === hs(1))
    assert(hs(0) !== hs(2))
  }

  test("multimodal decode stub is deterministic and byte-accurate") {
    val media = MultimodalOps.asMediaTable(
      Seq((1L, "hello world")).toDF("id", "t")
        .withColumn("media", encode(col("t"), "UTF-8")),
      "id", "media", "text/plain")
    val f = MultimodalOps.decodeAndFeaturize(media).collect()(0)
    assert(f.byte_len === 11L)
    assert(math.abs(f.mean_byte - "hello world".getBytes.map(_ & 0xff).sum / 11.0) < 1e-9)
    assert(f.feature.sum === 11.0f) // histogram mass = byte count
  }

  test("BMP decode: stride, bottom-up rows, exact channel bytes") {
    // 2x2 canary with KNOWN pixels, built by hand (not via
    // syntheticBmp, so generator and parser can't share a bug):
    // image rows top-down are [(B=1,G=2,R=3),(4,5,6)] / [(7,8,9),
    // (10,11,12)] — stored bottom-up, stride 8 (2 pad bytes, set to
    // 0xEE to prove padding is skipped)
    val w = 2; val h = 2; val stride = 8
    val bmp = new Array[Byte](54 + stride * h)
    bmp(0) = 'B'; bmp(1) = 'M'
    def p32(o: Int, v: Int): Unit = (0 until 4).foreach(i =>
      bmp(o + i) = ((v >> (8 * i)) & 0xff).toByte)
    def p16(o: Int, v: Int): Unit = (0 until 2).foreach(i =>
      bmp(o + i) = ((v >> (8 * i)) & 0xff).toByte)
    p32(2, bmp.length); p32(10, 54); p32(14, 40)
    p32(18, w); p32(22, h); p16(26, 1); p16(28, 24); p32(30, 0)
    // bottom file row = image row 1 (values 7..12)
    val bottom = Array[Byte](7, 8, 9, 10, 11, 12, 0xEE.toByte, 0xEE.toByte)
    val top = Array[Byte](1, 2, 3, 4, 5, 6, 0xEE.toByte, 0xEE.toByte)
    System.arraycopy(bottom, 0, bmp, 54, 8)
    System.arraycopy(top, 0, bmp, 54 + 8, 8)
    val f = MultimodalOps.decodeBmp(9L, bmp, 8)
    assert(f.n_samples === 12L)
    assert(f.value_sum === (1 to 12).sum.toLong) // pad bytes excluded
    assert(f.mean_value === (1 to 12).sum / 12.0)
    // corrupt: truncated pixel array fails loudly
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeBmp(9L, bmp.take(54 + 8), 8)
    }
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeBmp(9L, "JFIFnotabmp".getBytes, 8)
    }
  }

  test("WAV decode: chunk walk, signed PCM16, synthetic round-trip") {
    // hand-built: samples 100, -100, 32767, -32768 → sum = -1
    val n = 4
    val wav = MultimodalOps.syntheticWav(0L, n) // reuse layout, overwrite data
    val dataOff = 48 + 8
    def ps(o: Int, v: Int): Unit = {
      wav(o) = (v & 0xff).toByte; wav(o + 1) = ((v >> 8) & 0xff).toByte
    }
    ps(dataOff, 100); ps(dataOff + 2, -100 & 0xffff)
    ps(dataOff + 4, 32767); ps(dataOff + 6, -32768 & 0xffff)
    val f = MultimodalOps.decodeWav(3L, wav, 8)
    assert(f.n_samples === 4L)
    assert(f.value_sum === -1L)
    // synthetic generator round-trips through the decoder exactly
    val id = 17L; val m = 80
    val g = MultimodalOps.decodeWav(id, MultimodalOps.syntheticWav(id, m), 8)
    val expect = (0 until m).map(i => ((id * 31 + 7L * i) % 2048) - 1024).sum
    assert(g.n_samples === m.toLong && g.value_sum === expect)
    // BMP generator round-trips too (stride path: width 17)
    val b = MultimodalOps.decodeBmp(id, MultimodalOps.syntheticBmp(id, 17, 9), 8)
    val bExpect = (for (y <- 0 until 9; x <- 0 until 17; c <- 0 until 3)
      yield (id * 31 + 7L * x + 13L * y + 5L * c) % 256).sum
    assert(b.n_samples === 17L * 9 * 3 && b.value_sum === bExpect)
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeWav(3L, new Array[Byte](100), 8)
    }
    // malformed fmt chunk shorter than the 16-byte PCM layout must
    // hit the descriptive require, not an ArrayIndexOutOfBounds from
    // reading bits at off+22 past the chunk (ADVICE r12)
    val shortFmt = MultimodalOps.syntheticWav(0L, 4)
    def ps2(o: Int, v: Int): Unit = {
      shortFmt(o) = (v & 0xff).toByte
      shortFmt(o + 1) = ((v >> 8) & 0xff).toByte
    }
    ps2(16, 2); ps2(18, 0) // fmt clen 16 → 2
    val e = intercept[IllegalArgumentException] {
      MultimodalOps.decodeWav(5L, shortFmt, 8)
    }
    assert(e.getMessage.contains("fmt chunk too short"))
  }

  test("ImageIO decode: PNG lossless + flat-field JPEG are closed-form") {
    // PNG: inflate + unfilter must reproduce the generator's pixels
    // bit-exactly (lossless format), arbitrary dims
    for ((id, w, h) <- Seq((4L, 17, 9), (11L, 1, 1), (250L, 33, 5))) {
      val f = MultimodalOps.decodeImage(id,
        MultimodalOps.syntheticPng(id, w, h), 8)
      val expect = (for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        yield (id * 31 + 7L * x + 13L * y + 5L * c) % 256).sum
      assert(f.n_samples === w.toLong * h * 3)
      assert(f.value_sum === expect, s"png ${w}x$h id=$id")
    }
    // JPEG: flat-field at quality 1.0 survives the lossy round trip
    // exactly — a real Huffman+IDCT decode checked by integer equality.
    // ids chosen so (id*31)%256 sweeps low/mid/high sample values.
    for (id <- Seq(0L, 3L, 7L, 33L, 128L, 255L)) {
      val v = (id * 31) % 256
      val f = MultimodalOps.decodeImage(id,
        MultimodalOps.syntheticJpeg(id, 16, 16), 8)
      assert(f.n_samples === 256L, s"jpeg id=$id")
      assert(f.value_sum === 256L * v, s"jpeg id=$id v=$v")
    }
    // GIF: palette-indexed raster must be expanded to RGB before
    // features — a flat <=256-color image is lossless through GIF,
    // so the decoded RGB sum is closed-form (indices would not be)
    for (v <- Seq(0, 77, 255)) {
      val img = new java.awt.image.BufferedImage(10, 6,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 6; x <- 0 until 10)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "gif", bos)
      val f = MultimodalOps.decodeImage(v.toLong, bos.toByteArray, 8)
      assert(f.n_samples === 10L * 6 * 3, s"gif v=$v")
      assert(f.value_sum === 10L * 6 * 3 * v, s"gif v=$v")
    }
    // corrupt: truncated PNG and garbage bytes fail loudly
    val png = MultimodalOps.syntheticPng(9L, 8, 8)
    intercept[Exception] {
      MultimodalOps.decodeImage(9L, png.take(20), 8)
    }
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeImage(9L, "not an image at all".getBytes, 8)
    }
  }

  test("image dHash: cross-format twins collide, bases distinct, noise-robust") {
    // BMP and PNG of the SAME pixels hash identically (both fixture
    // families: the smooth gradient and the block pattern)
    (0 until 8).foreach { i =>
      assert(MultimodalOps.dHash64(i.toLong,
          MultimodalOps.syntheticBmp(i, 32, 24), "image/bmp") ===
        MultimodalOps.dHash64(i.toLong,
          MultimodalOps.syntheticPng(i, 32, 24), "image/png"),
        s"gradient base $i: BMP/PNG dHash differ")
      assert(MultimodalOps.dHash64(i.toLong,
          MultimodalOps.blockBmp(i, 32, 24), "image/bmp") ===
        MultimodalOps.dHash64(i.toLong,
          MultimodalOps.blockPng(i, 32, 24), "image/png"),
        s"block base $i: BMP/PNG dHash differ")
    }
    // the gate's 64 deterministic block bases are pairwise distinct at
    // Hamming 0 — protects its organic-collision-free require
    val hashes = (0 until 64).map(i => MultimodalOps.dHash64(i.toLong,
      MultimodalOps.blockBmp(i, 32, 24), "image/bmp"))
    assert(hashes.distinct.size === 64,
      "gate bases must be pairwise dHash-distinct")
    // small local noise: bump one pixel's channels; pooled averages
    // barely move, so the hash stays within 1 bit
    val noisy = MultimodalOps.blockBmp(5L, 32, 24)
    (0 until 3).foreach { c =>
      val o = 54 + 10 * 96 + 3 * 3 + c // file row 10, x = 3 (stride 96)
      noisy(o) = ((noisy(o) & 0xff) ^ 0x04).toByte
    }
    val h0 = MultimodalOps.dHash64(5L,
      MultimodalOps.blockBmp(5L, 32, 24), "image/bmp")
    val h1 = MultimodalOps.dHash64(5L, noisy, "image/bmp")
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 1,
      s"one-pixel noise moved ${java.lang.Long.bitCount(h0 ^ h1)} bits")
    // distributed pairs: twins at Hamming 0 through the banded join
    val media = Seq(
      (1L, MultimodalOps.blockBmp(1, 32, 24), "image/bmp"),
      (2L, MultimodalOps.blockPng(1, 32, 24), "image/png"),
      (3L, MultimodalOps.blockBmp(9, 32, 24), "image/bmp")
    ).toDF("media_id", "media", "format")
    val got = MultimodalOps.imageNearDupPairs(media, maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)), s"pairs: $got")
  }

  test("audio hash: cross-codec twins collide, bases distinct, mu-law round trip") {
    // mu-law encode/decode round trip stays within one mantissa step
    Seq(-30000, -1333, -133, 0, 7, 133, 1999, 32635).foreach { v =>
      val rt = MultimodalOps.ulawToLinear(MultimodalOps.linearToUlaw(v))
      val step = math.max(8, math.abs(v) / 16 + 1)
      assert(math.abs(rt - v) <= step, s"round trip $v -> $rt")
    }
    // PCM and its companded copy hash identically for EVERY gate base
    val hashes = (0 until 64).map { i =>
      val hp = MultimodalOps.audioHash64(i.toLong,
        MultimodalOps.envelopeWav(i))
      val hu = MultimodalOps.audioHash64(i.toLong,
        MultimodalOps.envelopeWavUlaw(i))
      assert(hp === hu, s"base $i: PCM/mu-law audio hash differ")
      hp
    }
    assert(hashes.distinct.size === 64,
      "gate bases must be pairwise audio-hash-distinct")
    // distributed pairs: the cross-codec twin through the banded join
    val media = Seq(
      (1L, MultimodalOps.envelopeWav(3), "audio/wav"),
      (2L, MultimodalOps.envelopeWavUlaw(3), "audio/wav"),
      (3L, MultimodalOps.envelopeWav(17), "audio/wav")
    ).toDF("media_id", "media", "format")
    val got = MultimodalOps.audioNearDupPairs(media, maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)), s"pairs: $got")
  }

  test("video hash: re-muxed twins collide, bases distinct, junk skipped") {
    // identical frames, byte-different container -> identical hash
    val hashes = (0 until 64).map { i =>
      val h0 = MultimodalOps.videoHash64(i.toLong,
        MultimodalOps.levelsMjpegAvi(i, 16, 16))
      val h1 = MultimodalOps.videoHash64(i.toLong,
        MultimodalOps.remuxedMjpegAvi(i, 16, 16))
      assert(h0 === h1, s"base $i: re-mux changed the video hash")
      h0
    }
    assert(hashes.distinct.size === 64,
      "gate bases must be pairwise video-hash-distinct")
    // the remux really IS byte-different (JUNK chunk present)
    assert(!java.util.Arrays.equals(
      MultimodalOps.levelsMjpegAvi(1, 16, 16),
      MultimodalOps.remuxedMjpegAvi(1, 16, 16)))
    // short clips hash too (empty windows carry the previous level)
    val short = MultimodalOps.videoHash64(7L,
      MultimodalOps.levelsMjpegAvi(7, 16, 16, frames = 5))
    assert(short === MultimodalOps.videoHash64(7L,
      MultimodalOps.remuxedMjpegAvi(7, 16, 16, frames = 5)))
    // distributed pairs through the banded join
    val media = Seq(
      (1L, MultimodalOps.levelsMjpegAvi(2, 16, 16), "video/avi"),
      (2L, MultimodalOps.remuxedMjpegAvi(2, 16, 16), "video/avi"),
      (3L, MultimodalOps.levelsMjpegAvi(40, 16, 16), "video/avi")
    ).toDF("media_id", "media", "format")
    val got = MultimodalOps.videoNearDupPairs(media, maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)), s"pairs: $got")
  }

  test("AVI MJPEG video: RIFF tree walk + real per-frame JPEG decode") {
    val id = 11L
    val avi = MultimodalOps.syntheticMjpegAvi(id, 16, 16, 3)
    val media = MultimodalOps.asMediaTable(
      Seq((id, avi)).toDF("id", "m"), "id", "m", "video/avi")
    // whole-clip features: all frames' decoded samples accumulate
    val feats = MultimodalOps.decodeAndFeaturize(media).collect()(0)
    val expSum =
      (0 until 3).map(fr => 256L * ((id * 31 + 11L * fr) % 256)).sum
    assert(feats.n_samples === 3 * 256L)
    assert(feats.value_sum === expSum)
    // per-frame rows with LIVE maxFrames truncation
    val frames = MultimodalOps.extractFrames(media, maxFrames = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.length === 2)
    frames.foreach { fr =>
      assert(fr.width === 16 && fr.height === 16)
      assert(fr.n_samples === 256L)
      assert(fr.value_sum === 256L * ((id * 31 + 11L * fr.frame_idx) % 256))
    }
    // a non-MJPEG codec is REFUSED loudly (patch the strh fccHandler),
    // never silently stubbed as byte stats
    val h264 = avi.clone()
    val strh = (0 until h264.length - 16).find(o =>
      new String(h264, o, 4, "US-ASCII") == "strh").get
    "H264".getBytes.copyToArray(h264, strh + 12)
    val e = intercept[IllegalArgumentException] {
      MultimodalOps.decodeAviClip(id, h264, 8)
    }
    assert(e.getMessage.contains("H264"))
    // truncated container and garbage fail loudly too
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeAviClip(id, avi.take(64), 8)
    }
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeAviClip(id, "RIFFnotavi".getBytes, 8)
    }
  }

  test("G.711 mu-law / A-law WAV decode expands to 16-bit linear") {
    // ITU-T G.711 fixed points: both zero codes, both extremes
    assert(MultimodalOps.ulawToLinear(0xff) === 0)
    assert(MultimodalOps.ulawToLinear(0x7f) === 0)
    assert(MultimodalOps.ulawToLinear(0x00) === -32124)
    assert(MultimodalOps.ulawToLinear(0x80) === 32124)
    assert(MultimodalOps.alawToLinear(0x55) === -8)
    assert(MultimodalOps.alawToLinear(0xd5) === 8)
    assert(MultimodalOps.alawToLinear(0x2a) === -32256)
    assert(MultimodalOps.alawToLinear(0xaa) === 32256)
    // end-to-end through the RIFF chunk walk (format 7, 8-bit)
    val id = 5L
    val n = 80
    val f = MultimodalOps.decodeWav(id,
      MultimodalOps.syntheticUlawWav(id, n), 8)
    val exp = (0 until n).map(i =>
      MultimodalOps.ulawToLinear(((id * 31 + 7L * i) % 256).toInt).toLong).sum
    assert(f.n_samples === n.toLong)
    assert(f.value_sum === exp)
  }

  test("LSH top-k: multi-probe widens recall; true near-dups always found") {
    // NOTE: sf0.001 embeddings are near-random (top-10 cosine ~0.3), the
    // regime where sign-LSH recall is weakest — neighbors differ in many
    // sign bits. Assert the structural properties, report the recall.
    val queries = emb.filter($"vec_id" < 20)
      .select($"vec_id".as("qid"), $"embedding".as("vec"))
    val corpus = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    val exact = SimilarityOps.bruteForceTopK(queries, corpus, k = 10)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val multi = SimilarityOps.lshTopK(queries, corpus, k = 10, bits = 4)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val single = SimilarityOps.lshTopK(queries, corpus, k = 10, bits = 4,
      multiProbe = false)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val mr = (exact intersect multi).size.toDouble / exact.size
    val sr = (exact intersect single).size.toDouble / exact.size
    info(f"recall@10: multi-probe $mr%.3f vs single-probe $sr%.3f")
    assert(mr >= sr) // probing only widens the candidate set
    assert(mr > 0.25) // even on near-random data, far above chance (~2%)

    // the regime that matters for dedup: an exact copy of the query IS
    // in its own bucket — recall of true near-duplicates is 1.0
    val copies = queries.select(($"qid" + 500000L).as("id"), $"vec")
    val withCopies = corpus.union(copies)
    val found = SimilarityOps.lshTopK(queries, withCopies, k = 1, bits = 4)
      .filter($"neighbor_id" === $"qid" + 500000L && $"cos" >= 0.999999)
    assert(found.count() === 20)
  }

  test("cluster-balanced sample: under-cap keeps all, over-cap thins") {
    // 4 well-separated clusters of very different sizes; centroids are
    // first-4-by-id, so id layout puts one corpus vector of each
    // cluster first — every cluster gets its own cell
    val rnd = new scala.util.Random(13)
    val d = 16
    def point(axis: Int): Array[Float] = {
      val v = Array.fill(d)((rnd.nextGaussian() * 0.05).toFloat)
      v(axis) = v(axis) + 1.0f
      v
    }
    val sizes = Seq(80, 10, 60, 5)
    // ids 0..3 are one vector per cluster (the centroid seeds), the
    // rest follow in cluster-tagged id ranges for leak checking
    val rows =
      (0 until 4).map(a => (a.toLong, a, point(a))) ++
      sizes.zipWithIndex.flatMap { case (n, a) =>
        (0 until n).map(i => ((100 + a * 1000 + i).toLong, a, point(a)))
      }
    val corpus = rows.map { case (id, _, v) => (id, v) }.toDF("id", "vec")
    val truth = rows.map { case (id, a, _) => id -> a.toLong }.toMap
    val kept = SimilarityOps.clusterBalancedSample(
      corpus, nlist = 4, capPerCluster = 30)
      .as[(Long, Long)].collect()
    // assignment is leak-free: every kept row sits in its planted cell
    kept.foreach { case (id, cell) =>
      assert(cell === truth(id), s"id $id landed in cell $cell")
    }
    val perCell = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // under-cap clusters keep every row (cluster + its seed vector)
    assert(perCell(1L) === 11)
    assert(perCell(3L) === 6)
    // over-cap clusters thin toward the cap: strictly fewer than
    // before, within the md5-grain tolerance of the target
    assert(perCell(0L) < 81 && perCell(0L) <= 45 && perCell(0L) >= 15,
      s"cell 0 kept ${perCell(0L)} of 81, cap 30")
    assert(perCell(2L) < 61 && perCell(2L) <= 45 && perCell(2L) >= 15,
      s"cell 2 kept ${perCell(2L)} of 61, cap 30")
    // determinism: the same call selects the same ids
    val again = SimilarityOps.clusterBalancedSample(
      corpus, nlist = 4, capPerCluster = 30)
      .as[(Long, Long)].collect()
    assert(kept.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("IVF on clustered data: k-means centroids rescue first-n recall") {
    // 16 clusters around orthogonal directions, corpus ids SORTED BY
    // CLUSTER — the first nlist ids all sit inside cluster 0, the
    // degenerate case for training-free first-n centroids. With point
    // noise sized so the noise dot-product term rivals the cluster
    // term, a cluster's members scatter across many noise-defined
    // cells: a query's nprobe cells can't cover its true top-k and
    // recall@k collapses. Deterministic k-means centroids put each
    // cluster back in one cell and recall recovers.
    val rnd = new scala.util.Random(7)
    val d = 32; val kClusters = 16; val perCluster = 50
    def point(j: Int): Array[Float] = {
      val v = Array.fill(d)(rnd.nextGaussian() * 0.22)
      v(j) += 1.0f
      v.map(_.toFloat)
    }
    val corpusRows = (0 until kClusters).flatMap { j =>
      (0 until perCluster).map(i => ((j * perCluster + i).toLong, point(j)))
    }
    val corpus = corpusRows.toDF("id", "vec")
    val queryRows = corpusRows.filter(_._1 % 10 == 0).map { case (id, v) =>
      (id + 1000000L, v.zipWithIndex.map { case (x, i) =>
        (x * (1.0 + 0.1 * math.sin(id * 31 + i))).toFloat })
    }
    val queries = queryRows.toDF("qid", "vec")
    val truth = SimilarityOps.bruteForceTopK(queries, corpus, k = 5)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(refine: Int): Double = {
      val got = SimilarityOps.ivfTopK(queries, corpus, k = 5,
          nlist = 16, nprobe = 4, refineIterations = refine)
        .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
      (truth intersect got).size.toDouble / truth.size
    }
    val firstN = recallOf(0)
    val kmeans = recallOf(3)
    info(f"clustered recall@5: first-n $firstN%.3f vs k-means $kmeans%.3f")
    assert(firstN < 0.9,
      f"fixture too easy: first-n recall $firstN%.3f should collapse")
    assert(kmeans >= 0.9,
      f"k-means refinement failed to hold recall: $kmeans%.3f")
  }

  test("scalable k-means||: deterministic, dispatched, recall holds") {
    // Same adversarial fixture as the sampled-path test above —
    // clustered corpus, ids sorted by cluster — but trained through
    // the distributed k-means|| path (driver holds nothing but the
    // final centroids; seeding and Lloyd are Spark jobs).
    val rnd = new scala.util.Random(7)
    val d = 32; val kClusters = 16; val perCluster = 50
    def point(j: Int): Array[Float] = {
      val v = Array.fill(d)(rnd.nextGaussian() * 0.22)
      v(j) += 1.0f
      v.map(_.toFloat)
    }
    val corpusRows = (0 until kClusters).flatMap { j =>
      (0 until perCluster).map(i => ((j * perCluster + i).toLong, point(j)))
    }
    val corpus = corpusRows.toDF("id", "vec")
    val c = corpus.select(col("id").as("__id"), col("vec").as("__cv"))

    // determinism: two direct invocations produce identical centroids
    val c1 = SimilarityOps.kmeansCentroidsScalable(c, nlist = 16, iters = 2)
      .as[(Long, Seq[Float])].collect().sortBy(_._1).toSeq
    val c2 = SimilarityOps.kmeansCentroidsScalable(c, nlist = 16, iters = 2)
      .as[(Long, Seq[Float])].collect().sortBy(_._1).toSeq
    assert(c1.size === 16)
    assert(c1 === c2)

    // the 16 centroids separate the 16 planted clusters: each cluster
    // direction's nearest centroid is distinct
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val owners = (0 until kClusters).map { j =>
      val dir = Seq.tabulate(d)(i => if (i == j) 1.0f else 0.0f)
      c1.maxBy { case (_, cent) => cos(dir, cent) }._1
    }
    assert(owners.distinct.size === kClusters,
      s"centroids failed to separate the planted clusters: $owners")

    // end-to-end: force the dispatcher onto the scalable path and
    // re-assert the clustered-recall bar the sampled path holds
    val queryRows = corpusRows.filter(_._1 % 10 == 0).map { case (id, v) =>
      (id + 1000000L, v.zipWithIndex.map { case (x, i) =>
        (x * (1.0 + 0.1 * math.sin(id * 31 + i))).toFloat })
    }
    val queries = queryRows.toDF("qid", "vec")
    val truth = SimilarityOps.bruteForceTopK(queries, corpus, k = 5)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    spark.conf.set("spark.graft.kmeansSampledNlistMax", "0")
    try {
      val got = SimilarityOps.ivfTopK(queries, corpus, k = 5,
          nlist = 16, nprobe = 4, refineIterations = 3)
        .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
      val recall = (truth intersect got).size.toDouble / truth.size
      info(f"clustered recall@5 via k-means||: $recall%.3f")
      assert(recall >= 0.9,
        f"k-means|| refinement failed to hold recall: $recall%.3f")
    } finally spark.conf.unset("spark.graft.kmeansSampledNlistMax")
  }

  test("incremental IVF append: new vectors searchable, no rewrite") {
    val rnd = new scala.util.Random(23)
    val base = (0L until 200L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val indexPath = tmpDir("ivf-append")
    SimilarityOps.buildIvfIndex(base.toDF("id", "vec"), indexPath,
      nlist = 8)
    val t = graft.lake.LakeTable.forPath(spark,
      s"$indexPath/assignments")
    val filesBefore = t.snapshot().files.map(_.path).toSet

    // feed batch: DIRECTIONAL perturbations of existing vectors (a
    // scalar rescale would be cosine-identical to its source and tie)
    val fresh = (1000L until 1020L).map { i =>
      val src = base((i % 200L).toInt)._2
      (i, src.zipWithIndex.map { case (x, j) =>
        x + 0.05f * math.sin(i * 7.0 + j).toFloat })
    }
    SimilarityOps.appendToIvfIndex(fresh.toDF("id", "vec"), indexPath)
    val after = graft.lake.LakeTable.forPath(spark,
      s"$indexPath/assignments").snapshot()
    // pure append: every pre-existing file survives untouched
    assert(filesBefore.subsetOf(after.files.map(_.path).toSet),
      "incremental append must not rewrite existing cell files")
    assert(after.files.size > filesBefore.size)

    // the appended vectors are immediately searchable: querying each
    // new vector's own perturbation must find IT first
    val queries = fresh.map { case (id, v) => (id + 9000L, v) }
      .toDF("qid", "vec")
    val top1 = SimilarityOps.ivfIndexTopK(queries, indexPath,
      k = 1, nprobe = 3)
      .select("qid", "neighbor_id").as[(Long, Long)].collect()
    assert(top1.length === 20)
    assert(top1.forall { case (q, n) => n == q - 9000L },
      s"appended vectors not found: ${top1.filter(p => p._2 != p._1 - 9000L).toSeq}")

    // PQ indexes refuse incremental append loudly
    val pqPath = tmpDir("ivf-append-pq")
    SimilarityOps.buildIvfIndex(base.toDF("id", "vec"), pqPath,
      nlist = 8, pq = true, pqM = 4, pqK = 8)
    intercept[IllegalArgumentException] {
      SimilarityOps.appendToIvfIndex(fresh.toDF("id", "vec"), pqPath)
    }

    // an index built WITH carry columns refuses an append without
    // them (silent null-fill would hide the vectors from filtered
    // search forever)
    val cPath = tmpDir("ivf-append-carry")
    SimilarityOps.buildIvfIndex(
      base.map { case (i, v) => (i, v, (i % 2).toInt) }
        .toDF("id", "vec", "tenant"),
      cPath, nlist = 8, carryCols = Seq("tenant"))
    intercept[IllegalArgumentException] {
      SimilarityOps.appendToIvfIndex(fresh.toDF("id", "vec"), cPath)
    }
    SimilarityOps.appendToIvfIndex(
      fresh.map { case (i, v) => (i, v, (i % 2).toInt) }
        .toDF("id", "vec", "tenant"),
      cPath, carryCols = Seq("tenant"))
    assert(graft.lake.LakeTable.forPath(spark, s"$cPath/assignments")
      .toDF.where("tenant IS NULL").count() === 0L)
  }

  test("filtered ANN: predicate excludes neighbors, carry column rides") {
    val rnd = new scala.util.Random(17)
    val corpusRows = (0L until 300L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1), (i % 3).toInt))
    val corpus = corpusRows.toDF("id", "vec", "tenant")
    // each query is a slight perturbation of a tenant-0 corpus vector
    val queries = corpusRows.filter(r => r._1 % 30 == 0 && r._3 == 0)
      .map { case (id, v, _) => (id + 1000L, v.map(_ * 1.02f)) }
      .toDF("qid", "vec")
    val indexPath = tmpDir("ivf-filtered")
    SimilarityOps.buildIvfIndex(corpus, indexPath, nlist = 8,
      carryCols = Seq("tenant"))
    // the carry column lands in the assignments table
    val stored = graft.lake.LakeTable
      .forPath(spark, s"$indexPath/assignments").toDF
    assert(stored.columns.contains("tenant"))
    assert(stored.select("id", "tenant").as[(Long, Int)].collect()
      .forall { case (id, t) => t == (id % 3).toInt })
    val got = SimilarityOps.ivfIndexTopK(queries, indexPath, k = 5,
      nprobe = 4, filter = "tenant = 0")
      .select("qid", "neighbor_id").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    // hard guarantee: no cross-tenant neighbor ever
    assert(got.forall { case (_, n) => n % 3 == 0 },
      s"leaked non-tenant-0 neighbors: ${got.filter(_._2 % 3 != 0).toSeq}")
    // each query's planted source (tenant 0) must be its top match
    val top1 = SimilarityOps.ivfIndexTopK(queries, indexPath, k = 1,
      nprobe = 4, filter = "tenant = 0")
      .select("qid", "neighbor_id").as[(Long, Long)].collect()
    assert(top1.forall { case (q, n) => n == q - 1000L },
      s"planted tenant-0 neighbor not recovered: ${top1.toSeq}")
  }

  test("persisted IVF index: probe matches in-memory IVF, scan prunes cells") {
    val rnd = new scala.util.Random(11)
    val corpusRows = (0L until 400L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val corpus = corpusRows.toDF("id", "vec")
    val queries = corpusRows.filter(_._1 % 20 == 0).map { case (id, v) =>
      (id + 1000L, v.map(x => (x * 1.02f)))
    }.toDF("qid", "vec")
    val indexPath = tmpDir("ivf-index")
    SimilarityOps.buildIvfIndex(corpus, indexPath, nlist = 8)
    val fromIndex = SimilarityOps.ivfIndexTopK(
        queries, indexPath, k = 3, nprobe = 2)
      .select("qid", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val inMemory = SimilarityOps.ivfTopK(queries, corpus, k = 3,
        nlist = 8, nprobe = 2)
      .select("qid", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(fromIndex === inMemory,
      "persisted probe must agree with the per-call IVF path")
    // the probe's candidate scan prunes to the probed cells' partitions
    val candidates = graft.lake.LakeTable
      .forPath(spark, s"$indexPath/assignments").toDF
      .filter(col("cell").isin(0L, 1L))
    val plan = candidates.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("LakeFileIndex"), plan)
    assert(plan.contains("PartitionFilters: ["), plan)
    val filesRead = candidates.select(input_file_name())
      .distinct().count()
    val filesTotal = graft.lake.LakeTable
      .forPath(spark, s"$indexPath/assignments").toDF
      .select(input_file_name()).distinct().count()
    assert(filesRead < filesTotal,
      s"cell filter should prune assignment files at planning time " +
      s"($filesRead of $filesTotal read)")
    // pin the metric exactly: the scan may touch AT MOST the probed
    // cells' own files (VERDICT r10: localize probe regressions
    // before they hide in the fused build+probe gate number)
    val probedCellFiles = graft.lake.LakeTable
      .forPath(spark, s"$indexPath/assignments").snapshot()
      .files.count(f =>
        Set("0", "1").contains(f.partitionValues.getOrElse("cell", "")))
    assert(filesRead <= probedCellFiles,
      s"probe scanned $filesRead files, more than the probed cells " +
      s"own ($probedCellFiles)")
    // rebuild is an atomic overwrite, probe still consistent
    SimilarityOps.buildIvfIndex(corpus, indexPath, nlist = 8)
    assert(SimilarityOps.ivfIndexTopK(queries, indexPath, k = 3, nprobe = 2)
      .count() > 0)
  }

  test("IVF-PQ: ADC + re-rank matches brute force; codes are smaller") {
    val rnd = new scala.util.Random(23)
    val corpusRows = (0L until 600L).map(i =>
      (i, Array.fill(32)(rnd.nextFloat() * 2 - 1)))
    val corpus = corpusRows.toDF("id", "vec")
    val queries = corpusRows.filter(_._1 % 20 == 0).map { case (id, v) =>
      (id + 1000L, v.map(x => x * 1.02f))
    }.toDF("qid", "vec")
    val indexPath = tmpDir("ivf-pq")
    SimilarityOps.buildIvfIndex(corpus, indexPath, nlist = 8,
      pq = true, pqM = 8, pqK = 16)

    // compressed codes must actually compress: pqM ints + a float per
    // vector vs a 32-float vector
    val codesBytes = graft.lake.LakeTable
      .forPath(spark, s"$indexPath/pq_codes").snapshot().sizeInBytes
    val vecBytes = graft.lake.LakeTable
      .forPath(spark, s"$indexPath/assignments").snapshot().sizeInBytes
    assert(codesBytes * 2 < vecBytes,
      s"pq_codes $codesBytes bytes vs assignments $vecBytes bytes")

    val got = SimilarityOps.ivfPqTopK(
        queries, indexPath, k = 3, nprobe = 6, rerank = 64)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val truth = SimilarityOps.bruteForceTopK(queries, corpus, k = 3)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (truth intersect got).size.toDouble / truth.size
    info(f"IVF-PQ recall@3 vs brute force: $recall%.3f")
    assert(recall >= 0.9, f"IVF-PQ recall $recall%.3f below 0.9")
    // with a generous re-rank list the ADC ranking loses nothing the
    // IVF probe itself kept: same cells, same answers
    val ivf = SimilarityOps.ivfIndexTopK(
        queries, indexPath, k = 3, nprobe = 6)
      .select("qid", "neighbor_id").as[(Long, Long)].collect().toSet
    val overlap = (ivf intersect got).size.toDouble / ivf.size
    assert(overlap >= 0.9,
      f"PQ diverged from the uncompressed probe: overlap $overlap%.3f")
    // the planted nearest neighbor (the unperturbed source) survives
    val planted = got.count { case (q, n) => n == q - 1000L }
    assert(planted >= 27, s"planted neighbors found: $planted/30")
    // deterministic: rebuilding yields identical codes
    val codes1 = graft.lake.LakeTable
      .forPath(spark, s"$indexPath/pq_codes").toDF
      .select("id", "codes").as[(Long, Seq[Int])].collect().toMap
    SimilarityOps.buildIvfIndex(corpus, indexPath, nlist = 8,
      pq = true, pqM = 8, pqK = 16)
    val codes2 = graft.lake.LakeTable
      .forPath(spark, s"$indexPath/pq_codes").toDF
      .select("id", "codes").as[(Long, Seq[Int])].collect().toMap
    assert(codes1 === codes2, "PQ encode must be deterministic")
  }

  test("language id guesses 'und' for null text (fold parity)") {
    val df = Seq((1L, "the cat sat on the mat"), (2L, null))
      .toDF("doc_id", "text")
    val got = TextOps.langId(df, "text")
      .select("doc_id", "lang_guess").as[(Long, String)].collect().toMap
    assert(got(1L) === "en")
    assert(got(2L) === "und",
      "null text must guess 'und', not SQL NULL")
  }

  test("language id picks the profile language on planted stopwords") {
    val df = Seq(
      (1L, "the cat sat on the mat and the dog"),
      (2L, "el perro y la casa de la madre es grande"),
      (3L, "zzz qqq www")
    ).toDF("doc_id", "text")
    val got = TextOps.langId(df, "text").select("doc_id", "lang_guess")
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "en")
    assert(got(2L) === "es")
    assert(got(3L) === "und")
  }

  test("simhash Hamming banding: <=3-bit pairs guaranteed, distances exact") {
    val base = 0x0123456789ABCDEFL
    val sigs = Seq(
      (1L, base),
      (2L, base ^ 1L),                       // distance 1
      (3L, base ^ (1L << 17) ^ (1L << 50)),  // distance 2
      (4L, base ^ 7L ^ (1L << 63)),          // distance 4 from id 1
      (5L, 0x5555555555555555L)              // far from everything
    ).toDF("id", "sig")
    val pairs = DedupOps.simhashNearPairsFromSigs(sigs, "sig", "id")
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)]
      .collect().sortBy(p => (p._1, p._2))
    // pigeonhole guarantee: every pair within distance 3 is present
    assert(pairs.contains((1L, 2L, 1)))
    assert(pairs.contains((1L, 3L, 2)))
    assert(pairs.contains((2L, 3L, 3)))
    // distance-4+ pairs are excluded even when they share a band
    assert(!pairs.exists(p => p._1 == 1L && p._2 == 4L))
    assert(!pairs.exists(p => p._2 == 5L || p._1 == 5L))
  }

  test("winnowing: shared >= n+w-1 token run guarantees a shared fingerprint") {
    val sharedPassage = "alpha beta gamma delta epsilon zeta eta"
    val df = Seq(
      (1L, s"unrelated prefix words here $sharedPassage and a suffix"),
      (2L, s"$sharedPassage totally different continuation tokens now"),
      (3L, "nothing in common with anyone at all whatsoever today")
    ).toDF("doc_id", "text")
    val pairs = TextOps.passageOverlapPairs(df, "text", "doc_id",
      n = 3, window = 4, minShared = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))     // 7-token shared run >= 3+4-1
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // short docs fingerprint whole-text; identical shorts collide
    val shorts = Seq((10L, "tiny doc"), (11L, "tiny doc"))
      .toDF("doc_id", "text")
    val sp = TextOps.passageOverlapPairs(shorts, "text", "doc_id",
      minShared = 1).count()
    assert(sp === 1L)
  }

  test("decontamination drops benchmark quoters, keeps clean docs") {
    val question = "what is the capital city of the ancient empire there"
    val reference = Seq((100L, question)).toDF("rid", "rtext")
    val corpus = Seq(
      // quotes the full benchmark question inside other text: dropped
      (1L, s"some prose then $question and a conclusion sentence"),
      // clean document: kept
      (2L, "entirely unrelated content about cooking pasta at home today"),
      // shares only a sub-(n+w-1) run (4 tokens < 6): kept at
      // minShared=2 — short accidental overlaps are not contamination
      (3L, "what is the capital spelled differently in every other region")
    ).toDF("doc_id", "text")
    val kept = TextOps.decontaminateAgainst(
      corpus, "text", "doc_id", reference, "rtext",
      n = 3, window = 4, minShared = 2)
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(2L, 3L))
    // minShared = 1 also catches the short-overlap doc only if a
    // whole >= n+w-1 run is shared — doc 3 shares no 6-token run, so
    // it survives even the strictest setting
    val strict = TextOps.decontaminateAgainst(
      corpus, "text", "doc_id", reference, "rtext",
      n = 3, window = 4, minShared = 1)
      .select("doc_id").as[Long].collect().sorted
    assert(strict.contains(2L) && !strict.contains(1L))
    // schema passes through unchanged
    assert(TextOps.decontaminateAgainst(corpus, "text", "doc_id",
      reference, "rtext").columns.toSeq === Seq("doc_id", "text"))
  }

  test("token-budget mix: derived rates hit shares, cap at 1, drop unlisted") {
    // 3 domains, 100 docs x 10 tokens each: big=60 docs, mid=30, tiny=10
    val docs = (0L until 100L).map { i =>
      val d = if (i < 60) "big" else if (i < 90) "mid" else "tiny"
      (i, d, 10)
    }.toDF("id", "domain", "n_tokens")
    // budget 500 tokens: big -> 250/600 rate .41, tiny -> 250/100 capped
    val out = SampleOps.tokenBudgetMix(docs, "domain", "id", "n_tokens",
      targetShares = Map("big" -> 0.5, "tiny" -> 0.5), budgetTokens = 500L)
      .select("id", "domain").as[(Long, String)].collect()
    val byDomain = out.groupBy(_._2).view.mapValues(_.length).toMap
    // capped domain keeps EVERYTHING (never upsamples, never drops)
    assert(byDomain.getOrElse("tiny", 0) === 10)
    // unlisted domain vanishes
    assert(!byDomain.contains("mid"))
    // downsampled domain lands near its 41.7% rate (hash-binomial;
    // generous band — determinism is the exact assertion below)
    val bigKept = byDomain.getOrElse("big", 0)
    assert(bigKept > 10 && bigKept < 45, s"big kept $bigKept of 60")
    // deterministic: an identical rerun selects the identical ids
    val rerun = SampleOps.tokenBudgetMix(docs, "domain", "id", "n_tokens",
      targetShares = Map("big" -> 0.5, "tiny" -> 0.5), budgetTokens = 500L)
      .select("id", "domain").as[(Long, String)].collect()
    assert(out.sortBy(_._1).toSeq === rerun.sortBy(_._1).toSeq)
    // zero budget selects nothing
    assert(SampleOps.tokenBudgetMix(docs, "domain", "id", "n_tokens",
      Map("big" -> 1.0), budgetTokens = 0L).count() === 0L)
  }

  test("passage overlap: hot-posting guard is exact on skewed fixtures") {
    // 30 docs all carry the SAME boilerplate passage (hot under a low
    // threshold) plus unique filler; two pairs additionally share a
    // rare passage. The guard must (a) keep reporting the rare-passage
    // pairs with the EXACT full shared count — including the hot
    // fingerprints' contribution — and (b) drop boilerplate-only
    // pairs by documented contamination semantics.
    val boiler = "standard license header text applies to this file body"
    val rareA = "quick brown foxes jump over seven lazy sleeping dogs"
    val rareB = "nine green bottles stand quietly upon the old wall"
    val docs = (0L until 30L).map { i =>
      val rare =
        if (i == 3 || i == 7) rareA
        else if (i == 11 || i == 19) rareB
        else s"filler_${i}_a filler_${i}_b filler_${i}_c filler_${i}_d " +
          s"filler_${i}_e filler_${i}_f filler_${i}_g filler_${i}_h"
      (i, s"$boiler $rare")
    }.toDF("doc_id", "text")

    def run(threshold: Int): Map[(Long, Long), Long] =
      TextOps.passageOverlapPairs(docs, "text", "doc_id",
        n = 3, window = 4, minShared = 1, hotThreshold = threshold)
        .as[(Long, Long, Long)].collect()
        .map(t => (t._1, t._2) -> t._3).toMap

    val unguarded = run(Int.MaxValue) // nothing hot: the naive join
    val guarded = run(4)              // boilerplate fingerprints hot

    // rare-passage pairs survive with identical exact counts
    for (pair <- Seq((3L, 7L), (11L, 19L))) {
      assert(guarded.contains(pair), s"guard lost rare pair $pair")
      assert(guarded(pair) === unguarded(pair),
        s"guard changed the shared count for $pair")
    }
    // every guarded pair's count matches the unguarded ground truth
    guarded.foreach { case (pair, n) =>
      assert(unguarded(pair) === n, s"count mismatch for $pair")
    }
    // boilerplate-only pairs (e.g. two filler docs) are dropped
    assert(!guarded.contains((0L, 1L)),
      "guard must drop pairs sharing only boilerplate fingerprints")
    assert(unguarded.contains((0L, 1L)),
      "fixture broken: boilerplate must overlap in the naive join")
  }

  test("hashed shingles native expr matches composable set semantics") {
    val df = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y"), (4L, "a b c x y")
    ).toDF("id", "text")
    val native = df.select($"id",
      graft.functions.HashedShingles($"text", 3).as("sh"))
    // identical texts -> identical sets; distinct sizes match the
    // composable definition (n-2 shingles for n>=3 tokens, else 1)
    val sizes = native.select($"id", size($"sh")).as[(Long, Int)]
      .collect().toMap
    assert(sizes === Map(1L -> 3, 2L -> 3, 3L -> 1, 4L -> 3))
    val j12 = native.as("a").join(native.as("b"),
        $"a.id" === 1L && $"b.id" === 2L)
      .select(DedupOps.jaccardFromShingles($"a.sh", $"b.sh"))
      .as[Double].head()
    assert(j12 === 1.0)
  }

  test("funnel: strict ordering, greedy-earliest, depth per entity") {
    val ev = Seq(
      // user 1: complete ordered funnel
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      // user 2: click BEFORE the first view -> stalls at depth 1
      (2L, 1L, "click"), (2L, 2L, "view"), (2L, 3L, "purchase"),
      // user 3: never views -> depth 0
      (3L, 1L, "click"), (3L, 2L, "purchase"),
      // user 4: two views; the EARLIEST one admits the later click
      (4L, 5L, "view"), (4L, 1L, "view"), (4L, 3L, "click")
    ).toDF("user_id", "ts", "event_type")
    val got = SequenceOps.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .select("user_id", "funnel_depth", "step_1_ts", "step_2_ts")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got(1L)._1 === 3)
    assert(got(2L) === ((1, Some(2L), None)))
    assert(got(3L) === ((0, None, None)))
    // greedy-earliest: step_1 = ts 1, so click@3 completes step 2
    assert(got(4L) === ((2, Some(1L), Some(3L))))
  }
}

package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Unit checks for the round-6 corpus-hygiene operators: deterministic
  * sampling, PII redaction, repetition stats, heavy-hitter n-grams,
  * BM25 and token-window chunking. The gates cover DuckDB oracle
  * parity; these pin the semantics on closed-form fixtures.
  */
class TextPipelineSuite extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("hash sample: deterministic, key-consistent, near-nominal rate") {
    val a = SampleOps.hashSample(docs, "doc_id", 26)
    val b = SampleOps.hashSample(docs, "doc_id", 26)
    val idsA = a.select("doc_id").as[Long].collect().sorted
    assert(idsA.sameElements(b.select("doc_id").as[Long].collect().sorted))
    // same keys sample identically from a DIFFERENT table projection —
    // the cross-table-consistency property random sampling lacks
    val other = docs.select(col("doc_id"), col("lang"))
    val idsO = SampleOps.hashSample(other, "doc_id", 26)
      .select("doc_id").as[Long].collect().sorted
    assert(idsA.sameElements(idsO))
    val rate = idsA.length.toDouble / docs.count()
    assert(rate > 0.03 && rate < 0.25, s"rate $rate implausible for ~10%")
    // threshold monotone: a wider threshold strictly contains a narrower
    val wide = SampleOps.hashSample(docs, "doc_id", 64)
      .select("doc_id").as[Long].collect().toSet
    assert(idsA.forall(wide.contains))
  }

  test("stratified sample: exactly min(N, stratum size) per stratum") {
    val got = SampleOps.stratifiedSample(docs, "lang", "doc_id", 5)
      .groupBy("lang").agg(count(lit(1)).as("n"))
    val sizes = docs.groupBy("lang").agg(count(lit(1)).as("total"))
    val joined = got.join(sizes, "lang")
      .select("lang", "n", "total").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(1) === math.min(5L, r.getLong(2)),
        s"stratum ${r.getString(0)}")
    }
  }

  test("quota sample: per-group rates, unlisted groups dropped") {
    val df = (1L to 400L).map(i => (i, s"g${i % 4}")).toDF("id", "g")
    val got = SampleOps.quotaSample(df, "g", "id",
      Map("g0" -> 256, "g1" -> 64, "g2" -> 0))
      .groupBy("g").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("g0") === 100L)             // 256 = keep everything
    assert(got.get("g2").isEmpty)          // quota 0 -> nothing
    assert(!got.contains("g3"))            // unlisted -> dropped
    val g1 = got("g1")
    assert(g1 > 5 && g1 < 60, s"g1 kept $g1 of 100 at nominal 25%")
    // consistency with the uniform sampler: same keys survive
    val uni = SampleOps.hashSample(df.filter(col("g") === "g1"), "id", 64)
      .select("id").as[Long].collect().toSet
    val quo = SampleOps.quotaSample(df, "g", "id", Map("g1" -> 64))
      .select("id").as[Long].collect().toSet
    assert(uni === quo)
  }

  test("pii redaction: counts and masks emails + phones") {
    val df = Seq(
      (1L, "mail me at a.b-c_1@foo-bar.example.org today"),
      (2L, "call 555-0199 or 555-0200 thanks"),
      (3L, "no pii here at all"),
      (4L, "x@y.io and 123-4567 both")).toDF("id", "text")
    val got = TextOps.redactPii(df, "text")
      .select("id", "n_emails", "n_phones", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(got(1) === ((1, 0, "mail me at <EMAIL> today")))
    assert(got(2) === ((0, 2, "call <PHONE> or <PHONE> thanks")))
    assert(got(3) === ((0, 0, "no pii here at all")))
    assert(got(4) === ((1, 1, "<EMAIL> and <PHONE> both")))
  }

  test("repetition stats: closed-form ratios") {
    val df = Seq(
      (1L, "a a a a"),          // 4 tokens, 1 distinct -> 0.75
      (2L, "a b c d"),          // all distinct -> 0.0
      (3L, "a b a b a b")       // 6 tokens, 2 distinct -> 0.6667
    ).toDF("id", "text")
    val got = TextOps.repetitionStats(df, "text")
      .select("id", "dup_ratio").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1) === 0.75)
    assert(got(2) === 0.0)
    assert(got(3) === 0.6667)
  }

  test("top ngrams: frequency order with deterministic tiebreak") {
    val df = Seq("x y z x y z", "x y z q", "a b c").toDF("text")
    // doc1 [x,y,z,x,y,z] -> "x y z","y z x","z x y","x y z";
    // doc2 -> "x y z","y z q"; doc3 -> "a b c"
    val got = TextOps.topNgrams(df, "text", 3, 3)
      .as[(String, Long)].collect()
    // freq order first, then ngram ascending among the freq-1 ties
    assert(got.toSeq === Seq(("x y z", 3L), ("a b c", 1L), ("y z q", 1L)))
  }

  test("StringShingles: equals the composable transform/slice form") {
    val df = docs.select(col("text"))
    val native = df.select(
      graft.functions.StringShingles(col("text"), 3).as("s"))
    val toks = split(col("text"), "\\s+")
    val composed = df.select(
      when(size(toks) < 3, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ", slice(toks, i + 1, lit(3))))).as("s"))
    assert(native.collect().map(_.getSeq[String](0)).toSeq ===
      composed.collect().map(_.getSeq[String](0)).toSeq)
  }

  test("unigram surprisal: rare tokens score higher than common ones") {
    val df = Seq(
      (1L, "common common common common"),
      (2L, "common common common rare")).toDF("id", "text")
    val got = TextOps.unigramSurprisal(df, "text", "id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // p(common)=7/8, p(rare)=1/8: doc 2 mixes in the rare token
    assert(got(2L) > got(1L))
    val expected1 = -math.log(7.0 / 8.0)
    assert(math.abs(got(1L) - expected1) < 1e-4)
  }

  test("bm25: docs with more query-term mass score higher; absent terms zero") {
    val df = Seq(
      (1L, "join join join filter scan"),
      (2L, "join filter scan sort hash"),
      (3L, "filter scan sort hash group")).toDF("doc_id", "text")
    val got = TextOps.bm25(df, "text", "doc_id", Seq("join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1) > got(2), "higher tf must outrank")
    assert(got(3) === 0.0, "absent term scores zero")
  }

  test("pack offsets: sharded prefix sum equals sequential cumsum") {
    val df = (1L to 10L).map(i => (i, (1L to i).map(_ => "w").mkString(" ")))
      .toDF("id", "text") // doc i has i tokens
    val got = TextOps.packOffsets(df, "text", "id",
      blockTokens = 8, docsPerShard = 3)
      .select("id", "n_tokens", "offset", "first_block", "last_block")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    var acc = 0L
    got.foreach { case (id, nt, off, fb, lb) =>
      assert(nt === id.toInt)
      assert(off === acc, s"doc $id offset")
      assert(fb === off / 8)
      assert(lb === (off + nt - 1) / 8)
      acc += nt
    }
    assert(acc === 55L)
  }

  test("curation: lang+quality filters, dup collapse to lowest id") {
    val enText = (1 to 60).map(_ => "the of and to in is that").mkString(" ")
    val esText = (1 to 60).map(_ => "el la de y que en un es").mkString(" ")
    val df = Seq(
      (1L, enText), (5L, enText),              // dup pair -> keep 1
      (2L, esText),                             // wrong lang -> dropped
      (3L, "the of and")                        // en but low quality
    ).toDF("id", "text")
      .withColumn("n_chars", length(col("text")))
    // stopword-only fixtures mean-word-length below 3 -> quality 0.5
    val got = CurationOps.curate(df, "text", "id", "n_chars",
      langs = Seq("en"), minQuality = 0.4, samplePct256 = 256)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L))
  }

  test("chunking: full coverage, stride geometry, suffix last chunk") {
    val text = (1 to 150).map(i => s"t$i").mkString(" ")
    val got = TextOps.chunkTokens(
      Seq((1L, text)).toDF("id", "text"), "text", "id", 64, 48)
      .select("chunk_idx", "chunk_start", "chunk_len")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).sorted
    // n=150: kMax = ceil(86/48) = 2 -> chunks at 1, 49, 97
    assert(got.toSeq === Seq((0, 1, 64), (1, 49, 64), (2, 97, 54)))
    // every token covered: last chunk reaches 97+54-1 = 150
    assert(got.last._2 + got.last._3 - 1 === 150)
    // short doc: single whole-doc chunk
    val one = TextOps.chunkTokens(
      Seq((1L, "a b c")).toDF("id", "text"), "text", "id", 64, 48)
      .select("chunk_idx", "chunk_len").as[(Int, Int)].collect()
    assert(one.toSeq === Seq((0, 3)))
  }
}

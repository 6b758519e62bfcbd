package graft.ops

import graft.SparkSuite
import org.scalatest.prop.TableDrivenPropertyChecks
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property-style invariants for the round-2 operators: the
  * inverted-index Jaccard must EQUAL the naive all-pairs join on
  * arbitrary corpora (the losslessness claim), salted joins must be
  * row-identical to plain joins, sessionization must partition events
  * exactly, and simhash banding must never miss a close pair.
  */
class OpsPropertySuite extends SparkSuite with TableDrivenPropertyChecks {
  import spark.implicits._

  /** Deterministic random corpus with planted overlap structure. */
  private def corpus(seed: Int, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val vocab = (0 until 40).map(i => s"w$i")
    (0 until nDocs).map { i =>
      val len = 5 + rnd.nextInt(30)
      val toks = Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, toks.mkString(" "))
    }
  }

  test("inverted-index Jaccard == naive all-pairs on random corpora") {
    forAll(Table(("seed", "n"), (1, 30), (7, 60), (42, 45))) { (seed, n) =>
      val df = corpus(seed, n).toDF("doc_id", "text")
      val fast = DedupOps.ngramJaccardPairs(df, "text", "doc_id",
          n = 3, minJaccard = 0.15)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      // naive: all pairs, exact jaccard on the same hashed shingles
      val sh = df.select(col("doc_id"),
        graft.functions.HashedShingles(col("text"), 3).as("sh"))
      val naive = sh.as("a").join(sh.as("b"),
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"),
          round(DedupOps.jaccardFromShingles(col("a.sh"), col("b.sh")), 4)
            .as("j"))
        .filter(expr(
          "size(array_intersect(a.sh, b.sh)) / " +
          "(size(a.sh) + size(b.sh) - size(array_intersect(a.sh, b.sh)))" +
          " >= 0.15"))
        .as[(Long, Long, Double)].collect().toSet
      assert(fast === naive)
    }
  }

  test("repetition signals == naive quadratic reference on random docs") {
    // naive reference: re-derives every signal with plain collections
    // code (group-by counts, brute positional scan) — a disagreement
    // means the single-pass map/mask bookkeeping broke
    def naive(text: String): Seq[Double] = {
      def seg(sep: String): (Double, Double) = {
        val s = text.split(sep).filter(_.nonEmpty)
        if (s.isEmpty) (0.0, 0.0)
        else {
          val g = s.groupBy(identity).map { case (v, o) => (v, o.length) }
          val d = g.values.map(c => (c - 1).toLong).sum
          val dc = g.collect { case (v, c) if c > 1 =>
            (c - 1).toLong * v.length }.sum
          val tot = s.map(_.length.toLong).sum
          (d.toDouble / s.length,
            if (tot == 0) 0.0 else dc.toDouble / tot)
        }
      }
      val (dlf, dlcf) = seg("\n")
      val (dpf, dpcf) = seg("\n\n")
      val w = text.split("\\s+").filter(_.nonEmpty)
      val tot = w.map(_.length.toLong).sum
      def grams(n: Int): Seq[String] =
        (0 to w.length - n).map(i => w.slice(i, i + n).mkString(" "))
      def top(n: Int): Double =
        if (w.length < n || tot == 0) 0.0
        else {
          val g = grams(n).groupBy(identity)
            .map { case (k, o) => (k, o.length) }
          val (bg, bc) = g.toSeq.minBy { case (k, c) => (-c, k) }
          if (bc < 2) 0.0
          else (bc.toLong * (bg.length - (n - 1))).toDouble / tot
        }
      def cov(n: Int): Double =
        if (w.length < n || tot == 0) 0.0
        else {
          val g = grams(n).groupBy(identity)
            .map { case (k, o) => (k, o.length) }
          val covered = (0 to w.length - n)
            .filter(i => g(w.slice(i, i + n).mkString(" ")) > 1)
            .flatMap(i => i until i + n).toSet
          covered.toSeq.map(w(_).length.toLong).sum.toDouble / tot
        }
      Seq(dlf, dlcf, dpf, dpcf, top(2), top(3), top(4)) ++
        (5 to 10).map(cov)
    }
    def r4(d: Double): Double =
      BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    forAll(Table("seed", 3, 17, 59)) { seed =>
      val rnd = new Random(seed)
      val vocab = (0 until 12).map(i => s"t$i") // small → real repeats
      val docs = (0 until 25).map { i =>
        val n = 4 + rnd.nextInt(60)
        val toks = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
        // inject line/para structure
        val sep = Seq(" ", " ", " ", "\n", "\n\n")
        val text = toks.tail.foldLeft(new StringBuilder(toks.head)) {
          (sb, t) => sb.append(sep(rnd.nextInt(sep.size))).append(t)
        }.toString
        (i.toLong, text)
      }
      val got = TextOps.gopherRepetition(docs.toDF("doc_id", "text"), "text")
        .collect().map { r =>
          r.getLong(r.fieldIndex("doc_id")) ->
            graft.functions.RepetitionSignals.fieldNames
              .map(f => r.getDouble(r.fieldIndex(f)))
        }.toMap
      docs.foreach { case (id, text) =>
        val exp = naive(text).map(r4)
        assert(got(id) === exp, s"doc $id: '$text'")
      }
    }
  }

  test("prefix filtering is exact on a stop-phrase-skewed corpus") {
    forAll(Table(("seed", "n"), (4, 60), (19, 90))) { (seed, n) =>
      val rnd = new Random(seed)
      val vocab = (0 until 30).map(i => s"w$i")
      // 70% of docs embed the same hot stop phrase — the skew that
      // makes full-posting inverted indexes quadratic on the web
      val stop = "the quick brown fox jumps over the lazy dog again"
      val docs = (0 until n).map { i =>
        val len = 6 + rnd.nextInt(25)
        val toks = Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
        val text =
          if (rnd.nextDouble() < 0.7) {
            val cut = rnd.nextInt(toks.size)
            (toks.take(cut) ++ stop.split(" ") ++ toks.drop(cut))
              .mkString(" ")
          } else toks.mkString(" ")
        (i.toLong, text)
      }
      val df = docs.toDF("doc_id", "text")
      // hotThreshold = 0 → pure prefix filtering; Int.MaxValue → pure
      // direct group-count; 16 → genuine hybrid (the planted stop
      // phrase lands in ~70% of docs, so its postings exceed 16 and
      // route through the prefix path while the rest stay direct).
      def run(hotThreshold: Int) =
        DedupOps.ngramJaccardPairs(df, "text", "doc_id",
            n = 3, minJaccard = 0.25, hotThreshold = hotThreshold)
          .as[(Long, Long, Double)].collect().toSet
      val direct = run(Int.MaxValue)
      assert(run(0) === direct)
      assert(run(16) === direct)
    }
  }

  test("salted join is row-identical to the plain join") {
    forAll(Table(("seed", "salt"), (3, 2), (9, 8), (21, 16))) { (seed, salt) =>
      val rnd = new Random(seed)
      // skewed probe: 60% of rows share one key
      val probe = (0 until 500).map { i =>
        val k = if (rnd.nextDouble() < 0.6) 7L else rnd.nextInt(50).toLong
        (k, i.toLong)
      }.toDF("k", "payload")
      val build = (0L until 50L).map(k => (k, s"b$k")).toDF("bk", "attr")
      val salted = JoinOps.saltedJoin(probe, build, "k", "bk", salt)
        .select("k", "payload", "attr")
        .as[(Long, Long, String)].collect().sorted.toSeq
      val plain = probe.join(build, col("k") === col("bk"))
        .select("k", "payload", "attr")
        .as[(Long, Long, String)].collect().sorted.toSeq
      assert(salted === plain)
    }
  }

  test("asOfJoin equals the naive greatest-prior-row join") {
    forAll(Table("seed", 2, 13, 31)) { seed =>
      val rnd = new Random(seed)
      // distinct (key, ts) per side, overlapping key ranges, some keys
      // with no right rows at all; a null right value exercises the
      // same-matched-row guarantee (struct transport, not per-column)
      val left = (0 until 300).map { i =>
        (rnd.nextInt(12).toLong, rnd.nextInt(5000).toLong, i.toLong)
      }.distinct.toDF("k", "t", "lid")
      val right = (0 until 200).map { i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(5000).toLong,
          if (i % 7 == 0) null else s"r$i")
      }.distinct.toDF("k", "rt", "rv")
        .dropDuplicates("k", "rt")
      val fast = JoinOps.asOfJoin(left, right,
          keyCols = Seq("k"), leftTime = "t", rightTime = "rt",
          rightValueCols = Seq("rt", "rv"))
        .select("k", "t", "lid", "rt", "rv")
        .as[(Long, Long, Long, Option[Long], Option[String])]
        .collect().toSet
      // naive: left join on key + rt <= t, keep the max-rt row per
      // left row (rt unique per (k, rt) so the max row is unique)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lid").orderBy(col("rt").desc_nulls_last)
      val naive = left.join(right,
          left("k") === right("k") && col("rt") <= col("t"), "left")
        .drop(right("k"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        .select("k", "t", "lid", "rt", "rv")
        .as[(Long, Long, Long, Option[Long], Option[String])]
        .collect().toSet
      assert(fast === naive)
    }
  }

  test("sessionization partitions each user's events exactly") {
    forAll(Table("seed", 5, 11)) { seed =>
      val rnd = new Random(seed)
      val base = 1700000000000L
      val events = (0 until 400).map { i =>
        val uid = rnd.nextInt(8).toLong
        val ts = new java.sql.Timestamp(
          base + rnd.nextInt(48 * 60) * 60000L)
        (uid, ts, rnd.nextInt(100) / 10.0)
      }.toDF("user_id", "ts", "value")
      val sessions = graft.streaming.LakeStreaming
        .sessionize(events, gapMinutes = 45)
      // every event is in exactly one session; totals add up
      val sumN = sessions.agg(sum("n_events")).as[Long].head()
      assert(sumN === 400L)
      val sumV = sessions.agg(round(sum("total_value"), 4))
        .as[Double].head()
      val expectV = events.agg(round(sum("value"), 4)).as[Double].head()
      assert(math.abs(sumV - expectV) < 1e-6)
      // sessions of one user never overlap and respect the gap
      val perUser = sessions
        .select("user_id", "session_start", "session_end")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp)]
        .collect().groupBy(_._1)
      perUser.values.foreach { ss =>
        val sorted = ss.sortBy(_._2.getTime)
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(b._2.getTime - a._3.getTime > 45 * 60000L)
          case _ =>
        }
      }
      // the spill-safe window plan and the typed flatMapGroups API
      // demo compute the same sessions, row for row
      val typed = graft.streaming.LakeStreaming
        .sessionizeTyped(events, gapMinutes = 45)
        .select("user_id", "session_start", "session_end",
          "n_events", "total_value")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
        .collect().sortBy(t => (t._1, t._2.getTime)).toSeq
      val windowed = sessions
        .select("user_id", "session_start", "session_end",
          "n_events", "total_value")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
        .collect().sortBy(t => (t._1, t._2.getTime)).toSeq
      assert(windowed.map(t => (t._1, t._2, t._3, t._4)) ===
        typed.map(t => (t._1, t._2, t._3, t._4)))
      windowed.zip(typed).foreach { case (w, t) =>
        assert(math.abs(w._5 - t._5) < 1e-9)
      }
    }
  }

  test("simhash banding finds every pair within Hamming distance 3") {
    val rnd = new Random(13)
    val sigs = (0 until 200).map { i =>
      (i.toLong, rnd.nextLong())
    }
    // plant close pairs: flip 1-3 random bits of existing signatures
    val planted = (0 until 40).map { i =>
      val (srcId, sig) = sigs(rnd.nextInt(sigs.size))
      val flips = 1 + rnd.nextInt(3)
      val flipped = (0 until flips).foldLeft(sig)((s, _) =>
        s ^ (1L << rnd.nextInt(64)))
      (1000L + i, flipped, srcId)
    }
    val all = (sigs ++ planted.map(p => (p._1, p._2))).toDF("id", "sig")
    val found = DedupOps.simhashNearPairsFromSigs(all, "sig", "id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // ground truth by brute force
    val rows = sigs ++ planted.map(p => (p._1, p._2))
    for {
      (i, si) <- rows
      (j, sj) <- rows if i < j
      if java.lang.Long.bitCount(si ^ sj) <= 3
    } assert(found.contains((i, j)),
      s"missed pair ($i, $j) at distance ${java.lang.Long.bitCount(si ^ sj)}")
  }

  /** Driver-side union-find ground truth for component labels. */
  private def unionFindLabels(
      edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("connectedComponents equals union-find on adversarial shapes") {
    // chain (worst case for naive propagation), star, two merged
    // blobs, isolated pair — plus random graphs
    val shapes: Seq[Seq[(Long, Long)]] = Seq(
      (0L until 40L).map(i => (i, i + 1)),                // long chain
      (1L to 20L).map(i => (100L, 100L + i)),             // star
      Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L),
        (3L, 10L)),                                       // merged blobs
      Seq((500L, 501L)),                                  // isolated pair
      {
        val rnd = new Random(7)
        Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
          .filter(e => e._1 != e._2)
      },
      {
        val rnd = new Random(42)
        // descending chains stress the v <= u small-star side
        (0 until 5).flatMap(c =>
          (0 until 15).map(i =>
            ((c * 1000 + 15 - i).toLong, (c * 1000 + 14 - i).toLong)))
      })
    shapes.zipWithIndex.foreach { case (edges, si) =>
      val want = unionFindLabels(edges)
      // small-graph fast path (default) AND the distributed
      // large-star/small-star rounds (forced) must both match
      val fast = DedupOps.connectedComponents(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(fast === want, s"shape $si (fast path)")
      val dist = DedupOps.connectedComponents(edges.toDF("a", "b"),
          smallGraphEdges = -1L)
        .as[(Long, Long)].collect().toMap
      assert(dist === want, s"shape $si (distributed path)")
    }
  }

  test("TextStats byte scan == the regex split formulation it replaced") {
    // the round-10 single-pass scan claims byte-identity with
    // size(split(text, "\\s+")) and size(split(text, "[\\p{Punct}]"))-1
    // — pin it on adversarial shapes: empties, pure whitespace,
    // leading/trailing separators, every ASCII punct char, multi-byte
    // UTF-8 (which Java \s and \p{Punct} must NOT match), and random
    // printable soup
    val fixed = Seq(
      "", " ", "  ", "a", " a", "a ", " a ", "a b", "a  b", "\t\n\f\r",
      "a\tb\nc", "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~",
      "word, word. word!", "ünïcödé tëxt — mit säparatoren",
      "中文 没有 标点 吗？", "a b", "mixed!@# and spaces  \t x")
    val rnd = new Random(7)
    val soup = (1 to 50).map { _ =>
      (1 to rnd.nextInt(80)).map(_ => (rnd.nextInt(95) + 32).toChar)
        .mkString
    }
    val df = (fixed ++ soup).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rows = df.select(col("id"),
        graft.functions.TextStats.tokenCount(col("text")).as("fast_tok"),
        size(split(col("text"), "\\s+")).as("regex_tok"),
        graft.functions.TextStats.punctCount(col("text")).as("fast_p"),
        (size(split(col("text"), "[\\p{Punct}]")) - 1).as("regex_p"),
        col("text"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) === r.getInt(2),
        s"token count mismatch on ${r.getString(5)}")
      assert(r.getInt(3) === r.getInt(4),
        s"punct count mismatch on ${r.getString(5)}")
    }
  }

  test("synthetic BMP/WAV round-trip through the decoders exactly") {
    // generator and parser meet in the middle: for arbitrary dims the
    // decoded exact integer sum must equal the closed form the
    // payload was built from (stride padding and bottom-up row order
    // cancel only if BOTH sides honor them)
    forAll(Table(("id", "w", "h"),
      (1L, 1, 1), (7L, 2, 3), (17L, 17, 9), (23L, 33, 2),
      (40L, 5, 40), (99L, 64, 1))) { (id, w, h) =>
      val f = MultimodalOps.decodeBmp(id,
        MultimodalOps.syntheticBmp(id, w, h), 8)
      val expect = (for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        yield (id * 31 + 7L * x + 13L * y + 5L * c) % 256).sum
      assert(f.n_samples === w.toLong * h * 3)
      assert(f.value_sum === expect, s"bmp ${w}x$h id=$id")
    }
    forAll(Table(("id", "n"), (3L, 1), (11L, 17), (29L, 96), (5L, 640))) {
      (id, n) =>
      val f = MultimodalOps.decodeWav(id,
        MultimodalOps.syntheticWav(id, n), 8)
      val expect = (0 until n)
        .map(i => ((id * 31 + 7L * i) % 2048) - 1024).sum
      assert(f.n_samples === n.toLong)
      assert(f.value_sum === expect, s"wav n=$n id=$id")
    }
  }

  test("simhash is token-order-invariant and multiplicity-sensitive") {
    val rnd = new Random(77)
    val vocab = (0 until 20).map(i => s"t$i")
    (1 to 5).foreach { _ =>
      val toks = Seq.fill(8 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
      val shuffled = rnd.shuffle(toks)
      val df = Seq((1L, toks.mkString(" ")), (2L, shuffled.mkString(" ")))
        .toDF("id", "text")
      val sigs = df.select(DedupOps.simhash(col("text")))
        .as[Long].collect()
      // sign-sum is a commutative reduction over token hashes: any
      // permutation of the same multiset yields the same signature
      assert(sigs(0) === sigs(1), s"order changed simhash: $toks")
    }
    // multiplicity matters (frequency-weighted form): doubling a
    // token's count must be able to flip vote signs, unlike a
    // distinct-set simhash which would collapse the two
    val base = "a b c d e f g h"
    val heavy = "a a a a a a a a a a a a b c d e f g h"
    val two = Seq((1L, base), (2L, heavy)).toDF("id", "text")
      .select(DedupOps.simhash(col("text"))).as[Long].collect()
    assert(two(0) !== two(1), "multiplicity ignored by simhash")
  }
}

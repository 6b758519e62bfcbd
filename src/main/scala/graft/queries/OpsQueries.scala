package graft.queries

import org.apache.spark.sql.functions._
import graft.ops._

/** Correctness-gate queries for the LLM-data-pipeline extension
  * operators (dedup, similarity search, text analysis, multimodal) over
  * the `documents` / `embeddings` fixtures. Oracles are provided
  * wherever the computation is SQL-expressible in DuckDB; hash-based
  * operators (minhash/simhash/LSH) are deterministic but engine-defined,
  * so they get rows-only checks.
  */
object OpsQueries {
  import QueryDef.{scratch, table, fixture, tableFp, fixtureFresh,
    fixtureMark}
  import org.apache.spark.sql.{DataFrame, SparkSession}

  /** Planted near-dup protocol shared by every sim_* recall gate:
    * queries are every 10th corpus vector deterministically perturbed
    * (cos ≈ 0.99 to its source — far above the ~0.49 max cosine
    * between unrelated vectors here, so the source IS each query's
    * true nearest neighbor), qid = source vec_id + 1e6.
    * @return (src, queries, corpus)
    */
  private def plantedSim(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val e = table(s, dir, "embeddings")
    val src = e.filter(col("vec_id") % 10 === 0)
    val queries = src.select(
      (col("vec_id") + 1000000L).as("qid"),
      expr("transform(embedding, (x, i) -> " +
        "CAST(x * (1.0d + 0.15d * sin(vec_id * 31 + i)) AS FLOAT))")
        .as("vec"))
    val corpus = e.select(col("vec_id").as("id"),
      col("embedding").as("vec"))
    (src, queries, corpus)
  }

  /** Exact brute-force top-5 for the planted protocol, persisted as a
    * fixture keyed by the embeddings file fingerprint: the truth table
    * is a pure function of the corpus, so it is computed ONCE per
    * corpus and re-READ (the gates' requires still run against it
    * every time) instead of re-deriving the full O(queries × corpus)
    * scan inside every benchmarked gate run (VERDICT r11 #3).
    */
  private def exactTruth(s: SparkSession, dir: String): DataFrame = {
    val path = fixture("sim_exact_truth", dir)
    // the fingerprint binds the fixture to the corpus AND the
    // protocol parameters (k, perturbation formula version): editing
    // either must invalidate, not silently reuse
    val fp = tableFp(dir, "embeddings") + ":k=5:perturb=sin31-v1"
    if (!fixtureFresh(path, fp)) {
      graft.lake.LakeWriter.deleteRecursively(
        java.nio.file.Paths.get(path))
      val (_, queries, corpus) = plantedSim(s, dir)
      SimilarityOps.bruteForceTopK(queries, corpus, 5)
        .write.mode("overwrite").parquet(s"$path/truth")
      fixtureMark(path, fp)
    }
    s.read.parquet(s"$path/truth")
  }

  /** The persisted-IVF fixture path, built (nlist = 16) iff absent or
    * stale for the current corpus. The BUILD gate always rebuilds and
    * re-marks; the PROBE gate calls this and normally finds it fresh.
    */
  private def ensureIvfIndex(s: SparkSession, dir: String,
      force: Boolean = false): String = {
    val path = fixture("sim_ivf_index", dir)
    // corpus + build parameters: an nlist (or builder-protocol)
    // change must rebuild, never probe a mismatched persisted index
    val fp = tableFp(dir, "embeddings") + ":nlist=16:build=v1"
    if (force || !fixtureFresh(path, fp)) {
      graft.lake.LakeWriter.deleteRecursively(
        java.nio.file.Paths.get(path))
      val (_, _, corpus) = plantedSim(s, dir)
      SimilarityOps.buildIvfIndex(corpus, path, nlist = 16)
      fixtureMark(path, fp)
    }
    path
  }

  /** DuckDB replay of the deterministic IVF retrieval pipeline
    * (VERDICT r13 ask #3): centroids = first nlist corpus vectors by
    * id (the training-free quantizer [[graft.ops.SimilarityOps
    * .ivfTopK]] documents as oracle-friendly), assignment = per-vector
    * argmax cosine over the 16 centroids, probes = top-4 centroids
    * per query by (sim desc, cid asc), candidates scored at 6-decimal
    * rounding and ranked by (cos desc, id asc) — every step the Spark
    * side runs, re-derived in SQL. All cosine math runs over DOUBLE[]
    * casts to match Spark's double accumulation over float inputs.
    * The output (n_queries, n_found, recall) is tie-robust: planted
    * sources sit at cos ≈ 0.99 vs ≈ 0.3–0.49 for everything else, so
    * a last-ulp rounding flip deep in the ranking can never move a
    * source across the top-k boundary.
    *
    * `qExtra` narrows the query-source predicate; `candFilter`
    * filters the candidate set (the filtered-search gate).
    */
  private def ivfReplaySql(qExtra: String = "",
      candFilter: String = ""): String =
    s"""WITH emb AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v, label
       |  FROM embeddings
       |), cent AS (
       |  SELECT id AS cid, v AS cv FROM emb ORDER BY id LIMIT 16
       |), assign AS (
       |  SELECT e.id, any_value(e.label) AS label, any_value(e.v) AS v,
       |    arg_max(c.cid, list_cosine_similarity(e.v, c.cv)) AS cell
       |  FROM emb e CROSS JOIN cent c GROUP BY e.id
       |), q AS (
       |  SELECT vec_id + 1000000 AS qid,
       |    CAST(list_transform(embedding, (x, i) ->
       |      CAST(x * (1.0 + 0.15 * sin(vec_id * 31 + (i - 1)))
       |        AS FLOAT)) AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id % 10 = 0$qExtra
       |), probes AS (
       |  SELECT qid, qv, cid FROM (
       |    SELECT q.qid, q.qv, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
       |        list_cosine_similarity(q.qv, c.cv) DESC, c.cid ASC)
       |        AS pr
       |    FROM q CROSS JOIN cent c) WHERE pr <= 4
       |), cand AS (
       |  SELECT p.qid, a.id,
       |    ROUND(list_cosine_similarity(p.qv, a.v), 6) AS cos
       |  FROM probes p JOIN assign a ON a.cell = p.cid
       |  WHERE p.qid <> a.id$candFilter
       |), top AS (
       |  SELECT qid, id FROM (
       |    SELECT qid, id, ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, id ASC) AS rank FROM cand)
       |  WHERE rank <= 5
       |), agg AS (
       |  SELECT (SELECT count(*) FROM q) AS nq,
       |    (SELECT count(*) FROM top WHERE id = qid - 1000000) AS nf
       |)
       |SELECT CAST(nq AS BIGINT) AS n_queries,
       |  CAST(nf AS BIGINT) AS n_found,
       |  ROUND(nf * 1.0 / nq, 4) AS recall FROM agg""".stripMargin

  /** DuckDB replay of the FULL IVF-PQ pipeline (VERDICT r14 #6 —
    * collapses the gate's no_oracle): centroids/assignment exactly as
    * [[ivfReplaySql]]; the 256-row residual training sample by
    * md5-coordinate order (buildPqTables' selector, switched from
    * xxhash64 for exactly this replayability); per-subspace codebook
    * training UNROLLED — pqK−1 greedy farthest-point seeding rounds
    * then 3 Lloyd iterations, the [[bpeMergesReplaySql]] posture —
    * with Scala's exact tie rules (first max on seeding, first min on
    * assignment, empty Lloyd cluster keeps its center, per-dim means
    * cast through FLOAT); the distributed encode (argmin code per
    * subspace, reconstruction vhat, float-cast reconstruction norm);
    * ADC scoring dot(q, vhat)/(|q|·norm_hat) over the probed cells;
    * rerank-64 exact re-rank at 6-decimal rounding; top-k recall.
    * Tie-robustness: planted sources re-rank at cos ≈ 0.99 vs
    * ≈ 0.3–0.5 noise, so a last-ulp summation-order difference deep
    * in codebook training can shift individual codes but cannot move
    * a source across the rerank-64 or top-5 boundary.
    */
  private def pqReplaySql(pqM: Int = 8, pqK: Int = 16, dim: Int = 64,
      sampleN: Int = 256, nprobe: Int = 4, k: Int = 5,
      rerank: Int = 64): String = {
    val sub = dim / pqM
    // L2 over one subspace slice (double math over DOUBLE[] casts —
    // same values the Scala loop folds)
    def l2(a: String, b: String): String =
      s"list_sum(list_transform(range(1, ${sub + 1}), " +
        s"i -> ($a[i]-$b[i])*($a[i]-$b[i])))"
    val head = Seq(
      s"""emb AS MATERIALIZED (
         |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings)""".stripMargin,
      s"""cent AS MATERIALIZED (
         |  SELECT id AS cid, v AS cv FROM emb ORDER BY id LIMIT 16)"""
        .stripMargin,
      s"""assign AS MATERIALIZED (
         |  SELECT e.id, any_value(e.v) AS v,
         |    arg_max(c.cid, list_cosine_similarity(e.v, c.cv)) AS cell
         |  FROM emb e CROSS JOIN cent c GROUP BY e.id)""".stripMargin,
      s"""res AS MATERIALIZED (
         |  SELECT a.id, a.cell, a.v,
         |    list_transform(range(1, ${dim + 1}),
         |      i -> a.v[i] - c.cv[i]) AS r
         |  FROM assign a JOIN cent c ON c.cid = a.cell)""".stripMargin,
      s"""samp AS MATERIALIZED (
         |  SELECT mm.m, s.sidx,
         |    s.r[mm.m*$sub+1 : mm.m*$sub+$sub] AS sv
         |  FROM (SELECT r, ROW_NUMBER() OVER (
         |          ORDER BY md5(CAST(id AS VARCHAR)), id) AS sidx
         |        FROM res QUALIFY sidx <= $sampleN) s,
         |       (SELECT unnest(range(0, $pqM)) AS m) mm)""".stripMargin,
      """seeds1 AS MATERIALIZED (
        |  SELECT m, [sv] AS ss FROM samp WHERE sidx = 1)""".stripMargin)
    val seeding = (2 to pqK).map { j =>
      s"""seeds$j AS MATERIALIZED (
         |  SELECT m, list_append(ss, sv) AS ss FROM (
         |    SELECT t.m, s.ss, t.sv, ROW_NUMBER() OVER (
         |      PARTITION BY t.m ORDER BY
         |        list_min(list_transform(s.ss,
         |          c -> ${l2("t.sv", "c")})) DESC,
         |        t.sidx ASC) AS rk
         |    FROM samp t JOIN seeds${j - 1} s USING (m))
         |  WHERE rk = 1)""".stripMargin
    }
    val meanList = (1 to sub)
      .map(i => s"CAST(CAST(sum(sv[$i])/count(*) AS FLOAT) AS DOUBLE)")
      .mkString("[", ", ", "]")
    val lloyd = Seq(
      s"lloyd0 AS (SELECT m, ss AS cs FROM seeds$pqK)") ++
      (1 to 3).flatMap { j =>
        Seq(
          s"""asg$j AS (
             |  SELECT m, sidx, sv, list_indexof(dl, list_min(dl)) AS ci
             |  FROM (SELECT t.m, t.sidx, t.sv,
             |      list_transform(l.cs, c -> ${l2("t.sv", "c")}) AS dl
             |    FROM samp t JOIN lloyd${j - 1} l USING (m)))"""
            .stripMargin,
          s"""grp$j AS (
             |  SELECT m, ci, $meanList AS nc
             |  FROM asg$j GROUP BY m, ci)""".stripMargin,
          s"""lloyd$j AS MATERIALIZED (
             |  SELECT s.m, list(coalesce(g.nc, s.cs[kk.k])
             |    ORDER BY kk.k) AS cs
             |  FROM lloyd${j - 1} s
             |  CROSS JOIN (SELECT unnest(range(1, ${pqK + 1})) AS k) kk
             |  LEFT JOIN grp$j g ON g.m = s.m AND g.ci = kk.k
             |  GROUP BY s.m)""".stripMargin)
      }
    val tail = Seq(
      s"""pick AS MATERIALIZED (
         |  SELECT id, m, cs[list_indexof(dl, list_min(dl))] AS cc
         |  FROM (SELECT r.id, l.m, l.cs,
         |      list_transform(l.cs, c ->
         |        list_sum(list_transform(range(1, ${sub + 1}),
         |          i -> (r.r[l.m*$sub+i]-c[i])
         |             * (r.r[l.m*$sub+i]-c[i])))) AS dl
         |    FROM res r CROSS JOIN lloyd3 l))""".stripMargin,
      s"""pickagg AS MATERIALIZED (
         |  SELECT id, flatten(list(cc ORDER BY m)) AS rc
         |  FROM pick GROUP BY id)""".stripMargin,
      s"""encn AS MATERIALIZED (
         |  SELECT r.id, r.cell,
         |    list_transform(range(1, ${dim + 1}),
         |      i -> c.cv[i] + p.rc[i]) AS vhat
         |  FROM res r JOIN cent c ON c.cid = r.cell
         |  JOIN pickagg p ON p.id = r.id)""".stripMargin,
      s"""encn2 AS MATERIALIZED (
         |  SELECT id, cell, vhat,
         |    CAST(CAST(sqrt(list_sum(list_transform(vhat, x -> x*x)))
         |      AS FLOAT) AS DOUBLE) AS nh
         |  FROM encn)""".stripMargin,
      s"""q AS MATERIALIZED (
         |  SELECT vec_id + 1000000 AS qid,
         |    CAST(list_transform(embedding, (x, i) ->
         |      CAST(x * (1.0 + 0.15 * sin(vec_id * 31 + (i - 1)))
         |        AS FLOAT)) AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id % 10 = 0)""".stripMargin,
      s"""probes AS (
         |  SELECT qid, qv, cid FROM (
         |    SELECT q.qid, q.qv, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
         |        list_cosine_similarity(q.qv, c.cv) DESC, c.cid ASC)
         |        AS pr
         |    FROM q CROSS JOIN cent c) WHERE pr <= $nprobe)"""
        .stripMargin,
      s"""cand AS (
         |  SELECT p.qid, e.id,
         |    list_sum(list_transform(range(1, ${dim + 1}),
         |      i -> p.qv[i] * e.vhat[i])) /
         |      (sqrt(list_sum(list_transform(p.qv, x -> x*x))) * e.nh)
         |      AS approx
         |  FROM probes p JOIN encn2 e ON e.cell = p.cid
         |  WHERE p.qid <> e.id)""".stripMargin,
      s"""rr AS (
         |  SELECT qid, id FROM (
         |    SELECT qid, id, ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY approx DESC, id ASC) AS ar FROM cand)
         |  WHERE ar <= $rerank)""".stripMargin,
      s"""ex AS (
         |  SELECT rr.qid, rr.id,
         |    ROUND(list_cosine_similarity(q.qv, a.v), 6) AS cos
         |  FROM rr JOIN q ON q.qid = rr.qid
         |  JOIN assign a ON a.id = rr.id)""".stripMargin,
      s"""top AS (
         |  SELECT qid, id FROM (
         |    SELECT qid, id, ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY cos DESC, id ASC) AS rank FROM ex)
         |  WHERE rank <= $k)""".stripMargin,
      """agg AS (
        |  SELECT (SELECT count(*) FROM q) AS nq,
        |    (SELECT count(*) FROM top WHERE id = qid - 1000000) AS nf)"""
        .stripMargin)
    (head ++ seeding ++ lloyd ++ tail).mkString("WITH ", ",\n", "\n") +
      """SELECT CAST(nq AS BIGINT) AS n_queries,
        |  CAST(nf AS BIGINT) AS n_found,
        |  ROUND(nf * 1.0 / nq, 4) AS recall FROM agg""".stripMargin
  }

  /** The ±1 hyperplane component table of
    * [[graft.functions.HyperplaneBucket]] at bits=4 over 64 dims,
    * embedded as a SQL literal: component (p, i) is the parity of
    * XXH64(i, seed = p) — the SAME deterministic hash the Catalyst
    * expression evaluates, emitted here once so DuckDB re-derives
    * buckets from plain arithmetic without a compatible xxhash64.
    */
  private lazy val lshSignsLiteral: String =
    (0 until 4).map { p =>
      (0 until 64).map { i =>
        if ((org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(i.toLong, p.toLong) & 1L) == 1L) "1.0" else "-1.0"
      }.mkString("[", ",", "]")
    }.mkString("[", ",", "]")

  /** The 4-bit hyperplane bucket of `vec` as DuckDB arithmetic over
    * the embedded sign table — shared by the LSH recall and top-k
    * replays so the two oracles can never drift.
    */
  private def lshBucketExpr(vec: String): String =
    (0 until 4).map { p =>
      s"(CASE WHEN list_sum(list_transform(range(1, 65), i -> " +
        s"$vec[i] * m[${p + 1}][i])) >= 0 " +
        s"THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")

  /** DuckDB replay of the LSH TOP-K pipeline itself (row-level, the
    * sim_bruteforce_topk precedent): same bucket/multiprobe/join
    * chain as [[lshReplaySql]], queries = the first 10 corpus vectors
    * verbatim, output = the (qid, rank, neighbor_id, cos) rows at
    * 6-decimal rounding with the id tiebreak — deterministic on both
    * engines, so the hash gate applies to the actual result rows, not
    * just a recall aggregate.
    */
  private def lshTopKReplaySql(k: Int = 5): String = {
    def bucketExpr(vec: String): String = lshBucketExpr(vec)
    s"""WITH s AS (SELECT $lshSignsLiteral AS m),
       |emb AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings
       |), cb AS (
       |  SELECT id, v, ${bucketExpr("v")} AS bucket FROM emb, s
       |), q AS (
       |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id < 10
       |), qb AS (
       |  SELECT qid, qv, ${bucketExpr("qv")} AS base FROM q, s
       |), probes AS (
       |  SELECT qid, qv, unnest([base, xor(base, 1), xor(base, 2),
       |    xor(base, 4), xor(base, 8)]) AS bucket
       |  FROM qb
       |), cand AS (
       |  SELECT p.qid, c.id,
       |    ROUND(list_cosine_similarity(p.qv, c.v), 6) AS cos
       |  FROM probes p JOIN cb c ON c.bucket = p.bucket
       |  WHERE p.qid <> c.id
       |)
       |SELECT qid, CAST(rank AS INTEGER) AS rank, id AS neighbor_id,
       |  cos FROM (
       |  SELECT qid, id, cos, ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY cos DESC, id ASC) AS rank FROM cand)
       |WHERE rank <= $k""".stripMargin
  }

  /** DuckDB replay of the hyperplane-LSH retrieval pipeline: 4 sign
    * bits per vector (dot with the embedded ±1 hyperplanes, double
    * accumulation in element order — bit-compatible with the codegen
    * loop), Hamming-1 multi-probe (base ∪ base⊕2^b), bucket-join,
    * 6-decimal cosine ranking. Same tie-robustness argument as
    * [[ivfReplaySql]].
    */
  private def lshReplaySql: String = {
    def bucketExpr(vec: String): String = lshBucketExpr(vec)
    s"""WITH s AS (SELECT $lshSignsLiteral AS m),
       |emb AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings
       |), cb AS (
       |  SELECT id, v, ${bucketExpr("v")} AS bucket FROM emb, s
       |), q AS (
       |  SELECT vec_id + 1000000 AS qid,
       |    CAST(list_transform(embedding, (x, i) ->
       |      CAST(x * (1.0 + 0.15 * sin(vec_id * 31 + (i - 1)))
       |        AS FLOAT)) AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id % 10 = 0
       |), qb AS (
       |  SELECT qid, qv, ${bucketExpr("qv")} AS base FROM q, s
       |), probes AS (
       |  SELECT qid, qv, unnest([base, xor(base, 1), xor(base, 2),
       |    xor(base, 4), xor(base, 8)]) AS bucket
       |  FROM qb
       |), cand AS (
       |  SELECT p.qid, c.id,
       |    ROUND(list_cosine_similarity(p.qv, c.v), 6) AS cos
       |  FROM probes p JOIN cb c ON c.bucket = p.bucket
       |  WHERE p.qid <> c.id
       |), top AS (
       |  SELECT qid, id FROM (
       |    SELECT qid, id, ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, id ASC) AS rank FROM cand)
       |  WHERE rank <= 5
       |), agg AS (
       |  SELECT (SELECT count(*) FROM q) AS nq,
       |    (SELECT count(*) FROM top WHERE id = qid - 1000000) AS nf
       |)
       |SELECT CAST(nq AS BIGINT) AS n_queries,
       |  CAST(nf AS BIGINT) AS n_found,
       |  ROUND(nf * 1.0 / nq, 4) AS recall FROM agg""".stripMargin
  }

  /** DuckDB replay of the FULL 16-round BPE training arg-max sequence
    * (VERDICT r13 ask #3): each round re-derives the weighted
    * adjacent-pair counts, picks the (freq desc, left asc, right asc)
    * arg-max, and applies the merge — so the oracle hash-checks the
    * whole greedy trajectory, not a summary. Word symbol streams ride
    * as strings with DOUBLE chr(31) boundaries ("␟␟a␟␟b␟␟"): the
    * merge step is then one `replace` of ␟l␟␟r␟ → ␟lr␟, whose
    * left-to-right non-overlapping semantics equal mergePair's
    * adjacent fusion, the single-␟ pattern edges anchor on symbol
    * boundaries (a pair can never match a symbol's SUFFIX), and the
    * shared middle boundary lets back-to-back occurrences ("aaa" with
    * a+a) fuse exactly like the sequential reference. CTEs are
    * MATERIALIZED: round k reads w(k-1) twice, and without pinning,
    * inlining doubles the plan per round — 2^16 by round 16. minFreq
    * early-stop falls out of monotonicity: the best pair's frequency
    * never increases round-over-round, so filtering emitted rows at
    * freq >= 2 reproduces the trainer's stop exactly.
    */
  private def bpeMergesReplaySql(numMerges: Int = 16): String = {
    val B = "chr(31)"
    val head = Seq(
      """wf AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS f
        |  FROM (SELECT unnest(list_filter(string_split_regex(text, '\s+'),
        |      x -> len(x) > 0)) AS word
        |    FROM documents) GROUP BY word)""".stripMargin,
      s"""w0 AS MATERIALIZED (SELECT $B||$B ||
         |  array_to_string(list_append(string_split(word, ''), '</w>'),
         |    $B||$B) || $B||$B AS w, f FROM wf)""".stripMargin)
    val rounds = (1 to numMerges).flatMap { k =>
      Seq(
        s"""b$k AS MATERIALIZED (SELECT l, r, bf FROM (
           |    SELECT sy[j] AS l, sy[j+1] AS r, sum(f) AS bf
           |    FROM (SELECT list_filter(string_split(w, $B||$B),
           |        x -> x <> '') AS sy, f FROM w${k - 1}),
           |      UNNEST(range(1, len(sy))) AS u(j)
           |    GROUP BY 1, 2)
           |  ORDER BY bf DESC, l ASC, r ASC LIMIT 1)""".stripMargin,
        s"""w$k AS MATERIALIZED (SELECT CASE WHEN b.bf >= 2 THEN
           |    replace(p.w, $B||b.l||$B||$B||b.r||$B, $B||b.l||b.r||$B)
           |    ELSE p.w END AS w, p.f AS f
           |  FROM w${k - 1} p LEFT JOIN b$k b ON TRUE)""".stripMargin)
    }
    val sel = (1 to numMerges).map { k =>
      s"""SELECT CAST($k AS INTEGER) AS rank, l AS "left", """ +
        s"""r AS "right", CAST(bf AS BIGINT) AS freq FROM b$k """ +
        "WHERE bf >= 2"
    }.mkString("\nUNION ALL\n")
    "WITH " + (head ++ rounds).mkString(",\n") + "\n" + sel
  }

  /** The trained BPE merge list as a corpus-fingerprinted fixture:
    * training is a pure function of the corpus and its parameters, so
    * it runs ONCE per corpus generation and the encode gate reads the
    * kilobyte merge table back — the steady-state shape at 100 TB,
    * where a tokenizer is trained rarely and applied constantly.
    * text_bpe_merges still re-trains every run; that is its job.
    */
  private def ensureBpeMerges(s: SparkSession, dir: String)
      : Seq[(String, String)] = {
    val path = fixture("bpe_merges", dir)
    val fp = tableFp(dir, "documents") + ":m=16:minFreq=2:parts=4:v1"
    if (!fixtureFresh(path, fp)) {
      graft.lake.LakeWriter.deleteRecursively(
        java.nio.file.Paths.get(path))
      BpeOps.trainBpeMerges(table(s, dir, "documents"), "text",
          numMerges = 16, minFreq = 2, vocabPartitions = 4)
        .write.mode("overwrite").parquet(s"$path/merges")
      fixtureMark(path, fp)
    }
    s.read.parquet(s"$path/merges").orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
  }

  /** Driver-side fixture payloads built in PARALLEL (guide §1.2 "the
    * distributed algorithm" applied to the driver too): the neardup
    * gates synthesize 128 media payloads per run, and the video gate's
    * 65-frame clips cost 65 JPEG encodes each — 8,320 serial ImageIO
    * encodes was the single largest leg of its bench time. Each `gen`
    * call is independent and allocates its own encoder (flatJpeg and
    * friends construct a fresh writer per call), so a parallel stream
    * produces byte-identical payloads in deterministic index order;
    * only WHEN each payload is built changes, never its bytes.
    */
  private def parPayloads(n: Int, base: Long)(gen: Int => Array[Byte])
      : Seq[(Long, Array[Byte])] = {
    val out = new Array[Array[Byte]](n)
    java.util.stream.IntStream.range(0, n).parallel()
      .forEach(i => out(i) = gen(i))
    (0 until n).map(i => (base + i, out(i)))
  }

  /** The multimodal_frames payload table (animated GIF / multi-page
    * TIFF per doc, closed-form pixels) as a corpus-fingerprinted
    * fixture: built once per corpus generation, so the gate's timed
    * leg measures the multi-frame DECODE, not 5k GIF encodes.
    */
  private def ensureFrameFixtures(s: SparkSession, dir: String): String = {
    import s.implicits._
    val path = fixture("frame_media", dir)
    val fp = tableFp(dir, "documents") + ":17x9:f=2+id%3:v1"
    if (!fixtureFresh(path, fp)) {
      graft.lake.LakeWriter.deleteRecursively(
        java.nio.file.Paths.get(path))
      table(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val frames = (2 + id % 3).toInt
          if (id % 2 == 0)
            (id, MultimodalOps.syntheticAnimatedGif(id, 17, 9, frames),
              "image/gif")
          else
            (id, MultimodalOps.syntheticMultipageTiff(id, 17, 9, frames),
              "image/tiff")
        }).toDF("media_id", "media", "format")
        .write.mode("overwrite").parquet(s"$path/media")
      fixtureMark(path, fp)
    }
    s"$path/media"
  }

  /** The multimodal_video payload table (Motion-JPEG AVI clips on
    * even ids, G.711 μ-law WAVs on odd) as a corpus-fingerprinted
    * fixture — encoding 5k AVI containers is ingest-side work the
    * decode benchmark must not clock.
    */
  private def ensureVideoFixtures(s: SparkSession, dir: String): String = {
    import s.implicits._
    val path = fixture("video_media", dir)
    val fp = tableFp(dir, "documents") + ":avi16x16:f=2+id%3:ulaw:v1"
    if (!fixtureFresh(path, fp)) {
      graft.lake.LakeWriter.deleteRecursively(
        java.nio.file.Paths.get(path))
      table(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          if (id % 2 == 0)
            (id, MultimodalOps.syntheticMjpegAvi(id, 16, 16,
              (2 + id % 3).toInt), "video/avi")
          else
            (id, MultimodalOps.syntheticUlawWav(id,
              (64 + id % 32).toInt), "audio/wav")
        }).toDF("media_id", "media", "format")
        .write.mode("overwrite").parquet(s"$path/media")
      fixtureMark(path, fp)
    }
    s"$path/media"
  }

  /** The label-carrying IVF index of the filtered-search gate as a
    * corpus-fingerprinted fixture — built once per corpus so the
    * gate's timed leg is the filtered PROBE, the steady-state op.
    */
  private def ensureFilteredIvfIndex(s: SparkSession, dir: String)
      : String = {
    val path = fixture("sim_ivf_filtered_index", dir)
    val fp = tableFp(dir, "embeddings") + ":nlist=16:carry=label:v1"
    if (!fixtureFresh(path, fp)) {
      graft.lake.LakeWriter.deleteRecursively(
        java.nio.file.Paths.get(path))
      val corpus = table(s, dir, "embeddings").select(
        col("vec_id").as("id"), col("embedding").as("vec"), col("label"))
      SimilarityOps.buildIvfIndex(corpus, path, nlist = 16,
        carryCols = Seq("label"))
      fixtureMark(path, fp)
    }
    path
  }

  /** Corpus-fingerprint-keyed PQ index fixture: same build/probe split
    * rule the plain-IVF gates follow (`sim_ivf_index_build` times the
    * build; probes are the steady-state workload). Rebuilding the PQ
    * tables per bench run made `sim_ivf_pq_recall`'s clock ~70% build
    * (codebook training + the encode pass) — the r13 timed-leg-hygiene
    * disease, one gate later.
    */
  private def ensurePqIvfIndex(s: SparkSession, dir: String): String = {
    val path = fixture("sim_ivf_pq_index", dir)
    val fp = tableFp(dir, "embeddings") + ":nlist=16:pqM=8:pqK=16:v2"
    if (!fixtureFresh(path, fp)) {
      graft.lake.LakeWriter.deleteRecursively(
        java.nio.file.Paths.get(path))
      val corpus = table(s, dir, "embeddings").select(
        col("vec_id").as("id"), col("embedding").as("vec"))
      val t0 = System.nanoTime()
      SimilarityOps.buildIvfIndex(corpus, path, nlist = 16,
        pq = true, pqM = 8, pqK = 16)
      System.err.println(f"[fixture] sim_ivf_pq_index built in " +
        f"${(System.nanoTime() - t0) / 1e9}%.3fs")
      fixtureMark(path, fp)
    }
    path
  }

  /** Corpus-fingerprint-keyed minhash signature store (the persisted
    * half of `dedup_incremental_minhash`): signatures of the even-id
    * half of `documents`. Immutable — the gate probes with
    * `appendKept = false`; store growth is suite-covered.
    */
  private def ensureMinhashStore(s: SparkSession, dir: String): String = {
    val path = fixture("dedup_mh_store", dir)
    val fp = tableFp(dir, "documents") + ":even:nh=32:n=3:v1"
    if (!fixtureFresh(path, fp)) {
      graft.lake.LakeWriter.deleteRecursively(
        java.nio.file.Paths.get(path))
      DedupOps.buildMinhashStore(
        table(s, dir, "documents").filter("doc_id % 2 = 0"),
        "text", "doc_id", path)
      fixtureMark(path, fp)
    }
    path
  }

  /** The Gopher rule metrics as ONE DuckDB CTE chain (`sp` → `m`),
    * shared by the batch gate here and the streaming gate in
    * [[PipelineQueries]] — a threshold or rule expression edits in
    * exactly one place, so the two oracles can never drift from each
    * other. Tokenization is `string_split_regex(text, '\s+')` to
    * match [[graft.ops.TextOps.tokens]] on tabs/newlines, same as
    * every other tokens()-based oracle in this file.
    */
  private[queries] val GOPHER_METRICS_SQL: String =
    """WITH sp AS (
      |  SELECT doc_id, text,
      |    list_filter(string_split_regex(text, '\s+'),
      |                w -> len(w) > 0) AS w
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    CAST(len(w) AS BIGINT) AS n_words,
      |    round(list_sum(list_transform(w, x -> len(x))) * 1.0
      |      / len(w), 4) AS mean_word_len,
      |    round(((len(text) - len(replace(text, '#', ''))) +
      |      (len(text) - len(replace(text, '...', ''))) / 3) * 1.0
      |      / len(w), 4) AS symbol_word_ratio,
      |    round(list_sum(list_transform(w, x ->
      |        CASE WHEN regexp_matches(x, '[a-zA-Z]')
      |             THEN 1 ELSE 0 END)) * 1.0 / len(w), 4)
      |      AS alpha_word_frac,
      |    CAST(list_sum(list_transform(w, x ->
      |        CASE WHEN lower(x) IN ('the','be','to','of','and',
      |          'that','have','with') THEN 1 ELSE 0 END))
      |      AS BIGINT) AS stopword_hits
      |  FROM sp)""".stripMargin

  /** The DSIR weights pipeline as a DuckDB CTE chain ending in
    * `w(doc_id, n_feats, log_weight)` — md5-bucketed unigram+bigram
    * distributions, add-1 smoothing over 1024 buckets,
    * log-likelihood-ratio sums (target = the corpus's English docs).
    * Shared by the weights gate and the Gumbel-top-k selection gate so
    * the two oracles can never drift.
    */
  private[queries] val DSIR_WEIGHTS_CTES: String =
    """sp AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS s
      |  FROM documents),
      |rawf AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(f),1,8))::BIGINT % 1024 AS b
      |  FROM (SELECT doc_id, unnest(s || list_transform(
      |      range(1, len(s)), i -> s[i] || ' ' || s[i+1])) AS f
      |    FROM sp)),
      |tgtf AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5(f),1,8))::BIGINT % 1024 AS b
      |  FROM (SELECT doc_id, unnest(s || list_transform(
      |      range(1, len(s)), i -> s[i] || ' ' || s[i+1])) AS f
      |    FROM sp WHERE lang = 'en')),
      |db AS (SELECT doc_id, b, count(*) AS c
      |       FROM rawf GROUP BY doc_id, b),
      |rc AS (SELECT b, sum(c) AS cr FROM db GROUP BY b),
      |tc AS (SELECT b, count(*) AS ct FROM tgtf GROUP BY b),
      |tot AS (SELECT (SELECT sum(cr) FROM rc) AS tr,
      |               (SELECT sum(ct) FROM tc) AS tt),
      |ratio AS (
      |  SELECT rc.b,
      |    ln((coalesce(tc.ct, 0) + 1.0) / (tot.tt + 1024.0)) -
      |    ln((rc.cr + 1.0) / (tot.tr + 1024.0)) AS lr
      |  FROM rc LEFT JOIN tc USING (b), tot),
      |w AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_feats,
      |    round(sum(c * lr), 4) AS log_weight
      |  FROM db JOIN ratio USING (b)
      |  GROUP BY doc_id)""".stripMargin

  /** The pass conjunction over the `m` CTE's columns. */
  private[queries] val GOPHER_PASS_SQL: String =
    """n_words BETWEEN 50 AND 100000
      |  AND mean_word_len BETWEEN 3.0 AND 10.0
      |  AND symbol_word_ratio <= 0.1
      |  AND alpha_word_frac >= 0.8
      |  AND stopword_hits >= 2""".stripMargin

  /** The text_repetition_signals oracle: every one of the 13 Gopher
    * repetition fractions replayed in DuckDB over the SAME derived
    * text the Spark gate builds. Generated per n so the 9 n-gram
    * replays cannot drift from each other: positions → joined n-gram
    * (`w[i+1:i+n]`), per-doc counts, the (c DESC, g ASC) argmax for
    * top-{2,3,4}, and the DISTINCT positional union of repeated-gram
    * spans for {5..10}.
    */
  private[queries] val repetitionSignalsOracle: String = {
    def posCte(n: Int) =
      s"""g$n AS (
         |  SELECT doc_id, i, array_to_string(w[i+1:i+$n], ' ') AS g
         |  FROM words,
         |    UNNEST(range(0, greatest(len(w) - ${n - 1}, 0))) AS r$n(i)),
         |g${n}c AS (
         |  SELECT doc_id, g, count(*) AS c FROM g$n GROUP BY doc_id, g)"""
        .stripMargin
    def topCte(n: Int) =
      s"""top$n AS (
         |  SELECT q.doc_id,
         |    CASE WHEN c < 2 THEN 0.0
         |      ELSE (c * (len(g) - ${n - 1})) * 1.0 / tot END AS f
         |  FROM (SELECT doc_id, g, c,
         |          row_number() OVER (PARTITION BY doc_id
         |            ORDER BY c DESC, g ASC) AS rn
         |        FROM g${n}c) q JOIN totals USING (doc_id)
         |  WHERE rn = 1)""".stripMargin
    def covCte(n: Int) =
      s"""d$n AS (
         |  SELECT doc_id, g FROM g${n}c WHERE c > 1),
         |cov$n AS (
         |  SELECT DISTINCT a.doc_id, j
         |  FROM g$n a JOIN d$n USING (doc_id, g),
         |    UNNEST(range(a.i, a.i + $n)) AS c$n(j)),
         |f$n AS (
         |  SELECT cov$n.doc_id, sum(len(w[j+1])) AS s
         |  FROM cov$n JOIN words USING (doc_id)
         |  GROUP BY cov$n.doc_id)""".stripMargin
    def segCtes(tag: String, sep: String) =
      s"""${tag}seg AS (
         |  SELECT doc_id, s FROM t,
         |    UNNEST(list_filter(string_split(tx, $sep), x -> len(x) > 0))
         |      AS u$tag(s)),
         |${tag}grp AS (
         |  SELECT doc_id, s, count(*) AS c, len(s) AS l
         |  FROM ${tag}seg GROUP BY doc_id, s),
         |${tag}stat AS (
         |  SELECT doc_id,
         |    sum(c - 1) * 1.0 / sum(c) AS df,
         |    CASE WHEN sum(c * l) = 0 THEN 0.0
         |      ELSE sum(CASE WHEN c > 1 THEN (c - 1) * l ELSE 0 END) * 1.0
         |        / sum(c * l) END AS dcf
         |  FROM ${tag}grp GROUP BY doc_id)""".stripMargin
    val ns = 2 to 10
    s"""WITH t AS MATERIALIZED (
       |  SELECT doc_id,
       |    text || chr(10) || substr(text, 1, 40)
       |      || chr(10) || chr(10) || substr(text, 1, 40)
       |      || chr(10) || chr(10) || substr(text, 1, 40) AS tx
       |  FROM documents),
       |${segCtes("l", "chr(10)")},
       |${segCtes("p", "chr(10) || chr(10)")},
       |words AS MATERIALIZED (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(tx, '\\s+'),
       |                x -> len(x) > 0) AS w
       |  FROM t),
       |totals AS (
       |  SELECT doc_id, list_sum(list_transform(w, x -> len(x))) AS tot
       |  FROM words),
       |${ns.map(posCte).mkString(",\n")},
       |${Seq(2, 3, 4).map(topCte).mkString(",\n")},
       |${(5 to 10).map(covCte).mkString(",\n")}
       |SELECT t.doc_id,
       |  round(lstat.df, 4) AS dup_line_frac,
       |  round(lstat.dcf, 4) AS dup_line_char_frac,
       |  round(pstat.df, 4) AS dup_para_frac,
       |  round(pstat.dcf, 4) AS dup_para_char_frac,
       |${Seq(2, 3, 4).map(n =>
            s"  round(coalesce(top$n.f, 0), 4) AS top${n}gram_char_frac,")
          .mkString("\n")}
       |${(5 to 10).map(n =>
            s"  round(coalesce(f$n.s * 1.0 / totals.tot, 0), 4)" +
              s" AS dup${n}gram_char_frac").mkString(",\n")}
       |FROM t
       |JOIN lstat USING (doc_id)
       |JOIN pstat USING (doc_id)
       |JOIN totals USING (doc_id)
       |${Seq(2, 3, 4).map(n => s"LEFT JOIN top$n USING (doc_id)")
          .mkString("\n")}
       |${(5 to 10).map(n => s"LEFT JOIN f$n ON f$n.doc_id = t.doc_id")
          .mkString("\n")}""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(

    // Text analysis: token counts + quality score per language.
    QueryDef("text_quality_stats",
      (s, dir) => {
        val d = table(s, dir, "documents")
        d.withColumn("n_tokens", TextOps.tokenCount(col("text")))
          .withColumn("quality",
            TextOps.qualityScore(col("text"), col("n_chars")))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            round(avg("quality"), 4).as("avg_quality"))
      },
      Some("""WITH scored AS (
             |  SELECT lang,
             |    len(string_split(text, ' ')) AS n_tokens,
             |    LEAST(len(string_split(text, ' ')) / 50.0, 1.0)
             |      * (CASE WHEN (n_chars - len(string_split(text, ' ')) + 1.0) / len(string_split(text, ' '))
             |              BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
             |      AS quality
             |  FROM documents)
             |SELECT lang, COUNT(*) AS n_docs,
             |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             |  ROUND(AVG(ROUND(quality, 4)), 4) AS avg_quality
             |FROM scored GROUP BY lang""".stripMargin)),

    // Per-doc token accounting (exact + BPE-ish estimate).
    QueryDef("text_token_counts",
      (s, dir) => table(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          TextOps.bpeTokenEstimate(col("text")).as("bpe_estimate")),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
             |  CAST(len(string_split(text, ' ')) + (length(text) // 24) AS BIGINT) AS bpe_estimate
             |FROM documents""".stripMargin)),

    // Language-ID heuristic. The whole decision rule — per-language
    // stopword-hit counts, argmax with alphabetical tiebreak, "und" on
    // zero hits — is deterministic and closed-form, so the oracle
    // replays it exactly in DuckDB (round-5: was rows-only).
    QueryDef("text_lang_id",
      (s, dir) => TextOps.langId(
        table(s, dir, "documents"), "text")
        .select("doc_id", "lang", "lang_guess"),
      Some("""WITH s AS (
             |  SELECT doc_id, lang,
             |    len(list_filter(string_split_regex(text, '\s+'),
             |      x -> x IN ('der','die','das','und','zu','in','ist','ein'))) AS score_de,
             |    len(list_filter(string_split_regex(text, '\s+'),
             |      x -> x IN ('the','a','of','and','to','in','is','that'))) AS score_en,
             |    len(list_filter(string_split_regex(text, '\s+'),
             |      x -> x IN ('el','la','de','y','que','en','un','es'))) AS score_es,
             |    len(list_filter(string_split_regex(text, '\s+'),
             |      x -> x IN ('le','la','de','et','que','en','un','est'))) AS score_fr,
             |    len(list_filter(string_split_regex(text, '\s+'),
             |      x -> x IN ('的','了','是','在','我','有','和','不'))) AS score_zh
             |  FROM documents)
             |SELECT doc_id, lang,
             |  CASE WHEN GREATEST(score_de, score_en, score_es, score_fr, score_zh) <= 0
             |       THEN 'und'
             |       WHEN score_de >= score_en AND score_de >= score_es
             |        AND score_de >= score_fr AND score_de >= score_zh THEN 'de'
             |       WHEN score_en >= score_es AND score_en >= score_fr
             |        AND score_en >= score_zh THEN 'en'
             |       WHEN score_es >= score_fr AND score_es >= score_zh THEN 'es'
             |       WHEN score_fr >= score_zh THEN 'fr'
             |       ELSE 'zh' END AS lang_guess
             |FROM s""".stripMargin)),

    // Deterministic uniform sample: md5-of-key threshold (26/256
    // ≈ 10%). Reproducible in any engine with md5 — the property that
    // makes corpus samples auditable and joinable across tables.
    QueryDef("text_sample_hash",
      (s, dir) => SampleOps.hashSample(
        table(s, dir, "documents"), "doc_id", pct256 = 26)
        .select(col("doc_id"), col("lang")),
      Some("""SELECT doc_id, lang FROM documents
             |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'""".stripMargin)),

    // Deterministic stratified sample: smallest-md5 20 docs per lang.
    QueryDef("text_sample_stratified",
      (s, dir) => SampleOps.stratifiedSample(
        table(s, dir, "documents"), "lang", "doc_id", perStratum = 20)
        .select(col("doc_id"), col("lang")),
      Some("""SELECT doc_id, lang FROM documents
             |QUALIFY ROW_NUMBER() OVER (PARTITION BY lang
             |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 20""".stripMargin)),

    // Deterministic global shuffle for training export: (shard, pos)
    // coordinates from md5(id) — the reproducible data order an LLM
    // training run reads. No global sort: one hash shuffle per shard,
    // each shard ranks independently. The oracle replays the exact
    // permutation, so the full coordinate assignment hash-matches.
    QueryDef("text_shuffle_shards",
      (s, dir) => SampleOps.shuffleToShards(
        table(s, dir, "documents"), "doc_id", nShards = 16),
      Some("""WITH c AS (SELECT doc_id,
             |    md5(CAST(doc_id AS VARCHAR)) AS h,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
             |      ::BIGINT % 16 AS shard
             |  FROM documents)
             |SELECT doc_id, shard,
             |  CAST(row_number() OVER (PARTITION BY shard
             |    ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
             |FROM c""".stripMargin)),

    // Data-mixing quota sample: per-source keep rates (books-like
    // src0 kept whole, web-like src1 at ~25%, src2 at ~6%; every
    // OTHER source dropped — unlisted domains must not leak in).
    QueryDef("text_quota_sample",
      (s, dir) => SampleOps.quotaSample(
        table(s, dir, "documents"), "source", "doc_id",
        quotas = Map("src0" -> 256, "src1" -> 64, "src2" -> 16))
        .select(col("doc_id"), col("source")),
      Some("""SELECT doc_id, source FROM documents
             |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
             |  CASE source WHEN 'src0' THEN 'zz'
             |              WHEN 'src1' THEN '40'
             |              WHEN 'src2' THEN '10'
             |              ELSE NULL END""".stripMargin)),

    // Token-budget domain mixing (round 10, DoReMi-style): rates are
    // DERIVED from measured per-lang token totals against a target
    // share + a 40%-of-corpus budget — 'de' is over-targeted so its
    // rate caps at 1 (whole domain kept, never upsampled), en/fr/es
    // downsample to their budgets, zh is unlisted and must vanish.
    // Fully hash-deterministic, so the oracle replays the exact
    // selection.
    QueryDef("text_token_budget_mix",
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            TextOps.tokenCount(col("text")).as("n_tokens"))
        val total = docs.agg(sum("n_tokens")).head.getLong(0)
        SampleOps.tokenBudgetMix(docs, "lang", "doc_id", "n_tokens",
          targetShares = Map(
            "en" -> 0.25, "de" -> 0.5, "fr" -> 0.15, "es" -> 0.10),
          budgetTokens = (0.4 * total).toLong)
          .select(col("doc_id"), col("lang"), col("n_tokens"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, lang,
             |    CAST(len(string_split_regex(text, '\s+')) AS INTEGER)
             |      AS n_tokens
             |  FROM documents),
             |total AS (
             |  SELECT CAST(FLOOR(0.4 * SUM(n_tokens)) AS BIGINT)
             |    AS budget FROM toks),
             |rates AS (
             |  SELECT lang,
             |    LEAST(1.0,
             |      (CAST((SELECT budget FROM total) AS DOUBLE) * share)
             |        / tok) AS rate
             |  FROM (
             |    SELECT lang,
             |      CASE lang WHEN 'en' THEN 0.25 WHEN 'de' THEN 0.5
             |                WHEN 'fr' THEN 0.15 WHEN 'es' THEN 0.10
             |      END AS share,
             |      CAST(SUM(n_tokens) AS DOUBLE) AS tok
             |    FROM toks GROUP BY lang)
             |  WHERE share IS NOT NULL)
             |SELECT t.doc_id, t.lang, t.n_tokens
             |FROM toks t JOIN rates r ON t.lang = r.lang
             |WHERE substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 4) <
             |    CASE WHEN r.rate >= 1.0 THEN 'zzzz'
             |         ELSE printf('%04x',
             |           CAST(FLOOR(r.rate * 65536.0) AS INT)) END"""
        .stripMargin)),

    // PII scrub: plant one email + one phone per doc, redact, count.
    QueryDef("text_pii_redact",
      (s, dir) => {
        val planted = table(s, dir, "documents")
          .withColumn("text", concat(col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        TextOps.redactPii(planted, "text")
          .select(col("doc_id"), col("n_emails"), col("n_phones"),
            length(col("text")).as("redacted_len"))
      },
      Some("""WITH planted AS (
             |  SELECT doc_id,
             |    text || ' contact user' || CAST(doc_id AS VARCHAR)
             |      || '@example.com or 555-'
             |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
             |  CAST(len(regexp_extract_all(text,
             |    '\b[0-9]{3}-[0-9]{4}\b')) AS INTEGER) AS n_phones,
             |  CAST(length(regexp_replace(regexp_replace(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\b[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g')) AS INTEGER) AS redacted_len
             |FROM planted""".stripMargin)),

    // Repetition / boilerplate: duplicate-token fraction per doc.
    QueryDef("text_repetition",
      (s, dir) => TextOps.repetitionStats(
        table(s, dir, "documents"), "text")
        .select("doc_id", "n_tokens", "n_distinct", "dup_ratio"),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
             |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
             |  ROUND(1.0 - len(list_distinct(string_split(text, ' ')))
             |    / len(string_split(text, ' ')), 4) AS dup_ratio
             |FROM documents""".stripMargin)),

    // The full Gopher repetition battery (Rae et al. 2021 §A1.1) —
    // duplicate line/paragraph fractions, top-{2,3,4}-gram char
    // fractions, duplicate-{5..10}-gram positional-coverage char
    // fractions — over a text with REAL line/paragraph/repeat
    // structure derived closed-form from each doc (its own 40-char
    // prefix appended as one duplicate line + two duplicate
    // paragraphs), so both engines build the identical input and the
    // oracle replays every signal: per-value duplicate counts, the
    // (count DESC, ngram ASC) argmax, and the DISTINCT positional
    // union of repeated n-gram spans. All divisions are
    // integer-numerator-first in both engines — doubles match
    // bit-for-bit before the round(4).
    QueryDef("text_repetition_signals",
      (s, dir) => {
        val p = substring(col("text"), 1, 40)
        val tx = concat(col("text"), lit("\n"), p,
          lit("\n\n"), p, lit("\n\n"), p)
        TextOps.gopherRepetition(
          table(s, dir, "documents").select(col("doc_id"), tx.as("text")),
          "text")
          .select(("doc_id" +:
            graft.functions.RepetitionSignals.fieldNames).map(col): _*)
      },
      Some(repetitionSignalsOracle)),

    // Corpus heavy hitters: top-20 trigrams, deterministic tiebreak.
    QueryDef("text_top_ngrams",
      (s, dir) => TextOps.topNgrams(
        table(s, dir, "documents"), "text", n = 3, k = 20),
      Some("""SELECT ngram, COUNT(*) AS freq FROM (
             |  SELECT unnest(list_transform(
             |    range(1, len(string_split(text, ' ')) - 1),
             |    i -> array_to_string(
             |      list_slice(string_split(text, ' '), i, i + 2), ' '))) AS ngram
             |  FROM documents
             |  WHERE len(string_split(text, ' ')) >= 3)
             |GROUP BY ngram ORDER BY freq DESC, ngram LIMIT 20""".stripMargin)),

    // Okapi BM25 against a fixed bag-of-terms query.
    QueryDef("text_bm25",
      (s, dir) => TextOps.bm25(
        table(s, dir, "documents"), "text", "doc_id",
        terms = Seq("join", "vector", "spark", "stream")),
      Some("""WITH tf AS (
             |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
             |    len(list_filter(string_split(text, ' '), x -> x = 'join')) AS tf_join,
             |    len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS tf_spark,
             |    len(list_filter(string_split(text, ' '), x -> x = 'stream')) AS tf_stream,
             |    len(list_filter(string_split(text, ' '), x -> x = 'vector')) AS tf_vector
             |  FROM documents),
             |st AS (
             |  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl,
             |    SUM(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END) AS df_join,
             |    SUM(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS df_spark,
             |    SUM(CASE WHEN tf_stream > 0 THEN 1 ELSE 0 END) AS df_stream,
             |    SUM(CASE WHEN tf_vector > 0 THEN 1 ELSE 0 END) AS df_vector
             |  FROM tf)
             |SELECT doc_id, ROUND(
             |    ln(1.0 + (n_docs - df_join + 0.5) / (df_join + 0.5))
             |      * tf_join * 2.2 / (tf_join + 1.2 * (0.25 + 0.75 * dl / avgdl))
             |  + ln(1.0 + (n_docs - df_spark + 0.5) / (df_spark + 0.5))
             |      * tf_spark * 2.2 / (tf_spark + 1.2 * (0.25 + 0.75 * dl / avgdl))
             |  + ln(1.0 + (n_docs - df_stream + 0.5) / (df_stream + 0.5))
             |      * tf_stream * 2.2 / (tf_stream + 1.2 * (0.25 + 0.75 * dl / avgdl))
             |  + ln(1.0 + (n_docs - df_vector + 0.5) / (df_vector + 0.5))
             |      * tf_vector * 2.2 / (tf_vector + 1.2 * (0.25 + 0.75 * dl / avgdl)),
             |  4) AS bm25
             |FROM tf, st""".stripMargin)),

    // Token-window chunking (size 64, stride 48): every token lands in
    // >= 1 chunk; chunk content pinned by md5.
    QueryDef("text_chunking",
      (s, dir) => TextOps.chunkTokens(
        table(s, dir, "documents"), "text", "doc_id",
        size_ = 64, stride = 48),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS sp FROM documents),
             |k AS (
             |  SELECT doc_id, sp, unnest(range(0,
             |    (GREATEST(len(sp) - 64, 0) + 47) // 48 + 1)) AS chunk_idx
             |  FROM t)
             |SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
             |  CAST(chunk_idx * 48 + 1 AS INTEGER) AS chunk_start,
             |  CAST(LEAST(64, len(sp) - chunk_idx * 48) AS INTEGER) AS chunk_len,
             |  md5(array_to_string(
             |    list_slice(sp, chunk_idx * 48 + 1, chunk_idx * 48 + 64), ' ')) AS chunk_md5
             |FROM k""".stripMargin)),

    // Concatenate-and-slice packing layout: global token offsets via
    // the sharded two-phase prefix sum (docsPerShard=100 forces ~5
    // shards at gate scale). The oracle is the GLOBAL-order window sum
    // — the gate proves sharded == global.
    QueryDef("text_pack_offsets",
      (s, dir) => TextOps.packOffsets(
        table(s, dir, "documents"), "text", "doc_id",
        blockTokens = 256, docsPerShard = 100L),
      Some("""WITH t AS (
             |  SELECT doc_id, len(string_split(text, ' ')) AS nt
             |  FROM documents),
             |o AS (
             |  SELECT doc_id, nt,
             |    COALESCE(SUM(nt) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS off
             |  FROM t)
             |SELECT doc_id, CAST(nt AS INTEGER) AS n_tokens,
             |  CAST(off AS BIGINT) AS offset,
             |  CAST(off // 256 AS BIGINT) AS first_block,
             |  CAST((off + nt - 1) // 256 AS BIGINT) AS last_block
             |FROM o""".stripMargin)),

    // Statistical quality: per-doc mean unigram surprisal against the
    // corpus's own unigram distribution (the perplexity-proxy filter).
    // Gopher quality rules (Rae et al. 2021 §A1.1): the rule set most
    // open curation pipelines start from — word-count bounds, mean
    // word length, symbol-to-word ratio, alphabetic-word fraction,
    // stopword presence, and the conjunction. All codegen'd column
    // math over one whitespace split; the oracle recomputes every
    // rule and the pass flag in DuckDB.
    QueryDef("text_gopher_quality",
      (s, dir) => {
        val g = TextOps.gopherQuality(
          table(s, dir, "documents"), "text", "doc_id")
        g.withColumn("n_words", col("n_words").cast("long"))
          .withColumn("stopword_hits", col("stopword_hits").cast("long"))
      },
      Some(s"""$GOPHER_METRICS_SQL
             |SELECT m.*, ($GOPHER_PASS_SQL) AS gopher_pass
             |FROM m""".stripMargin)),

    // DSIR importance weights (Xie et al. 2023): how much each raw
    // doc's hashed unigram+bigram profile looks drawn from the TARGET
    // (here: the corpus's English docs) vs the raw corpus. Bucketing
    // is md5-based so the entire estimate — two hashed-feature
    // distributions, add-1 smoothing, per-doc log-likelihood-ratio
    // sum — replays bit-identically in DuckDB: a full-pipeline
    // oracle, not a spot check.
    QueryDef("text_dsir_weights",
      (s, dir) => {
        val d = table(s, dir, "documents")
        // target = predicate subset of raw → the subset path derives
        // the target histogram from the single staged featurize pass
        // (bit-identical weights, one tokenize+md5 pass instead of two)
        DsirOps.dsirWeightsForSubset(d, expr("lang = 'en'"),
          "text", "doc_id", buckets = 1024)
      },
      Some(s"""WITH $DSIR_WEIGHTS_CTES
             |SELECT doc_id, n_feats, log_weight FROM w""".stripMargin)),

    // DSIR resampling (the selection half): Gumbel-top-k over the
    // importance weights, deterministic via md5-derived noise.
    // Round 12: SQL-oracled end to end — the Gumbel key is
    // round(log_weight/T − ln(−ln(u)), 4) with u an md5 coordinate,
    // so DuckDB replays the whole selection (weights chain shared
    // with the gate above via DSIR_WEIGHTS_CTES). The in-gate planted
    // truths stay: the selected set must (a) be exactly k docs,
    // (b) ENRICH English vs the corpus base rate by a real margin,
    // (c) prefer high-weight docs on average, and (d) reproduce
    // EXACTLY on a second run — "importance resampling" that can't
    // demonstrate bias toward its target or replay deterministically
    // would be noise with extra steps.
    QueryDef("text_dsir_select",
      (s, dir) => {
        import s.implicits._
        val d = table(s, dir, "documents")
        val en = d.filter("lang = 'en'")
        // one pass for both corpus counts (they fed two separate
        // count() jobs; the enrichment require uses them identically)
        val cnts = d.agg(count(lit(1)).as("n"),
          count(when(col("lang") === "en", 1)).as("n_en")).head()
        val (total, enCnt) = (cnts.getLong(0), cnts.getLong(1))
        val k = (total / 5).toInt
        // weights are the expensive leg (and their determinism is
        // already oracle-proven above) — computed once (dsirWeights
        // returns a materialized frame), ranked twice; subset path:
        // en ⊂ d, so the target histogram derives from the one staged
        // featurize pass (bit-identical, half the featurize cost)
        val wts = DsirOps.dsirWeightsForSubset(d, expr("lang = 'en'"),
          "text", "doc_id", 1024)
        def run() = DsirOps.dsirResampleFromWeights(wts, "doc_id",
          k, temperature = 0.5)
        val sel = run()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val ids = sel.select("doc_id").as[Long].collect().toSet
        require(ids.size == k, s"expected $k selected, got ${ids.size}")
        // joins, not isin(ids): an isin over k collected ids compiles
        // a k-literal predicate per require — the join keeps the
        // check plan-side and k-independent
        val selIds = sel.select(col("doc_id"))
        val enFrac = enCnt.toDouble / total
        val selEn = en.join(selIds, "doc_id").count()
        val selEnFrac = selEn.toDouble / k
        require(selEnFrac > enFrac + 0.05,
          f"no target enrichment: selected en-frac $selEnFrac%.3f vs " +
          f"base $enFrac%.3f")
        // both weight means in ONE pass over the checkpointed weights:
        // a left-join marker + conditional avg replaces the separate
        // all-docs agg and selected-docs join+agg (identical numbers —
        // avg ignores the unmarked rows' nulls)
        val means = wts.join(
            selIds.withColumn("__sel", lit(1)), Seq("doc_id"), "left")
          .agg(avg("log_weight").as("all"),
            avg(when(col("__sel") === 1, col("log_weight"))).as("sel"))
          .head()
        val (meanAll, meanSel) = (means.getDouble(0), means.getDouble(1))
        require(meanSel > meanAll,
          s"selection does not prefer high weights: $meanSel <= $meanAll")
        val ids2 = run().select("doc_id").as[Long].collect().toSet
        require(ids2 == ids, "resample ranking is not reproducible")
        sel
      },
      Some(s"""WITH $DSIR_WEIGHTS_CTES,
             |g AS (SELECT doc_id, n_feats, log_weight,
             |    round(log_weight / 0.5 - ln(-ln(
             |      (('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8))
             |        ::BIGINT + 0.5) / 4294967296.0)), 4) AS gumbel_key
             |  FROM w)
             |SELECT doc_id, n_feats, log_weight, gumbel_key FROM g
             |QUALIFY row_number()
             |    OVER (ORDER BY gumbel_key DESC, doc_id) <=
             |  (SELECT count(*) // 5 FROM documents)""".stripMargin)),

    // Trained quality classifier (round 12): hashed-ngram logistic
    // regression — the model-based selector (GPT-3/CCNet/LLaMA-style)
    // next to the rule-based Gopher gate. Planted truth: junk twins
    // of every document (tiny synthetic vocabulary, no natural
    // structure) labeled 0 against the real docs' 1; the model trains
    // on even doc_ids and must classify the HELD-OUT odd ids at
    // >= 95% accuracy — a classifier that can't separate real prose
    // from low-diversity noise on unseen docs would be selecting
    // training data by coin flip. No SQL oracle (L-BFGS optimization
    // is not SQL-expressible); rows-only check + the in-gate
    // accuracy require.
    QueryDef("text_quality_classifier",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        val toks = split(col("text"), " ")
        val junk = docs.select((col("doc_id") + 1000000L).as("doc_id"),
          concat_ws(" ", transform(
            sequence(lit(1), greatest(size(toks), lit(5))),
            i => concat(lit("zq"), pmod(col("doc_id") + i, lit(13)))))
            .as("text"))
        val all = docs.withColumn("label", lit(1.0))
          .union(junk.withColumn("label", lit(0.0)))
        val train = all.filter(pmod(col("doc_id"), lit(2)) === 0)
        val heldOut = all.filter(pmod(col("doc_id"), lit(2)) === 1)
        // The training set is a few thousand tiny rows — coalesced so
        // each L-BFGS iteration schedules 4 tasks, not one per
        // shuffle partition (at real scale the partition count IS
        // the parallelism you want; here it's pure scheduling tax).
        // 8k-bucket features / 8 L-BFGS iterations: profiled at sf0.1
        // — training wall is iterations × line-search evals, and the
        // planted classes separate in the first few iterations, so
        // the larger settings bought accuracy 1.0 slightly slower
        val tTrain = System.nanoTime()
        val model = QualityModelOps.trainQualityModel(
          train.coalesce(4), "text", "label",
          numFeatures = 1 << 13, maxIter = 8)
        val trainSec = (System.nanoTime() - tTrain) / 1e9
        val tScore = System.nanoTime()
        val scored = QualityModelOps.scoreQuality(heldOut, model)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nEval = scored.count()
        System.err.println(f"[gate] text_quality_classifier " +
          f"train=$trainSec%.3fs score=" +
          f"${(System.nanoTime() - tScore) / 1e9}%.3fs")
        val nCorrect = scored.filter(
          (col("quality_score") >= 0.5) === (col("label") === 1.0))
          .count()
        val acc = if (nEval == 0) 0.0 else nCorrect.toDouble / nEval
        require(acc >= 0.95,
          s"held-out accuracy $acc below 0.95 ($nCorrect/$nEval)")
        Seq((nEval, nCorrect, math.rint(acc * 10000) / 10000))
          .toDF("n_eval", "n_correct", "accuracy")
      },
      None),

    // Interpolated bigram LM scoring (round 12) — the perplexity
    // filter one model order above unigram surprisal; pure count
    // arithmetic, so the ENTIRE estimate (bigram MLE, unigram
    // interpolation, per-doc averaging) replays in DuckDB.
    QueryDef("text_bigram_surprisal",
      (s, dir) => TextOps.bigramSurprisal(
        table(s, dir, "documents"), "text", "doc_id"),
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split(text, ' ') AS s
             |  FROM documents),
             |uni AS (
             |  SELECT w, COUNT(*) AS cu FROM
             |    (SELECT unnest(s) AS w FROM tok) GROUP BY w),
             |tot AS (SELECT SUM(cu) AS total FROM uni),
             |big AS (
             |  SELECT doc_id, s[i] AS w1, s[i + 1] AS w2
             |  FROM tok, UNNEST(range(1, len(s))) AS t(i)
             |  WHERE len(s) >= 2),
             |bc AS (SELECT w1, w2, COUNT(*) AS cb FROM big
             |  GROUP BY w1, w2)
             |SELECT doc_id, COUNT(*) AS n_bigrams,
             |  ROUND(AVG(-ln(0.75 * (cb * 1.0 / u1.cu) +
             |    0.25 * (u2.cu * 1.0 / total))), 4) AS avg_neg_log
             |FROM big
             |JOIN bc USING (w1, w2)
             |JOIN uni u1 ON u1.w = big.w1
             |JOIN uni u2 ON u2.w = big.w2, tot
             |GROUP BY doc_id""".stripMargin)),

    QueryDef("text_unigram_surprisal",
      (s, dir) => TextOps.unigramSurprisal(
        table(s, dir, "documents"), "text", "doc_id"),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |freq AS (
             |  SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
             |total AS (SELECT SUM(cnt) AS total FROM freq)
             |SELECT doc_id, COUNT(*) AS n_tokens,
             |  ROUND(AVG(-ln(cnt * 1.0 / total)), 4) AS avg_surprisal
             |FROM toks JOIN freq USING (tok), total
             |GROUP BY doc_id""".stripMargin)),

    // The flagship end-to-end curation pass: lang filter → quality
    // filter → exact dedup (planted duplicate copies must collapse to
    // the lowest id) → deterministic 50% downsample. Every stage is
    // closed-form, so the WHOLE pipeline is one DuckDB oracle — this
    // is the "could you run your pre-training data curation on it"
    // check, not a single-operator probe.
    QueryDef("text_curation_pipeline",
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), col("text"), col("n_chars"))
        val planted = (1 to 2).map(k => docs
          .filter(col("doc_id") % 11 === 0)
          .withColumn("doc_id", col("doc_id") + k * 1000000L))
        CurationOps.curate(
          planted.foldLeft(docs)(_.unionByName(_)),
          "text", "doc_id", "n_chars",
          langs = Seq("en", "de"), minQuality = 0.5,
          samplePct256 = 128)
      },
      Some("""WITH all_docs AS (
             |  SELECT doc_id, text, n_chars FROM documents
             |  UNION ALL SELECT doc_id + 1000000, text, n_chars
             |    FROM documents WHERE doc_id % 11 = 0
             |  UNION ALL SELECT doc_id + 2000000, text, n_chars
             |    FROM documents WHERE doc_id % 11 = 0),
             |s AS (
             |  SELECT doc_id, text, n_chars,
             |    len(string_split(text, ' ')) AS nt,
             |    len(list_filter(string_split_regex(text, '\s+'),
             |      x -> x IN ('der','die','das','und','zu','in','ist','ein'))) AS score_de,
             |    len(list_filter(string_split_regex(text, '\s+'),
             |      x -> x IN ('the','a','of','and','to','in','is','that'))) AS score_en,
             |    len(list_filter(string_split_regex(text, '\s+'),
             |      x -> x IN ('el','la','de','y','que','en','un','es'))) AS score_es,
             |    len(list_filter(string_split_regex(text, '\s+'),
             |      x -> x IN ('le','la','de','et','que','en','un','est'))) AS score_fr,
             |    len(list_filter(string_split_regex(text, '\s+'),
             |      x -> x IN ('的','了','是','在','我','有','和','不'))) AS score_zh
             |  FROM all_docs),
             |g AS (
             |  SELECT doc_id, text, nt AS n_tokens,
             |    CASE WHEN GREATEST(score_de, score_en, score_es, score_fr, score_zh) <= 0
             |         THEN 'und'
             |         WHEN score_de >= score_en AND score_de >= score_es
             |          AND score_de >= score_fr AND score_de >= score_zh THEN 'de'
             |         WHEN score_en >= score_es AND score_en >= score_fr
             |          AND score_en >= score_zh THEN 'en'
             |         WHEN score_es >= score_fr AND score_es >= score_zh THEN 'es'
             |         WHEN score_fr >= score_zh THEN 'fr'
             |         ELSE 'zh' END AS lang_guess,
             |    ROUND(LEAST(nt / 50.0, 1.0)
             |      * (CASE WHEN (n_chars - nt + 1.0) / nt
             |              BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END),
             |      4) AS quality
             |  FROM s),
             |f AS (
             |  SELECT * FROM g
             |  WHERE lang_guess IN ('en', 'de') AND quality >= 0.5),
             |d AS (
             |  SELECT doc_id, lang_guess, n_tokens, quality,
             |    ROW_NUMBER() OVER (
             |      PARTITION BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
             |      ORDER BY doc_id) AS rn
             |  FROM f)
             |SELECT doc_id, lang_guess,
             |  CAST(n_tokens AS INTEGER) AS n_tokens, quality
             |FROM d
             |WHERE rn = 1
             |  AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80'""".stripMargin)),

    // Exact dedup via content fingerprint (md5 ⇒ oracle-reproducible).
    QueryDef("dedup_exact",
      (s, dir) => DedupOps.exactDedup(
        table(s, dir, "documents"), "text", "doc_id"),
      Some("""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
             |FROM documents
             |GROUP BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))""".stripMargin)),

    // Distributed BPE vocabulary training (Sennrich 2016): the gate
    // replays a SEQUENTIAL reference implementation over the same
    // collected word-frequency table (vocabulary-sized by
    // construction) and requires the distributed trainer's merge
    // sequence to match EXACTLY — tie-breaks, early stop and all.
    // No SQL oracle: the algorithm is inherently iterative.
    QueryDef("text_bpe_merges",
      (s, dir) => {
        import s.implicits._
        val d = table(s, dir, "documents")
        val got = BpeOps.trainBpeMerges(d, "text",
          numMerges = 16, minFreq = 2, vocabPartitions = 4)
        val wf = BpeOps.wordFrequencies(d, "text")
          .as[(String, Long)].collect().toSeq
        val ref = BpeOps.referenceMerges(wf, 16, 2)
        val gotSeq = got.orderBy("rank").collect().toSeq
          .map(r => (r.getInt(0), r.getString(1), r.getString(2),
            r.getLong(3)))
        require(gotSeq == ref,
          s"distributed BPE diverged from the sequential reference: " +
            s"got ${gotSeq.take(3)}..., expected ${ref.take(3)}...")
        require(gotSeq.nonEmpty, "corpus produced no merges")
        got
      },
      Some(bpeMergesReplaySql())),

    // BPE ENCODE (the apply side): segment every document with the
    // learned merges in one map-only broadcast pass — the tokenize
    // step of a training-data pipeline, where the corpus is 100 TB
    // and the merge table is kilobytes. The merges come from a
    // corpus-fingerprinted FIXTURE (trained once per corpus, the
    // ensureIvfIndex pattern): re-training 16 driver-coordinated
    // rounds inside this gate duplicated what text_bpe_merges
    // already measures and was ~3.2 s of a 4.8 s timed leg (VERDICT
    // r13 #2) — the steady-state op is apply, and that is what the
    // clock must see.
    // Differential gate: an independent sequential encoder
    // (index-scan/in-place-splice vs the UDF's candidate-list
    // rebuild) re-encodes a 5% sample on the driver and the token
    // counts must match exactly; bounds pin the output to reality
    // (every word >= 1 token, no word more tokens than chars+1).
    // No SQL oracle: greedy rank-ordered fusion is inherently
    // iterative.
    QueryDef("text_bpe_encode",
      (s, dir) => {
        import s.implicits._
        val d = table(s, dir, "documents")
        val mergeList = ensureBpeMerges(s, dir)
        require(mergeList.nonEmpty, "corpus produced no merges")
        val app = BpeOps.applyBpe(d.select("doc_id", "text"), "text",
          mergeList)
        // structural sanity DISTRIBUTED (BPE can only merge, so every
        // doc has at least one token per word) — no driver text loop
        val underWords = app.filter(col("bpe_tokens") < size(
          filter(split(col("text"), "\\s+"), w => length(w) > 0)))
          .count()
        require(underWords == 0,
          s"$underWords docs encoded to fewer tokens than words")
        val got = app.select("doc_id", "bpe_tokens")
        // exactness differential vs the sequential reference encoder
        // on a DETERMINISTIC 5% sample (VERDICT r12 ask #6) — run
        // over every doc it dominated the timed leg 3:1. The stratum
        // offset keys off the corpus fingerprint (ADVICE r13): a
        // fixed `% 20 == 0` stratum would let an apply-path bug
        // correlated with doc content outside it pass forever, while
        // a corpus-keyed offset re-rolls whenever the data does and
        // still stays deterministic for a given testdata generation.
        val off = math.floorMod(tableFp(dir, "documents").hashCode, 20)
        val sample = d.select("doc_id", "text")
          .filter(col("doc_id") % 20 === off).as[(Long, String)].collect()
        require(sample.nonEmpty, "empty differential sample")
        val gotSample = got.filter(col("doc_id") % 20 === off)
          .as[(Long, Int)].collect().toMap
        require(sample.length == gotSample.size,
          "row count changed in apply")
        sample.foreach { case (id, text) =>
          val ref = BpeOps.referenceTokenCount(text, mergeList)
          require(gotSample(id) == ref,
            s"doc $id: distributed encode ${gotSample(id)} != reference $ref")
        }
        got
      },
      None),

    // Segment-level keep-first dedup (fixed 16-word segments standing
    // in for CCNet's newline paragraphs — this corpus is single-line).
    // The oracle replays keep-first with a window over the RAW segment
    // text, proving the fingerprint shuffle loses nothing.
    // Exact-substring dedup, Lee et al. 2022 posture (VERDICT r13 ask
    // #7): 50-token windows fingerprinted corpus-wide; non-first
    // occurrences removed; overlaps merged to maximal spans. Planted
    // truth: every >= 64-token doc gets an overlay twin (id + 10^6)
    // carrying a VERBATIM 60-token slice of its source between unique
    // sentinels — each must lose exactly tokens [1, 61). The oracle
    // replays the whole pipeline (window md5s, keep-first by
    // (id, pos), gaps-and-islands union) in DuckDB, so natural
    // corpus-internal 50-token repeats are hash-checked too, not just
    // the plants.
    QueryDef("dedup_substring",
      (s, dir) => {
        val d = table(s, dir, "documents")
        val srctoks = d.select(col("doc_id").as("id"),
          filter(split(col("text"), "\\s+"),
            w => length(w) > 0).as("toks"))
        val overlays = srctoks.where(size(col("toks")) >= 64).select(
          (col("id") + 1000000L).as("id"),
          filter(split(concat(
            lit("uq"), col("id").cast("string"), lit(" "),
            array_join(slice(col("toks"), 5, 60), " "),
            lit(" tl"), col("id").cast("string")), "\\s+"),
            w => length(w) > 0).as("toks"))
        val nPlanted = overlays.count()
        val spans = DedupOps.exactSubstringSpansOfTokens(
          srctoks.union(overlays), minTokens = 50)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val caught = spans.filter(col("doc_id") >= 1000000L &&
          col("span_start") === 1L && col("span_end") === 61L).count()
        require(caught == nPlanted,
          s"only $caught of $nPlanted planted 60-token verbatim spans " +
            "were removed as exactly [1, 61)")
        spans
      },
      Some("""WITH srctoks AS (
             |  SELECT doc_id AS id,
             |    list_filter(string_split_regex(text,'\s+'),
             |                w->len(w)>0) AS toks
             |  FROM documents
             |), corpus AS (
             |  SELECT id, toks FROM srctoks
             |  UNION ALL
             |  SELECT id + 1000000 AS id,
             |    list_filter(string_split_regex(
             |      'uq' || CAST(id AS VARCHAR) || ' ' ||
             |      array_to_string(toks[5:64], ' ') ||
             |      ' tl' || CAST(id AS VARCHAR),
             |      '\s+'), w->len(w)>0) AS toks
             |  FROM srctoks WHERE len(toks) >= 64
             |), t AS (
             |  SELECT id, toks, len(toks) AS n FROM corpus
             |), w AS (
             |  SELECT id, CAST(i AS BIGINT) AS pos,
             |    unhex(md5(array_to_string(
             |      toks[CAST(i+1 AS BIGINT):CAST(i+50 AS BIGINT)],
             |      ' '))) AS fp
             |  FROM t, UNNEST(range(0, n - 49)) AS u(i)
             |  WHERE n >= 50
             |), m AS (
             |  SELECT id, pos,
             |    count(*) OVER (PARTITION BY fp) AS c,
             |    min(struct_pack(id:=id, pos:=pos))
             |      OVER (PARTITION BY fp) AS wmin
             |  FROM w
             |), r AS (
             |  SELECT id, pos FROM m
             |  WHERE c >= 2 AND NOT (id = wmin.id AND pos = wmin.pos)
             |), isl AS (
             |  SELECT id, pos,
             |    CASE WHEN max(pos + 50) OVER (PARTITION BY id
             |        ORDER BY pos
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |        IS NULL
             |      OR pos > max(pos + 50) OVER (PARTITION BY id
             |        ORDER BY pos
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      THEN 1 ELSE 0 END AS ni
             |  FROM r
             |), isl2 AS (
             |  SELECT id, pos,
             |    sum(ni) OVER (PARTITION BY id ORDER BY pos
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS island
             |  FROM isl
             |)
             |SELECT id AS doc_id, CAST(min(pos) AS BIGINT) AS span_start,
             |  CAST(max(pos) + 50 AS BIGINT) AS span_end
             |FROM isl2 GROUP BY id, island""".stripMargin)),

    QueryDef("dedup_segments",
      (s, dir) => DedupOps.segmentDedup(
        table(s, dir, "documents"), "text", "doc_id", segWords = 16),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS sp FROM documents),
             |seg AS (
             |  SELECT doc_id, unnest(range(0, (len(sp) + 15) // 16)) AS seg_idx, sp
             |  FROM t),
             |s2 AS (
             |  SELECT doc_id, seg_idx,
             |    array_to_string(
             |      list_slice(sp, seg_idx * 16 + 1, seg_idx * 16 + 16), ' ') AS seg
             |  FROM seg),
             |r AS (
             |  SELECT doc_id, seg_idx, seg,
             |    row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
             |  FROM s2)
             |SELECT doc_id, CAST(seg_idx AS INTEGER) AS seg_idx, md5(seg) AS seg_md5
             |FROM r WHERE rn = 1""".stripMargin)),

    // Incremental exact dedup against a PERSISTED fingerprint store —
    // the daily-ingest shape at 100 TB: the historical corpus's
    // fingerprints live in a lake table; a new batch anti-joins
    // against it (cost = O(batch) + a join against O(history
    // fingerprints), never a rescan of history text) and in-batch
    // duplicates collapse to the lowest id.
    QueryDef("dedup_incremental",
      (s, dir) => {
        val d = table(s, dir, "documents")
        val path = scratch("dedup_incremental", dir)
        graft.lake.LakeWriter.write(
          d.filter("doc_id % 2 = 0")
            .select(TextOps.fingerprint(col("text")).as("fp")).distinct(),
          path, mode = "overwrite")
        val store = graft.lake.LakeTable.forPath(s, path).toDF
        val incoming = d.filter("doc_id % 2 = 1")
          .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("fp").orderBy("doc_id")
        incoming.join(store, Seq("fp"), "left_anti")
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .select("doc_id")
      },
      Some("""WITH fp AS (SELECT doc_id,
             |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS f
             |  FROM documents),
             |seen AS (SELECT DISTINCT f FROM fp WHERE doc_id % 2 = 0),
             |incoming AS (SELECT * FROM fp WHERE doc_id % 2 = 1)
             |SELECT min(doc_id) AS doc_id FROM incoming
             |WHERE f NOT IN (SELECT f FROM seen)
             |GROUP BY f""".stripMargin)),

    // Incremental NEAR-dup dedup against a persisted SIGNATURE store —
    // the re-crawl/boilerplate-variant twin of dedup_incremental:
    // history keeps only (id, 32-long minhash sig) (~256 B/doc, never
    // text), a new batch is signed once, banded candidates shuffle
    // scalar longs, and verification is the signature-estimated
    // Jaccard (Broder's matching-minima estimator — the store holds no
    // shingles, by design). Store BUILD rides a corpus-keyed fixture
    // (builds are one-time; batches are the workload); the appendKept
    // store-growth path is suite-covered so the fixture stays
    // immutable. Planted exact copies of store docs must all drop;
    // the oracle replays the ENTIRE pipeline — FNV shingles,
    // splitmix64 signatures, 8x4 banding, est-Jaccard >= 0.5, the
    // pessimistic in-batch keep-first — in DuckDB bit math.
    QueryDef("dedup_incremental_minhash",
      (s, dir) => {
        val d = table(s, dir, "documents")
        val path = ensureMinhashStore(s, dir)
        val planted = d.filter(col("doc_id") % 40 === 0)
          .select((col("doc_id") + 4000001L).as("doc_id"), col("text"))
        val incoming = d.filter("doc_id % 2 = 1")
          .select(col("doc_id"), col("text")).unionByName(planted)
        val kept = DedupOps.incrementalMinhashDedup(
          incoming, "text", "doc_id", path, minJaccard = 0.5,
          appendKept = false)
        val survivors = kept.filter(col("id") >= 4000000L).count()
        require(survivors == 0,
          s"$survivors planted store-copies survived the near-dup check")
        kept
      },
      Some(s"""WITH corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 4000001, text FROM documents
             |  WHERE doc_id % 40 = 0),
             |${DuckSql.minhashSigCtes("corpus")},
             |banded AS (SELECT doc_id, b,
             |    array_to_string(list_slice(sig, b*4+1, b*4+4), ',') AS bs
             |  FROM msig, (SELECT unnest(range(0,8)) AS b) bb),
             |est AS MATERIALIZED (SELECT x.doc_id AS id_a, y.doc_id AS id_b,
             |    len(list_filter(range(1, 33),
             |      i -> x.sig[i] = y.sig[i])) / 32.0 AS e
             |  FROM (SELECT DISTINCT a.doc_id, c.doc_id AS other
             |        FROM banded a JOIN banded c
             |          ON a.b = c.b AND a.bs = c.bs
             |         AND a.doc_id <> c.doc_id) cand
             |  JOIN msig x ON x.doc_id = cand.doc_id
             |  JOIN msig y ON y.doc_id = cand.other),
             |dup_store AS (SELECT DISTINCT id_a AS id FROM est
             |  WHERE (id_a % 2 = 1 OR id_a >= 4000000)
             |    AND id_b % 2 = 0 AND id_b < 4000000 AND e >= 0.5),
             |dup_batch AS (SELECT DISTINCT id_b AS id FROM est
             |  WHERE (id_a % 2 = 1 OR id_a >= 4000000)
             |    AND (id_b % 2 = 1 OR id_b >= 4000000)
             |    AND id_a < id_b AND e >= 0.5)
             |SELECT doc_id AS id FROM corpus
             |WHERE (doc_id % 2 = 1 OR doc_id >= 4000000)
             |  AND doc_id NOT IN (SELECT id FROM dup_store)
             |  AND doc_id NOT IN (SELECT id FROM dup_batch)"""
        .stripMargin)),

    // Connected-components dedup clustering (large-star/small-star):
    // CHAIN edges link consecutive ids within each duplicate-text
    // group — a path graph, the worst case for naive propagation —
    // and the clusters must collapse each chain to its minimum id.
    // Oracle: the same grouping, closed-form (min over the group).
    QueryDef("dedup_clusters",
      (s, dir) => {
        // The corpus has (almost) no exact duplicates at gate scale,
        // so plant them: 3 copies of every 7th doc → each group is a
        // 4-node CHAIN after consecutive-id linking.
        val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
        val planted = (1 to 3).map(k => docs
          .filter(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + k * 1000000L))
        val all = planted.foldLeft(docs)(_.unionByName(_))
        val fp = all.select(col("doc_id"),
          TextOps.fingerprint(col("text")).as("fp"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("fp").orderBy("doc_id")
        val edges = fp.withColumn("prev", lag("doc_id", 1).over(w))
          .filter(col("prev").isNotNull)
          .select(col("prev").as("a"), col("doc_id").as("b"))
        DedupOps.connectedComponents(edges)
      },
      Some("""WITH all_docs AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
             |  UNION ALL SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 7 = 0
             |  UNION ALL SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 7 = 0)
             |SELECT doc_id AS id, MIN(doc_id) OVER (PARTITION BY fp) AS cluster
             |FROM (SELECT doc_id,
             |        md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
             |      FROM all_docs)
             |QUALIFY COUNT(*) OVER (PARTITION BY fp) > 1""".stripMargin)),

    // Exact n-gram Jaccard pairs within each source shard — computed
    // via the lossless inverted-index shape (share-a-shingle candidates
    // + group-count intersection), identical output to the all-pairs
    // oracle below at a Σk² cost instead of O(docs²).
    QueryDef("dedup_ngram_pairs",
      (s, dir) => DedupOps.ngramJaccardPairs(
        table(s, dir, "documents"), "text", "doc_id",
        groupCol = "source", n = 3, minJaccard = 0.2),
      Some("""WITH sh AS (
             |  SELECT doc_id, source,
             |    list_distinct(CASE WHEN len(string_split(text,' ')) < 3
             |      THEN [text]
             |      ELSE list_transform(range(1, len(string_split(text,' '))-1),
             |        i -> array_to_string(list_slice(string_split(text,' '), i, i+2), ' '))
             |      END) AS shingles
             |  FROM documents)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  ROUND(len(list_intersect(a.shingles, b.shingles))
             |    / (len(a.shingles) + len(b.shingles)
             |       - len(list_intersect(a.shingles, b.shingles))), 4) AS jaccard
             |FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
             |  AND len(a.shingles) <= 5 * len(b.shingles)
             |  AND len(b.shingles) <= 5 * len(a.shingles)
             |WHERE len(list_intersect(a.shingles, b.shingles))
             |    / (len(a.shingles) + len(b.shingles)
             |       - len(list_intersect(a.shingles, b.shingles))) >= 0.2""".stripMargin)),

    // MinHash+LSH near-dup pairs. Fully deterministic (FNV shingles,
    // splitmix64 minhash family), so the oracle replays the ENTIRE
    // pipeline in DuckDB bit math: signatures, 8x4 banding, candidate
    // join, exact-Jaccard verification (DuckSql generates the hash
    // arithmetic; band equality is on the raw 4-hash slice, which the
    // engine's xxhash64 bucket key represents injectively modulo
    // 2^-64 collisions).
    QueryDef("dedup_minhash_lsh",
      (s, dir) => DedupOps.minhashLshPairs(
        table(s, dir, "documents"), "text", "doc_id",
        numHashes = 32, bands = 8, minJaccard = 0.2),
      Some(s"""WITH ${DuckSql.minhashSigCtes()},
             |banded AS (SELECT doc_id, b,
             |    array_to_string(list_slice(sig, b*4+1, b*4+4), ',') AS bs
             |  FROM msig, (SELECT unnest(range(0,8)) AS b) bb),
             |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
             |  FROM banded a JOIN banded c
             |    ON a.b = c.b AND a.bs = c.bs AND a.doc_id < c.doc_id),
             |jac AS (SELECT id_a, id_b,
             |    len(list_intersect(x.sh, y.sh)) * 1.0 /
             |      (len(x.sh) + len(y.sh)
             |       - len(list_intersect(x.sh, y.sh))) AS j
             |  FROM cand JOIN sh x ON x.doc_id = cand.id_a
             |    JOIN sh y ON y.doc_id = cand.id_b)
             |SELECT id_a, id_b, ROUND(j, 4) AS jaccard
             |FROM jac WHERE j >= 0.2""".stripMargin)),

    // SimHash signature groups. Deterministic FNV-token SimHash → the
    // oracle re-derives every 64-bit signature in DuckDB bit math and
    // regroups (sign-sum votes replayed per bit).
    QueryDef("dedup_simhash",
      (s, dir) => DedupOps.simhashGroups(
        table(s, dir, "documents"), "text", "doc_id")
        .select(col("simhash"), col("n_docs"),
          concat_ws(",", col("ids")).as("ids_csv")),
      Some(s"""WITH docsrc AS (SELECT doc_id, text FROM documents),
             |${DuckSql.simhashCtes}
             |SELECT simhash, count(*) AS n_docs,
             |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
             |    AS ids_csv
             |FROM sig GROUP BY simhash""".stripMargin)),

    // Winnowing (MOSS) passage-overlap: plant contaminated composites
    // (25 tokens lifted from a real doc + unique filler). Whole-doc
    // similarity can't see a short shared passage; winnowing
    // guarantees a shared fingerprint for any run >= n + w - 1 tokens,
    // and the gate asserts every planted pair is recovered.
    QueryDef("text_passage_overlap",
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        val toks = split(col("text"), "\\s+")
        val base = docs.filter(col("doc_id") % 20 === 0 && size(toks) >= 30)
        val composite = base.select(
          (col("doc_id") + 2000000L).as("doc_id"),
          concat_ws(" ",
            concat(slice(toks, 1, 25),
              transform(sequence(lit(1), lit(40)), i =>
                concat_ws("_", lit("zz"),
                  col("doc_id").cast("string"), i.cast("string")))))
            .as("text"))
        // persisted: the in-gate recovery assertion AND the returned
        // rows both evaluate this frame — without a cache the
        // fingerprint self-join runs twice
        val pairs = TextOps.passageOverlapPairs(
          docs.union(composite), "text", "doc_id",
          n = 3, window = 4, minShared = 2)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nPlanted = base.count()
        val planted = pairs
          .filter(col("id_b") === col("id_a") + 2000000L &&
            col("id_a") < 2000000L)
        val found = planted.count()
        require(found >= nPlanted,
          s"winnowing missed planted contaminated pairs: $found/$nPlanted")
        // Returned rows = the DETERMINISTIC subset (round-5): the
        // planted contaminated pairs, whose ids are closed-form, so
        // the driver hash-checks them against DuckDB. The fingerprint
        // COUNTS and the organic pair set are winnow-sampling-defined
        // (hash-dependent) by construction and stay in-gate-asserted
        // via the require above, which runs over the FULL pair set.
        planted.select(col("id_a"), col("id_b")).orderBy("id_a")
      },
      Some("""SELECT CAST(doc_id AS BIGINT) AS id_a,
             |  CAST(doc_id + 2000000 AS BIGINT) AS id_b
             |FROM documents
             |WHERE doc_id % 20 = 0
             |  AND len(string_split_regex(text, '\s+')) >= 30""".stripMargin)),

    // Benchmark decontamination: the reference set is the same base
    // slice the passage gate uses; corpus = all documents + planted
    // composites quoting 25 reference tokens. EVERY planted id (the
    // reference docs themselves, present in the corpus verbatim, and
    // every quoting composite) must drop — that closed-form planted
    // set is the oracle row set. Organic drops (documents near-dup
    // to a reference doc) are winnow-defined and asserted in-gate
    // only by the survivors-exist check.
    QueryDef("text_decontaminate",
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        val toks = split(col("text"), "\\s+")
        val base = docs.filter(col("doc_id") % 20 === 0 && size(toks) >= 30)
        val composite = base.select(
          (col("doc_id") + 3000000L).as("doc_id"),
          concat_ws(" ",
            concat(slice(toks, 1, 25),
              transform(sequence(lit(1), lit(40)), i =>
                concat_ws("_", lit("qq"),
                  col("doc_id").cast("string"), i.cast("string")))))
            .as("text"))
        val kept = TextOps.decontaminateAgainst(
          docs.union(composite), "text", "doc_id", base, "text",
          n = 3, window = 4, minShared = 2)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nBase = base.count()
        val plantedIds = base.select(col("doc_id"))
          .union(base.select((col("doc_id") + 3000000L).as("doc_id")))
        val dropped = plantedIds
          .join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
        val nDropped = dropped.count()
        require(nDropped == 2 * nBase,
          s"decontamination missed planted contaminated docs " +
          s"($nDropped of ${2 * nBase} dropped)")
        require(kept.count() > 0, "decontamination dropped everything")
        dropped.orderBy("doc_id")
      },
      Some("""SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
             |WHERE doc_id % 20 = 0
             |  AND len(string_split_regex(text, '\s+')) >= 30
             |UNION ALL
             |SELECT CAST(doc_id + 3000000 AS BIGINT) AS doc_id
             |FROM documents
             |WHERE doc_id % 20 = 0
             |  AND len(string_split_regex(text, '\s+')) >= 30""".stripMargin)),

    // SimHash Hamming-banding near-dup: plant a 1-bit-flipped variant
    // of every 10th doc's signature; 4x16-bit banding must recover
    // EVERY planted pair (pigeonhole guarantee for distance <= 3).
    // Recovery is asserted inside the gate — a miss fails loudly.
    QueryDef("dedup_simhash_near",
      (s, dir) => {
        val sigs = table(s, dir, "documents")
          .filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"),
            DedupOps.simhash(col("text")).as("sig"))
        val planted = sigs.select(
          (col("doc_id") + 1000000L).as("doc_id"),
          expr("sig ^ shiftleft(CAST(1 AS BIGINT), " +
            "CAST(doc_id % 64 AS INT))").as("sig"))
        // persisted: the recovery assertion and the returned rows both
        // evaluate the banded self-join (see passage-overlap note)
        val pairs = DedupOps.simhashNearPairsFromSigs(
          sigs.union(planted), "sig", "doc_id", maxHamming = 3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nPlanted = sigs.count()
        val nRecovered = pairs
          .filter(col("id_b") === col("id_a") + 1000000L &&
            col("hamming") === 1).count()
        require(nRecovered >= nPlanted,
          s"simhash banding missed planted 1-bit pairs: " +
            s"$nRecovered/$nPlanted recovered")
        pairs.orderBy("id_a", "id_b")
      },
      // The banded join's output is EXACTLY all pairs at Hamming <= 3
      // (pigeonhole: <= 3 differing bits leave >= 1 of the 4 16-bit
      // bands equal), so the oracle replays signatures in DuckDB bit
      // math and takes the plain quadratic form the banding avoids at
      // scale.
      Some(s"""WITH docsrc AS (SELECT doc_id, text FROM documents
             |    WHERE doc_id % 10 = 0),
             |${DuckSql.simhashCtes},
             |sigs AS (SELECT doc_id, simhash AS sig FROM sig
             |  UNION ALL
             |  SELECT s.doc_id + 1000000 AS doc_id,
             |    CASE WHEN s.doc_id % 64 = 63
             |      THEN xor(s.simhash, CAST(-9223372036854775807 AS BIGINT) - 1)
             |      ELSE xor(s.simhash,
             |        CAST(1 AS BIGINT) << CAST(s.doc_id % 64 AS INT)) END AS sig
             |  FROM sig s)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  bit_count(xor(a.sig, b.sig)) AS hamming
             |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin)),

    // MinHash-LSH recall, measured: plant a 10%-truncated variant of
    // every doc (shingle Jaccard ~0.85-0.9 vs the original), compute
    // the TRUE planted pairs above the threshold exactly (per-doc
    // jaccard, no join), and require LSH to find >= 90% of them at the
    // production banding (32 hashes x 8 bands).
    QueryDef("dedup_minhash_recall",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
        val toks = split(col("text"), "\\s+")
        val truncated = docs.select(
          (col("doc_id") + 1000000L).as("doc_id"),
          concat_ws(" ", slice(toks, lit(1),
            greatest(lit(3), (size(toks) * 0.9).cast("int")))).as("text"))
        val minJ = 0.8
        val truth = docs
          .select(col("doc_id"),
            graft.functions.HashedShingles(col("text"), 3).as("sh_a"))
          .join(truncated.select((col("doc_id") - 1000000L).as("doc_id"),
            graft.functions.HashedShingles(col("text"), 3).as("sh_b")),
            "doc_id")
          .withColumn("j",
            DedupOps.jaccardFromShingles(col("sh_a"), col("sh_b")))
          .filter(col("j") >= minJ)
        val nTrue = truth.count()
        val lsh = DedupOps.minhashLshPairs(docs.union(truncated),
          "text", "doc_id", numHashes = 32, bands = 8, minJaccard = minJ)
        val nFound = lsh
          .filter(col("id_b") === col("id_a") + 1000000L).count()
        val recall = if (nTrue == 0) 1.0 else nFound.toDouble / nTrue
        require(recall >= 0.9,
          s"minhash LSH recall $recall below 0.9 ($nFound/$nTrue)")
        // HALF_UP, matching DuckDB's half-away ROUND — rint (half-
        // even) diverges from the oracle on exact .00005 ties
        Seq((nTrue, nFound, BigDecimal(recall)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
          .toDF("n_true_pairs", "n_found_pairs", "recall")
      },
      // Round 12: the measured recall itself is DuckDB-replayable —
      // the truth count is exact shingle Jaccard per planted pair and
      // the found count re-runs the full signature/banding pipeline
      // in SQL bit math, so the oracle recomputes BOTH sides of the
      // recall fraction, not just sanity rows.
      Some(s"""WITH corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 1000000 AS doc_id,
             |    array_to_string(list_slice(
             |      string_split_regex(text, '\\s+'), 1,
             |      GREATEST(3, CAST(floor(
             |        len(string_split_regex(text, '\\s+')) * 0.9)
             |        AS INT))), ' ') AS text
             |  FROM documents),
             |${DuckSql.minhashSigCtes("corpus")},
             |banded AS (SELECT doc_id, b,
             |    array_to_string(list_slice(sig, b*4+1, b*4+4), ',') AS bs
             |  FROM msig, (SELECT unnest(range(0,8)) AS b) bb),
             |cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
             |  FROM banded a JOIN banded c
             |    ON a.b = c.b AND a.bs = c.bs AND a.doc_id < c.doc_id),
             |found AS (SELECT count(*) AS nf
             |  FROM cand JOIN sh x ON x.doc_id = cand.id_a
             |    JOIN sh y ON y.doc_id = cand.id_b
             |  WHERE id_b = id_a + 1000000 AND id_a < 1000000
             |    AND len(list_intersect(x.sh, y.sh)) * 1.0 /
             |      (len(x.sh) + len(y.sh)
             |       - len(list_intersect(x.sh, y.sh))) >= 0.8),
             |truth AS (SELECT count(*) AS nt
             |  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1000000
             |  WHERE a.doc_id < 1000000
             |    AND len(list_intersect(a.sh, b.sh)) * 1.0 /
             |      (len(a.sh) + len(b.sh)
             |       - len(list_intersect(a.sh, b.sh))) >= 0.8)
             |SELECT nt AS n_true_pairs, nf AS n_found_pairs,
             |  CASE WHEN nt = 0 THEN 1.0
             |       ELSE round(nf * 1.0 / nt, 4) END AS recall
             |FROM truth, found""".stripMargin)),

    // SemDeDup (cluster-scoped semantic dedup): corpus ∪ perturbed
    // copies (ids shifted, cos ≈ 0.99 to their source) — every copy
    // must land in its source's k-means cluster, pair above tau, and
    // be dropped in favor of the lower-id source; near-random
    // non-planted vectors must NOT pair at tau = 0.95. Recall and the
    // false-drop bound are both enforced in-gate (no SQL oracle: the
    // k-means assignment is not SQL-expressible).
    // SemDeDup, two legs (VERDICT r12 ask #3 oracle-ized it):
    //  1. the REAL clustered run over the full corpus ∪ perturbed
    //     copies keeps its planted-recall and zero-false-drop
    //     requires in-gate — clustering bounds candidates, so recall
    //     is the only honest contract for that path;
    //  2. the OUTPUT is the exact-mode drop-set (nClusters=1 makes
    //     the within-cluster self-join a true all-pairs over a capped
    //     deterministic subset), which DuckDB replays end to end:
    //     all-pairs cosine >= tau edges, transitive closure, min-id
    //     representative — hash-verifying the threshold math and the
    //     connected-components collapse, not just recall. The subset
    //     cap keeps the exact leg O(constant) across SFs.
    QueryDef("dedup_semantic",
      (s, dir) => {
        import s.implicits._
        val e = table(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val copies = e.select(
          (col("vec_id") + 1000000L).as("vec_id"),
          expr("transform(embedding, (x, i) -> " +
            "CAST(x * (1.0d + 0.05d * sin(vec_id * 31 + i)) AS FLOAT))")
            .as("embedding"))
        val nPlanted = copies.count()
        val dropped = DedupOps.semanticDedup(
          e.union(copies), "vec_id", "embedding",
          tau = 0.95, nClusters = 16, kmeansIters = 2)
        val caught = dropped.filter(col("id") >= 1000000L &&
          col("rep_id") === col("id") - 1000000L).count()
        val falseDrops = dropped.filter(col("id") < 1000000L).count()
        val recall = if (nPlanted == 0) 1.0 else caught.toDouble / nPlanted
        require(recall >= 0.9,
          s"SemDeDup recall $recall below 0.9 ($caught/$nPlanted)")
        require(falseDrops <= nPlanted / 20,
          s"SemDeDup dropped $falseDrops non-planted vectors — " +
            "tau = 0.95 should not pair near-random embeddings")
        val sub = e.filter(col("vec_id") < 400)
        val subCopies = copies.filter(col("vec_id") < 1000400L)
        DedupOps.semanticDedup(
          sub.union(subCopies), "vec_id", "embedding",
          tau = 0.95, nClusters = 1, kmeansIters = 1)
          .select(col("id"), col("rep_id"))
      },
      Some("""WITH RECURSIVE corpus AS (
             |  SELECT vec_id AS id, embedding FROM embeddings
             |  WHERE vec_id < 400
             |  UNION ALL
             |  SELECT vec_id + 1000000 AS id,
             |    list_transform(embedding, (x, i) ->
             |      CAST(x * (1.0 + 0.05 * sin(vec_id * 31 + (i - 1)))
             |        AS FLOAT))
             |  FROM embeddings WHERE vec_id < 400
             |), dv AS (
             |  -- DOUBLE[] up-cast (ADVICE r13): Spark's cosine reads
             |  -- FLOAT elements but ACCUMULATES in double; scoring
             |  -- FLOAT[] here would accumulate in float and a pair
             |  -- within float error of tau could flip between engines
             |  SELECT id, CAST(embedding AS DOUBLE[]) AS embedding
             |  FROM corpus
             |), edges AS (
             |  SELECT a.id AS x, b.id AS y
             |  FROM dv a JOIN dv b ON a.id < b.id
             |  WHERE list_dot_product(a.embedding, b.embedding) /
             |    (sqrt(list_dot_product(a.embedding, a.embedding)) *
             |     sqrt(list_dot_product(b.embedding, b.embedding)))
             |    >= 0.95
             |), und AS (
             |  SELECT x, y FROM edges
             |  UNION SELECT y AS x, x AS y FROM edges
             |), reach(a, b) AS (
             |  SELECT x, x FROM (SELECT DISTINCT x FROM und)
             |  UNION
             |  SELECT r.a, u.y FROM reach r JOIN und u ON r.b = u.x
             |)
             |SELECT a AS id, MIN(b) AS rep_id FROM reach GROUP BY a
             |HAVING MIN(b) < a""".stripMargin)),

    // Embedding near-dup: corpus ∪ exact copies (ids shifted) must
    // rediscover each copy pair through the LSH-bucketed join.
    QueryDef("dedup_embedding_pairs",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val copies = e.withColumn("vec_id", col("vec_id") + 1000000L)
        DedupOps.embeddingNearDupPairs(
          e.union(copies), "embedding", "vec_id", minCos = 0.99)
      },
      Some("""SELECT vec_id AS id_a, vec_id + 1000000 AS id_b,
             |  CAST(1.0 AS DOUBLE) AS cos
             |FROM embeddings""".stripMargin)),

    // Exact brute-force cosine top-k (the ANN correctness baseline).
    QueryDef("sim_bruteforce_topk",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("vec"))
        val corpus = e.select(col("vec_id").as("id"),
          col("embedding").as("vec"))
        SimilarityOps.bruteForceTopK(queries, corpus, k = 5)
      },
      // DOUBLE[] casts: DuckDB otherwise scores FLOAT[] in float
      // precision while Spark accumulates in double.
      Some("""SELECT qid, CAST(rank AS INTEGER) AS rank, neighbor_id, cos FROM (
             |  SELECT q.vec_id AS qid, c.vec_id AS neighbor_id,
             |    ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS cos,
             |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
             |      ORDER BY ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) DESC,
             |               c.vec_id ASC) AS rank
             |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
             |  WHERE q.vec_id < 10)
             |WHERE rank <= 5""".stripMargin)),

    // LSH-bucketed approximate top-k (scale path). Hash-defined
    // result set → no SQL oracle, but the STRUCTURE is asserted
    // in-gate (round 12): per query ≤ k rows with contiguous ranks
    // from 1, rank order consistent with descending cosine, no
    // self-matches — an LSH that returned garbage rows or broke the
    // ranking contract would pass a rows-only check silently.
    QueryDef("sim_lsh_topk",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("vec"))
        val corpus = e.select(col("vec_id").as("id"),
          col("embedding").as("vec"))
        val k = 5
        // the result is driver-sized BY CONTRACT (≤ |queries| × k =
        // 50 rows), so the structural checks run on the collected
        // array in plain Scala — zero extra Spark jobs. Running them
        // as a groupBy + self-join put two verifier jobs inside the
        // timed leg and the bench measured the harness, not the
        // operator (VERDICT r13 #1, same disease text_bpe_encode had).
        val top = SimilarityOps.lshTopK(queries, corpus, k, bits = 4)
        val rows = top.collect()
        require(rows.length <= 10 * k, s"${rows.length} rows exceed " +
          s"the ≤ queries×k bound")
        rows.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rs) =>
          val ranks = rs.map(_.getAs[Int]("rank")).sorted
          // ranks exactly 1..n — a rank()-style tie (1,1,3) has
          // max = n but a duplicate, so the sequence check fails it
          require(ranks.length <= k &&
            ranks.sameElements(1 to ranks.length),
            s"query $qid ranks ${ranks.mkString(",")} are not 1..n")
          require(!rs.exists(_.getAs[Long]("neighbor_id") == qid),
            s"query $qid returned itself")
          val byRank = rs.sortBy(_.getAs[Int]("rank"))
            .map(_.getAs[Double]("cos"))
          require(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
            s"query $qid cosines not descending by rank")
        }
        // the collected rows ARE the result: re-materializing `top`
        // for the caller's count() would re-run the LSH join
        s.createDataFrame(
          s.sparkContext.parallelize(rows.toIndexedSeq, 1), top.schema)
      },
      // Round 15: full row-level oracle (was no_oracle with structural
      // requires only) — the whole bucket/multiprobe/rank pipeline is
      // deterministic, so DuckDB replays it and the hash gate pins the
      // actual top-k rows. The in-gate structural requires stay: they
      // run on the collected array at zero job cost and catch contract
      // breaks with a clearer message than a hash mismatch.
      Some(lshTopKReplaySql())),

    // ANN recall, measured at the gate's own settings (bits=4,
    // Hamming-1 multi-probe) on the retrieval task LSH actually serves
    // at 100 TB: near-duplicate lookup. Queries are deterministic small
    // perturbations of every 10th corpus vector (cos ~0.99 to their
    // source, far above the ~0.49 max cosine between unrelated vectors
    // here, so the source IS each query's true nearest neighbor —
    // verified against brute force below); recall = fraction of
    // queries whose source appears in the LSH top-k. The corpus'
    // embeddings are otherwise near-random (top-10 neighbor cosine
    // averages 0.30), where NO sub-linear method can recover arbitrary
    // top-k — asserting 0.9 there would force scanning the whole
    // corpus and make the gate meaningless. Fails loudly below 0.9.
    QueryDef("sim_lsh_recall",
      (s, dir) => {
        import s.implicits._
        val (src, queries, corpus) = plantedSim(s, dir)
        val k = 5
        // ground truth: brute force must rank each source in the
        // top-k — read from the corpus-fingerprint-keyed fixture
        // (computed once per corpus; the require still runs per-run)
        val exact = exactTruth(s, dir)
        val nQueries = src.count()
        val exactHits = exact
          .filter(col("neighbor_id") === col("qid") - 1000000L).count()
        require(exactHits == nQueries,
          s"planted sources not exact-NN: $exactHits/$nQueries — " +
            "perturbation too large for this corpus")
        val approx = SimilarityOps.lshTopK(queries, corpus, k, bits = 4)
        val found = approx
          .filter(col("neighbor_id") === col("qid") - 1000000L).count()
        val recall = if (nQueries == 0) 1.0 else found.toDouble / nQueries
        require(recall >= 0.9,
          s"LSH near-dup recall $recall below 0.9 ($found/$nQueries)")
        // floor(x·10⁴ + 0.5)/10⁴ — DuckDB's ROUND(x, 4) for positive
        // x, unlike rint (half-even), so the oracle can reproduce it
        Seq((nQueries, found,
            math.floor(found * 10000.0 / math.max(nQueries, 1) + 0.5)
              / 10000))
          .toDF("n_queries", "n_found", "recall")
      },
      Some(lshReplaySql)),

    // IVF coarse-quantizer ANN (the second scale path next to LSH):
    // same planted near-dup protocol as sim_lsh_recall; recall >= 0.9
    // required at nlist=16 / nprobe=4 (~25% of the corpus scored).
    QueryDef("sim_ivf_recall",
      (s, dir) => {
        import s.implicits._
        val (src, queries, corpus) = plantedSim(s, dir)
        val k = 5
        // exact-NN precondition from the persisted truth fixture
        // (cheap read; same require the LSH gate enforces)
        val nQueries = src.count()
        val exactHits = exactTruth(s, dir)
          .filter(col("neighbor_id") === col("qid") - 1000000L).count()
        require(exactHits == nQueries,
          s"planted sources not exact-NN: $exactHits/$nQueries")
        val approx = SimilarityOps.ivfTopK(queries, corpus, k,
          nlist = 16, nprobe = 4)
        val found = approx
          .filter(col("neighbor_id") === col("qid") - 1000000L).count()
        val recall = if (nQueries == 0) 1.0 else found.toDouble / nQueries
        require(recall >= 0.9,
          s"IVF near-dup recall $recall below 0.9 ($found/$nQueries)")
        // floor(x·10⁴ + 0.5)/10⁴ — DuckDB's ROUND(x, 4) for positive
        // x, unlike rint (half-even), so the oracle can reproduce it
        Seq((nQueries, found,
            math.floor(found * 10000.0 / math.max(nQueries, 1) + 0.5)
              / 10000))
          .toDF("n_queries", "n_found", "recall")
      },
      Some(ivfReplaySql())),

    // Persisted IVF index, SPLIT into separately-benchmarked build
    // and probe gates (VERDICT r11 #1 — three rounds of creep hid in
    // the fused number). The BUILD gate always rebuilds the
    // fixture-path index from scratch and marks it fresh; its output
    // (cell and vector counts of the committed lake tables) is
    // DuckDB-oracled. The PROBE gate finds the fixture fresh and
    // times only the partition-pruned probe — the steady-state op of
    // a 100 TB ANN service, where builds are rare and probes are the
    // workload.
    QueryDef("sim_ivf_index_build",
      (s, dir) => {
        import s.implicits._
        val (_, _, corpus) = plantedSim(s, dir)
        val path = ensureIvfIndex(s, dir, force = true)
        val nCells = graft.lake.LakeTable
          .forPath(s, s"$path/centroids").toDF.count()
        val nVec = graft.lake.LakeTable
          .forPath(s, s"$path/assignments").toDF.count()
        require(nVec == corpus.count(),
          s"index holds $nVec of ${corpus.count()} corpus vectors")
        Seq((nCells, nVec)).toDF("n_cells", "n_vectors")
      },
      Some("""SELECT CAST(16 AS BIGINT) AS n_cells,
             |  CAST(count(*) AS BIGINT) AS n_vectors
             |FROM embeddings""".stripMargin)),

    // Probe-only leg: same planted-near-dup protocol and recall bar
    // as sim_ivf_recall, against the PREBUILT index (the probe-side
    // scan bound — only the probed cells' files — is pinned by the
    // OpsSuite file-count assertion).
    QueryDef("sim_ivf_index_probe",
      (s, dir) => {
        import s.implicits._
        val (src, queries, _) = plantedSim(s, dir)
        val indexPath = ensureIvfIndex(s, dir)
        val approx = SimilarityOps.ivfIndexTopK(
          queries, indexPath, k = 5, nprobe = 4)
        val nQueries = src.count()
        val found = approx
          .filter(col("neighbor_id") === col("qid") - 1000000L).count()
        val recall = if (nQueries == 0) 1.0 else found.toDouble / nQueries
        require(recall >= 0.9,
          s"persisted-IVF recall $recall below 0.9 ($found/$nQueries)")
        // floor(x·10⁴ + 0.5)/10⁴ — DuckDB's ROUND(x, 4) for positive
        // x, unlike rint (half-even), so the oracle can reproduce it
        Seq((nQueries, found,
            math.floor(found * 10000.0 / math.max(nQueries, 1) + 0.5)
              / 10000))
          .toDF("n_queries", "n_found", "recall")
      },
      Some(ivfReplaySql())),

    // FILTERED ANN (round 11): vector search under a metadata
    // predicate — "nearest neighbors among label-even vectors" — the
    // shape every retrieval service actually runs (tenant/language/
    // date filters). The build carries the label into the
    // cell-partitioned assignments so the predicate is a codegen'd
    // filter on the probed cells' scan, never a corpus join. In-gate
    // truth: (a) ZERO returned neighbors may violate the predicate,
    // (b) planted near-dups whose sources satisfy the predicate must
    // be recovered at >= 0.9 — i.e. filtering must not cost the
    // recall the unfiltered gate guarantees.
    QueryDef("sim_ivf_filtered_recall",
      (s, dir) => {
        import s.implicits._
        val e = table(s, dir, "embeddings")
        // queries derive only from sources that SATISFY the filter,
        // so each planted nearest neighbor is inside the searched set
        val src = e.filter(col("vec_id") % 10 === 0 &&
          col("label") % 2 === 0)
        val queries = src.select(
          (col("vec_id") + 1000000L).as("qid"),
          expr("transform(embedding, (x, i) -> " +
            "CAST(x * (1.0d + 0.15d * sin(vec_id * 31 + i)) AS FLOAT))")
            .as("vec"))
        val corpus = e.select(col("vec_id").as("id"),
          col("embedding").as("vec"), col("label"))
        // label-carrying index from a corpus-fingerprinted fixture:
        // builds are rare and probes are the workload (the
        // build/probe split rule sim_ivf_index_build/probe already
        // follows) — re-building the index per run made the clock
        // measure the build, not the filtered probe
        val indexPath = ensureFilteredIvfIndex(s, dir)
        val approx = SimilarityOps.ivfIndexTopK(
          queries, indexPath, k = 5, nprobe = 4,
          filter = "label % 2 = 0")
        val labels = corpus.select(col("id").as("neighbor_id"),
          col("label"))
        val violations = approx.join(labels, "neighbor_id")
          .filter(col("label") % 2 =!= 0).count()
        require(violations == 0L,
          s"$violations neighbors violate the search predicate")
        val nQueries = src.count()
        val found = approx
          .filter(col("neighbor_id") === col("qid") - 1000000L).count()
        val recall = if (nQueries == 0) 1.0 else found.toDouble / nQueries
        require(recall >= 0.9,
          s"filtered-IVF recall $recall below 0.9 ($found/$nQueries)")
        // floor(x·10⁴ + 0.5)/10⁴ — DuckDB's ROUND(x, 4) for positive
        // x, unlike rint (half-even), so the oracle can reproduce it
        Seq((nQueries, found,
            math.floor(found * 10000.0 / math.max(nQueries, 1) + 0.5)
              / 10000))
          .toDF("n_queries", "n_found", "recall")
      },
      Some(ivfReplaySql(
        qExtra = " AND label % 2 = 0",
        candFilter = " AND a.label % 2 = 0"))),

    // IVF-PQ (Jégou et al., TPAMI 2011): the probe ranks candidates
    // from product-quantized residual CODES (pqM small ints + one
    // float per vector) instead of full float vectors, then re-ranks
    // the survivors exactly. Same planted-neighbor recall contract as
    // sim_ivf_index_recall; the in-gate byte assertion pins the point
    // of the compression — the ranking scan's table is a fraction of
    // the full-vector table it replaces.
    QueryDef("sim_ivf_pq_recall",
      (s, dir) => {
        import s.implicits._
        val e = table(s, dir, "embeddings")
        val src = e.filter(col("vec_id") % 10 === 0)
        val queries = src.select(
          (col("vec_id") + 1000000L).as("qid"),
          expr("transform(embedding, (x, i) -> " +
            "CAST(x * (1.0d + 0.15d * sin(vec_id * 31 + i)) AS FLOAT))")
            .as("vec"))
        // build rides the corpus-fingerprinted fixture (built once per
        // corpus, logged there) — the timed leg is the PROBE, the
        // steady-state op of a 100 TB ANN service
        val indexPath = ensurePqIvfIndex(s, dir)
        // the compressed ranking table must be a FRACTION of the
        // full-vector table the ADC scan replaces (probe bytes ∝
        // table bytes: both scans prune to the same probed cells).
        // Metadata-only: two snapshot footer sums, no data scan.
        val codesBytes = graft.lake.LakeTable
          .forPath(s, s"$indexPath/pq_codes").snapshot().sizeInBytes
        val vecBytes = graft.lake.LakeTable
          .forPath(s, s"$indexPath/assignments").snapshot().sizeInBytes
        require(codesBytes * 2 < vecBytes,
          s"PQ codes $codesBytes B should be well under the " +
          s"full vectors' $vecBytes B")
        val approx = SimilarityOps.ivfPqTopK(
          queries, indexPath, k = 5, nprobe = 4, rerank = 64)
        val nQueries = src.count()
        val found = approx
          .filter(col("neighbor_id") === col("qid") - 1000000L).count()
        val recall = if (nQueries == 0) 1.0 else found.toDouble / nQueries
        require(recall >= 0.9,
          s"IVF-PQ recall $recall below 0.9 ($found/$nQueries)")
        // floor(x·10⁴ + 0.5)/10⁴ — DuckDB's ROUND(x, 4) for positive
        // x, unlike rint (half-even), so the oracle can reproduce it
        Seq((nQueries, found,
            math.floor(found * 10000.0 / math.max(nQueries, 1) + 0.5)
              / 10000))
          .toDF("n_queries", "n_found", "recall")
      },
      Some(pqReplaySql())),

    // Cluster-balanced downsampling (topic balancing): nearest of 16
    // deterministic centroids per vector, then each over-represented
    // cluster thins toward the cap via the md5-coordinate keep rate.
    // Fully DuckDB-oracled — the oracle replays assignment (the
    // arg_max-cosine chain every sim_ivf oracle uses), the per-cell
    // counts, the floor(rate·65536) hex threshold, and the md5
    // selection, so the kept (id, cell) set must hash-match row for
    // row; no in-gate requires needed (the under-cap-keeps-all /
    // over-cap-shrinks semantics are pinned on a planted clustered
    // corpus in OpsSuite), so the timed leg is exactly the operator.
    QueryDef("sim_cluster_balance",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val corpus = e.select(col("vec_id").as("id"),
          col("embedding").as("vec"))
        SimilarityOps.clusterBalancedSample(
          corpus, nlist = 16, capPerCluster = 25)
      },
      Some("""WITH emb AS MATERIALIZED (
             |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
             |  FROM embeddings
             |), cent AS (
             |  SELECT id AS cid, v AS cv FROM emb ORDER BY id LIMIT 16
             |), assign AS MATERIALIZED (
             |  SELECT e.id,
             |    arg_max(c.cid, list_cosine_similarity(e.v, c.cv)) AS cell
             |  FROM emb e CROSS JOIN cent c GROUP BY e.id
             |), thr AS (
             |  SELECT cell,
             |    CASE WHEN least(1.0, 25.0 / count(*)) >= 1.0 THEN 'zzzz'
             |      ELSE printf('%04x', CAST(floor(
             |        least(1.0, 25.0 / count(*)) * 65536.0) AS INTEGER))
             |    END AS th
             |  FROM assign GROUP BY cell
             |)
             |SELECT a.id, a.cell FROM assign a JOIN thr USING (cell)
             |WHERE substr(md5(CAST(a.id AS VARCHAR)), 1, 4) < th"""
        .stripMargin)),

    // Multimodal plumbing: binary payloads through the batched decode
    // stub; byte accounting is oracle-checkable.
    QueryDef("multimodal_decode",
      (s, dir) => {
        val media = MultimodalOps.asMediaTable(
          table(s, dir, "documents").withColumn("media",
            encode(col("text"), "UTF-8")),
          "doc_id", "media", "text/plain")
        MultimodalOps.decodeAndFeaturize(media).toDF()
          .select(col("media_id"), col("byte_len"),
            round(col("mean_byte"), 4).as("mean_byte"))
      },
      Some("""WITH bytes AS (
             |  SELECT doc_id, octet_length(encode(text)) AS byte_len,
             |    list_transform(string_split(text, ''), c -> ascii(c)) AS cps
             |  FROM documents)
             |SELECT doc_id AS media_id, CAST(byte_len AS BIGINT) AS byte_len,
             |  ROUND(list_aggregate(cps, 'sum') * 1.0 / byte_len, 4) AS mean_byte
             |FROM bytes""".stripMargin)),

    // REAL multimodal decode (VERDICT r11 #5, extended r13 per ask
    // #1): well-formed BMP, WAV, PNG and JPEG payloads built from
    // closed-form generators, decoded by the actual kernels — the
    // hand-rolled byte parsers (BMP header + bottom-up stride walk,
    // WAV RIFF chunk walk + signed PCM16) and the JDK's own
    // `javax.imageio` codecs (PNG inflate+unfilter; JPEG
    // Huffman+IDCT, exact for the flat-field/quality-1.0 fixture) —
    // and the oracle re-derives pixel/sample sums ARITHMETICALLY
    // from the same closed forms, so a decoder that misreads stride,
    // row order, chunk layout, sample signedness, or raster band
    // layout hash-mismatches. value_sum is an exact integer: no
    // float rounding anywhere in the compare.
    QueryDef("multimodal_decode_real",
      (s, dir) => {
        import s.implicits._
        val ids = table(s, dir, "documents").select(col("doc_id")).as[Long]
        val media = ids.mapPartitions(_.map { id =>
          (id % 4) match {
            case 0 =>
              (id, MultimodalOps.syntheticBmp(id, 17, 9), "image/bmp")
            case 1 =>
              (id, MultimodalOps.syntheticWav(id, 64 + (id % 32).toInt),
                "audio/wav")
            case 2 =>
              (id, MultimodalOps.syntheticPng(id, 17, 9), "image/png")
            case _ =>
              (id, MultimodalOps.syntheticJpeg(id, 16, 16), "image/jpeg")
          }
        }).toDF("media_id", "media", "format")
        MultimodalOps.decodeAndFeaturize(media).toDF()
          .select(col("media_id"), col("n_samples"), col("value_sum"))
      },
      Some("""SELECT doc_id AS media_id, CAST(459 AS BIGINT) AS n_samples,
             |  CAST(list_sum(flatten(list_transform(range(0,9), y ->
             |    flatten(list_transform(range(0,17), x ->
             |      list_transform(range(0,3), c ->
             |        (doc_id*31 + 7*x + 13*y + 5*c) % 256))))))
             |    AS BIGINT) AS value_sum
             |FROM documents WHERE doc_id % 4 IN (0, 2)
             |UNION ALL
             |SELECT doc_id AS media_id,
             |  CAST(64 + doc_id % 32 AS BIGINT) AS n_samples,
             |  CAST(list_sum(list_transform(range(0, 64 + doc_id % 32),
             |    i -> ((doc_id*31 + 7*i) % 2048) - 1024))
             |    AS BIGINT) AS value_sum
             |FROM documents WHERE doc_id % 4 = 1
             |UNION ALL
             |SELECT doc_id AS media_id, CAST(256 AS BIGINT) AS n_samples,
             |  CAST(256 * ((doc_id*31) % 256) AS BIGINT) AS value_sum
             |FROM documents WHERE doc_id % 4 = 3""".stripMargin)),

    // REAL multi-frame decode (VERDICT r13 ask #5): every doc gets an
    // ANIMATED GIF (even ids) or multi-page TIFF (odd ids) of
    // 2 + id%3 frames, pixels on the closed form
    // (id·31 + 7x + 13y + 11f) mod 256; extractFrames enumerates via
    // ImageReader.getNumImages/read(i) and walks each frame's raster
    // for real — the indexed-GIF path additionally exercises palette
    // expansion (3 RGB samples per index → sums exactly 3× TIFF's
    // single gray band). maxFrames = 3 is LIVE: 4-frame payloads must
    // truncate, which the oracle's LEAST mirrors. True video codecs
    // remain the labeled sampleFrames stub.
    // Perceptual image near-dup (dHash): every cross-format twin —
    // the SAME closed-form pixel grid encoded as BMP and as PNG —
    // must collide at Hamming 0 (dHash sees pixels, not bytes; exact
    // byte dedup can never pair these), and the 64 deterministic base
    // gradients are pairwise distinct (suite-pinned), so the planted
    // twins are the ENTIRE pair set and the oracle is closed-form.
    // Candidates come banded (the SimHash 4x16 machinery), never
    // all-pairs.
    QueryDef("multimodal_image_neardup",
      (s, dir) => {
        import s.implicits._
        val n = 64
        val rows =
          parPayloads(n, 0L)(i => MultimodalOps.blockBmp(i, 32, 24))
            .map { case (id, b) => (id, b, "image/bmp") } ++
          parPayloads(n, 100000L)(i => MultimodalOps.blockPng(i, 32, 24))
            .map { case (id, b) => (id, b, "image/png") }
        val media = rows.toDF("media_id", "media", "format")
          .repartition(8)
        val pairs = MultimodalOps.imageNearDupPairs(media, maxHamming = 0)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val twin = col("id_b") === col("id_a") + 100000L
        // one aggregate materializes the persist AND answers both
        // requires — the planted/organic counts were two separate
        // jobs over the cache before
        val counts = pairs.agg(count(lit(1)).as("all"),
          count(when(twin, 1)).as("planted")).head()
        val (all, found) = (counts.getLong(0), counts.getLong(1))
        require(found == n, s"cross-format twins found: $found/$n")
        require(all == found,
          s"${all - found} unexpected non-twin collisions")
        pairs.filter(twin).select(col("id_a"), col("id_b"))
      },
      Some("""SELECT CAST(range AS BIGINT) AS id_a,
             |  CAST(range + 100000 AS BIGINT) AS id_b
             |FROM range(64)""".stripMargin)),

    // Perceptual AUDIO near-dup (envelope hash): each PCM16 recording
    // and its G.711 μ-law COMPANDED copy — different codec, different
    // bytes, same waveform — must collide at Hamming 0. The fixtures'
    // amplitude envelopes are level-spaced wider than G.711's worst
    // quantization step, so window ordering survives companding
    // exactly (suite-pinned); the 64 planted cross-codec pairs are
    // the entire pair set and the oracle is closed-form.
    QueryDef("multimodal_audio_neardup",
      (s, dir) => {
        import s.implicits._
        val n = 64
        val rows =
          parPayloads(n, 0L)(i => MultimodalOps.envelopeWav(i))
            .map { case (id, b) => (id, b, "audio/wav") } ++
          parPayloads(n, 100000L)(i => MultimodalOps.envelopeWavUlaw(i))
            .map { case (id, b) => (id, b, "audio/wav") }
        val media = rows.toDF("media_id", "media", "format")
          .repartition(8)
        val pairs = MultimodalOps.audioNearDupPairs(media, maxHamming = 0)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val twin = col("id_b") === col("id_a") + 100000L
        val counts = pairs.agg(count(lit(1)).as("all"),
          count(when(twin, 1)).as("planted")).head()
        val (all, found) = (counts.getLong(0), counts.getLong(1))
        require(found == n, s"cross-codec twins found: $found/$n")
        require(all == found,
          s"${all - found} unexpected non-twin collisions")
        pairs.filter(twin).select(col("id_a"), col("id_b"))
      },
      Some("""SELECT CAST(range AS BIGINT) AS id_a,
             |  CAST(range + 100000 AS BIGINT) AS id_b
             |FROM range(64)""".stripMargin)),

    // Perceptual VIDEO near-dup (temporal envelope hash): each MJPEG
    // clip and its RE-MUXED copy — identical frames, different
    // container bytes (an extra skippable JUNK chunk) — must collide
    // at Hamming 0; envelope discrimination comes from 65 real frame
    // decodes per clip. Same closed-form-twin oracle shape as the
    // image and audio gates: the 64 planted pairs are the entire set.
    QueryDef("multimodal_video_neardup",
      (s, dir) => {
        import s.implicits._
        val n = 64
        val rows =
          parPayloads(n, 0L)(i =>
            MultimodalOps.levelsMjpegAvi(i, 16, 16))
            .map { case (id, b) => (id, b, "video/avi") } ++
          parPayloads(n, 100000L)(i =>
            MultimodalOps.remuxedMjpegAvi(i, 16, 16))
            .map { case (id, b) => (id, b, "video/avi") }
        val media = rows.toDF("media_id", "media", "format")
          .repartition(16)
        val pairs = MultimodalOps.videoNearDupPairs(media, maxHamming = 0)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val twin = col("id_b") === col("id_a") + 100000L
        val counts = pairs.agg(count(lit(1)).as("all"),
          count(when(twin, 1)).as("planted")).head()
        val (all, found) = (counts.getLong(0), counts.getLong(1))
        require(found == n, s"re-muxed twins found: $found/$n")
        require(all == found,
          s"${all - found} unexpected non-twin collisions")
        pairs.filter(twin).select(col("id_a"), col("id_b"))
      },
      Some("""SELECT CAST(range AS BIGINT) AS id_a,
             |  CAST(range + 100000 AS BIGINT) AS id_b
             |FROM range(64)""".stripMargin)),

    QueryDef("multimodal_frames",
      (s, dir) => {
        // payloads come from a corpus-fingerprinted FIXTURE: encoding
        // 5k animated GIFs is ingest-side work a decode benchmark
        // must not clock (the ensureBpeMerges/exactTruth rule — the
        // steady-state op is decode, so that is what the timed leg
        // sees)
        val media = s.read.parquet(ensureFrameFixtures(s, dir))
        MultimodalOps.extractFrames(media, maxFrames = 3).toDF()
          .select("media_id", "frame_idx", "n_samples", "value_sum")
      },
      Some("""SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx,
             |  CAST(17*9*3 AS BIGINT) AS n_samples,
             |  CAST(3 * list_sum(flatten(list_transform(range(0,9), y ->
             |    list_transform(range(0,17), x ->
             |      (doc_id*31 + 7*x + 13*y + 11*f) % 256))))
             |    AS BIGINT) AS value_sum
             |FROM documents,
             |  UNNEST(range(0, LEAST(2 + doc_id % 3, 3))) AS t(f)
             |WHERE doc_id % 2 = 0
             |UNION ALL
             |SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx,
             |  CAST(17*9 AS BIGINT) AS n_samples,
             |  CAST(list_sum(flatten(list_transform(range(0,9), y ->
             |    list_transform(range(0,17), x ->
             |      (doc_id*31 + 7*x + 13*y + 11*f) % 256))))
             |    AS BIGINT) AS value_sum
             |FROM documents,
             |  UNNEST(range(0, LEAST(2 + doc_id % 3, 3))) AS t(f)
             |WHERE doc_id % 2 = 1""".stripMargin)),

    // REAL video + compressed-audio decode: even docs carry a
    // Motion-JPEG AVI clip (2 + id%3 flat-field 16x16 frames, value
    // (id·31 + 11f) mod 256 — quantization-exact at quality 1.0) that
    // extractFrames walks through the RIFF chunk tree, decoding every
    // 00dc chunk as a real JPEG; odd docs carry a G.711 μ-law WAV
    // whose byte stream (id·31 + 7i) mod 256 expands to 16-bit linear
    // through the segment/mantissa bit math the oracle replays
    // verbatim in SQL. maxFrames = 3 is LIVE (4-frame clips truncate,
    // mirrored by the oracle's LEAST). Only inter-frame video and
    // perceptual audio codecs remain the labeled stub.
    QueryDef("multimodal_video",
      (s, dir) => {
        val media = s.read.parquet(ensureVideoFixtures(s, dir))
        val aviFrames = MultimodalOps.extractFrames(
            media.where(col("format") === "video/avi"), maxFrames = 3)
          .toDF()
          .select(col("media_id"), col("frame_idx"),
            col("n_samples"), col("value_sum"))
        val ulaw = MultimodalOps.decodeAndFeaturize(
            media.where(col("format") === "audio/wav")).toDF()
          .select(col("media_id"), lit(0).as("frame_idx"),
            col("n_samples"), col("value_sum"))
        aviFrames.unionByName(ulaw)
      },
      Some("""WITH ulaw AS MATERIALIZED (
             |  SELECT doc_id,
             |    255 - ((doc_id*31 + 7*i) % 256) AS u
             |  FROM documents,
             |    UNNEST(range(0, 64 + doc_id % 32)) AS t(i)
             |  WHERE doc_id % 2 = 1),
             |lin AS (
             |  SELECT doc_id,
             |    CASE WHEN (u & 128) != 0
             |      THEN 132 - (((u & 15) * 8 + 132) * (1 << ((u >> 4) & 7)))
             |      ELSE (((u & 15) * 8 + 132) * (1 << ((u >> 4) & 7))) - 132
             |    END AS s
             |  FROM ulaw)
             |SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx,
             |  CAST(256 AS BIGINT) AS n_samples,
             |  CAST(256 * ((doc_id*31 + 11*f) % 256) AS BIGINT)
             |    AS value_sum
             |FROM documents,
             |  UNNEST(range(0, LEAST(2 + doc_id % 3, 3))) AS t(f)
             |WHERE doc_id % 2 = 0
             |UNION ALL
             |SELECT doc_id AS media_id, CAST(0 AS INTEGER) AS frame_idx,
             |  CAST(64 + doc_id % 32 AS BIGINT) AS n_samples,
             |  CAST(sum(s) AS BIGINT) AS value_sum
             |FROM lin GROUP BY doc_id""".stripMargin))
  )
}

package graft.queries

/** Generators for DuckDB oracle SQL that replays graft's hash-defined
  * operators bit-for-bit: FNV-1a 64 token/shingle hashing
  * ([[graft.functions.HashedShingles]]), the splitmix64-finalizer
  * minhash family ([[graft.functions.MinHashSig]]), and the 64-bit
  * sign-sum SimHash ([[graft.functions.SimHash64]]).
  *
  * DuckDB has no wrapping 64-bit multiply (BIGINT/UBIGINT arithmetic
  * raises on overflow), so `x * c mod 2^64` is emulated in HUGEINT via
  * a 32-bit split: `x*c = (x_lo*c + ((x_hi*c mod 2^32) << 32)) mod
  * 2^64` — every intermediate stays under 2^97, well inside HUGEINT.
  * Left-shift by 63 also overflows (even for UBIGINT), so bit-63
  * constants are spelled as literals. Signed/unsigned discipline
  * mirrors the Scala exactly: hashing runs unsigned (UBIGINT), minhash
  * minima compare SIGNED (Scala `Long` ordering), SimHash signatures
  * emerge as signed BIGINT.
  *
  * These strings are oracle-side only — the engine never runs them.
  */
object DuckSql {

  /** 2^64 as a DuckDB HUGEINT-context literal. */
  private val P64 = "18446744073709551616"

  /** `(x * c) mod 2^64` for a UBIGINT expression `x` and a decimal
    * 64-bit constant `c`, via the 32-bit split (see object doc).
    */
  def mulMod(x: String, c: String): String =
    s"CAST(((CAST($x & CAST(4294967295 AS UBIGINT) AS HUGEINT) * $c) + " +
      s"(((CAST($x >> 32 AS HUGEINT) * $c) % 4294967296) * 4294967296))" +
      s" % $P64 AS UBIGINT)"

  /** FNV-1a 64 of a VARCHAR expression `s` (ASCII corpus: `ascii` per
    * char == Scala's UTF-16 `charAt`), as UBIGINT. The FNV prime is
    * only 2^40, so the plain HUGEINT product stays under 2^104 — no
    * split needed.
    */
  def fnv64(s: String): String =
    "list_reduce(list_prepend(CAST(14695981039346656037 AS UBIGINT), " +
      s"list_transform(range(1, length($s)+1), " +
      s"ii -> CAST(ascii($s[ii]) AS UBIGINT))), " +
      s"(h, c) -> CAST((CAST(xor(h, c) AS HUGEINT) * 1099511628211)" +
      s" % $P64 AS UBIGINT))"

  /** UBIGINT expression reinterpreted as signed BIGINT (two's
    * complement), the ordering minhash minima use.
    */
  def toSigned(u: String): String =
    s"CAST(CAST($u AS HUGEINT) - CASE WHEN $u >= " +
      s"CAST(9223372036854775808 AS UBIGINT) THEN CAST($P64 AS HUGEINT)" +
      s" ELSE 0 END AS BIGINT)"

  /** Whitespace tokens of the `text` column (Spark `split(_, "\\s+")`
    * semantics on this corpus).
    */
  val toks = "string_split_regex(text, '\\s+')"

  /** Word n-gram shingles of `text` (space-joined; whole text when
    * fewer than `n` tokens) — mirrors [[graft.ops.DedupOps.shingles]].
    */
  def grams(n: Int): String =
    s"CASE WHEN len($toks) < $n THEN [array_to_string($toks, ' ')] " +
      s"ELSE list_transform(range(1, len($toks)-${n - 2}), i -> " +
      s"array_to_string(list_slice($toks, i, i+${n - 1}), ' ')) END"

  /** CTE chain applying the splitmix64 finalizer to UBIGINT column
    * `xin` of CTE `src`; the result lands in column `<prefix>x5` of
    * CTE `<prefix>e`. Staged as columns (not nested inline) to keep
    * the generated SQL linear in size.
    */
  def mixStages(src: String, xin: String, prefix: String): String =
    s"""${prefix}a AS (SELECT *, xor($xin, $xin >> 30) AS ${prefix}x1 FROM $src),
       |${prefix}b AS (SELECT *, ${mulMod(prefix + "x1", "13787848793156543929")} AS ${prefix}x2 FROM ${prefix}a),
       |${prefix}c AS (SELECT *, xor(${prefix}x2, ${prefix}x2 >> 27) AS ${prefix}x3 FROM ${prefix}b),
       |${prefix}d AS (SELECT *, ${mulMod(prefix + "x3", "10723151780598845931")} AS ${prefix}x4 FROM ${prefix}c),
       |${prefix}e AS (SELECT *, xor(${prefix}x4, ${prefix}x4 >> 31) AS ${prefix}x5 FROM ${prefix}d)""".stripMargin

  /** splitmix64 stream seed for minhash function `j` (column `j`):
    * `mix((j+1) * 0x9e3779b97f4a7c15)` — the pre-mix product via
    * [[mulMod]] (j+1 < 2^32, so the simple split suffices).
    */
  val minhashSeed: String =
    mulMod("CAST(j+1 AS UBIGINT)", "11400714819323198485")

  /** CTE chain `docsrc -> sig(doc_id, simhash)`: frequency-weighted
    * 64-bit SimHash over FNV token hashes, signed BIGINT — replays
    * `SimHash64(HashedShingles(text, 1, distinct = false))`. Expects a
    * CTE `docsrc(doc_id, text)` upstream.
    */
  val simhashCtes: String = {
    val simsum = "COALESCE(list_sum(list_transform(range(0,64), b -> " +
      "CASE WHEN 2*len(list_filter(hl, h -> ((h >> b) & " +
      "CAST(1 AS UBIGINT)) = CAST(1 AS UBIGINT))) > len(hl) " +
      "THEN CASE WHEN b = 63 THEN CAST(9223372036854775808 AS HUGEINT) " +
      "ELSE CAST(CAST(1 AS UBIGINT) << b AS HUGEINT) END " +
      "ELSE CAST(0 AS HUGEINT) END)), 0)"
    s"""hl AS (SELECT doc_id, list_transform($toks, s -> ${fnv64("s")}) AS hl FROM docsrc),
       |ss AS (SELECT doc_id, $simsum AS s FROM hl),
       |sig AS (SELECT doc_id, CAST(s - CASE WHEN s >= CAST(9223372036854775808 AS HUGEINT) THEN CAST($P64 AS HUGEINT) ELSE 0 END AS BIGINT) AS simhash FROM ss)""".stripMargin
  }

  /** CTE chain `<src> -> sh(doc_id, sh) -> msig(doc_id, sig)`:
    * distinct FNV 3-gram shingle hashes and the 32-element minhash
    * signature (signed BIGINT list, index order = seed order) —
    * replays `MinHashSig(HashedShingles(text, 3), 32)` over a source
    * CTE/table with (doc_id, text) columns.
    */
  def minhashSigCtes(src: String = "documents"): String =
    s"""sh AS (SELECT doc_id, list_distinct(list_transform(${grams(3)}, g -> ${fnv64("g")})) AS sh FROM $src),
       |el AS (SELECT doc_id, unnest(sh) AS e FROM sh),
       |ej AS (SELECT doc_id, e, unnest(range(0, 32)) AS j FROM el),
       |sj AS (SELECT doc_id, e, j, $minhashSeed AS s0 FROM ej),
       |${mixStages("sj", "s0", "q")},
       |mx AS (SELECT doc_id, e, j, xor(e, qx5) AS m0 FROM qe),
       |${mixStages("mx", "m0", "r")},
       |sgn AS (SELECT doc_id, j, ${toSigned("rx5")} AS h FROM re),
       |mh AS (SELECT doc_id, j, min(h) AS m FROM sgn GROUP BY doc_id, j),
       |msig AS (SELECT doc_id, list(m ORDER BY j) AS sig FROM mh GROUP BY doc_id)""".stripMargin
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-shape utilities for skewed data at scale. */
object JoinOps {

  /** Skew-safe inner equi-join (salting): scatter the probe (large,
    * possibly skewed) side across `salt` buckets with a deterministic
    * per-row salt, replicate the build side once per bucket, and join
    * on (key, salt). A key held by 20% of the probe rows then occupies
    * `salt` shuffle partitions instead of one straggler task.
    *
    * Row-identical to `probe.join(build, key)` for an inner equi-join:
    * every probe row meets exactly one replica of each matching build
    * row. Costs `salt`× the build side's shuffle volume — use for
    * fact-fact joins where the build side is too big to broadcast but
    * far smaller than the probe side; prefer plain broadcast when the
    * build side fits, and rely on AQE skew splitting when its runtime
    * thresholds already catch the skew.
    */
  def saltedJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, salt: Int): DataFrame = {
    require(salt >= 2, "salt must be >= 2 (1 is a plain join)")
    // Deterministic scatter: hash the full probe row (xxhash64 over
    // all columns). Any per-row assignment preserves correctness;
    // hashing the row (not just the key!) is what spreads a hot key.
    val p = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col).toSeq: _*), lit(salt.toLong)))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    p.join(b,
        p(probeKey) === b(buildKey) && p("__salt") === b("__salt"))
      .drop("__salt")
  }
}

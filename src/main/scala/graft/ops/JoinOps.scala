package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-shape utilities for skewed data at scale. */
object JoinOps {

  /** AS-OF (temporal) LEFT join: for each left row, attach the right
    * row with the same `keyCols` and the greatest `rightTime` <=
    * `leftTime` (inclusive), or nulls when no prior right row exists —
    * the point-in-time lookup behind feature stores, slowly-changing
    * dimensions, and market-data joins (DuckDB/kdb `ASOF JOIN`
    * semantics).
    *
    * Implementation is a UNION + running `last(ignoreNulls)` window,
    * not a range join: tag both sides, union them, sort each key's
    * timeline once, and carry the latest right row forward. Right
    * rows order before left rows at equal timestamps, which is what
    * makes the match inclusive.
    *
    * 100 TB shape: ONE shuffle on the join keys (no range-condition
    * join, which Spark would plan as a per-key cross product and
    * filter — quadratic in rows-per-key); the window's running frame
    * is incremental (O(1) state per row) over a spill-safe external
    * sort. The right row's columns travel as a single struct so every
    * attached column comes from the SAME matched row even when some
    * of its fields are legitimately null.
    *
    * `rightValueCols` defaults to all right columns except the keys
    * and `rightTime`. Both sides must share the key column names;
    * rename upstream for differently-keyed inputs.
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTime: String, rightTime: String,
      rightValueCols: Seq[String] = null): DataFrame = {
    require(keyCols.nonEmpty, "asOfJoin needs at least one key column")
    val rvals = Option(rightValueCols).map(_.toSeq).getOrElse(
      right.columns.filterNot(c =>
        keyCols.contains(c) || c == rightTime).toSeq)
    require(rvals.nonEmpty, "asOfJoin needs at least one right value column")
    val TS = "__asof_ts"
    val SIDE = "__asof_side"
    val RV = "__asof_rv"
    val leftCols = left.columns.toSeq
    val rvStruct = struct(rvals.map(c => col(s"`$c`")): _*)
    val rvType = {
      // null literal for the left side, typed like the right struct
      val fields = rvals.map(c => right.schema(c))
      org.apache.spark.sql.types.StructType(fields)
    }
    val lSide = left.select(
      leftCols.map(c => col(s"`$c`")) ++ Seq(
        col(s"`$leftTime`").as(TS), lit(1).as(SIDE),
        lit(null).cast(rvType).as(RV)): _*)
    val rSide = right.select(
      leftCols.map {
        case c if keyCols.contains(c) => col(s"`$c`")
        case c => lit(null).cast(left.schema(c).dataType).as(c)
      } ++ Seq(col(s"`$rightTime`").as(TS), lit(0).as(SIDE),
        rvStruct.as(RV)): _*)
    val w = Window.partitionBy(keyCols.map(c => col(s"`$c`")): _*)
      .orderBy(col(TS), col(SIDE))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn(RV, last(col(RV), ignoreNulls = true).over(w))
      .filter(col(SIDE) === 1)
      .select(leftCols.map(c => col(s"`$c`")) ++
        rvals.map(c => col(s"$RV.`$c`").as(c)): _*)
  }

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

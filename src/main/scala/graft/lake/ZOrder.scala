package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering key for multi-column OPTIMIZE — the
  * Delta `ZORDER BY` analog.
  *
  * Lexicographic `BY (a, b)` clustering gives file-level min/max
  * locality on `a` only: every file spans b's full range and a filter
  * on `b` alone prunes nothing. Interleaving the bits of per-column
  * bucket indices gives every clustered column partial locality, so
  * single-column predicates on ANY of them skip most files.
  *
  * Bucketing is quantile-based (one `approxQuantile` pass over all
  * columns together, boundaries broadcast as literals): equal-mass
  * buckets keep the curve balanced under skew, exactly why range ids
  * beat uniform buckets in Delta's implementation. Numeric, date and
  * timestamp columns bucket by quantile; string columns fall back to a
  * hash bucket (equality locality only — a range filter on a string
  * column won't skip, same caveat as any hash layout). Bucketing is a
  * codegen'd binary search against the broadcast boundary array
  * ([[graft.functions.QuantileBucket]], O(bits) per row) and the
  * interleave is plain bit-op expressions — fully codegen'd, no UDFs;
  * the only driver work is the boundary collection (≤ 2^bits doubles
  * per column).
  */
object ZOrder {

  /** Build the z-value column for `cols` of `df`: per-column bucket
    * index (2^bits quantile buckets) with bits interleaved
    * column-major, so bucket bit b of column c lands at position
    * b·nCols + c.
    */
  def zOrderKey(df: DataFrame, cols: Seq[String], bits: Int = 6): Column = {
    require(cols.nonEmpty, "zOrderKey needs at least one column")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits * nCols must fit a long, got $bits * ${cols.size}")
    val nc = cols.size
    val schema = df.schema
    // derive a double-castable shadow column per sortable input
    val casts: Seq[(String, Option[Column])] = cols.map { c =>
      schema(c).dataType match {
        case _: NumericType => c -> Some(col(s"`$c`").cast("double"))
        case DateType | TimestampType | TimestampNTZType =>
          c -> Some(col(s"`$c`").cast("timestamp").cast("double"))
        case _ => c -> None // string & friends: hash bucket
      }
    }
    val quantileCols = casts.collect { case (c, Some(_)) => c }
    val boundaries: Map[String, Array[Double]] =
      if (quantileCols.isEmpty) Map.empty
      else {
        val shadow = df.select(casts.collect { case (c, Some(e)) =>
          e.as(s"__z_$c")
        }: _*)
        val probs = (1 until (1 << bits))
          .map(i => i.toDouble / (1 << bits)).toArray
        quantileCols.zip(shadow.stat.approxQuantile(
          quantileCols.map(c => s"__z_$c").toArray, probs, 0.01))
          .map { case (c, bs) => c -> bs.distinct.sorted }.toMap
      }
    val buckets: Seq[Column] = casts.map {
      case (c, Some(e)) =>
        // bucket = number of boundaries strictly below the value —
        // binary search in the codegen'd QuantileBucket expression,
        // O(bits) per row instead of the former O(2^bits) when-ladder.
        // NULLs keep the ladder's bucket-0 behavior via coalesce.
        val bs = boundaries(c)
        if (bs.isEmpty) lit(0L)
        else coalesce(
          graft.functions.QuantileBucket(e, bs), lit(0L))
      case (c, None) =>
        pmod(xxhash64(col(s"`$c`")), lit(1L << bits))
    }
    (for {
      b <- 0 until bits
      (bc, ci) <- buckets.zipWithIndex
    } yield shiftleft(
      shiftrightunsigned(bc, b).bitwiseAND(lit(1L)), b * nc + ci))
      .reduce(_.bitwiseOR(_))
  }
}

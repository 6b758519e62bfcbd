package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator coverage for SURVEY.md §2 over the driver test
  * tables (TPC-H-ish star schema + events). Each query exercises one or
  * more inventory rows (P, F, J, A, W, O) and carries a DuckDB oracle.
  *
  * Determinism rules for oracle hash-parity:
  *  - money sums go through DECIMAL(18,2) (exact, associative) and are
  *    cast back to DOUBLE so both engines emit the same schema;
  *  - avg/stddev are rounded to 4 decimals on both sides;
  *  - int sums are cast to BIGINT on the DuckDB side (DuckDB widens to
  *    HUGEINT by default, Spark to LONG);
  *  - timestamps are truncated/cast identically on both sides
  *    (events.ts is ns-precision in the files; Spark reads µs).
  */
object CoreQueries {
  import QueryDef.table

  private def dsum(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast("decimal(18,2)")).cast("double")
  private def odsum(c: String): String =
    s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"

  val all: Seq[QueryDef] = Seq(

    // A1/A6/P5: TPC-H Q1 shape — scan + filter + hash agg (partial+final).
    QueryDef("q1_pricing_summary",
      (s, dir) => table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum("l_quantity").as("sum_qty"),
          dsum("l_extendedprice").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(stddev("l_quantity"), 4).as("stddev_qty"),
          count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             |  ROUND(AVG(l_quantity), 4) AS avg_qty,
             |  ROUND(STDDEV_SAMP(l_quantity), 4) AS stddev_qty,
             |  COUNT(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // P1/P5/P7/P12: projection + SQL-string filter + arithmetic + cast.
    QueryDef("q2_filter_project",
      (s, dir) => table(s, dir, "lineitem")
        .filter("l_returnflag = 'R' AND l_quantity >= 30")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)").cast("double").as("revenue"),
          col("l_shipdate").cast("date").as("ship_dt")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
             |  CAST(l_shipdate AS DATE) AS ship_dt
             |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 30""".stripMargin)),

    // J1/A1: 3-way equi-join + agg (TPC-H Q10 shape). Catalyst broadcasts
    // the customer side at small SF; at scale AQE picks SMJ on the keys.
    QueryDef("q3_join_revenue",
      (s, dir) => {
        val c = table(s, dir, "customer")
        val o = table(s, dir, "orders")
        val l = table(s, dir, "lineitem")
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .filter(col("l_returnflag") === "R")
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT c_custkey, c_name,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             |  COUNT(*) AS n_items
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE l_returnflag = 'R'
             |GROUP BY c_custkey, c_name""".stripMargin)),

    // J1 broadcast dims: customer ⋈ nation ⋈ region rollup.
    QueryDef("q4_region_rollup",
      (s, dir) => {
        val c = table(s, dir, "customer")
        val n = table(s, dir, "nation")
        val r = table(s, dir, "region")
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_customers"),
            dsum("c_acctbal").as("total_acctbal"))
      },
      Some(s"""SELECT r_name, COUNT(*) AS n_customers,
              |  ${odsum("c_acctbal")} AS total_acctbal
              |FROM customer JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |GROUP BY r_name""".stripMargin)),

    // O1/O2: global sort + limit → TakeOrderedAndProject (top-K, no full
    // sort at scale). Deterministic tiebreak on the key.
    QueryDef("q5_topk_orders",
      (s, dir) => table(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderdate").cast("date").as("order_dt")),
      Some("""SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS order_dt
             |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin)),

    // W1: lag/lead over a partitioned ordered window (the reference's
    // interpolation shape, rapid:325-352).
    QueryDef("q6_window_lag",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        QueryDef.events(s, dir)
          .withColumn("prev_value", lag(col("value"), 1).over(w))
          .withColumn("next_value", lead(col("value"), 1).over(w))
          .withColumn("interpolated",
            ((col("prev_value") + col("next_value")) / 2).cast("double"))
          .select("event_id", "user_id", "value", "prev_value", "next_value",
            "interpolated")
      },
      Some("""SELECT event_id, user_id, value,
             |  LAG(value, 1) OVER w AS prev_value,
             |  LEAD(value, 1) OVER w AS next_value,
             |  (LAG(value, 1) OVER w + LEAD(value, 1) OVER w) / 2 AS interpolated
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)),

    // O3: positional union of two filtered branches.
    QueryDef("q7_union",
      (s, dir) => {
        val e = QueryDef.events(s, dir)
        e.filter("event_type = 'signup'").select("event_id", "user_id", "event_type")
          .union(e.filter("event_type = 'purchase'")
            .select("event_id", "user_id", "event_type"))
      },
      Some("""SELECT event_id, user_id, event_type FROM events WHERE event_type = 'signup'
             |UNION ALL
             |SELECT event_id, user_id, event_type FROM events WHERE event_type = 'purchase'""".stripMargin)),

    // F1/P11: from_json with DDL schema + struct flatten (etl/02:228-256).
    QueryDef("q8_json_extract",
      (s, dir) => QueryDef.events(s, dir)
        .withColumn("nested_json", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")))
        .select(col("event_id"), col("event_type"), col("nested_json.*"))
        .groupBy("event_type")
        .agg(sum("k").cast("long").as("sum_k"), count(lit(1)).as("n")),
      Some("""SELECT event_type,
             |  CAST(SUM(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER)) AS BIGINT) AS sum_k,
             |  COUNT(*) AS n
             |FROM events GROUP BY event_type""".stripMargin)),

    // F2/F3: date-part extraction (util:33-38) + agg.
    QueryDef("q9_date_parts",
      (s, dir) => QueryDef.events(s, dir)
        .select(month(col("ts")).as("month"), dayofmonth(col("ts")).as("day"),
          hour(col("ts")).as("hour"), col("value"))
        .groupBy("month", "day", "hour")
        .agg(count(lit(1)).as("n_events"), dsum("value").as("sum_value")),
      Some(s"""SELECT CAST(EXTRACT(month FROM ts) AS INTEGER) AS month,
              |  CAST(EXTRACT(day FROM ts) AS INTEGER) AS day,
              |  CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
              |  COUNT(*) AS n_events, ${odsum("value")} AS sum_value
              |FROM events GROUP BY 1, 2, 3""".stripMargin)),

    // P9/F6: RLIKE regex predicate (etl/01:184-193).
    QueryDef("q10_rlike",
      (s, dir) => table(s, dir, "documents")
        .filter(col("text").rlike("merge .* join"))
        .groupBy("lang").agg(count(lit(1)).as("n_docs")),
      Some("""SELECT lang, COUNT(*) AS n_docs FROM documents
             |WHERE regexp_matches(text, 'merge .* join') GROUP BY lang""".stripMargin)),

    // A4/A5/A6: scalar aggregates incl. count distinct.
    QueryDef("q11_scalar_aggs",
      (s, dir) => table(s, dir, "lineitem")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          min(col("l_shipdate").cast("date")).as("min_ship"),
          max(col("l_shipdate").cast("date")).as("max_ship"),
          dsum("l_extendedprice").as("total_price")),
      Some(s"""SELECT COUNT(*) AS n_rows, COUNT(DISTINCT l_orderkey) AS n_orders,
              |  CAST(MIN(l_shipdate) AS DATE) AS min_ship,
              |  CAST(MAX(l_shipdate) AS DATE) AS max_ship,
              |  ${odsum("l_extendedprice")} AS total_price
              |FROM lineitem""".stripMargin)),

    // Anti-join (NOT EXISTS): orders with no lineitem rows.
    QueryDef("q12_anti_join",
      (s, dir) => {
        val o = table(s, dir, "orders")
        val l = table(s, dir, "lineitem")
        o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
          .select("o_orderkey", "o_orderstatus")
      },
      Some("""SELECT o_orderkey, o_orderstatus FROM orders
             |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)""".stripMargin)),

    // Semi-join (EXISTS): customers that placed a high-value order.
    QueryDef("q13_semi_join",
      (s, dir) => {
        val c = table(s, dir, "customer")
        val o = table(s, dir, "orders").filter("o_totalprice > 400000")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name", "c_mktsegment")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin)),

    // String scalar functions: upper/length/concat/substring.
    QueryDef("q14_string_funcs",
      (s, dir) => table(s, dir, "customer")
        .select(col("c_custkey"),
          upper(col("c_mktsegment")).as("seg_upper"),
          length(col("c_name")).as("name_len"),
          concat(col("c_name"), lit("#"), col("c_mktsegment")).as("tagged"),
          substring(col("c_name"), 1, 8).as("name_prefix")),
      Some("""SELECT c_custkey, UPPER(c_mktsegment) AS seg_upper,
             |  CAST(LENGTH(c_name) AS INTEGER) AS name_len,
             |  c_name || '#' || c_mktsegment AS tagged,
             |  SUBSTRING(c_name, 1, 8) AS name_prefix
             |FROM customer""".stripMargin)),

    // Distinct (set op surface beyond union).
    QueryDef("q15_distinct",
      (s, dir) => table(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus").distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    // Group-by + HAVING.
    QueryDef("q16_having",
      (s, dir) => table(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice").as("spend"))
        .filter("n_orders >= 3"),
      Some(s"""SELECT o_custkey, COUNT(*) AS n_orders, ${odsum("o_totalprice")} AS spend
              |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3""".stripMargin)),

    // CASE WHEN classification + conditional agg.
    QueryDef("q17_case_when",
      (s, dir) => table(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 300000, "high")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("low").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n")),
      Some("""SELECT CASE WHEN o_totalprice > 300000 THEN 'high'
             |            WHEN o_totalprice > 100000 THEN 'mid'
             |            ELSE 'low' END AS bucket, COUNT(*) AS n
             |FROM orders GROUP BY 1""".stripMargin)),

    // W1 ranking variant: top-3 customers per market segment by acctbal.
    QueryDef("q18_rank_per_group",
      (s, dir) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        table(s, dir, "customer")
          .withColumn("rn", row_number().over(w))
          .filter("rn <= 3")
          .select(col("c_mktsegment"), col("rn"), col("c_custkey"), col("c_acctbal"))
      },
      Some("""SELECT c_mktsegment, CAST(rn AS INTEGER) AS rn, c_custkey, c_acctbal FROM (
             |  SELECT c_mktsegment, c_custkey, c_acctbal,
             |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
             |      ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
             |  FROM customer) WHERE rn <= 3""".stripMargin)),

    // Running sum window frame (rowsBetween) over events per user.
    QueryDef("q19_running_sum",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        QueryDef.events(s, dir)
          .select(col("event_id"), col("user_id"),
            sum(col("value").cast("decimal(18,2)")).over(w)
              .cast("double").as("running_value"))
      },
      Some("""SELECT event_id, user_id,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
             |FROM events""".stripMargin)),

    // Multi-way join through the full dim chain with filters on dims.
    QueryDef("q20_star_join",
      (s, dir) => {
        val l = table(s, dir, "lineitem")
        val sup = table(s, dir, "supplier")
        val n = table(s, dir, "nation")
        val p = table(s, dir, "part").filter("p_size <= 15")
        l.join(p, l("l_partkey") === p("p_partkey"))
          .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
          .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"), col("p_brand"))
          .agg(dsum("l_quantity").as("sum_qty"), count(lit(1)).as("n_lines"))
      },
      Some(s"""SELECT n_name, p_brand, ${odsum("l_quantity")} AS sum_qty, COUNT(*) AS n_lines
              |FROM lineitem
              |JOIN part ON l_partkey = p_partkey AND p_size <= 15
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation ON s_nationkey = n_nationkey
              |GROUP BY n_name, p_brand""".stripMargin)),

    // Skew-safe salted join: the probe side is scattered over `salt`
    // buckets and the build side replicated once per bucket, so one
    // hot join key spreads across salt tasks instead of stalling a
    // single straggler. Result identical to the plain join (the
    // oracle IS the plain join) — the idiom for fact-fact joins whose
    // key histogram is Zipfian at 100 TB, complementing AQE's runtime
    // skew splitting (which only triggers past its thresholds).
    QueryDef("q21_salted_skew_join",
      (s, dir) => {
        val l = table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"))
        val o = table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"))
        val salted = graft.ops.JoinOps.saltedJoin(
          l, o, "l_orderkey", "o_orderkey", salt = 8)
        salted.groupBy("o_orderpriority")
          .agg(dsum("l_quantity").as("sum_qty"),
            count(lit(1)).as("n_lines"))
      },
      Some(s"""SELECT o_orderpriority, ${odsum("l_quantity")} AS sum_qty,
              |  COUNT(*) AS n_lines
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |GROUP BY o_orderpriority""".stripMargin)),

    // ROLLUP: hierarchical subtotals in one pass (partial aggregation
    // still map-side; the grouping-set expansion happens pre-shuffle).
    QueryDef("q22_rollup",
      (s, dir) => table(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), dsum("l_quantity").as("sum_qty")),
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
              |  ${odsum("l_quantity")} AS sum_qty
              |FROM lineitem
              |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)),

    // CUBE: the full 2^k grouping-set lattice (ROLLUP's sibling —
    // q22 covers the hierarchy, this covers every margin). One Expand
    // + one shuffle regardless of k; at 100 TB the lattice costs k
    // duplicated lanes map-side, never k separate scans.
    QueryDef("q29_cube",
      (s, dir) => table(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"),
          dsum("o_totalprice").as("total")),
      Some(s"""SELECT o_orderstatus, o_orderpriority,
              |  COUNT(*) AS n_rows, ${odsum("o_totalprice")} AS total
              |FROM orders
              |GROUP BY CUBE (o_orderstatus, o_orderpriority)"""
        .stripMargin)),

    // TPC-H Q8-shaped market share: the widest analytic join in the
    // suite — SEVEN relation instances (lineitem, orders, customer,
    // part, supplier, nation ×2 roles, region), the classic
    // snowflake-with-two-nation-roles shape. Scale design: the ONLY
    // shuffle-worthy edge is lineitem ⋈ orders (fact-fact on
    // orderkey); every dimension — part, supplier, customer, both
    // nation roles, region — is explicitly broadcast, so the plan is
    // one fact-fact join plus a broadcast chain, and AQE coalesces
    // the single aggregation exchange. Selective dim filters (p_type,
    // r_name, o_orderdate range) cut the fact rows before the
    // aggregate; the share ratio is computed from exact decimal sums
    // cast to double (IEEE division is deterministic, so the oracle
    // matches bit-for-bit).
    QueryDef("q30_market_share",
      (s, dir) => {
        val l = table(s, dir, "lineitem")
        val o = table(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
            && col("o_orderdate") <= lit("1997-12-31").cast("timestamp"))
        val c = table(s, dir, "customer")
        val p = table(s, dir, "part").filter(col("p_type") === "PROMO")
        val sup = table(s, dir, "supplier")
        val n1 = table(s, dir, "nation")
          .select(col("n_nationkey").as("c_n_key"),
            col("n_regionkey").as("c_r_key"))
        val n2 = table(s, dir, "nation")
          .select(col("n_nationkey").as("s_n_key"),
            col("n_name").as("supp_nation"))
        val r = table(s, dir, "region").filter(col("r_name") === "EUROPE")
        // cast each FACTOR to decimal before multiplying: the stored
        // doubles recover their exact 2-decimal values under the
        // cast in both engines, and decimal multiplication is exact —
        // casting the double PRODUCT instead lands on .xx5 ties that
        // Spark and DuckDB break differently
        val vol = col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") -
            col("l_discount").cast("decimal(18,2)"))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(p), l("l_partkey") === p("p_partkey"))
          .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
          .join(broadcast(n2), sup("s_nationkey") === col("s_n_key"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n1), c("c_nationkey") === col("c_n_key"))
          .join(broadcast(r), col("c_r_key") === r("r_regionkey"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            sum(when(col("supp_nation") === "NATION_7", vol)
              .otherwise(lit(0).cast("decimal(20,4)"))).as("__num"),
            sum(vol).as("__den"))
          .select(col("o_year"),
            round(col("__num").cast("double") /
              col("__den").cast("double"), 6).as("mkt_share"),
            col("__den").cast("double").as("total_volume"))
      },
      Some("""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             |  ROUND(CAST(SUM(CASE WHEN n2.n_name = 'NATION_7'
             |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
             |        (1 - CAST(l_discount AS DECIMAL(18,2)))
             |      ELSE CAST(0 AS DECIMAL(20,4)) END) AS DOUBLE) /
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6)
             |    AS mkt_share,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             |    AS total_volume
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate <= TIMESTAMP '1997-12-31'
             |JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation n2 ON s_nationkey = n2.n_nationkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation n1 ON c_nationkey = n1.n_nationkey
             |JOIN region ON n1.n_regionkey = r_regionkey
             |  AND r_name = 'EUROPE'
             |GROUP BY 1""".stripMargin)),

    // Correlated SCALAR subquery (TPC-H Q17 shape): each lineitem
    // compares against a per-partkey aggregate of the same table.
    // Catalyst DECORRELATES this into an aggregate + equi-join — the
    // only plan that survives 100 TB (a per-row subquery execution
    // would be O(rows × scan)); the oracle runs the same SQL in
    // DuckDB. Sums ride decimal for cross-engine exactness.
    QueryDef("q35_correlated_scalar",
      (s, dir) => {
        table(s, dir, "lineitem").createOrReplaceTempView("q35_l")
        table(s, dir, "part").createOrReplaceTempView("q35_p")
        s.sql("""
          SELECT p_brand,
            COUNT(*) AS n_small,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
              AS total_price
          FROM q35_l l1 JOIN q35_p ON p_partkey = l_partkey
          WHERE p_size <= 5
            AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
              FROM q35_l l2 WHERE l2.l_partkey = l1.l_partkey)
          GROUP BY p_brand""")
      },
      Some("""SELECT p_brand, COUNT(*) AS n_small,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
             |    AS DOUBLE) AS total_price
             |FROM lineitem l1 JOIN part ON p_partkey = l_partkey
             |WHERE p_size <= 5
             |  AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
             |    FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
             |GROUP BY p_brand""".stripMargin)),

    // EXISTS / NOT EXISTS correlated subqueries (TPC-H Q21/Q22
    // shape): customers above the positive-balance average with no
    // HIGH-VALUE order. Catalyst plans these as semi/anti joins — q12/
    // q13 gate the DataFrame forms; this gates the SQL decorrelation
    // path users actually write.
    QueryDef("q36_exists",
      (s, dir) => {
        table(s, dir, "customer").createOrReplaceTempView("q36_c")
        table(s, dir, "orders").createOrReplaceTempView("q36_o")
        s.sql("""
          SELECT c_mktsegment, COUNT(*) AS n,
            CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
              AS total_bal
          FROM q36_c c
          WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM q36_c
              WHERE c_acctbal > 0)
            AND NOT EXISTS (SELECT 1 FROM q36_o o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 300000)
          GROUP BY c_mktsegment""")
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             |    AS total_bal
             |FROM customer c
             |WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
             |    WHERE c_acctbal > 0)
             |  AND NOT EXISTS (SELECT 1 FROM orders o
             |    WHERE o.o_custkey = c.c_custkey
             |      AND o.o_totalprice > 300000)
             |GROUP BY c_mktsegment""".stripMargin)),

    // Explicit GROUPING SETS (the general form behind q22's ROLLUP
    // and q29's CUBE — hand-picked margins only, with grouping_id()
    // disambiguating which set produced each row). Still ONE Expand +
    // one shuffle; at 100 TB you enumerate the margins you need
    // instead of paying CUBE's full 2^k lattice.
    QueryDef("q34_grouping_sets",
      (s, dir) => table(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")),
            Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum("o_totalprice").as("total"),
          grouping_id().as("gid")),
      Some(s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
              |  ${odsum("o_totalprice")} AS total,
              |  GROUPING(o_orderstatus, o_orderpriority) AS gid
              |FROM orders
              |GROUP BY GROUPING SETS ((o_orderstatus),
              |  (o_orderpriority), ())""".stripMargin)),

    // Set operations beyond UNION (q7): INTERSECT and EXCEPT, both
    // in their deduplicating and ALL (bag-semantics) forms — the
    // audit-diff shape ("which customer keys appear in both segments /
    // only one"). Spark plans these as semi/anti joins or aggregated
    // counts over one shuffle each; nothing drags a distinct through
    // the driver.
    QueryDef("q31_set_ops",
      (s, dir) => {
        val c = table(s, dir, "customer")
        val a = c.filter(col("c_acctbal") > 0)
          .select(col("c_nationkey").as("k"))
        val b = c.filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_nationkey").as("k"))
        a.intersect(b).withColumn("op", lit("intersect"))
          .union(a.except(b).withColumn("op", lit("except")))
          .union(a.intersectAll(b).withColumn("op", lit("intersect_all")))
          .union(a.exceptAll(b).withColumn("op", lit("except_all")))
          .groupBy(col("op"), col("k"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""WITH a AS (SELECT c_nationkey AS k FROM customer
             |    WHERE c_acctbal > 0),
             |b AS (SELECT c_nationkey AS k FROM customer
             |    WHERE c_mktsegment = 'BUILDING'),
             |u AS (
             |  SELECT 'intersect' AS op, k FROM
             |    (SELECT k FROM a INTERSECT SELECT k FROM b)
             |  UNION ALL
             |  SELECT 'except' AS op, k FROM
             |    (SELECT k FROM a EXCEPT SELECT k FROM b)
             |  UNION ALL
             |  SELECT 'intersect_all' AS op, k FROM
             |    (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
             |  UNION ALL
             |  SELECT 'except_all' AS op, k FROM
             |    (SELECT k FROM a EXCEPT ALL SELECT k FROM b))
             |SELECT op, k, COUNT(*) AS n FROM u GROUP BY op, k"""
        .stripMargin)),

    // UNPIVOT (melt): wide → long, the inverse of q23's pivot. The
    // stack() form is codegen'd row expansion — no shuffle at all
    // until the caller aggregates.
    QueryDef("q32_unpivot",
      (s, dir) => table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("stack(3, 'qty', l_quantity, 'price', l_extendedprice, " +
            "'disc', l_discount) AS (measure, val)"))
        .groupBy("measure")
        .agg(count(lit(1)).as("n"),
          dsum("val").as("total")),
      Some(s"""SELECT measure, COUNT(*) AS n,
              |  ${odsum("val")} AS total
              |FROM (
              |  SELECT 'qty' AS measure, l_quantity AS val FROM lineitem
              |  UNION ALL
              |  SELECT 'price', l_extendedprice FROM lineitem
              |  UNION ALL
              |  SELECT 'disc', l_discount FROM lineitem)
              |GROUP BY measure""".stripMargin)),

    // Distribution window functions beyond q18's row_number and q6's
    // lag: ntile quartiles, percent_rank, cume_dist, and a
    // first/last_value frame — the analyst-facing window surface.
    QueryDef("q33_window_suite",
      (s, dir) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
        val wFrame = w.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        table(s, dir, "customer").select(
          col("c_custkey"), col("c_mktsegment"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"),
          first(col("c_custkey")).over(wFrame).as("poorest"),
          last(col("c_custkey")).over(wFrame).as("richest"))
      },
      Some("""SELECT c_custkey, c_mktsegment,
             |  CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
             |  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
             |  ROUND(CUME_DIST() OVER w, 6) AS cume,
             |  FIRST_VALUE(c_custkey) OVER
             |    (w ROWS BETWEEN UNBOUNDED PRECEDING
             |       AND UNBOUNDED FOLLOWING) AS poorest,
             |  LAST_VALUE(c_custkey) OVER
             |    (w ROWS BETWEEN UNBOUNDED PRECEDING
             |       AND UNBOUNDED FOLLOWING) AS richest
             |FROM customer
             |WINDOW w AS (PARTITION BY c_mktsegment
             |  ORDER BY c_acctbal ASC, c_custkey ASC)""".stripMargin)),

    // PIVOT with an explicit value list (never let the engine scan for
    // distinct pivot values at 100 TB — list them).
    QueryDef("q23_pivot",
      (s, dir) => table(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1))),
      Some("""SELECT o_orderpriority,
             |  COUNT(*) FILTER (o_orderstatus = 'F') AS F,
             |  COUNT(*) FILTER (o_orderstatus = 'O') AS O,
             |  COUNT(*) FILTER (o_orderstatus = 'P') AS P
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // Exact interpolated percentiles (Spark `percentile` ==
    // DuckDB `quantile_cont` semantics). For 100 TB pipelines
    // approx_percentile is the scale path; the exact form is the
    // oracle-checkable baseline.
    QueryDef("q24_percentiles",
      (s, dir) => table(s, dir, "events")
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          count(lit(1)).as("n")),
      Some("""SELECT event_type,
             |  ROUND(quantile_cont(value, 0.5), 4) AS p50,
             |  ROUND(quantile_cont(value, 0.9), 4) AS p90,
             |  COUNT(*) AS n
             |FROM events GROUP BY event_type""".stripMargin)),

    // Approximate sketches (round 11): HyperLogLog++ distinct and the
    // approx-percentile quantile sketch — at 100 TB these replace
    // their exact forms (one partial-agg pass, constant sketch state
    // per task, no giant hash table or global sort). The gate proves
    // both: the ORACLE checks the exact legs; the in-gate requires
    // bound each sketch's error against its exact answer (HLL rsd
    // 0.02 → require <= 5%; quantile accuracy 10000 → require <= 1%),
    // so a sketch that silently degrades fails the gate, not a
    // dashboard three months later.
    QueryDef("q28_approx_sketches",
      (s, dir) => {
        import s.implicits._
        val l = table(s, dir, "lineitem")
        // two separate single-pass aggregates: mixing countDistinct
        // with the percentile sketches in ONE agg makes Spark plan an
        // Expand (one duplicated input lane per distinct group) under
        // sort aggregates — measured 16 s vs ~3 s split at sf0.1.
        // The two aggregates are INDEPENDENT jobs over the same scan,
        // so they run concurrently (guide §2.6): the second job's
        // tasks back-fill executors freed by the first one's tail
        // instead of serializing two full scan+agg walls.
        val pFut = scala.concurrent.Future {
          l.agg(
            expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
            expr("approx_percentile(l_extendedprice, 0.5, 10000)")
              .as("approx_p50")).head()
        }(scala.concurrent.ExecutionContext.global)
        val d = l.agg(
          countDistinct($"l_orderkey").as("exact_distinct"),
          approx_count_distinct($"l_orderkey", 0.02)
            .as("approx_distinct")).head()
        val p = scala.concurrent.Await.result(pFut,
          scala.concurrent.duration.Duration.Inf)
        val (ed, ad) = (d.getLong(0), d.getLong(1))
        require(math.abs(ad - ed).toDouble / ed <= 0.05,
          s"HLL distinct off by ${math.abs(ad - ed)} of $ed (> 5%)")
        val (ep, ap) = (p.getDouble(0), p.getDouble(1))
        require(math.abs(ap - ep) / math.abs(ep) <= 0.01,
          s"approx p50 $ap vs exact $ep (> 1%)")
        // the frame is built FROM the probe values — the exact legs
        // already ran once each; re-aggregating them would double the
        // gate's cost for identical numbers
        Seq((ed, math.rint(ep * 10000) / 10000))
          .toDF("exact_distinct", "exact_p50")
      },
      Some("""SELECT count(DISTINCT l_orderkey) AS exact_distinct,
             |  ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50
             |FROM lineitem""".stripMargin)),

    // Array functions over the embedding column (higher-order
    // fold/slice — per-row math, no shuffle).
    QueryDef("q25_array_funcs",
      (s, dir) => table(s, dir, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          round(expr(
            "aggregate(slice(CAST(embedding AS ARRAY<DOUBLE>), 1, 8), " +
              "0D, (acc, x) -> acc + x)"), 4).as("head_sum")),
      Some("""SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
             |  ROUND(list_aggregate(list_slice(CAST(embedding AS DOUBLE[]), 1, 8), 'sum'), 4) AS head_sum
             |FROM embeddings""".stripMargin)),

    // AS-OF join: each purchase event picks up the same user's most
    // recent prior (inclusive) click — the point-in-time lookup shape
    // (feature stores, SCD, market data). Planned as union + running
    // window (ONE shuffle on user_id, O(1) state per row), never a
    // range join's per-key cross product; oracle is DuckDB's native
    // ASOF LEFT JOIN.
    QueryDef("q26_asof_join",
      (s, dir) => {
        val ev = QueryDef.events(s, dir)
        val purchases = ev.filter("event_type = 'purchase'")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val clicks = ev.filter("event_type = 'click'")
          .select(col("user_id"), col("ts").as("click_ts"),
            col("value").as("click_value"))
        graft.ops.JoinOps.asOfJoin(purchases, clicks,
          keyCols = Seq("user_id"), leftTime = "ts",
          rightTime = "click_ts",
          rightValueCols = Seq("click_ts", "click_value"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts, value FROM events
             |  WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, ts AS click_ts, value AS click_value
             |  FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id, p.ts, p.value,
             |  c.click_ts, c.click_value
             |FROM p ASOF LEFT JOIN c
             |  ON p.user_id = c.user_id AND p.ts >= c.click_ts""".stripMargin)),

    // Ordered-sequence funnel: per user, earliest view -> first click
    // strictly after it -> first purchase strictly after that. One
    // shuffle on user_id, k windowed conditional minima — never k
    // joins. Oracle replays the same greedy-earliest chain as
    // explicit per-step joins.
    QueryDef("q27_funnel",
      (s, dir) => graft.ops.SequenceOps.funnel(
        QueryDef.events(s, dir), "user_id", "ts", "event_type",
        steps = Seq("view", "click", "purchase")),
      Some("""WITH s1 AS (
             |  SELECT user_id, MIN(ts) AS t1 FROM events
             |  WHERE event_type = 'view' GROUP BY 1),
             |s2 AS (
             |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
             |  JOIN s1 ON e.user_id = s1.user_id
             |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
             |s3 AS (
             |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
             |  JOIN s2 ON e.user_id = s2.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
             |SELECT u.user_id, s1.t1 AS step_1_ts, s2.t2 AS step_2_ts,
             |  s3.t3 AS step_3_ts,
             |  CAST(CASE WHEN s3.t3 IS NOT NULL THEN 3
             |            WHEN s2.t2 IS NOT NULL THEN 2
             |            WHEN s1.t1 IS NOT NULL THEN 1
             |            ELSE 0 END AS INTEGER) AS funnel_depth
             |FROM (SELECT DISTINCT user_id FROM events) u
             |LEFT JOIN s1 ON u.user_id = s1.user_id
             |LEFT JOIN s2 ON u.user_id = s2.user_id
             |LEFT JOIN s3 ON u.user_id = s3.user_id""".stripMargin))
  )
}

package graft.queries

/** SQL-engine parity queries (SURVEY.md §2.2-§2.6): scan/project/filter,
  * aggregation, every join type, set ops, DISTINCT aggregates, GROUP_CONCAT,
  * variance/stddev family, MEDIAN/PERCENTILE_CONT, window functions
  * (ROWS + time-RANGE frames), limit/top-k, subqueries (scalar/IN/EXISTS/
  * correlated), scalar function surface, LIKE/ESCAPE.
  *
  * Numeric policy for oracle parity: money-like doubles are cast to
  * DECIMAL(18,2) before SUM (exact, order-independent), then cast back to
  * DOUBLE; irreducibly-floating aggregates (avg/var/percentile) are rounded
  * to 4 digits on both sides.
  */
object CoreSql {

  private val discPrice =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

  val qs: Seq[Q] = Seq(

    // ---- aggregation over scan (OP_GROUP + OP_SCAN; TPC-H Q1 shape) ----
    Q.sql("q1_agg",
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         |  CAST(SUM($discPrice) AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM($discPrice * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      bench = true),

    // ---- multi-join + agg + top-k (TPC-H Q3 shape) ----
    Q.sql("q3_join_agg_topk",
      s"""SELECT l_orderkey,
         |  CAST(SUM($discPrice) AS DOUBLE) AS revenue,
         |  o_orderdate, o_orderpriority
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1999-03-15 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1999-03-15 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderdate, l_orderkey
         |LIMIT 10""".stripMargin,
      bench = true),

    // ---- 6-table join with region filter (TPC-H Q5 shape) ----
    // Spark-side join order puts LINEITEM FIRST (r19, guide §3.1): in the
    // customer-first spelling the planner's size-only estimates made the
    // whole unfiltered fact the BROADCAST BUILD side of join #2 (a join
    // output is estimated as the product of its children, so the
    // customer⨝orders subtree always looks bigger than lineitem's pruned
    // scan). Left-deep from lineitem, every build side is a genuinely
    // small filtered relation (orders-by-date, customer, supplier, nation,
    // region) and the fact STREAMS through all five joins; past the
    // broadcast cliff the same shape degrades to the one fundamental
    // l_orderkey shuffle. Inner-join reorder + exact DECIMAL sums = result
    // identical; the oracle keeps the original spelling as proof.
    Q.sql("q5_join_region",
      s"""SELECT n_name, CAST(SUM($discPrice) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON c_custkey = o_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,
      duck = s"""SELECT n_name, CAST(SUM($discPrice) AS DOUBLE) AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,
      bench = true),

    // ---- outer joins ----
    Q.sql("q_join_left",
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin),

    Q.sql("q_join_full",
      """WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
        |     s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
        |SELECT COALESCE(c.nk, s.nk) AS nationkey, n_cust, n_supp
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk
        |ORDER BY nationkey""".stripMargin),

    Q.sql("q_join_cross",
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin),

    Q.sql("q_join_right",
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin),

    Q.sql("q_join_natural",
      """SELECT nationkey, n_name, COUNT(*) AS n_cust
        |FROM (SELECT c_nationkey AS nationkey, c_custkey FROM customer) c
        |NATURAL JOIN (SELECT n_nationkey AS nationkey, n_name FROM nation) n
        |GROUP BY nationkey, n_name ORDER BY nationkey""".stripMargin),

    // ---- HAVING ----
    Q.sql("q_having",
      """SELECT l_suppkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY l_suppkey HAVING COUNT(*) > 80
        |ORDER BY l_suppkey""".stripMargin),

    // ---- GridDB-registered functions through spark.sql ----
    Q.sql("q_fn_compat",
      """SELECT o_orderkey,
        |  strftime('%Y-%m', o_orderdate) AS ym,
        |  hex_to_dec('ff') AS h,
        |  glob('1*', CAST(o_orderkey AS STRING)) AS g
        |FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey""".stripMargin,
      duck = """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  255 AS h,
        |  (CAST(o_orderkey AS VARCHAR) LIKE '1%') AS g
        |FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey""".stripMargin),

    Q.sql("q_agg_compat",
      """SELECT l_returnflag,
        |  ROUND(total(l_quantity), 2) AS tot,
        |  ROUND(stddev0(l_quantity), 4) AS sd,
        |  ROUND(variance0(l_quantity), 4) AS vr
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      duck = """SELECT l_returnflag,
        |  ROUND(COALESCE(SUM(l_quantity), 0), 2) AS tot,
        |  ROUND(COALESCE(stddev_samp(l_quantity), 0), 4) AS sd,
        |  ROUND(COALESCE(var_samp(l_quantity), 0), 4) AS vr
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ---- semi / anti joins (EXISTS / NOT EXISTS decorrelation) ----
    Q.sql("q_join_semi",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin),

    Q.sql("q_join_anti",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 470000)
        |ORDER BY c_custkey""".stripMargin),

    // ---- set operators (UNION/INTERSECT/EXCEPT are DISTINCT-semantics) ----
    Q.sql("q_union",
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin),

    Q.sql("q_union_all",
      """SELECT nationkey, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier) t
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin),

    Q.sql("q_intersect",
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
        |INTERSECT SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
        |ORDER BY nationkey""".stripMargin),

    Q.sql("q_except",
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
        |ORDER BY nationkey""".stripMargin),

    // ---- DISTINCT aggregates ----
    Q.sql("q_distinct_agg",
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_suppkey) AS nd_supp,
        |  CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sd_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ---- GROUP_CONCAT (deterministic: sorted element order) ----
    Q.sql("q_group_concat",
      """SELECT n_name,
        |  array_join(sort_array(collect_list(c_name)), ',') AS names
        |FROM nation JOIN customer ON c_nationkey = n_nationkey
        |WHERE c_acctbal > 9500
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
      duck = """SELECT n_name, string_agg(c_name, ',' ORDER BY c_name) AS names
        |FROM nation JOIN customer ON c_nationkey = n_nationkey
        |WHERE c_acctbal > 9500
        |GROUP BY n_name ORDER BY n_name""".stripMargin),

    // ---- variance / stddev family ----
    Q.sql("q_stats_var_stddev",
      """SELECT l_returnflag,
        |  ROUND(var_samp(l_quantity), 4) AS v_samp,
        |  ROUND(var_pop(l_quantity), 4) AS v_pop,
        |  ROUND(stddev_samp(l_quantity), 4) AS s_samp,
        |  ROUND(stddev_pop(l_quantity), 4) AS s_pop
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ---- MEDIAN / PERCENTILE_CONT (exact interpolated) ----
    Q.sql("q_percentile_median",
      """SELECT l_returnflag,
        |  ROUND(median(l_extendedprice), 4) AS med_price,
        |  ROUND(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p25,
        |  ROUND(percentile_cont(0.90) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ---- window functions: ROW_NUMBER / LAG / LEAD / running SUM ----
    // Spark side range-partitions the scan by o_custkey (r19, guide §2.4):
    // RangePartitioning(o_custkey) satisfies BOTH the Window's clustered
    // distribution AND the final ORDER BY (o_custkey, rn)'s ordered
    // distribution (o_custkey is the ordering prefix, equal keys are
    // co-located, and rn is the window order within each key), so the
    // plan needs ONE exchange instead of a hash exchange for the window
    // plus a full range exchange for the sort. Built via the DataFrame
    // API because the SQL spelling cannot express it: ORDER BY attributes
    // resolved through a derived-table alias carry a different qualifier
    // than the repartition hint's, and RangePartitioning.satisfies
    // compares SortOrders with plain equality — the exchange reappears.
    // SIZE-GATED like Parallelism.spread (r19 A/B, local[32]): the range
    // exchange needs a boundary-sampling pass over the input, a fixed
    // ~2-stage cost that loses below ~tens of MB (sf0.1: 0.355 -> 0.414 s
    // median) and wins once the saved exchange carries real bytes (sf10z
    // 350 MB orders: 3.53 -> 2.89 s median, 1.22x). Both shapes compute
    // the identical ordered row set; the oracle keeps the original SQL.
    Q.df("q_window_row_number",
      duck = """SELECT o_custkey, o_orderkey, rn, prev_price, next_price, running
        |FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER w AS rn,
        |    lag(o_totalprice, 1, -1.0) OVER w AS prev_price,
        |    lead(o_totalprice, 1, -1.0) OVER w AS next_price,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |) t WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
      bench = true) { (s, dir) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      graft.engine.Tables.registerAll(s, dir)
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val orders = s.table("orders")
      val big = orders.queryExecution.optimizedPlan.stats.sizeInBytes >=
        BigInt(64L << 20)
      (if (big) orders.repartitionByRange(col("o_custkey")) else orders)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rn"),
          lag("o_totalprice", 1, -1.0).over(w).as("prev_price"),
          lead("o_totalprice", 1, -1.0).over(w).as("next_price"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(run)
            .cast("double").as("running"))
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    },

    // ---- window with time-RANGE frame (24h trailing avg per user) ----
    Q.sql("q_window_range_time",
      """SELECT event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |        / COUNT(*) OVER w AS avg_24h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY unix_millis(ts)
        |    RANGE BETWEEN 86400000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
      bench = true,
      duck = """SELECT event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |        / COUNT(*) OVER w AS avg_24h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |    RANGE BETWEEN 86400000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin),

    // ---- rank / dense_rank / ntile ----
    Q.sql("q_window_rank",
      """SELECT s_nationkey, s_suppkey,
        |  rank() OVER w AS rk, dense_rank() OVER w AS drk, ntile(4) OVER w AS nt
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
        |ORDER BY s_nationkey, s_suppkey""".stripMargin),

    // ---- distribution windows: percent_rank / cume_dist ----
    Q.sql("q_window_pct",
      """SELECT s_nationkey, s_suppkey,
        |  ROUND(percent_rank() OVER w, 6) AS prk,
        |  ROUND(cume_dist() OVER w, 6) AS cd
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
        |ORDER BY s_nationkey, s_suppkey""".stripMargin),

    // ---- top-k (TakeOrderedAndProject) ----
    Q.sql("q_topk_order_limit",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin),

    // ---- OFFSET paging ----
    Q.sql("q_limit_offset",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 15 OFFSET 5""".stripMargin),

    // ---- subqueries ----
    Q.sql("q_subquery_scalar",
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.9 FROM customer)
        |ORDER BY c_custkey""".stripMargin),

    Q.sql("q_subquery_in",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |  AND o_totalprice > 430000
        |ORDER BY o_orderkey""".stripMargin),

    Q.sql("q_subquery_correlated",
      """SELECT c_custkey,
        |  (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM customer c
        |WHERE c_custkey <= 200
        |ORDER BY c_custkey""".stripMargin),

    // ---- scalar string functions ----
    Q.sql("q_scalar_string_funcs",
      """SELECT p_partkey,
        |  length(p_name) AS len,
        |  upper(p_brand) AS ub,
        |  lower(p_type) AS lt,
        |  substr(p_name, 3, 8) AS sub,
        |  replace(p_name, 'e', '*') AS repl,
        |  instr(p_name, 'ol') AS pos,
        |  translate(p_type, 'AEO', 'aeo') AS tr,
        |  concat(p_brand, '#', p_type) AS cc,
        |  lpad(CAST(p_size AS VARCHAR(8)), 4, '0') AS padded,
        |  ascii(p_name) AS a0
        |FROM part WHERE p_partkey <= 300 ORDER BY p_partkey""".stripMargin),

    // ---- scalar math + conditional ----
    Q.sql("q_scalar_math_case",
      """SELECT o_orderkey,
        |  abs(o_totalprice - 250000.0) AS dist,
        |  ROUND(sqrt(o_totalprice), 4) AS sq,
        |  ROUND(ln(o_totalprice), 4) AS lg,
        |  CAST(floor(o_totalprice / 1000) AS BIGINT) AS fl,
        |  CAST(ceil(o_totalprice / 1000) AS BIGINT) AS ce,
        |  o_orderkey % 7 AS md,
        |  CASE WHEN o_totalprice > 400000 THEN 'big'
        |       WHEN o_totalprice > 200000 THEN 'mid' ELSE 'small' END AS bucket,
        |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS st,
        |  greatest(o_totalprice, 150000.0) AS gr,
        |  least(o_totalprice, 150000.0) AS le
        |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin),

    // ---- time scalar functions (shared dialect subset) ----
    Q.sql("q_time_funcs",
      """SELECT o_orderkey,
        |  extract(year FROM o_orderdate) AS y,
        |  extract(month FROM o_orderdate) AS m,
        |  extract(day FROM o_orderdate) AS d,
        |  date_trunc('month', o_orderdate) AS mon,
        |  o_orderdate + INTERVAL 36 HOUR AS plus36h
        |FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey""".stripMargin),

    // ---- GridDB-dialect time functions (different names across engines) ----
    Q.sql("q_time_funcs_epoch",
      """SELECT o_orderkey,
        |  unix_millis(CAST(o_orderdate AS TIMESTAMP)) AS ep_ms,
        |  (dayofweek(o_orderdate) - 1) AS dow,
        |  dayofyear(o_orderdate) AS doy,
        |  datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS days_since
        |FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey""".stripMargin,
      duck = """SELECT o_orderkey,
        |  epoch_ms(o_orderdate) AS ep_ms,
        |  dayofweek(o_orderdate) AS dow,
        |  dayofyear(o_orderdate) AS doy,
        |  datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since
        |FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey""".stripMargin),

    // ---- per-call timezone arguments (grammar rules 267-283: optional
    // 'Z'/±hh:mm on EXTRACT/STRFTIME/TIMESTAMP_TRUNC/TIMESTAMP_ADD) — the
    // GridDB call forms route through GraftSql's rewriter; the DuckDB
    // oracle shifts by the fixed offset (AT TIME ZONE only takes names) ----
    Q.df("q_time_funcs_tz",
      duck = """SELECT event_id,
        |  extract(hour FROM ts + INTERVAL 330 MINUTE) AS h_ist,
        |  extract(day FROM ts - INTERVAL 480 MINUTE) AS d_pst,
        |  dayofweek(ts + INTERVAL 540 MINUTE) AS dow_jst,
        |  strftime(ts + INTERVAL 540 MINUTE, '%Y-%m-%d %H:%M') AS s_jst,
        |  date_trunc('day', ts + INTERVAL 540 MINUTE) - INTERVAL 540 MINUTE AS day_start_jst,
        |  ts + INTERVAL 2 MONTH AS plus2mo
        |FROM events WHERE event_id <= 300 ORDER BY event_id""".stripMargin) { (s, dir) =>
      graft.engine.Tables.registerAll(s, dir)
      graft.engine.GraftSql.sql(s,
        """SELECT event_id,
          |  EXTRACT(HOUR, ts, '+05:30') AS h_ist,
          |  EXTRACT(DAY, ts, '-08:00') AS d_pst,
          |  EXTRACT(DAY_OF_WEEK, ts, '+09:00') AS dow_jst,
          |  STRFTIME('%Y-%m-%d %H:%M', ts, '+09:00') AS s_jst,
          |  TIMESTAMP_TRUNC(DAY, ts, '+09:00') AS day_start_jst,
          |  TIMESTAMP_ADD(MONTH, ts, 2) AS plus2mo
          |FROM events WHERE event_id <= 300 ORDER BY event_id""".stripMargin)
    },

    // ---- LIKE with ESCAPE ----
    Q.sql("q_like_escape",
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_name LIKE '%wid%' AND p_type LIKE '%ALL%'
        |  AND 'a_b' LIKE 'a!_b' ESCAPE '!'
        |ORDER BY p_partkey""".stripMargin),

    // ---- bit operators (OP_SHIFT_*, OP_BIT_*) ----
    Q.sql("q_bit_ops",
      """SELECT o_orderkey,
        |  shiftleft(o_orderkey, 2) AS shl,
        |  shiftright(o_orderkey, 1) AS shr,
        |  o_orderkey & 255 AS band,
        |  o_orderkey | 4096 AS bor,
        |  CAST(~o_orderkey AS BIGINT) AS bnot,
        |  o_orderkey ^ 1023 AS bxor
        |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin,
      duck = """SELECT o_orderkey,
        |  o_orderkey << 2 AS shl,
        |  o_orderkey >> 1 AS shr,
        |  o_orderkey & 255 AS band,
        |  o_orderkey | 4096 AS bor,
        |  ~o_orderkey AS bnot,
        |  xor(o_orderkey, 1023) AS bxor
        |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin),

    // ---- CAST conversion matrix (GridDB/SQLite truncation semantics) ----
    Q.sql("q_cast_matrix",
      """SELECT o_orderkey,
        |  CAST(CAST(o_orderkey AS VARCHAR(20)) AS BIGINT) AS roundtrip_int,
        |  CAST(o_totalprice AS BIGINT) AS dbl_to_int,
        |  CAST(o_totalprice AS VARCHAR(32)) AS dbl_to_str,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR(32)) AS dec_to_str,
        |  CAST(o_orderkey AS DOUBLE) AS int_to_dbl,
        |  CAST(o_orderkey % 2 AS BOOLEAN) AS int_to_bool
        |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin,
      duck = """SELECT o_orderkey,
        |  CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS roundtrip_int,
        |  CAST(trunc(o_totalprice) AS BIGINT) AS dbl_to_int,
        |  CAST(o_totalprice AS VARCHAR) AS dbl_to_str,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS dec_to_str,
        |  CAST(o_orderkey AS DOUBLE) AS int_to_dbl,
        |  CAST(o_orderkey % 2 AS BOOLEAN) AS int_to_bool
        |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin),

    // ---- NULL tri-state semantics via outer-join-produced nulls ----
    Q.sql("q_null_semantics",
      """WITH big AS (SELECT o_custkey, MAX(o_totalprice) AS maxp
        |             FROM orders WHERE o_totalprice > 470000 GROUP BY o_custkey)
        |SELECT c_custkey,
        |  b.maxp AS maxp,
        |  COALESCE(b.maxp, -1.0) AS maxp_or,
        |  IFNULL(b.maxp, 0.0) AS maxp_if,
        |  NULLIF(COALESCE(b.maxp, -1.0), -1.0) AS renulled,
        |  (b.maxp IS NULL) AS is_missing,
        |  (b.maxp > 480000) AS gt_unknown,
        |  CASE WHEN b.maxp IS NULL THEN 'none'
        |       WHEN b.maxp > 490000 THEN 'huge' ELSE 'big' END AS cls
        |FROM customer LEFT JOIN big b ON c_custkey = b.o_custkey
        |WHERE c_custkey <= 400
        |ORDER BY c_custkey""".stripMargin),

    // ---- CASE-insensitive containment + IN list (filter pushdown shapes) ----
    Q.sql("q_filter_in_between",
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_returnflag IN ('A', 'R')
        |  AND l_quantity BETWEEN 10 AND 12
        |  AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // ---- SQL-text DDL/DML front-end (grammar rules 15-41, 242-251,
    // /root/reference/server/sql_internal_parser.cpp:849-875,:1076-1085):
    // the whole lifecycle — CREATE, INSERT, REPLACE-upsert, column-list
    // INSERT, UPDATE, DELETE — runs as statement text; the oracle recreates
    // the expected final state as a VALUES relation ----
    Q.df("q_sql_ddl_dml",
      duck = """SELECT id, name, temp FROM (VALUES
        |  (1, 'a2', 26.0), (2, 'b', 22.0), (4, 'd', CAST(NULL AS DOUBLE)))
        |  t(id, name, temp)
        |ORDER BY id""".stripMargin) { (s, _) =>
      import graft.engine.GraftSql
      Seq(
        "DROP TABLE IF EXISTS q_ddl_sensors",
        "CREATE TABLE q_ddl_sensors (id INTEGER PRIMARY KEY, name STRING, temp DOUBLE)",
        "INSERT INTO q_ddl_sensors VALUES (1,'a',20.5), (2,'b',21.0), (3,'c',19.0)",
        "REPLACE INTO q_ddl_sensors VALUES (1,'a2',25.0)",
        "INSERT INTO q_ddl_sensors (id, name) VALUES (4, 'd')",
        "UPDATE q_ddl_sensors SET temp = temp + 1.0 WHERE id <= 2",
        "DELETE FROM q_ddl_sensors WHERE name = 'c'"
      ).foreach(GraftSql.sql(s, _))
      GraftSql.sql(s, "SELECT id, name, temp FROM q_ddl_sensors ORDER BY id")
    },

    // ---- GridDB join hints: INDEX_JOIN -> broadcast, NO_INDEX_JOIN ->
    // merge (GraftSql rewrite); a hint must change the PLAN, never the
    // RESULT — the oracle is the unhinted join ----
    Q.df("q_join_hint_index",
      duck = """SELECT n_name, count(*) AS n
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
      graft.engine.Tables.registerAll(s, dir)
      graft.engine.GraftSql.sql(s,
        """SELECT /*+ INDEX_JOIN(nation) */ n_name, COUNT(*) AS n
          |FROM supplier JOIN nation ON s_nationkey = n_nationkey
          |GROUP BY n_name ORDER BY n_name""".stripMargin)
    },
    Q.df("q_join_hint_merge",
      duck = """SELECT n_name, count(*) AS n
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
      graft.engine.Tables.registerAll(s, dir)
      graft.engine.GraftSql.sql(s,
        """SELECT /*+ NO_INDEX_JOIN(nation) */ n_name, COUNT(*) AS n
          |FROM supplier JOIN nation ON s_nationkey = n_nationkey
          |GROUP BY n_name ORDER BY n_name""".stripMargin)
    },

    // ---- interval-partition drop as statement text: DROP PARTITION FOR
    // removes the day bucket containing the literal ----
    Q.df("q_sql_drop_partition",
      duck = """SELECT ts, v FROM (VALUES
        |  (TIMESTAMP '2024-01-01 05:00:00', 1.0),
        |  (TIMESTAMP '2024-01-03 07:00:00', 3.0)) t(ts, v)
        |ORDER BY ts""".stripMargin) { (s, _) =>
      import graft.engine.GraftSql
      Seq(
        "DROP TABLE IF EXISTS q_part_ts",
        """CREATE TABLE q_part_ts (ts TIMESTAMP PRIMARY KEY, v DOUBLE)
          |USING TIMESERIES PARTITION BY RANGE(ts) EVERY (1, DAY)""".stripMargin,
        """REPLACE INTO q_part_ts VALUES
          |  (TIMESTAMP '2024-01-01 05:00:00', 1.0),
          |  (TIMESTAMP '2024-01-02 06:00:00', 2.0),
          |  (TIMESTAMP '2024-01-03 07:00:00', 3.0)""".stripMargin,
        "ALTER TABLE q_part_ts DROP PARTITION FOR (TIMESTAMP '2024-01-02 12:00:00')"
      ).foreach(GraftSql.sql(s, _))
      GraftSql.sql(s, "SELECT ts, v FROM q_part_ts ORDER BY ts")
    },

    // ---- declarative TTL: CREATE TABLE ... WITH (expiration_time=...)
    // (DDLWithParameter::EXPIRATION_*, sql_parser.h:49-53; consumed
    // nosql_command.cpp:2100) + the expiry sweep as a catalog operation.
    // PARTITION expiry drops whole day partitions whose end+TTL passed
    // (checkExpirableInterval, nosql_command.cpp:4193); ROW expiry deletes
    // rows older than now-TTL. Fixed "now" = 2024-01-10 12:00:00Z ----
    Q.df("q_sql_table_ttl",
      duck = """SELECT tab, ts, v FROM (VALUES
        |  ('part', TIMESTAMP '2024-01-08 01:00:00', 3.0),
        |  ('part', TIMESTAMP '2024-01-09 12:00:00', 4.0),
        |  ('part', TIMESTAMP '2024-01-10 09:00:00', 5.0),
        |  ('row',  TIMESTAMP '2024-01-09 01:00:00', 20.0)) t(tab, ts, v)
        |ORDER BY tab, ts""".stripMargin) { (s, _) =>
      import graft.engine.GraftSql
      Seq(
        "DROP TABLE IF EXISTS q_ttl_part",
        "DROP TABLE IF EXISTS q_ttl_row",
        // partition expiry: 2-day TTL over 1-day interval partitions
        """CREATE TABLE q_ttl_part (ts TIMESTAMP PRIMARY KEY, v DOUBLE)
          |USING TIMESERIES
          |WITH (expiration_time=2, expiration_time_unit='DAY')
          |PARTITION BY RANGE(ts) EVERY (1, DAY)""".stripMargin,
        """REPLACE INTO q_ttl_part VALUES
          |  (TIMESTAMP '2024-01-05 06:00:00', 1.0),
          |  (TIMESTAMP '2024-01-07 23:00:00', 2.0),
          |  (TIMESTAMP '2024-01-08 01:00:00', 3.0),
          |  (TIMESTAMP '2024-01-09 12:00:00', 4.0),
          |  (TIMESTAMP '2024-01-10 09:00:00', 5.0)""".stripMargin,
        // row expiry: 36-hour TTL, explicit ROW type + division count
        """CREATE TABLE q_ttl_row (ts TIMESTAMP PRIMARY KEY, v DOUBLE)
          |USING TIMESERIES
          |WITH (expiration_time=36, expiration_time_unit='HOUR',
          |      expiration_division_count=3, expiration_type='ROW')""".stripMargin,
        """REPLACE INTO q_ttl_row VALUES
          |  (TIMESTAMP '2024-01-08 23:00:00', 10.0),
          |  (TIMESTAMP '2024-01-09 01:00:00', 20.0)""".stripMargin
      ).foreach(GraftSql.sql(s, _))
      // the sweep an operator schedules, at a pinned "now": cutoffs are
      // 2024-01-08 12:00 (part; watermark 01-08 00:00) and 01-09 00:00 (row)
      graft.engine.GraftCatalog.forSession(s)
        .expireNow(java.time.Instant.parse("2024-01-10T12:00:00Z").toEpochMilli)
      GraftSql.sql(s,
        """SELECT 'part' AS tab, ts, v FROM q_ttl_part
          |UNION ALL SELECT 'row' AS tab, ts, v FROM q_ttl_row
          |ORDER BY tab, ts""".stripMargin)
    },

    // ---- schema evolution as statement text: ALTER ADD COLUMN fills
    // existing rows with NULL (the reference's fixed-null fill), RENAME
    // COLUMN carries data + metadata; the oracle is the expected literal
    // table ----
    Q.df("q_sql_alter_evolution",
      duck = """SELECT id, label, score FROM (VALUES
        |  (1, 'x', CAST(NULL AS DOUBLE)), (2, 'y', CAST(NULL AS DOUBLE)),
        |  (3, 'z', 7.5)) t(id, label, score)
        |ORDER BY id""".stripMargin) { (s, _) =>
      import graft.engine.GraftSql
      Seq(
        "DROP TABLE IF EXISTS q_alter_tab",
        "CREATE TABLE q_alter_tab (id INTEGER PRIMARY KEY, tag STRING)",
        "INSERT INTO q_alter_tab VALUES (1,'x'), (2,'y')",
        "ALTER TABLE q_alter_tab ADD COLUMN score DOUBLE",
        "ALTER TABLE q_alter_tab RENAME COLUMN tag TO label",
        "INSERT INTO q_alter_tab VALUES (3,'z',7.5)"
      ).foreach(GraftSql.sql(s, _))
      GraftSql.sql(s, "SELECT id, label, score FROM q_alter_tab ORDER BY id")
    },

    // ---- NoSQL point APIs (Container.put/get/remove, multiGet,
    // RowKeyPredicate range) driven end-to-end; the oracle is the expected
    // literal survivor set ----
    Q.df("q_api_point_ops",
      duck = """SELECT id, name FROM (VALUES
        |  (2, 'b2'), (3, 'c'), (4, 'd')) t(id, name)
        |ORDER BY id""".stripMargin) { (s, _) =>
      import org.apache.spark.sql.types._
      val cat = graft.engine.GraftCatalog.forSession(s)
      if (cat.exists("q_point_tab")) cat.dropContainer("q_point_tab")
      cat.createCollection("q_point_tab", StructType(Seq(
        StructField("id", IntegerType, nullable = false),
        StructField("name", StringType))), keyColumns = Seq("id"))
      import s.implicits._
      cat.put("q_point_tab",
        Seq((1, "a"), (2, "b"), (3, "c"), (5, "e")).toDF("id", "name"))
      cat.put("q_point_tab", Seq((2, "b2"), (4, "d")).toDF("id", "name")) // upsert
      cat.remove("q_point_tab", Seq(1))
      // survivors via the batch APIs: multiGet ∪ keyRange — and get() must
      // agree with the upsert
      assert(cat.getRows("q_point_tab", Seq(2)).head().getString(1) == "b2")
      cat.multiGet("q_point_tab", Seq(2, 3))
        .unionByName(cat.keyRange("q_point_tab", from = Some(4), until = Some(5)))
        .orderBy("id")
    },

    // ---- GridStore cross-container batch APIs (GridStore.java:2017
    //      multiPut(Map<container,rows>) and :2174 multiGet(Map<container,
    //      RowKeyPredicate>)) — one call ingests/reads several containers;
    //      per-container semantics (upsert, triggers) unchanged ----
    Q.df("q_api_multi_container",
      duck = """SELECT tab, id FROM (VALUES
        |  ('ta', 1), ('ta', 2), ('tb', 12), ('tb', 13)) t(tab, id)
        |ORDER BY tab, id""".stripMargin) { (s, _) =>
      import org.apache.spark.sql.types._
      import org.apache.spark.sql.functions._
      val cat = graft.engine.GraftCatalog.forSession(s)
      Seq("q_mc_ta", "q_mc_tb").foreach { t =>
        if (cat.exists(t)) cat.dropContainer(t)
        cat.createCollection(t, StructType(Seq(
          StructField("id", IntegerType, nullable = false),
          StructField("v", StringType))), keyColumns = Seq("id"))
      }
      import s.implicits._
      cat.multiPut(Map(
        "q_mc_ta" -> Seq(1 -> "a", 2 -> "b", 3 -> "c").toDF("id", "v"),
        "q_mc_tb" -> Seq(11 -> "x", 12 -> "y", 13 -> "z").toDF("id", "v")))
      // the bounded finish (13) is INCLUSIVE, like RowKeyPredicate
      // .setFinish — the exclusive reading would drop row 13 and fail here
      val got = cat.multiGetAll(Map(
        "q_mc_ta" -> graft.engine.GraftCatalog.KeySet(Seq(1, 2)),
        "q_mc_tb" -> graft.engine.GraftCatalog.KeyRange(Some(12), Some(13))))
      got.toSeq.sortBy(_._1).map { case (t, df) =>
        df.select(lit(t.stripPrefix("q_mc_")).as("tab"), col("id"))
      }.reduce(_ unionByName _).orderBy("tab", "id")
    },

    // ---- Container.query(tql) + GridStore.fetchAll (Container.java:722,
    //      GridStore.java:1871): per-container TQL through the catalog,
    //      batched in one call; results in input order ----
    Q.df("q_api_fetch_all",
      duck = """SELECT tab, id FROM (VALUES
        |  ('fa', 3), ('fa', 2), ('fb', 21)) t(tab, id)
        |ORDER BY tab, id""".stripMargin) { (s, _) =>
      import org.apache.spark.sql.types._
      import org.apache.spark.sql.functions._
      val cat = graft.engine.GraftCatalog.forSession(s)
      Seq("q_fa_ta", "q_fa_tb").foreach { t =>
        if (cat.exists(t)) cat.dropContainer(t)
        cat.createCollection(t, StructType(Seq(
          StructField("id", IntegerType, nullable = false),
          StructField("v", IntegerType))), keyColumns = Seq("id"))
      }
      import s.implicits._
      cat.multiPut(Map(
        "q_fa_ta" -> Seq(1 -> 10, 2 -> 20, 3 -> 30).toDF("id", "v"),
        "q_fa_tb" -> Seq(21 -> 5, 22 -> 50).toDF("id", "v")))
      val res = cat.fetchAll(Seq(
        "q_fa_ta" -> "select * where v >= 20 order by id desc",
        "q_fa_tb" -> "select * where v < 10"))
      res.zip(Seq("fa", "fb")).map { case (df, t) =>
        df.select(lit(t).as("tab"), col("id"))
      }.reduce(_ unionByName _).orderBy("tab", "id")
    },

    // ---- TimeSeries client point APIs (TimeSeries.java:312/:360/:446/:603
    //      get(base, TimeOperator) / interpolate / query(start,end,order) /
    //      aggregate(start,end,col,Aggregation)) driven end-to-end through
    //      the GraftCatalog wrappers; the oracle computes the same values
    //      over the literal fixture (variance/stddev by DuckDB itself) ----
    Q.df("q_api_ts_ops",
      duck = """WITH v(x) AS (VALUES (10.0), (20.0), (40.0), (80.0))
        |SELECT op, CAST(val AS DOUBLE) AS val FROM (
        |  SELECT 'agg_average' AS op, 37.5 AS val
        |  UNION ALL SELECT 'agg_count', 4
        |  UNION ALL SELECT 'agg_maximum', 80
        |  UNION ALL SELECT 'agg_minimum', 10
        |  UNION ALL SELECT 'agg_stddev', (SELECT stddev_samp(x) FROM v)
        |  UNION ALL SELECT 'agg_total', 150
        |  UNION ALL SELECT 'agg_variance', (SELECT var_samp(x) FROM v)
        |  UNION ALL SELECT 'agg_weighted_avg', 35
        |  UNION ALL SELECT 'get_next', 40
        |  UNION ALL SELECT 'get_next_only', 80
        |  UNION ALL SELECT 'get_previous', 20
        |  UNION ALL SELECT 'get_previous_only', 10
        |  UNION ALL SELECT 'interpolate_mid', 30
        |  UNION ALL SELECT 'query_desc_first', 80) t
        |ORDER BY op""".stripMargin) { (s, _) =>
      import org.apache.spark.sql.types._
      import org.apache.spark.sql.functions._
      val cat = graft.engine.GraftCatalog.forSession(s)
      if (cat.exists("q_ts_api_tab")) cat.dropContainer("q_ts_api_tab")
      cat.createTimeSeries("q_ts_api_tab", StructType(Seq(
        StructField("ts", TimestampType, nullable = false),
        StructField("value", DoubleType))), timeColumn = "ts")
      import s.implicits._
      cat.put("q_ts_api_tab",
        Seq(1000L -> 10.0, 2000L -> 20.0, 3000L -> 40.0, 4000L -> 80.0)
          .toDF("ms", "value")
          .select(timestamp_millis(col("ms")).as("ts"), col("value")))
      val T = "q_ts_api_tab"
      def one(op: String, df: org.apache.spark.sql.DataFrame,
              valueCol: String): org.apache.spark.sql.DataFrame =
        df.select(lit(op).as("op"), col(valueCol).cast("double").as("val"))
      Seq(
        one("agg_average", cat.tsAggregate(T, 1000, 4000, "value", "AVERAGE"), "average"),
        one("agg_count", cat.tsAggregate(T, 1000, 4000, "value", "COUNT"), "count"),
        one("agg_maximum", cat.tsAggregate(T, 1000, 4000, "value", "MAXIMUM"), "maximum"),
        one("agg_minimum", cat.tsAggregate(T, 1000, 4000, "value", "MINIMUM"), "minimum"),
        one("agg_stddev",
          cat.tsAggregate(T, 1000, 4000, "value", "STANDARD_DEVIATION"),
          "standard_deviation"),
        one("agg_total", cat.tsAggregate(T, 1000, 4000, "value", "TOTAL"), "total"),
        one("agg_variance", cat.tsAggregate(T, 1000, 4000, "value", "VARIANCE"), "variance"),
        one("agg_weighted_avg",
          cat.tsAggregate(T, 1000, 4000, "value", "WEIGHTED_AVERAGE"),
          "time_avg_value"),
        one("get_next", cat.tsGet(T, 2500, "NEXT"), "value"),
        one("get_next_only", cat.tsGet(T, 3000, "NEXT_ONLY"), "value"),
        one("get_previous", cat.tsGet(T, 2500, "PREVIOUS"), "value"),
        one("get_previous_only", cat.tsGet(T, 2000, "PREVIOUS_ONLY"), "value"),
        one("interpolate_mid", cat.tsInterpolate(T, 2500, "value"), "value"),
        one("query_desc_first",
          cat.tsQuery(T, 1000, 4000, descending = true).limit(1), "value")
      ).reduce(_ unionByName _).orderBy("op")
    },

    // ---- GROUP BY ROLLUP: subtotal grades with GROUPING markers ----
    Q.sql("q_rollup_agg",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
        .stripMargin),

    // ---- partial rollup: plain key + ROLLUP — no global set, so empty
    // input yields zero rows; the RollupEmptyGlobalRow rule must leave
    // this shape untouched (review regression, now driver-checked) ----
    Q.sql("q_rollup_partial",
      """SELECT l_returnflag, l_linestatus,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls
        |FROM lineitem
        |GROUP BY l_returnflag, ROLLUP(l_linestatus)
        |ORDER BY l_returnflag, g_ls, l_linestatus NULLS FIRST"""
        .stripMargin),

    // ---- explicit GROUPING SETS including (): the () set is the global
    // aggregate, present even when a WHERE empties the input ----
    Q.sql("q_grouping_sets_unit",
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf
        |FROM lineitem
        |WHERE l_quantity > 10
        |GROUP BY GROUPING SETS ((l_returnflag), ())
        |ORDER BY g_rf, l_returnflag NULLS FIRST"""
        .stripMargin),

    // ---- GROUP BY CUBE: all grouping-set combinations ----
    Q.sql("q_cube_agg",
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_pr
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY g_st, g_pr, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""
        .stripMargin),

    // ---- PIVOT: per-user event-type counts as columns (fixed value list
    // keeps the schema static — required for a deterministic plan at scale;
    // the oracle is the portable CASE-sum form) ----
    Q.df("q_pivot_events",
      duck = """SELECT user_id,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      graft.engine.Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")
    },

    // ---- equi-width histogram (profiling companion): fixed-width value
    // bins via integer floor arithmetic — identical FP semantics in both
    // engines because bin edges are exact multiples of the width ----
    Q.sql("q_histogram_value",
      """SELECT CAST(FLOOR(value / 25.0) AS INT) AS bin,
        |  COUNT(*) AS n,
        |  CAST(MIN(value) AS DOUBLE) AS lo, CAST(MAX(value) AS DOUBLE) AS hi
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // ---- correlated LATERAL join with per-group ORDER BY/LIMIT (top-N
    // per key as a join, decorrelated by Catalyst) ----
    Q.sql("q_lateral_topn",
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c.c_custkey <= 50
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin),

    // ---- multiset set operators: INTERSECT ALL / EXCEPT ALL keep
    // per-key multiplicity (min / difference of counts) ----
    Q.sql("q_set_ops_all",
      """SELECT 'ia' AS op, n FROM (
        |  SELECT c_nationkey AS n FROM customer
        |  INTERSECT ALL SELECT s_nationkey FROM supplier) ia
        |UNION ALL
        |SELECT 'ea' AS op, n FROM (
        |  SELECT c_nationkey AS n FROM customer
        |  EXCEPT ALL SELECT s_nationkey FROM supplier) ea
        |ORDER BY op, n""".stripMargin),

    // ---- boolean aggregates: bool_and / bool_or / count_if ----
    Q.sql("q_agg_bool",
      """SELECT event_type,
        |  bool_and(value > 0) AS all_pos,
        |  bool_or(value > 190) AS any_high,
        |  CAST(count_if(value > 100) AS BIGINT) AS n_over_100
        |FROM events WHERE value IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin),

    // ---- bivariate statistics: correlation / covariance / regression
    // slope (irreducibly floating → rounded to 4 on both sides, the
    // var/stddev policy) ----
    Q.sql("q_stats_corr",
      """SELECT l_returnflag,
        |  ROUND(corr(l_quantity, l_extendedprice), 4) AS r,
        |  ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS cov_s,
        |  ROUND(covar_pop(l_quantity, l_extendedprice), 4) AS cov_p,
        |  ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  )
}

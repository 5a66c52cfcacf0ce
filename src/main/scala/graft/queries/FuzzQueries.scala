package graft.queries

import scala.util.Random

/** Seeded SQL grammar fuzz queries, driver-oracle-checked.
  *
  * Hand-written queries cover each operator once; these cover operator
  * INTERACTIONS (predicate shapes x aggregates x grouping x windows x
  * joins x set ops) that no single query exercises — the systematic
  * semantics net the reference's own test void (SURVEY §5) leaves open.
  *
  * Every query is generated from a pinned seed as ONE text in the
  * Spark/DuckDB intersection dialect and registered with itself as its
  * oracle, so the driver's DuckDB run differentially checks our whole SQL
  * path (GraftSql rewrite -> Catalyst -> execution) against an independent
  * engine. Generation rules that keep the comparison sound:
  *   - every query ends in ORDER BY over a deterministic non-null key set
  *     (DuckDB sorts NULLS LAST, Spark NULLS FIRST — so sort keys are
  *     always non-null base columns or grouped keys);
  *   - double-typed outputs are ROUND()ed (both engines agree to 1 ulp at
  *     4 decimals; raw double aggregation order is engine-specific);
  *   - no integer `/` anywhere near types the dialects coerce differently;
  *   - LIMIT only after a total order.
  *
  * A wider in-repo net (200 seeds vs Spark itself) runs in SqlFuzzSpec;
  * the registered subset here is the driver-visible sample of it.
  */
object FuzzQueries {

  /** Per-(sf dir, seed) persisted exact indexes for the fz7 indexed-gate
    * chains — built once per JVM, deleted at exit. */
  private val fz7IndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Numeric lineitem columns safe to aggregate. */
  private val nums = Vector("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val strs = Vector("l_returnflag", "l_linestatus")
  private val keys = Vector("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")

  /** The generated lineitem has NO unique key — (l_orderkey, l_linenumber)
    * repeats (60k rows, ~46k distinct pairs) — but full rows are unique, so
    * ordering by every column is the only total order both engines agree
    * on. Row-order-sensitive templates (LIMIT boundaries, ROWS window
    * frames) must use this; anything weaker is tie-broken differently by
    * Spark and DuckDB and diverges. */
  private val totalOrder = (keys ++ nums ++ strs :+ "l_shipdate").mkString(", ")

  private def pick[T](r: Random, xs: Vector[T]): T = xs(r.nextInt(xs.size))

  /** A random scalar numeric expression over lineitem (closed under both
    * dialects; never divides, never mixes strings into arithmetic). */
  private def numExpr(r: Random, depth: Int = 0): String = {
    val leaf = r.nextInt(4) match {
      case 0 => pick(r, nums)
      case 1 => pick(r, keys)
      case 2 => (r.nextInt(20) + 1).toString
      case _ => f"${r.nextDouble() * 10}%.2f"
    }
    if (depth >= 2 || r.nextInt(3) == 0) leaf
    else r.nextInt(4) match {
      case 0 => s"($leaf + ${numExpr(r, depth + 1)})"
      case 1 => s"($leaf - ${numExpr(r, depth + 1)})"
      case 2 => s"($leaf * ${numExpr(r, depth + 1)})"
      case _ => s"ABS($leaf - ${numExpr(r, depth + 1)})"
    }
  }

  /** A random predicate over lineitem. */
  private def pred(r: Random, depth: Int = 0): String = {
    val atom = r.nextInt(6) match {
      case 0 =>
        val op = pick(r, Vector("<", "<=", "=", ">", ">=", "<>"))
        s"${numExpr(r, 1)} $op ${numExpr(r, 1)}"
      case 1 =>
        val lo = r.nextInt(20) + 1; val hi = lo + r.nextInt(30) + 1
        s"${pick(r, nums ++ keys)} BETWEEN $lo AND $hi"
      case 2 =>
        val vals = Vector("'A'", "'N'", "'R'").take(r.nextInt(2) + 1)
        s"l_returnflag IN (${vals.mkString(", ")})"
      case 3 => s"l_linestatus = '${pick(r, Vector("O", "F"))}'"
      case 4 => s"${pick(r, keys)} % ${r.nextInt(7) + 2} = ${r.nextInt(2)}"
      case _ => s"l_shipdate < TIMESTAMP '199${5 + r.nextInt(3)}-0${1 + r.nextInt(9)}-15 00:00:00'"
    }
    if (depth >= 2 || r.nextInt(3) == 0) atom
    else r.nextInt(3) match {
      case 0 => s"($atom AND ${pred(r, depth + 1)})"
      case 1 => s"($atom OR ${pred(r, depth + 1)})"
      case _ => s"(NOT ${pred(r, depth + 1)})"
    }
  }

  /** Aggregate ARGUMENTS follow the q1_agg parity discipline: decimal-cast
    * before SUM (exact, association-order-independent — Spark's tree
    * aggregation and DuckDB's sequential sum then agree bit-for-bit), cast
    * back to DOUBLE outside. ROUND is NOT used: the engines disagree on
    * binary-boundary rounding, and a fuzzer WILL eventually generate a
    * boundary value. */
  private def aggArg(r: Random): String = {
    def dec(c: String) = s"CAST($c AS DECIMAL(18,2))"
    r.nextInt(3) match {
      case 0 => dec(pick(r, nums))
      case 1 => s"(${dec(pick(r, nums))} + ${dec(pick(r, nums))})"
      case _ => s"(${dec(pick(r, nums))} * ${r.nextInt(19) + 1})"
    }
  }

  /** One aggregate call (exact under both engines), with its alias. */
  private def agg(r: Random, i: Int): (String, String) = {
    val a = s"a$i"
    val sql = r.nextInt(6) match {
      case 0 => s"CAST(SUM(${aggArg(r)}) AS DOUBLE) AS $a"
      case 1 => s"CAST(SUM(${aggArg(r)}) AS DOUBLE) / COUNT(*) AS $a" // exact AVG
      case 2 => s"MIN(${pick(r, keys)}) AS $a"
      case 3 => s"MAX(${pick(r, keys)}) AS $a"
      case 4 => s"COUNT(*) AS $a"
      case _ => s"COUNT(DISTINCT ${pick(r, keys ++ strs)}) AS $a"
    }
    (sql, a)
  }

  /** Grouped aggregation over a random predicate. */
  private def groupedAgg(r: Random): String = {
    val gs = r.shuffle(strs).take(r.nextInt(2) + 1)
    val aggs = (0 until r.nextInt(3) + 1).map(i => agg(r, i))
    s"""SELECT ${gs.mkString(", ")}, ${aggs.map(_._1).mkString(", ")}
       |FROM lineitem WHERE ${pred(r)}
       |GROUP BY ${gs.mkString(", ")}
       |ORDER BY ${gs.mkString(", ")}""".stripMargin
  }

  /** Global aggregation (no GROUP BY) — exercises empty-group semantics. */
  private def globalAgg(r: Random): String = {
    val aggs = (0 until r.nextInt(3) + 2).map(i => agg(r, i))
    // COUNT(*) included so the single row is stable even on empty input
    s"""SELECT COUNT(*) AS cnt, ${aggs.map(_._1).mkString(", ")}
       |FROM lineitem WHERE ${pred(r)}
       |ORDER BY cnt""".stripMargin
  }

  /** Scalar projection + filter + total order + LIMIT. Per-row double
    * arithmetic is the SAME fixed IEEE expression tree in both engines
    * (no reassociation), so raw unrounded doubles compare bit-for-bit. */
  private def projection(r: Random): String = {
    val exprs = (0 until r.nextInt(3) + 1).map(i => s"(${numExpr(r)}) AS e$i")
    val caseE = s"CASE WHEN ${pred(r, 1)} THEN '${pick(r, Vector("hi", "lo"))}'" +
      s" ELSE '${pick(r, Vector("mid", "na"))}' END AS tag"
    s"""SELECT l_orderkey, l_linenumber, $caseE, ${exprs.mkString(", ")}
       |FROM lineitem WHERE ${pred(r)}
       |ORDER BY $totalOrder LIMIT ${200 + r.nextInt(400)}""".stripMargin
  }

  /** Window functions over a deterministic order. */
  private def windowed(r: Random): String = {
    val part = pick(r, strs)
    val fn = r.nextInt(3) match {
      case 0 => "ROW_NUMBER()"
      case 1 => "RANK()"
      case _ => "DENSE_RANK()"
    }
    // decimal-cast the frame sum (exact both engines) over the full total
    // order — a ROWS frame over a non-unique order is tie-broken
    // differently per engine and silently diverges
    val agg2 = s"CAST(SUM(CAST(${pick(r, nums)} AS DECIMAL(18,2))) OVER " +
      s"(PARTITION BY $part ORDER BY $totalOrder ROWS BETWEEN " +
      s"${r.nextInt(5) + 1} PRECEDING AND CURRENT ROW) AS DOUBLE)"
    s"""SELECT l_orderkey, l_linenumber, $part,
       |  $fn OVER (PARTITION BY $part ORDER BY $totalOrder) AS rk,
       |  $agg2 AS wsum
       |FROM lineitem WHERE ${pred(r)}
       |ORDER BY $totalOrder LIMIT 500""".stripMargin
  }

  /** lineitem x orders join with per-side filters. */
  private def joined(r: Random): String = {
    val jt = pick(r, Vector("JOIN", "LEFT JOIN"))
    val aggs = (0 until r.nextInt(2) + 1).map(i => agg(r, i))
    // LEFT JOIN keeps unmatched lineitem rows; group keys stay non-null
    s"""SELECT l_returnflag, o_orderstatus, COUNT(*) AS cnt, ${aggs.map(_._1).mkString(", ")}
       |FROM lineitem $jt orders ON l_orderkey = o_orderkey
       |  AND o_totalprice > ${1000 + r.nextInt(100000)}
       |WHERE ${pred(r)}
       |GROUP BY l_returnflag, o_orderstatus
       |ORDER BY l_returnflag, o_orderstatus NULLS FIRST""".stripMargin
  }

  /** Set operation between two filtered projections of the same shape. */
  private def setOp(r: Random): String = {
    val op = pick(r, Vector("UNION", "UNION ALL", "INTERSECT", "EXCEPT"))
    val cols = "l_orderkey, l_linenumber, l_returnflag"
    // ORDER BY every output column: tied rows are then bit-identical, so
    // any tie order hashes the same
    s"""SELECT * FROM (
       |  SELECT $cols FROM lineitem WHERE ${pred(r)}
       |  $op
       |  SELECT $cols FROM lineitem WHERE ${pred(r)}
       |) t ORDER BY l_orderkey, l_linenumber, l_returnflag""".stripMargin
  }

  /** Generate the pinned text for seed `s` (pure function of the seed). */
  private[graft] def genSql(s: Int): String = {
    val r = new Random(s)
    r.nextInt(6) match {
      case 0 => groupedAgg(r)
      case 1 => globalAgg(r)
      case 2 => projection(r)
      case 3 => windowed(r)
      case 4 => joined(r)
      case _ => setOp(r)
    }
  }

  // ---------- v2 generator: the interaction shapes v1 leaves untested —
  // HAVING, IN / EXISTS / scalar subqueries, DISTINCT projections,
  // CASE-in-aggregate. A SEPARATE generator, not new cases in genSql:
  // changing genSql's draw fan-out would reinterpret every pinned seed. ----

  /** Grouped aggregation gated by HAVING over exact aggregates. */
  private def havingAgg(r: Random): String = {
    val g = pick(r, strs)
    val aggs = (0 until r.nextInt(2) + 1).map(i => agg(r, i))
    val hav = r.nextInt(3) match {
      case 0 => s"COUNT(*) > ${50 + r.nextInt(5000)}"
      case 1 => s"MIN(${pick(r, keys)}) >= ${r.nextInt(50)}"
      case _ => s"SUM(CAST(${pick(r, nums)} AS DECIMAL(18,2))) > ${100 + r.nextInt(10000)}"
    }
    s"""SELECT $g, COUNT(*) AS cnt, ${aggs.map(_._1).mkString(", ")}
       |FROM lineitem WHERE ${pred(r)}
       |GROUP BY $g HAVING $hav
       |ORDER BY $g""".stripMargin
  }

  /** IN / NOT IN over an orders subquery (non-null key on both sides, so
    * NOT IN's three-valued trap stays closed). */
  private def inSubquery(r: Random): String = {
    val not = if (r.nextBoolean()) "NOT " else ""
    s"""SELECT l_returnflag, COUNT(*) AS cnt,
       |  ${agg(r, 0)._1}
       |FROM lineitem
       |WHERE ${pred(r)}
       |  AND l_orderkey ${not}IN (SELECT o_orderkey FROM orders
       |    WHERE o_totalprice > ${1000 + r.nextInt(200000)})
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  }

  /** Correlated EXISTS / NOT EXISTS against orders. */
  private def existsSubquery(r: Random): String = {
    val not = if (r.nextBoolean()) "NOT " else ""
    val st = pick(r, Vector("'O'", "'F'", "'P'"))
    s"""SELECT l_linestatus, COUNT(*) AS cnt
       |FROM lineitem
       |WHERE ${pred(r)}
       |  AND ${not}EXISTS (SELECT 1 FROM orders
       |    WHERE o_orderkey = l_orderkey AND o_orderstatus = $st)
       |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin
  }

  /** Scalar subquery in the predicate (exact MIN/MAX/COUNT only — an AVG
    * here would reassociate doubles differently per engine). */
  private def scalarSubquery(r: Random): String = {
    val fn = pick(r, Vector("MIN", "MAX"))
    s"""SELECT l_orderkey, l_linenumber, l_returnflag
       |FROM lineitem
       |WHERE ${pred(r)}
       |  AND l_orderkey <= (SELECT $fn(o_orderkey) FROM orders
       |    WHERE o_totalprice > ${50000 + r.nextInt(100000)})
       |ORDER BY $totalOrder LIMIT ${100 + r.nextInt(300)}""".stripMargin
  }

  /** DISTINCT projection over derived columns. */
  private def distinctProj(r: Random): String = {
    val m = r.nextInt(7) + 2
    s"""SELECT DISTINCT l_returnflag, l_linestatus, ${pick(r, keys)} % $m AS km
       |FROM lineitem WHERE ${pred(r)}
       |ORDER BY l_returnflag, l_linestatus, km""".stripMargin
  }

  /** Conditional aggregation: SUM(CASE ...) with decimal-cast arms. */
  private def caseAgg(r: Random): String = {
    val g = pick(r, strs)
    s"""SELECT $g,
       |  CAST(SUM(CASE WHEN ${pred(r, 1)}
       |    THEN CAST(${pick(r, nums)} AS DECIMAL(18,2))
       |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS csum,
       |  COUNT(*) AS cnt
       |FROM lineitem WHERE ${pred(r)}
       |GROUP BY $g ORDER BY $g""".stripMargin
  }

  /** v2 pinned text for seed `s` — same stability policy as genSql. */
  private[graft] def genSql2(s: Int): String = {
    val r = new Random(0x5EED2 + s)
    r.nextInt(6) match {
      case 0 => havingAgg(r)
      case 1 => inSubquery(r)
      case 2 => existsSubquery(r)
      case 3 => scalarSubquery(r)
      case 4 => distinctProj(r)
      case _ => caseAgg(r)
    }
  }

  // ---------- v3 generator: the window-function shapes v1's single
  // windowed() template never draws — LAG/LEAD with explicit defaults,
  // FIRST/LAST_VALUE under asymmetric frames, NTILE, RANGE frames with
  // numeric offsets (peer-group semantics make duplicate order keys safe),
  // UNBOUNDED bounds, PERCENT_RANK/CUME_DIST, and ROLLUP/CUBE + GROUPING().
  // Again a separate generator so old pinned seeds keep their meaning. ----

  /** LAG/LEAD over the total order: the returned value is copied, not
    * recomputed, so raw doubles compare bit-for-bit. Integer defaults keep
    * the coercion identical in both dialects. */
  private def lagLead(r: Random): String = {
    val part = pick(r, strs)
    val off = r.nextInt(4) + 1
    val c1 = pick(r, keys); val c2 = pick(r, nums)
    s"""SELECT l_orderkey, l_linenumber, $part,
       |  LAG($c1, $off, ${r.nextInt(100) - 50}) OVER (PARTITION BY $part ORDER BY $totalOrder) AS lg,
       |  LEAD($c2, ${r.nextInt(3) + 1}) OVER (PARTITION BY $part ORDER BY $totalOrder) AS ld
       |FROM lineitem WHERE ${pred(r)}
       |ORDER BY $totalOrder LIMIT ${200 + r.nextInt(300)}""".stripMargin
  }

  /** FIRST_VALUE / LAST_VALUE under explicit asymmetric ROWS frames. The
    * frame endpoints land on specific rows of the total order, so the
    * picked values are engine-independent. */
  private def firstLast(r: Random): String = {
    val part = pick(r, strs)
    val c = pick(r, nums ++ keys)
    val frame = r.nextInt(3) match {
      case 0 => s"ROWS BETWEEN UNBOUNDED PRECEDING AND ${r.nextInt(4) + 1} FOLLOWING"
      case 1 => s"ROWS BETWEEN ${r.nextInt(4) + 1} PRECEDING AND CURRENT ROW"
      case _ => "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"
    }
    s"""SELECT l_orderkey, l_linenumber, $part,
       |  FIRST_VALUE($c) OVER (PARTITION BY $part ORDER BY $totalOrder $frame) AS fv,
       |  LAST_VALUE($c) OVER (PARTITION BY $part ORDER BY $totalOrder $frame) AS lv
       |FROM lineitem WHERE ${pred(r)}
       |ORDER BY $totalOrder LIMIT ${200 + r.nextInt(300)}""".stripMargin
  }

  /** NTILE bucketing + partition COUNT over the same window spec. */
  private def ntileBuckets(r: Random): String = {
    val part = pick(r, strs)
    s"""SELECT l_orderkey, l_linenumber, $part,
       |  NTILE(${r.nextInt(6) + 2}) OVER (PARTITION BY $part ORDER BY $totalOrder) AS nt,
       |  COUNT(*) OVER (PARTITION BY $part) AS pc
       |FROM lineitem WHERE ${pred(r)}
       |ORDER BY $totalOrder LIMIT ${200 + r.nextInt(300)}""".stripMargin
  }

  /** RANGE frame with numeric offsets over a single integer order key.
    * RANGE is peer-group-based: duplicate keys all receive the same
    * aggregate, so no tie-break divergence is possible — the one frame
    * family where a NON-unique order is sound by construction. Aggregates
    * stay decimal-exact. */
  private def rangeFrame(r: Random): String = {
    val key = pick(r, Vector("l_orderkey", "l_partkey", "l_suppkey"))
    val lo = r.nextInt(50) + 1; val hi = r.nextInt(50) + 1
    val frame = s"RANGE BETWEEN $lo PRECEDING AND $hi FOLLOWING"
    s"""SELECT l_orderkey, l_linenumber, $key AS okey,
       |  CAST(SUM(CAST(${pick(r, nums)} AS DECIMAL(18,2))) OVER (ORDER BY $key $frame) AS DOUBLE) AS rsum,
       |  COUNT(*) OVER (ORDER BY $key $frame) AS rcnt
       |FROM lineitem WHERE ${pred(r)}
       |ORDER BY $totalOrder LIMIT ${200 + r.nextInt(300)}""".stripMargin
  }

  /** PERCENT_RANK / CUME_DIST: rank ratios are small-integer divisions —
    * the same IEEE division in both engines, bit-identical. */
  private def percentCume(r: Random): String = {
    val part = pick(r, strs)
    s"""SELECT l_orderkey, l_linenumber, $part,
       |  PERCENT_RANK() OVER (PARTITION BY $part ORDER BY $totalOrder) AS pr,
       |  CUME_DIST() OVER (PARTITION BY $part ORDER BY $totalOrder) AS cd
       |FROM lineitem WHERE ${pred(r)}
       |ORDER BY $totalOrder LIMIT ${200 + r.nextInt(300)}""".stripMargin
  }

  /** ROLLUP / CUBE with GROUPING() disambiguation, following the
    * q_rollup_agg discipline (CAST GROUPING AS INT; NULLS FIRST order). */
  private def rollupCube(r: Random): String = {
    val op = pick(r, Vector("ROLLUP", "CUBE"))
    val gs = r.shuffle(strs).take(2)
    val aggs = (0 until r.nextInt(2) + 1).map(i => agg(r, i))
    s"""SELECT ${gs.mkString(", ")}, COUNT(*) AS cnt, ${aggs.map(_._1).mkString(", ")},
       |  ${gs.zipWithIndex.map { case (g, i) => s"CAST(GROUPING($g) AS INT) AS g$i" }.mkString(", ")}
       |FROM lineitem WHERE ${pred(r)}
       |GROUP BY $op(${gs.mkString(", ")})
       |ORDER BY ${gs.indices.map(i => s"g$i").mkString(", ")}, ${gs.map(g => s"$g NULLS FIRST").mkString(", ")}""".stripMargin
  }

  /** v3 pinned text for seed `s` — same stability policy as genSql. */
  private[graft] def genSql3(s: Int): String = {
    val r = new Random(0x5EED3 + s)
    r.nextInt(6) match {
      case 0 => lagLead(r)
      case 1 => firstLast(r)
      case 2 => ntileBuckets(r)
      case 3 => rangeFrame(r)
      case 4 => percentCume(r)
      case _ => rollupCube(r)
    }
  }

  // ---------- v4 generator: the TIME-TYPED family over the events table —
  // timestamp predicates, date_trunc bucketing, RANGE BETWEEN INTERVAL
  // frames, EXTRACT fields, LAG/cumulative windows over the (ts, event_id)
  // order. Motivation: the round-7 NTZ regression broke exactly this
  // family and stayed invisible because each timestamp shape had ONE
  // hand-written query; a generator makes any timestamp-semantics drift
  // fail dozens of driver-checked queries at once. ----

  /** events' total order: event_id is unique. */
  private val evOrder = "event_id"
  private val evTypes = Vector("view", "click", "purchase", "signup", "error")

  /** A random predicate over events (time + attribute mix). */
  private def evPred(r: Random, depth: Int = 0): String = {
    val atom = r.nextInt(5) match {
      case 0 =>
        val d = 1 + r.nextInt(27); val h = r.nextInt(24)
        val op = pick(r, Vector("<", ">=", ">"))
        f"ts $op TIMESTAMP '2024-01-$d%02d $h%02d:00:00'"
      case 1 =>
        val lo = 1 + r.nextInt(20); val hi = lo + 1 + r.nextInt(7)
        f"ts BETWEEN TIMESTAMP '2024-01-$lo%02d 00:00:00' AND TIMESTAMP '2024-01-$hi%02d 00:00:00'"
      case 2 =>
        val vals = r.shuffle(evTypes).take(1 + r.nextInt(3))
        s"event_type IN (${vals.map(v => s"'$v'").mkString(", ")})"
      case 3 => s"value ${pick(r, Vector("<", ">", ">=", "<="))} ${50 + r.nextInt(150)}"
      case _ => s"user_id % ${2 + r.nextInt(6)} = ${r.nextInt(2)}"
    }
    if (depth >= 2 || r.nextInt(3) == 0) atom
    else r.nextInt(3) match {
      case 0 => s"($atom AND ${evPred(r, depth + 1)})"
      case 1 => s"($atom OR ${evPred(r, depth + 1)})"
      case _ => s"(NOT ${evPred(r, depth + 1)})"
    }
  }

  /** date_trunc bucketing + exact aggregates per bucket. */
  private def truncAgg(r: Random): String = {
    val unit = pick(r, Vector("hour", "day", "week"))
    s"""SELECT date_trunc('$unit', ts) AS bucket, event_type, COUNT(*) AS cnt,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sval,
       |  MIN(event_id) AS first_ev
       |FROM events WHERE ${evPred(r)}
       |GROUP BY bucket, event_type
       |ORDER BY bucket, event_type""".stripMargin
  }

  /** Time-RANGE frame: peers share a ts, so the non-unique order is safe;
    * the frame bound is a literal INTERVAL both dialects accept. */
  private def rangeInterval(r: Random): String = {
    val mins = 10 + r.nextInt(170)
    val part = if (r.nextBoolean()) "PARTITION BY event_type " else ""
    s"""SELECT event_id, event_type,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (${part}ORDER BY ts
       |    RANGE BETWEEN INTERVAL $mins MINUTES PRECEDING AND CURRENT ROW) AS DOUBLE) AS wsum,
       |  COUNT(*) OVER (${part}ORDER BY ts
       |    RANGE BETWEEN INTERVAL $mins MINUTES PRECEDING AND CURRENT ROW) AS wcnt
       |FROM events WHERE ${evPred(r)}
       |ORDER BY $evOrder LIMIT ${200 + r.nextInt(300)}""".stripMargin
  }

  /** EXTRACT fields in predicate and projection. Fields restricted to the
    * cross-dialect-identical set: DOW is Sunday=1 in Spark but Sunday=0 in
    * DuckDB/Postgres (the first v4 sweep flagged all 11 DOW draws), so
    * day-of-week stays out of the differential net — the GridDB-dialect
    * DAY_OF_WEEK (Sunday=0, reference util/time.cpp:970) is separately
    * oracle-checked through griddb_extract in q_time_funcs. */
  private def extractShape(r: Random): String = {
    val field = pick(r, Vector("HOUR", "MINUTE", "DAY", "MONTH"))
    val hours = r.shuffle((0 until 24).toVector).take(4 + r.nextInt(8))
    s"""SELECT EXTRACT($field FROM ts) AS f, event_type, COUNT(*) AS cnt,
       |  MAX(event_id) AS last_ev
       |FROM events
       |WHERE ${evPred(r)} AND EXTRACT(HOUR FROM ts) IN (${hours.mkString(", ")})
       |GROUP BY f, event_type
       |ORDER BY f, event_type""".stripMargin
  }

  /** LAG/LEAD over the per-user time order (event_id breaks ts ties). */
  private def evLagLead(r: Random): String = {
    s"""SELECT event_id, user_id,
       |  LAG(value, ${1 + r.nextInt(3)}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv,
       |  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nt
       |FROM events WHERE ${evPred(r)}
       |ORDER BY $evOrder LIMIT ${200 + r.nextInt(300)}""".stripMargin
  }

  /** Cumulative ROWS frame over the unique (ts, event_id) order. */
  private def evCumulative(r: Random): String = {
    s"""SELECT event_id, user_id,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
       |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum,
       |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |FROM events WHERE ${evPred(r)}
       |ORDER BY $evOrder LIMIT ${200 + r.nextInt(300)}""".stripMargin
  }

  // ---------- v5 generator: MULTI-TABLE JOIN TREES — 3-table chains with
  // mixed INNER/LEFT joins, FULL OUTER with per-side null accounting,
  // RIGHT-join row outputs, and join-inside-subquery semi shapes. v1's
  // joined() stops at one 2-table join; join planning (reorder, null
  // handling through outer joins, ON-vs-WHERE placement) is the heart of
  // an analytics engine and gets its own family. ----

  private def ordPred(r: Random): String = r.nextInt(3) match {
    case 0 => s"o_totalprice > ${1000 + r.nextInt(150000)}"
    case 1 => s"o_orderstatus = '${pick(r, Vector("O", "F", "P"))}'"
    case _ => s"o_orderpriority IN ('1-URGENT', '2-HIGH')"
  }

  private def custPred(r: Random): String = r.nextInt(3) match {
    case 0 => s"c_mktsegment = '${pick(r, Vector("BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"))}'"
    case 1 => s"c_acctbal > ${r.nextInt(5000)}"
    case _ => s"c_nationkey < ${5 + r.nextInt(20)}"
  }

  /** L -> O -> C chain with independently drawn INNER/LEFT joins and an
    * extra ON-side condition (semantically different from WHERE under
    * LEFT — exactly the placement distinction worth fuzzing). */
  private def chainAgg(r: Random): String = {
    val jt1 = pick(r, Vector("JOIN", "LEFT JOIN"))
    val jt2 = pick(r, Vector("JOIN", "LEFT JOIN"))
    s"""SELECT l_returnflag, c_mktsegment, COUNT(*) AS cnt,
       |  COUNT(c_custkey) AS n_cust,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq
       |FROM lineitem
       |$jt1 orders ON l_orderkey = o_orderkey AND ${ordPred(r)}
       |$jt2 customer ON o_custkey = c_custkey AND ${custPred(r)}
       |WHERE ${pred(r)}
       |GROUP BY l_returnflag, c_mktsegment
       |ORDER BY l_returnflag, c_mktsegment NULLS FIRST""".stripMargin
  }

  /** FULL OUTER join with per-side null accounting: COUNT(side key)
    * exposes exactly which rows matched. Both inputs pre-filtered so both
    * null-extension directions occur. */
  private def fullOuterAgg(r: Random): String = {
    s"""SELECT o_orderstatus, COUNT(*) AS cnt,
       |  COUNT(l_orderkey) AS n_left, COUNT(o_orderkey) AS n_right,
       |  MIN(l_linenumber) AS min_ln
       |FROM (SELECT * FROM lineitem WHERE ${pred(r, 1)}) l
       |FULL JOIN (SELECT * FROM orders WHERE ${ordPred(r)}) o
       |  ON l_orderkey = o_orderkey
       |GROUP BY o_orderstatus
       |ORDER BY o_orderstatus NULLS FIRST""".stripMargin
  }

  /** RIGHT JOIN row output: unmatched orders surface null lineitem
    * columns; the ORDER BY totalizes over o_orderkey + every lineitem
    * column NULLS FIRST (lineitem full rows are unique). */
  private def rightJoinRows(r: Random): String = {
    val nullsFirst = (keys ++ nums :+ "l_returnflag").map(c => s"$c NULLS FIRST")
    s"""SELECT o_orderkey, o_orderstatus, l_orderkey, l_linenumber, l_returnflag, l_quantity
       |FROM (SELECT * FROM lineitem WHERE ${pred(r, 1)}) l
       |RIGHT JOIN orders ON l_orderkey = o_orderkey
       |WHERE ${ordPred(r)}
       |ORDER BY o_orderkey, ${nullsFirst.mkString(", ")} LIMIT ${300 + r.nextInt(300)}""".stripMargin
  }

  /** Join inside an IN-subquery: the planner must decorrelate through a
    * 2-table join. */
  private def semiThroughJoin(r: Random): String = {
    val not = if (r.nextBoolean()) "NOT " else ""
    s"""SELECT l_linestatus, COUNT(*) AS cnt,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp
       |FROM lineitem
       |WHERE ${pred(r)}
       |  AND l_orderkey ${not}IN (SELECT o_orderkey FROM orders
       |    JOIN customer ON o_custkey = c_custkey
       |    WHERE ${custPred(r)} AND ${ordPred(r)})
       |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin
  }

  /** v5 pinned text for seed `s` — same stability policy as genSql. */
  private[graft] def genSql5(s: Int): String = {
    val r = new Random(0x5EED5 + s)
    r.nextInt(4) match {
      case 0 => chainAgg(r)
      case 1 => fullOuterAgg(r)
      case 2 => rightJoinRows(r)
      case _ => semiThroughJoin(r)
    }
  }

  /** v4 pinned text for seed `s` — same stability policy as genSql. */
  private[graft] def genSql4(s: Int): String = {
    val r = new Random(0x5EED4 + s)
    r.nextInt(5) match {
      case 0 => truncAgg(r)
      case 1 => rangeInterval(r)
      case 2 => extractShape(r)
      case 3 => evLagLead(r)
      case _ => evCumulative(r)
    }
  }

  // ---------- v6 generator: LLM-pipeline operator CHAINS (round-9 ask #7).
  // Unlike v1-v5 (one SQL text run by both engines), each draw yields a
  // Spark PIPELINE composing the graft.pipeline operators PLUS a DuckDB
  // CTE chain implementing identical semantics — the differential proof
  // that the operators COMPOSE, not only pass standalone. Stage order is
  // canonical (quality -> repetition -> exact-dedup -> per-source cap ->
  // n-gram decontam -> sequence pack); presence and parameters are drawn
  // per seed with at least two stages per chain. Every stage's SQL is the
  // proven mapping from the hand-written curation oracles (v2/v5/v6 and
  // q_pipeline_pack_sequences). The corpus is always doc_id % 97 <> 0 and
  // the decontamination benchmark the % 97 == 0 complement, matching those
  // oracles.

  import org.apache.spark.sql.{DataFrame, SparkSession}

  private[graft] def genFuzz6(s: Int): ((SparkSession, String) => DataFrame, String) = {
    val r = new Random(0x5EED6 + s)
    var useQuality = r.nextBoolean()
    val minTok = Seq(5, 10, 20)(r.nextInt(3))
    val minUniq = Seq("0.2", "0.3", "0.4")(r.nextInt(3))
    val useRep = r.nextBoolean()
    val maxDup = Seq("0.5", "0.6", "0.7")(r.nextInt(3))
    val useDedup = r.nextBoolean()
    var useCap = r.nextBoolean()
    val capK = Seq(5, 10, 25)(r.nextInt(3))
    val useDecon = r.nextBoolean()
    // n >= 3: on the driver's 30-word-vocabulary corpus every document
    // shares some BIGRAM with the benchmark slice, so n=2 decontaminates
    // the corpus to zero rows — a degenerate (empty-vs-empty) differential
    val deconN = Seq(3, 4, 5)(r.nextInt(3))
    val usePack = r.nextBoolean()
    val budget = Seq(100L, 200L)(r.nextInt(2))
    // at least two stages, without disturbing any draw above
    if (Seq(useQuality, useRep, useDedup, useCap, useDecon, usePack).count(identity) < 2) {
      useQuality = true; useCap = true
    }

    val ctes = scala.collection.mutable.ArrayBuffer.empty[String]
    var prev = "c0"
    ctes += "c0 AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 97 <> 0)"
    def add(name: String, sql: String): Unit = { ctes += s"$name AS ($sql)"; prev = name }

    if (useQuality) add("cq",
      s"""SELECT doc_id, source, text FROM $prev
         |  WHERE len(string_split(lower(text), ' ')) >= $minTok
         |    AND CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE)
         |      / len(string_split(lower(text), ' ')) >= $minUniq""".stripMargin)
    if (useRep) add("cr",
      s"""SELECT doc_id, source, text FROM (
         |    SELECT doc_id, source, text,
         |      list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS t
         |    FROM $prev)
         |  WHERE len(t) = 0
         |     OR CAST(len(t) - len(list_distinct(t)) AS DOUBLE) / len(t) <= $maxDup""".stripMargin)
    if (useDedup) add("cd",
      s"""SELECT doc_id, source, text FROM $prev
         |  WHERE doc_id IN (SELECT MIN(doc_id) FROM $prev GROUP BY text)""".stripMargin)
    if (useCap) add("cc",
      s"""SELECT doc_id, source, text FROM (
         |    SELECT doc_id, source, text, row_number() OVER (PARTITION BY source
         |      ORDER BY CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE)
         |        / len(string_split(lower(text), ' ')) DESC, doc_id) AS rn
         |    FROM $prev)
         |  WHERE rn <= $capK""".stripMargin)
    if (useDecon) {
      val m = deconN - 1
      ctes += s"""ng_c AS (SELECT doc_id, array_to_string(t[i:i+$m], ' ') AS ng FROM
         |    (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
         |     FROM $prev) b,
         |    UNNEST(generate_series(1, len(t)-$m)) AS u(i))""".stripMargin
      ctes += s"""ng_b AS (SELECT DISTINCT array_to_string(t[i:i+$m], ' ') AS ng FROM
         |    (SELECT list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
         |     FROM documents WHERE doc_id % 97 = 0) bb,
         |    UNNEST(generate_series(1, len(t)-$m)) AS u(i))""".stripMargin
      add("cx",
        s"""SELECT doc_id, source, text FROM $prev
           |  WHERE doc_id NOT IN (SELECT DISTINCT ng_c.doc_id FROM ng_c JOIN ng_b USING (ng))""".stripMargin)
    }
    val duck =
      if (!usePack)
        s"WITH RECURSIVE ${ctes.mkString(",\n")}\nSELECT doc_id, source FROM $prev ORDER BY doc_id"
      else {
        ctes += s"""pd AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
           |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 4 AS INTEGER) AS shard,
           |    len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS tok
           |  FROM $prev)""".stripMargin
        ctes += "po AS (SELECT pd.*, row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS rn FROM pd)"
        ctes += s"""pp AS (
           |  SELECT shard, rn, doc_id, CAST(1 AS BIGINT) AS pack_id, tok AS pack_used
           |  FROM po WHERE rn = 1
           |  UNION ALL
           |  SELECT po.shard, po.rn, po.doc_id,
           |    CASE WHEN pp.pack_used + po.tok <= $budget THEN pp.pack_id ELSE pp.pack_id + 1 END,
           |    CASE WHEN pp.pack_used + po.tok <= $budget THEN pp.pack_used + po.tok ELSE po.tok END
           |  FROM pp JOIN po ON po.shard = pp.shard AND po.rn = pp.rn + 1)""".stripMargin
        s"WITH RECURSIVE ${ctes.mkString(",\n")}\nSELECT shard, doc_id, pack_id, pack_used FROM pp ORDER BY shard, doc_id"
      }

    val builder = (sp: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      val all = graft.engine.Tables.read(sp, dir, "documents")
      val bench = all.filter(col("doc_id") % 97 === 0)
      var d = all.filter(col("doc_id") % 97 =!= 0).select("doc_id", "source", "text")
      if (useQuality) d = d.join(
        graft.pipeline.TextAnalysis.quality(d, "text", "doc_id")
          .filter(col("n_tokens") >= minTok && col("uniq_ratio") >= minUniq.toDouble)
          .select("doc_id"), "doc_id")
      if (useRep) d = d.join(
        graft.pipeline.TextAnalysis.repetitionMetrics(d, "text", "doc_id")
          .filter(col("dup_word_frac") <= maxDup.toDouble).select("doc_id"), "doc_id")
      if (useDedup) d = graft.pipeline.Dedup.exactDedup(d, "text", "doc_id")
        .select("doc_id", "source", "text")
      if (useCap) {
        val toks = split(lower(col("text")), " ")
        val scored = d.withColumn("score",
          size(array_distinct(toks)).cast("double") / size(toks))
        d = graft.pipeline.Curation
          .capPerGroupByScore(scored, "source", "score", "doc_id", capK)
          .drop("score")
      }
      if (useDecon) d = d.join(
        graft.pipeline.Curation.ngramOverlap(d, "doc_id", "text", bench, "text", n = deconN)
          .select("doc_id"), Seq("doc_id"), "left_anti")
      if (!usePack) d.select("doc_id", "source").orderBy("doc_id")
      else {
        val withTok = d.withColumn("__tok",
          size(filter(split(col("text"), "\\s+"), x => x =!= "")).cast("long"))
        graft.pipeline.Curation.packSequences(withTok, "doc_id", "__tok", budget, shards = 4)
          .select("shard", "doc_id", "pack_id", "pack_used")
          .orderBy("shard", "doc_id")
      }
    }
    (builder, duck)
  }

  /** Seeded incremental-ingest chains (r14): a batch/corpus split drawn
    * per seed (modulus, threshold, optional planted cross-corpus copies),
    * an optional batch quality pre-filter, the incremental EXACT dedup
    * gate ([[graft.pipeline.Dedup.incrementalExactDedup]]: keep-min within
    * the batch, drop texts the corpus already has), and an optional
    * post-stage (per-source cap or deterministic shard shuffle) — each
    * with a GENERATED DuckDB oracle replaying the same chain, so the whole
    * ingest surface joins the differential net. */
  private[graft] def genFuzz7(s: Int): ((SparkSession, String) => DataFrame, String) = {
    val r = new Random(0x5EED7 + s)
    val (m, t) = Seq((10, 7), (7, 5), (13, 9), (10, 6))(r.nextInt(4))
    val plantMod = Seq(0, 2, 3)(r.nextInt(3)) // 0 = no planted copies
    val useQuality = r.nextBoolean()
    val minTok = Seq(5, 10)(r.nextInt(2))
    // post-stage: 0 = none, 1 = per-source cap, 2 = shard shuffle
    val post = r.nextInt(3)
    val capK = Seq(5, 10)(r.nextInt(2))
    val nShards = Seq(4, 8)(r.nextInt(2))
    val salt = s"fz7_$s"
    // r16 (r15 verdict #9): half the chains run the exact gate through a
    // PERSISTED ExactIndex built on the corpus instead of the direct
    // anti-join — same oracle (the gate is result-equal by contract,
    // q_dedup_incremental_exact_indexed pins it), so any index-path
    // divergence fails the DuckDB compare. Drawn LAST so seeds 0-9 keep
    // their existing upstream draws bit-identical.
    val useIndex = r.nextBoolean()

    val ctes = scala.collection.mutable.ArrayBuffer.empty[String]
    var prev = "batch0"
    ctes += s"batch0 AS (SELECT doc_id, source, text FROM documents WHERE doc_id % $m >= $t)"
    val plantSql = if (plantMod > 0)
      s"\n  UNION ALL SELECT text FROM batch0 WHERE doc_id % $plantMod = 0" else ""
    ctes += s"corpus AS (SELECT text FROM documents WHERE doc_id % $m < $t$plantSql)"
    def add(name: String, sql: String): Unit = { ctes += s"$name AS ($sql)"; prev = name }
    if (useQuality) add("bq",
      s"""SELECT doc_id, source, text FROM $prev
         |  WHERE len(string_split(lower(text), ' ')) >= $minTok""".stripMargin)
    add("keep",
      s"SELECT MIN(doc_id) AS doc_id FROM $prev GROUP BY text")
    // prev is now "keep"; the fresh CTE joins back to the LAST batch stage
    val batchStage = if (useQuality) "bq" else "batch0"
    add("fresh",
      s"SELECT b.* FROM $batchStage b JOIN keep USING (doc_id)")
    add("surv",
      s"""SELECT doc_id, source, text FROM fresh f
         |  WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = f.text)""".stripMargin)
    val duck = post match {
      case 1 =>
        add("capd",
          s"""SELECT doc_id, source FROM (
             |    SELECT doc_id, source, row_number() OVER (PARTITION BY source
             |      ORDER BY CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE)
             |        / len(string_split(lower(text), ' ')) DESC, doc_id) AS rn
             |    FROM surv)
             |  WHERE rn <= $capK""".stripMargin)
        s"WITH ${ctes.mkString(",\n")}\nSELECT doc_id, source FROM capd ORDER BY doc_id"
      case 2 =>
        add("sh",
          s"""SELECT doc_id,
             |  ('0x' || substr(md5('$salt#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
             |  FROM surv""".stripMargin)
        s"""WITH ${ctes.mkString(",\n")}
           |SELECT doc_id, CAST(hv % $nShards AS INT) AS shard,
           |  CAST(row_number() OVER (PARTITION BY hv % $nShards ORDER BY hv, doc_id) AS INT) AS pos
           |FROM sh ORDER BY shard, pos""".stripMargin
      case _ =>
        s"WITH ${ctes.mkString(",\n")}\nSELECT doc_id, source FROM surv ORDER BY doc_id"
    }

    val builder = (sp: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions._
      val all = graft.engine.Tables.read(sp, dir, "documents")
      var batch = all.filter(col("doc_id") % m >= t)
        .select("doc_id", "source", "text")
      val corpus0 = all.filter(col("doc_id") % m < t).select("text")
      val corpus = if (plantMod > 0)
        corpus0.unionByName(batch.filter(col("doc_id") % plantMod === 0).select("text"))
      else corpus0
      if (useQuality) batch = batch.join(
        graft.pipeline.TextAnalysis.quality(batch, "text", "doc_id")
          .filter(col("n_tokens") >= minTok).select("doc_id"), "doc_id")
      val surv = if (useIndex) {
        // corpus ids must be disjoint from batch ids (the gate's id-space
        // contract): the %m<t split keeps its own ids, planted copies are
        // re-keyed NEGATIVE like the registered planted corpus
        val corpusIds = {
          val base = all.filter(col("doc_id") % m < t).select(col("doc_id"), col("text"))
          if (plantMod > 0)
            base.unionByName(all.filter(col("doc_id") % m >= t)
              .filter(col("doc_id") % plantMod === 0)
              .select((-(col("doc_id") + 1)).as("doc_id"), col("text")))
          else base
        }
        // memoized per (sf dir, seed) and cleaned at JVM exit: a sweep of
        // hundreds of chains (or a builder re-invoked by compare retries)
        // must not rebuild — or orphan — one digest tree per call
        val path = fz7IndexCache.computeIfAbsent(s"$dir#$s", _ => {
          val p = java.nio.file.Files.createTempDirectory(s"graft_fz7_ex_$s").toString
          Runtime.getRuntime.addShutdownHook(new Thread(() =>
            org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))))
          graft.pipeline.ExactIndex.build(corpusIds, "text", "doc_id", p)
          p
        })
        graft.pipeline.ExactIndex.dedupBatch(batch, "text", "doc_id", path)
      } else graft.pipeline.Dedup
        .incrementalExactDedup(batch, corpus, "text", "doc_id")
      post match {
        case 1 =>
          val toks = split(lower(col("text")), " ")
          val scored = surv.withColumn("score",
            size(array_distinct(toks)).cast("double") / size(toks))
          graft.pipeline.Curation
            .capPerGroupByScore(scored, "source", "score", "doc_id", capK)
            .select("doc_id", "source").orderBy("doc_id")
        case 2 =>
          graft.pipeline.Curation
            .shuffleShards(surv, "doc_id", salt, nShards)
            .select("doc_id", "shard", "pos").orderBy("shard", "pos")
        case _ =>
          surv.select("doc_id", "source").orderBy("doc_id")
      }
    }
    (builder, duck)
  }

  /** TVF/DDL-form chains (r17, r16 verdict #8 extension): statements are
    * the SQL TABLE-FUNCTION and index-DDL surface added in r16/r17 —
    * GRAFT_SEARCH_BM25 (plain and COMPOSED through a join),
    * GRAFT_DECONTAMINATE, and GRAFT_DEDUP_GATE over an index created by
    * CREATE DEDUP INDEX (half the gate draws also ALTER INDEX ... APPEND
    * and gate a second batch against the appended tree). Every form
    * replays in DuckDB, so a divergence anywhere in the registry-TVF
    * lowering, the DDL build, or the append path fails the compare. */
  private val fz8IndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def genFuzz8(s: Int): ((SparkSession, String) => DataFrame, String) = {
    // golden-ratio scramble: java.util.Random's FIRST draw is heavily
    // correlated across sequential seeds (all 10 pinned seeds drew the
    // same form before the mix)
    val r = new Random((0x5EED8L + s) * 0x9E3779B97F4A7C15L)
    val form = r.nextInt(4)
    val vocab = Seq("spark", "join", "merge", "data", "query", "stream",
      "index", "table")

    def bm25Ctes(srcPred: String, terms: Seq[String]): String =
      s"""toks AS (
         |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> len(t) > 0) AS t
         |  FROM documents$srcPred),
         |dl AS (SELECT doc_id, len(t) AS dl FROM toks),
         |stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
         |hits AS (SELECT doc_id, w FROM (SELECT doc_id, unnest(t) AS w FROM toks)
         |         WHERE w IN (${terms.map(t => s"'$t'").mkString(", ")})),
         |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM hits GROUP BY doc_id, w),
         |dfq AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM hits GROUP BY w),
         |sc AS (
         |  SELECT tf.doc_id AS id,
         |    ROUND(SUM(ln(1 + (s.n - dfq.df + 0.5) / (dfq.df + 0.5))
         |        * (tf.tf * 2.2)
         |        / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))), 4) AS score
         |  FROM tf
         |  JOIN dfq USING (w)
         |  JOIN dl ON dl.doc_id = tf.doc_id
         |  CROSS JOIN stats s
         |  GROUP BY tf.doc_id)""".stripMargin

    form match {
      case 0 | 1 =>
        val terms = r.shuffle(vocab).take(1 + r.nextInt(3))
        val k = Seq(5, 10, 15)(r.nextInt(3))
        val (dMod, dRem) = Seq((0, 0), (2, 0), (3, 1))(r.nextInt(3))
        val srcPred = if (dMod == 0) "" else s" WHERE doc_id % $dMod = $dRem"
        val src = if (dMod == 0) "documents"
          else s"SELECT * FROM documents WHERE doc_id % $dMod = $dRem"
        val call = s"GRAFT_SEARCH_BM25('$src', 'text', 'doc_id', " +
          s"'${terms.mkString(" ")}', $k)"
        if (form == 0) {
          val duck = s"WITH ${bm25Ctes(srcPred, terms)}\n" +
            s"SELECT id, score FROM sc ORDER BY score DESC, id LIMIT $k"
          val builder = (sp: SparkSession, dir: String) => {
            graft.engine.Tables.registerAll(sp, dir)
            graft.engine.GraftSql.sql(sp, s"SELECT * FROM $call")
          }
          (builder, duck)
        } else {
          // COMPOSED: the TVF joined to the documents dimension
          val duck = s"WITH ${bm25Ctes(srcPred, terms)},\n" +
            s"topk AS (SELECT id, score FROM sc ORDER BY score DESC, id LIMIT $k)\n" +
            "SELECT t.id, t.score, d.lang FROM topk t " +
            "JOIN documents d ON d.doc_id = t.id ORDER BY t.score DESC, t.id"
          val builder = (sp: SparkSession, dir: String) => {
            graft.engine.Tables.registerAll(sp, dir)
            graft.engine.GraftSql.sql(sp,
              s"SELECT b.id, b.score, d.lang FROM $call b " +
                "JOIN documents d ON d.doc_id = b.id ORDER BY b.score DESC, b.id")
          }
          (builder, duck)
        }

      case 2 =>
        val n = 2 + r.nextInt(2) // word n-grams, 2..3
        val m = Seq(83, 89, 97)(r.nextInt(3))
        val duck =
          s"""WITH base AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
             |  FROM documents),
             |dg AS (SELECT doc_id, array_to_string(t[i:i+${n - 1}], ' ') AS ng
             |       FROM base, UNNEST(generate_series(1, len(t)-${n - 1})) AS u(i)
             |       WHERE doc_id % $m <> 0),
             |bg AS (SELECT DISTINCT array_to_string(t[i:i+${n - 1}], ' ') AS ng
             |       FROM base, UNNEST(generate_series(1, len(t)-${n - 1})) AS u(i)
             |       WHERE doc_id % $m = 0)
             |SELECT dg.doc_id, COUNT(DISTINCT dg.ng) AS n_shared_ngrams
             |FROM dg JOIN bg ON dg.ng = bg.ng
             |GROUP BY dg.doc_id ORDER BY dg.doc_id""".stripMargin
        val builder = (sp: SparkSession, dir: String) => {
          graft.engine.Tables.registerAll(sp, dir)
          graft.engine.GraftSql.sql(sp,
            "SELECT * FROM GRAFT_DECONTAMINATE(" +
              s"'SELECT * FROM documents WHERE doc_id % $m <> 0', " +
              "'doc_id', 'text', " +
              s"'SELECT * FROM documents WHERE doc_id % $m = 0', " +
              s"'text', $n) ORDER BY doc_id")
        }
        (builder, duck)

      case _ =>
        // dedup gate over a DDL-created exact index; half the draws also
        // ALTER INDEX ... APPEND a first batch and gate a second one
        val dDen = Seq(5, 7)(r.nextInt(2))
        val twoStep = r.nextBoolean()
        val corpusSel =
          s"SELECT doc_id, text FROM documents WHERE doc_id % $dDen < ${dDen - 2}"
        val b1Sel =
          s"SELECT doc_id, text FROM documents WHERE doc_id % $dDen = ${dDen - 2}"
        val b2Sel =
          s"SELECT doc_id, text FROM documents WHERE doc_id % $dDen = ${dDen - 1}"
        val gateSel = if (twoStep) b2Sel else b1Sel
        // after APPEND FROM (b1) the indexed text set is corpus ∪ batch1
        val corpusTexts =
          if (twoStep) s"$corpusSel UNION ALL $b1Sel" else corpusSel
        val duck =
          s"""WITH corpus AS ($corpusTexts),
             |batch AS ($gateSel),
             |keep AS (SELECT min(doc_id) AS doc_id FROM batch GROUP BY text),
             |fresh AS (SELECT b.doc_id, b.text FROM batch b JOIN keep USING (doc_id))
             |SELECT f.doc_id FROM fresh f
             |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = f.text)
             |ORDER BY f.doc_id""".stripMargin
        val builder = (sp: SparkSession, dir: String) => {
          import org.apache.spark.sql.functions.col
          graft.engine.Tables.registerAll(sp, dir)
          graft.engine.Tables.read(sp, dir, "documents")
            .filter(col("doc_id") % dDen < dDen - 2).select("doc_id", "text")
            .createOrReplaceTempView(s"fz8corpus_$s")
          val path = fz8IndexCache.computeIfAbsent(s"$dir#$s", _ => {
            val p = java.nio.file.Files
              .createTempDirectory(s"graft_fz8_ex_$s").toString + "/ix"
            Runtime.getRuntime.addShutdownHook(new Thread(() =>
              org.apache.commons.io.FileUtils.deleteQuietly(
                new java.io.File(p).getParentFile)))
            // OR REPLACE (r18): plain CREATE registers the name DURABLY
            // since the warehouse catalog landed, and this builder's temp
            // tree dies with the JVM — a SECOND Verify/Bench run in the
            // same working dir would hit "already exists" against a stale
            // catalog entry pointing at the deleted tree. REPLACE rebinds
            // the durable name to this run's fresh tree; the query's
            // result is unchanged (the DDL is setup, not output).
            graft.engine.GraftSql.sql(sp,
              s"CREATE OR REPLACE DEDUP INDEX fz8ix_$s ON fz8corpus_$s(doc_id, text) " +
                s"OPTIONS(kind 'exact', path '$p')")
            if (twoStep)
              graft.engine.GraftSql.sql(sp,
                s"ALTER INDEX fz8ix_$s APPEND FROM ($b1Sel)")
            p
          })
          // idempotent re-attach: a session hitting the warm cross-session
          // cache still needs the name bound in ITS registry
          graft.engine.GraftSql.sql(sp,
            s"CREATE DEDUP INDEX IF NOT EXISTS fz8ix_$s ON fz8corpus_$s(" +
              s"doc_id, text) OPTIONS(kind 'exact', path '$path', attach true)")
          graft.engine.GraftSql.sql(sp,
            s"SELECT doc_id FROM GRAFT_DEDUP_GATE('fz8ix_$s', " +
              s"'${gateSel.replace("'", "''")}', 'text', 'doc_id', 'exact') " +
              "ORDER BY doc_id")
        }
        (builder, duck)
    }
  }

  /** Seeds are pinned: the registered fuzz set must be bit-stable across
    * rounds (golden continuity + stable driver compare), so widening means
    * ADDING seeds, never reinterpreting old ones. */
  private val seeds: Seq[Int] = 0 until 24
  private val seeds2: Seq[Int] = 0 until 12
  private val seeds3: Seq[Int] = 0 until 12
  private val seeds4: Seq[Int] = 0 until 12
  private val seeds5: Seq[Int] = 0 until 12
  private val seeds6: Seq[Int] = 0 until 10
  private val seeds7: Seq[Int] = 0 until 10
  // 0-9 skew toward the bm25 forms; 10-15 add three dedup-gate-DDL and
  // two decontaminate draws so every fuzz8 form is driver-checked each
  // round (widening = ADDING seeds, the pinning rule above)
  private val seeds8: Seq[Int] = 0 until 16

  val qs: Seq[Q] = seeds.map { s =>
    val text = genSql(s)
    Q.df(f"q_fuzz_$s%02d", duck = text) { (spark, dir) =>
      graft.engine.Tables.registerAll(spark, dir)
      graft.engine.GraftSql.sql(spark, text)
    }
  } ++ seeds2.map { s =>
    val text = genSql2(s)
    Q.df(f"q_fuzz2_$s%02d", duck = text) { (spark, dir) =>
      graft.engine.Tables.registerAll(spark, dir)
      graft.engine.GraftSql.sql(spark, text)
    }
  } ++ seeds3.map { s =>
    val text = genSql3(s)
    Q.df(f"q_fuzz3_$s%02d", duck = text) { (spark, dir) =>
      graft.engine.Tables.registerAll(spark, dir)
      graft.engine.GraftSql.sql(spark, text)
    }
  } ++ seeds4.map { s =>
    val text = genSql4(s)
    Q.df(f"q_fuzz4_$s%02d", duck = text) { (spark, dir) =>
      graft.engine.Tables.registerAll(spark, dir)
      graft.engine.GraftSql.sql(spark, text)
    }
  } ++ seeds5.map { s =>
    val text = genSql5(s)
    Q.df(f"q_fuzz5_$s%02d", duck = text) { (spark, dir) =>
      graft.engine.Tables.registerAll(spark, dir)
      graft.engine.GraftSql.sql(spark, text)
    }
  } ++ seeds6.map { s =>
    val (builder, duck) = genFuzz6(s)
    Q.df(f"q_fuzz6_$s%02d", duck = duck)(builder)
  } ++ seeds7.map { s =>
    val (builder, duck) = genFuzz7(s)
    Q.df(f"q_fuzz7_$s%02d", duck = duck)(builder)
  } ++ seeds8.map { s =>
    val (builder, duck) = genFuzz8(s)
    Q.df(f"q_fuzz8_$s%02d", duck = duck)(builder)
  }
}

package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.Tables
import graft.ts.{GroupByRange, TimeSeriesOps => T}

/** GridDB TimeSeries operator queries (SURVEY.md §2.1 selection/aggregation
  * functions + §2.3 OP_GROUP_RANGE). Spark side uses the graft.ts operators;
  * oracles are hand-derived DuckDB SQL with identical epoch-µs arithmetic.
  *
  * NOTE on timestamps: events.parquet is TIMESTAMP(NANOS); Spark carries µs.
  * All outputs use epoch milliseconds (BIGINT) and all ordering/intervals use
  * epoch µs so both engines see identical values.
  */
object TimeSeriesQueries {

  private val t0 = "2024-01-15 00:00:00"
  private val tI = "2024-01-15 12:00:00"

  private def evs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(s, dir)

  private val rowCols = Seq(
    col("event_id"), unix_millis(col("ts")).as("ts_ms"), col("user_id"),
    col("event_type"), col("value"))

  private def rowSelect(where: String, order: String, limit: Int) =
    s"""SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value
       |FROM events WHERE $where ORDER BY $order LIMIT $limit""".stripMargin

  val qs: Seq[Q] = Seq(

    // ---- as-of join: batched TIME_PREV over a probe table ----
    Q.df("q_asof_join_prev",
      duck = """WITH p AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'),
        |s AS (SELECT user_id, ts AS view_ts, value AS view_value FROM events WHERE event_type = 'view')
        |SELECT p.event_id, epoch_ms(p.ts) AS ts_ms, p.user_id,
        |  epoch_ms(s.view_ts) AS view_ts_ms, s.view_value
        |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND s.view_ts <= p.ts
        |ORDER BY p.event_id""".stripMargin,
      bench = true) { (s, dir) =>
      val ev = evs(s, dir)
      val probe = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("ts"), col("user_id"))
      val series = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("ts").as("view_ts"),
          col("value").as("view_value"))
      T.asOfJoin(probe, series, keys = Seq("user_id"),
          probeTs = "ts", seriesTs = "ts")
        .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"),
          col("user_id"), unix_millis(col("view_ts")).as("view_ts_ms"),
          col("view_value"))
        .orderBy("event_id")
    },

    // ---- as-of join, forward: batched TIME_NEXT ----
    Q.df("q_asof_join_next",
      duck = """WITH p AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'),
        |s AS (SELECT user_id, ts AS buy_ts, value AS buy_value FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, epoch_ms(p.ts) AS ts_ms, p.user_id,
        |  epoch_ms(s.buy_ts) AS buy_ts_ms, s.buy_value
        |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND s.buy_ts >= p.ts
        |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
      val ev = evs(s, dir)
      val probe = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("ts"), col("user_id"))
      val series = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("ts").as("buy_ts"),
          col("value").as("buy_value"))
      T.asOfJoin(probe, series, keys = Seq("user_id"),
          probeTs = "ts", seriesTs = "ts", forward = true)
        .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"),
          col("user_id"), unix_millis(col("buy_ts")).as("buy_ts_ms"),
          col("buy_value"))
        .orderBy("event_id")
    },

    // ---- range join: views attributed to the hour before each purchase ----
    Q.df("q_range_join_attrib",
      bench = true,
      duck = """SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
        |  epoch_ms(v.ts) AS view_ts_ms
        |FROM events v JOIN events p
        |  ON v.user_id = p.user_id
        | AND v.event_type = 'view' AND p.event_type = 'purchase'
        | AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
        |ORDER BY view_id, purchase_id""".stripMargin) { (s, dir) =>
      val ev = evs(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("ts").as("view_ts"),
          col("user_id"))
      val windows = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          (col("ts") - expr("INTERVAL '1 hour'")).as("w_start"),
          col("ts").as("w_end"))
      graft.ts.RangeJoin.intervalJoin(views, "view_ts", windows,
          "w_start", "w_end", keys = Seq("user_id"), bucket = "1 hour")
        .select(col("view_id"), col("purchase_id"), col("user_id"),
          unix_millis(col("view_ts")).as("view_ts_ms"))
        .orderBy("view_id", "purchase_id")
    },

    // ---- TIME_WINDOW_AGG: tumbling 1h windows ----
    Q.df("q_ts_time_window_agg",
      duck = """SELECT epoch_ms(date_trunc('hour', ts)) AS bucket_ms,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
      bench = true) { (s, dir) =>
      T.timeWindowAgg(evs(s, dir), "ts", "1 hour", Seq(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"),
        (sum(col("value").cast(DecimalType(18, 2))).cast("double") /
          count(lit(1))).as("avg_value")))
    },

    // ---- TIME_NEXT / TIME_NEXT_ONLY / TIME_PREV / TIME_PREV_ONLY ----
    Q.df("q_ts_time_next",
      duck = rowSelect(s"ts >= TIMESTAMP '$t0'", "epoch_us(ts), event_id", 1)) {
      (s, dir) =>
        T.timeNext(evs(s, dir), "ts", lit(t0).cast("timestamp"),
          tieBreak = Seq("event_id")).select(rowCols: _*)
    },

    Q.df("q_ts_time_next_only",
      duck = rowSelect(s"ts > TIMESTAMP '$t0'", "epoch_us(ts), event_id", 1)) {
      (s, dir) =>
        T.timeNext(evs(s, dir), "ts", lit(t0).cast("timestamp"), only = true,
          tieBreak = Seq("event_id")).select(rowCols: _*)
    },

    Q.df("q_ts_time_prev",
      duck = rowSelect(s"ts <= TIMESTAMP '$t0'", "epoch_us(ts) DESC, event_id DESC", 1)) {
      (s, dir) =>
        T.timePrev(evs(s, dir), "ts", lit(t0).cast("timestamp"),
          tieBreak = Seq("event_id")).select(rowCols: _*)
    },

    Q.df("q_ts_time_prev_only",
      duck = rowSelect(s"ts < TIMESTAMP '$t0'", "epoch_us(ts) DESC, event_id DESC", 1)) {
      (s, dir) =>
        T.timePrev(evs(s, dir), "ts", lit(t0).cast("timestamp"), only = true,
          tieBreak = Seq("event_id")).select(rowCols: _*)
    },

    // ---- TIME_INTERPOLATED(value, t) ----
    Q.df("q_ts_time_interpolated",
      duck = s"""SELECT epoch_ms(TIMESTAMP '$tI') AS ts_ms,
        |  CASE WHEN n.t = p.t THEN p.v
        |    ELSE p.v + (n.v - p.v) *
        |      (CAST(epoch_us(TIMESTAMP '$tI') - p.t AS DOUBLE) / CAST(n.t - p.t AS DOUBLE))
        |  END AS value
        |FROM (SELECT epoch_us(ts) AS t, value AS v FROM events
        |      WHERE ts <= TIMESTAMP '$tI' ORDER BY ts DESC, event_id DESC LIMIT 1) p,
        |     (SELECT epoch_us(ts) AS t, value AS v FROM events
        |      WHERE ts >= TIMESTAMP '$tI' ORDER BY ts, event_id LIMIT 1) n""".stripMargin) {
      (s, dir) =>
        T.timeInterpolated(evs(s, dir), "ts", "value", lit(tI).cast("timestamp"))
          .select(col("ts_ms"), col("value"))
    },

    // ---- TIME_INTERPOLATED, EMPTY mode (InterpolationMode.java:70): no
    // interpolation — exact-match value or NULL, bracketing unchanged ----
    Q.df("q_ts_time_interp_empty_hit",
      duck = """SELECT epoch_ms(b.bt) AS ts_ms,
        |  CASE WHEN p.t = epoch_us(b.bt) THEN p.v ELSE NULL END AS value
        |FROM (SELECT ts AS bt FROM events WHERE event_id = 100) b,
        |  LATERAL (SELECT epoch_us(ts) AS t, value AS v FROM events
        |           WHERE ts <= b.bt ORDER BY ts DESC, event_id DESC LIMIT 1) p,
        |  LATERAL (SELECT 1 AS x FROM events WHERE ts >= b.bt LIMIT 1) n""".stripMargin) {
      (s, dir) =>
        // base time = an EXISTING row's timestamp -> the exact-match branch
        val bt = evs(s, dir).filter(col("event_id") === 100)
          .select(col("ts")).collect()(0).get(0)
        T.timeInterpolated(evs(s, dir), "ts", "value",
            lit(bt).cast("timestamp"), mode = "empty")
          .select(col("ts_ms"), col("value"))
    },
    Q.df("q_ts_time_interp_empty_miss",
      duck = s"""SELECT epoch_ms(TIMESTAMP '$tI') AS ts_ms,
        |  CASE WHEN p.t = epoch_us(TIMESTAMP '$tI') THEN p.v ELSE NULL END AS value
        |FROM (SELECT epoch_us(ts) AS t, value AS v FROM events
        |      WHERE ts <= TIMESTAMP '$tI' ORDER BY ts DESC, event_id DESC LIMIT 1) p,
        |     (SELECT 1 AS x FROM events WHERE ts >= TIMESTAMP '$tI' LIMIT 1) n""".stripMargin) {
      (s, dir) =>
        T.timeInterpolated(evs(s, dir), "ts", "value",
            lit(tI).cast("timestamp"), mode = "empty")
          .select(col("ts_ms"), col("value"))
    },

    // ---- sampling query, EMPTY mode (TimeSeries.java:497-505 +
    // InterpolationMode.java:70): exact-match values on the grid, NULL
    // where no row sits exactly on a grid instant, in-range rule unchanged ----
    Q.df("q_ts_time_sampling_empty",
      duck = """WITH b AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events),
        |g AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
        |        TIMESTAMP '2024-01-30 00:00:00', INTERVAL 6 HOUR)) AS gt),
        |x AS (SELECT epoch_us(ts) AS t, max(value) AS v FROM events GROUP BY 1)
        |SELECT epoch_ms(g.gt) AS ts_ms, x.v AS value
        |FROM g CROSS JOIN b LEFT JOIN x ON x.t = epoch_us(g.gt)
        |WHERE epoch_us(g.gt) BETWEEN b.lo AND b.hi
        |ORDER BY ts_ms""".stripMargin) { (s, dir) =>
      T.timeSamplingEmpty(evs(s, dir), "ts", "value",
          lit("2024-01-01 00:00:00"), lit("2024-01-30 00:00:00"),
          intervalUs = 6L * 3600 * 1000000)
        .orderBy("ts_ms")
    },

    // ---- sampling EMPTY mode, star form: every non-key field from the
    // exact row or NULL ("empty value ... for all Row fields except Row
    // keys", InterpolationMode.java:70) ----
    Q.df("q_ts_time_sampling_empty_star",
      duck = """WITH b AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events),
        |g AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
        |        TIMESTAMP '2024-01-30 00:00:00', INTERVAL 6 HOUR)) AS gt),
        |x AS (SELECT epoch_us(ts) AS t,
        |        max(struct_pack(event_id := event_id, user_id := user_id,
        |          event_type := event_type, value := value)) AS r
        |      FROM events GROUP BY 1)
        |SELECT epoch_ms(g.gt) AS ts_ms, x.r.event_id AS event_id,
        |  x.r.user_id AS user_id, x.r.event_type AS event_type, x.r.value AS value
        |FROM g CROSS JOIN b LEFT JOIN x ON x.t = epoch_us(g.gt)
        |WHERE epoch_us(g.gt) BETWEEN b.lo AND b.hi
        |ORDER BY ts_ms""".stripMargin) { (s, dir) =>
      T.timeSamplingEmptyAll(
          evs(s, dir).select("event_id", "ts", "user_id", "event_type", "value"),
          "ts", lit("2024-01-01 00:00:00"), lit("2024-01-30 00:00:00"),
          intervalUs = 6L * 3600 * 1000000)
        .select("ts_ms", "event_id", "user_id", "event_type", "value")
        .orderBy("ts_ms")
    },

    // ---- TIME_SAMPLING(value, start, end, 6h grid) ----
    Q.df("q_ts_time_sampling",
      duck = """SELECT epoch_ms(g.gt) AS ts_ms,
        |  CASE WHEN n.t = p.t THEN p.v
        |    ELSE p.v + (n.v - p.v) *
        |      (CAST(epoch_us(g.gt) - p.t AS DOUBLE) / CAST(n.t - p.t AS DOUBLE))
        |  END AS value
        |FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
        |        TIMESTAMP '2024-01-30 00:00:00', INTERVAL 6 HOUR)) AS gt) g,
        |  LATERAL (SELECT epoch_us(ts) AS t, value AS v FROM events
        |           WHERE ts <= g.gt ORDER BY ts DESC, event_id DESC LIMIT 1) p,
        |  LATERAL (SELECT epoch_us(ts) AS t, value AS v FROM events
        |           WHERE ts >= g.gt ORDER BY ts, event_id LIMIT 1) n
        |ORDER BY ts_ms""".stripMargin,
      bench = true) { (s, dir) =>
      T.timeSampling(evs(s, dir), "ts", "value",
          lit("2024-01-01 00:00:00").cast("timestamp"),
          lit("2024-01-30 00:00:00").cast("timestamp"),
          intervalUs = 6L * 3600 * 1000 * 1000)
        .select(col("ts_ms"), col("value"))
    },

    // ---- TIME_AVG: time-weighted average, per series key ----
    Q.df("q_ts_time_avg",
      duck = """WITH t AS (
        |  SELECT event_type, value, epoch_us(ts) AS tu,
        |    lag(epoch_us(ts))  OVER (PARTITION BY event_type ORDER BY epoch_us(ts), event_id) AS pt,
        |    lead(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY epoch_us(ts), event_id) AS nt
        |  FROM events)
        |SELECT event_type,
        |  ROUND(SUM(value * w) / SUM(w), 4) AS time_avg_value
        |FROM (SELECT event_type, value,
        |        CASE WHEN pt IS NULL AND nt IS NULL THEN 1.0
        |             WHEN pt IS NULL THEN CAST(nt - tu AS DOUBLE) / 2.0
        |             WHEN nt IS NULL THEN CAST(tu - pt AS DOUBLE) / 2.0
        |             ELSE CAST(nt - pt AS DOUBLE) / 2.0 END AS w
        |      FROM t) x
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      T.timeAvg(evs(s, dir), "ts", "value", keys = Seq("event_type"))
        .select(col("event_type"), round(col("time_avg_value"), 4).as("time_avg_value"))
        .orderBy("event_type")
    },

    // ---- MAX_ROWS / MIN_ROWS ----
    Q.df("q_ts_max_rows",
      duck = """SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value
        |FROM events WHERE value = (SELECT max(value) FROM events)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      T.extremeRows(evs(s, dir), "value", isMax = true)
        .select(rowCols: _*).orderBy("event_id")
    },

    Q.df("q_ts_min_rows",
      duck = """SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value
        |FROM events WHERE value = (SELECT min(value) FROM events)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      T.extremeRows(evs(s, dir), "value", isMax = false)
        .select(rowCols: _*).orderBy("event_id")
    }
  ) ++ FillQueries.qs
}

/** GROUP BY RANGE(ts) EVERY(2,HOUR) FILL(...) over [2024-01-01, 2024-01-30].
  * Reference: /root/reference/server/sql_operator_group.h:181-441. */
object FillQueries {
  private val startMs = 1704067200000L // 2024-01-01 00:00:00 UTC
  private val endMs   = 1706572800000L // 2024-01-30 00:00:00 UTC
  private val everyMs = 2L * 3600 * 1000

  private def duckFill(body: String): String =
    s"""WITH g AS (SELECT unnest(generate_series($startMs, $endMs, $everyMs)) AS ts_ms),
       |a AS (SELECT $startMs + (epoch_ms(ts) - $startMs) // $everyMs * $everyMs AS ts_ms,
       |             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value,
       |             COUNT(*) AS n
       |      FROM events
       |      WHERE epoch_ms(ts) >= $startMs AND epoch_ms(ts) <= $endMs
       |      GROUP BY 1),
       |j AS (SELECT g.ts_ms, a.avg_value, a.n FROM g LEFT JOIN a ON g.ts_ms = a.ts_ms)
       |$body""".stripMargin

  private def build(s: org.apache.spark.sql.SparkSession, dir: String,
                    fill: GroupByRange.Fill, withCount: Boolean) = {
    val exactAvg = (sum(col("value").cast(DecimalType(18, 2))).cast("double") /
      count(lit(1))).as("avg_value")
    val aggs =
      if (withCount) Seq(exactAvg, count(lit(1)).as("n")) else Seq(exactAvg)
    GroupByRange(Tables.events(s, dir), "ts", startMs, endMs, everyMs, aggs, fill)
  }

  val qs: Seq[Q] = Seq(
    Q.df("q_ts_range_fill_none",
      duck = duckFill(
        """SELECT ts_ms, avg_value, n FROM j
          |WHERE avg_value IS NOT NULL ORDER BY ts_ms""".stripMargin)) { (s, dir) =>
      build(s, dir, GroupByRange.FillNone, withCount = true)
        .select(col("ts_ms"), col("avg_value"), col("n"))
    },

    Q.df("q_ts_range_fill_null",
      duck = duckFill(
        """SELECT ts_ms, avg_value, n FROM j ORDER BY ts_ms""".stripMargin)) {
      (s, dir) =>
        build(s, dir, GroupByRange.FillNull, withCount = true)
          .select(col("ts_ms"), col("avg_value"), col("n"))
    },

    Q.df("q_ts_range_fill_previous",
      duck = duckFill(
        """SELECT ts_ms,
          |  COALESCE(avg_value,
          |    last_value(avg_value IGNORE NULLS) OVER
          |      (ORDER BY ts_ms ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS avg_value,
          |  COALESCE(n, last_value(n IGNORE NULLS) OVER
          |      (ORDER BY ts_ms ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS n
          |FROM j ORDER BY ts_ms""".stripMargin)) { (s, dir) =>
      build(s, dir, GroupByRange.FillPrevious, withCount = true)
        .select(col("ts_ms"), col("avg_value"), col("n"))
    },

    // GridDB SQL-dialect text through GraftSql (GROUP BY RANGE clause)
    Q.df("q_sql_group_by_range",
      duck = """WITH g AS (SELECT unnest(generate_series(1704067200000, 1704412800000, 21600000)) AS ts_ms),
        |a AS (SELECT 1704067200000 + (epoch_ms(ts) - 1704067200000) // 21600000 * 21600000 AS ts_ms,
        |             COUNT(*) AS n, MIN(value) AS min_value
        |      FROM events
        |      WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts <= TIMESTAMP '2024-01-05 00:00:00'
        |        AND epoch_ms(ts) >= 1704067200000 AND epoch_ms(ts) <= 1704412800000
        |      GROUP BY 1)
        |SELECT g.ts_ms,
        |  COALESCE(a.n, last_value(a.n IGNORE NULLS) OVER w) AS n,
        |  COALESCE(a.min_value, last_value(a.min_value IGNORE NULLS) OVER w) AS min_value
        |FROM g LEFT JOIN a ON g.ts_ms = a.ts_ms
        |WINDOW w AS (ORDER BY g.ts_ms ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY g.ts_ms""".stripMargin) { (s, dir) =>
      Tables.registerAll(s, dir)
      graft.engine.GraftSql.sql(s,
        """SELECT ts, count(*) AS n, min(value) AS min_value FROM events
          |WHERE ts BETWEEN TIMESTAMP '2024-01-01 00:00:00' AND TIMESTAMP '2024-01-05 00:00:00'
          |GROUP BY RANGE(ts) EVERY (6, HOUR) FILL (PREVIOUS)""".stripMargin)
        .select(col("ts_ms"), col("n"), col("min_value"))
    },

    // keyed variant: one series per event_type, fill PREVIOUS per key
    Q.df("q_ts_range_fill_keyed",
      duck = s"""WITH g0 AS (SELECT unnest(generate_series($startMs, $endMs, ${6 * 3600 * 1000})) AS ts_ms),
        |k AS (SELECT DISTINCT event_type FROM events),
        |g AS (SELECT k.event_type AS event_type, g0.ts_ms AS ts_ms FROM k, g0),
        |a AS (SELECT event_type,
        |        $startMs + (epoch_ms(ts) - $startMs) // ${6 * 3600 * 1000} * ${6 * 3600 * 1000} AS ts_ms,
        |        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
        |      FROM events
        |      WHERE epoch_ms(ts) >= $startMs AND epoch_ms(ts) <= $endMs
        |      GROUP BY 1, 2),
        |j AS (SELECT g.event_type, g.ts_ms, a.avg_value
        |      FROM g LEFT JOIN a ON g.event_type = a.event_type AND g.ts_ms = a.ts_ms)
        |SELECT event_type, ts_ms,
        |  COALESCE(avg_value, last_value(avg_value IGNORE NULLS) OVER
        |    (PARTITION BY event_type ORDER BY ts_ms
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS avg_value
        |FROM j ORDER BY event_type, ts_ms""".stripMargin) { (s, dir) =>
      val exactAvg = (sum(col("value").cast(DecimalType(18, 2))).cast("double") /
        count(lit(1))).as("avg_value")
      GroupByRange(Tables.events(s, dir), "ts", startMs, endMs, 6L * 3600 * 1000,
        Seq(exactAvg), GroupByRange.FillPrevious, keys = Seq("event_type"))
        .select(col("event_type"), col("ts_ms"), col("avg_value"))
    },

    Q.df("q_ts_range_fill_linear",
      duck = duckFill(
        """SELECT ts_ms,
          |  CASE WHEN avg_value IS NOT NULL THEN avg_value
          |    WHEN pt IS NOT NULL AND nt IS NOT NULL THEN
          |      pv + (nv - pv) * (CAST(ts_ms - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
          |    ELSE NULL END AS avg_value
          |FROM (SELECT ts_ms, avg_value,
          |  last_value(CASE WHEN avg_value IS NOT NULL THEN ts_ms END IGNORE NULLS)
          |    OVER wp AS pt,
          |  last_value(avg_value IGNORE NULLS) OVER wp AS pv,
          |  last_value(CASE WHEN avg_value IS NOT NULL THEN ts_ms END IGNORE NULLS)
          |    OVER wn AS nt,
          |  last_value(avg_value IGNORE NULLS) OVER wn AS nv
          |  FROM j
          |  WINDOW wp AS (ORDER BY ts_ms ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          |         wn AS (ORDER BY ts_ms DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |) f ORDER BY ts_ms""".stripMargin),
      bench = true) { (s, dir) =>
      build(s, dir, GroupByRange.FillLinear, withCount = false)
        .select(col("ts_ms"), col("avg_value"))
    },

    // ---- gap-based sessionization (30-min inactivity gap per user) ----
    Q.df("q_sessionize",
      duck = """WITH f AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS opens
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(opens) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM f)
        |SELECT user_id, session_id,
        |  epoch_ms(min(ts)) AS s_start_ms, epoch_ms(max(ts)) AS s_end_ms,
        |  count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
      T.sessionize(Tables.events(s, dir), "ts", gapMs = 30L * 60 * 1000,
          keys = Seq("user_id"), tieBreak = Seq("event_id"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(unix_millis(min(col("ts"))).as("s_start_ms"),
          unix_millis(max(col("ts"))).as("s_end_ms"),
          count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("sum_value"))
        .orderBy("user_id", "session_id")
    }
  )
}

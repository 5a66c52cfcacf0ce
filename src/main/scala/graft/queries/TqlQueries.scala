package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.tql.TqlCompiler

/** End-to-end TQL queries (parse -> compile -> DataFrame) with DuckDB SQL
  * oracles derived from the TQL semantics. */
object TqlQueries {

  private def events(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.container(s, dir, "events")

  val qs: Seq[Q] = Seq(

    Q.df("q_tql_filter_order_limit",
      duck = """SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value
        |FROM events
        |WHERE value > 150.0 AND event_type = 'click'
        |ORDER BY epoch_us(ts) DESC, event_id DESC LIMIT 20""".stripMargin) { (s, dir) =>
      TqlCompiler.run(events(s, dir),
          "select * where value > 150.0 and event_type = 'click' " +
            "order by ts desc, event_id desc limit 20")
        .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"),
          col("user_id"), col("event_type"), col("value"))
    },

    // ---- FetchOption.PARTIAL_EXECUTION: the range-divided cursor drained
    //      end-to-end and compared to the plain one-shot result — the rows
    //      served across lazily-executed ranges must be exactly the
    //      query's rows (order normalized; partial mode itself forbids
    //      ORDER BY, so the cursor serves partition order) ----
    Q.df("q_tql_partial_fetch",
      duck = """SELECT event_id, user_id, event_type, value FROM events
        |WHERE value > 150.0 ORDER BY event_id""".stripMargin) { (s, dir) =>
      val rows = graft.tql.PartialFetch
        .fetch(events(s, dir), "select * where value > 150.0")
        .toSeq
      s.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
          events(s, dir).df.schema)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .orderBy("event_id")
    },

    Q.df("q_tql_agg_avg",
      duck = """SELECT ROUND(avg(value), 4) AS avg_value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND event_type <> 'error'""".stripMargin) {
      (s, dir) =>
        TqlCompiler.run(events(s, dir),
            "select avg(value) where ts >= TIMESTAMP('2024-01-10T00:00:00Z') " +
              "and event_type <> 'error'")
          .select(round(col("avg"), 4).as("avg_value"))
    },

    Q.df("q_tql_count_like",
      duck = """SELECT COUNT(*) AS count FROM events
        |WHERE event_type LIKE 's%' AND value BETWEEN 50 AND 150""".stripMargin) {
      (s, dir) =>
        TqlCompiler.run(events(s, dir),
          "select count(*) where event_type like 's%' and value >= 50 and value <= 150")
    },

    Q.df("q_tql_arith_projection_filter",
      duck = """SELECT event_id, epoch_ms(ts) AS ts_ms, value FROM events
        |WHERE value * 2.0 + 1.0 > 399.0 AND NOT (user_id % 2 = 0)
        |ORDER BY event_id LIMIT 50""".stripMargin) { (s, dir) =>
      TqlCompiler.run(events(s, dir),
          "select * where value * 2.0 + 1.0 > 399.0 and not (user_id % 2 = 0) " +
            "order by event_id limit 50")
        .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"), col("value"))
    },

    Q.df("q_tql_time_prev_sel",
      duck = """SELECT event_id, epoch_ms(ts) AS ts_ms, value FROM events
        |WHERE ts <= TIMESTAMP '2024-01-20 06:30:00'
        |ORDER BY epoch_us(ts) DESC LIMIT 1""".stripMargin) { (s, dir) =>
      TqlCompiler.run(events(s, dir),
          "select time_prev(TIMESTAMP('2024-01-20T06:30:00Z'))")
        .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"), col("value"))
    },

    // arg order per selection_func_impl.h:997-1084: (col, AGG, start, end,
    // interval, unit) — the aggregation name is args[1], not last
    Q.df("q_tql_time_window_agg",
      duck = """SELECT 1704067200000 + (epoch_ms(ts) - 1704067200000) // 43200000 * 43200000 AS ts_ms,
        |  MIN(value) AS min
        |FROM events
        |WHERE epoch_ms(ts) >= 1704067200000 AND epoch_ms(ts) <= 1706572800000
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      TqlCompiler.run(events(s, dir),
        "select time_window_agg(value, MIN, TIMESTAMP('2024-01-01T00:00:00Z'), " +
          "TIMESTAMP('2024-01-30T00:00:00Z'), 12, HOUR)")
        .select(col("ts_ms"), col("min"))
    },

    // ---- TIME_WINDOW_AGG(*): the advertised all-columns form
    // (selection_func.h:197-205) — AGG over every numeric non-key column ----
    Q.df("q_tql_time_window_agg_star",
      duck = """SELECT 1704067200000 + (epoch_ms(ts) - 1704067200000) // 43200000 * 43200000 AS ts_ms,
        |  MIN(event_id) AS min_event_id, MIN(user_id) AS min_user_id,
        |  MIN(value) AS min_value
        |FROM events
        |WHERE epoch_ms(ts) >= 1704067200000 AND epoch_ms(ts) <= 1706572800000
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      TqlCompiler.run(events(s, dir),
        "select time_window_agg(*, MIN, TIMESTAMP('2024-01-01T00:00:00Z'), " +
          "TIMESTAMP('2024-01-30T00:00:00Z'), 12, HOUR)")
    },

    // ---- TIME_SAMPLING(*): sample-and-hold of the whole row at each grid
    // instant (selection_func_impl.h:599-713 — the star path emits the
    // bracketing row's image with field 0 replaced by the grid time; no
    // interpolation). Oracle: ASOF JOIN against the per-instant winner
    // (max event_id — mirrors the engine's deterministic struct tie-break),
    // grid points past the last row dropped. ----
    Q.df("q_tql_time_sampling_star",
      duck = """WITH d AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY ts ORDER BY event_id DESC) AS rn
        |    FROM events) WHERE rn = 1),
        |grid AS (
        |  SELECT unnest(generate_series(TIMESTAMP '2024-01-05 00:00:00',
        |    TIMESTAMP '2024-01-25 00:00:00', INTERVAL 6 HOUR)) AS g)
        |SELECT epoch_ms(grid.g) AS ts_ms, d.event_id, d.user_id,
        |  d.event_type, d.value, d.props
        |FROM grid ASOF JOIN d ON d.ts <= grid.g
        |WHERE grid.g <= (SELECT max(ts) FROM events)
        |ORDER BY ts_ms""".stripMargin) { (s, dir) =>
      TqlCompiler.run(events(s, dir),
        "select time_sampling(*, TIMESTAMP('2024-01-05T00:00:00Z'), " +
          "TIMESTAMP('2024-01-25T00:00:00Z'), 6, HOUR)")
        .orderBy("ts_ms")
    },

    Q.df("q_tql_max_rows",
      duck = """SELECT event_id, epoch_ms(ts) AS ts_ms, value FROM events
        |WHERE value = (SELECT max(value) FROM events WHERE event_type = 'purchase')
        |  AND event_type = 'purchase'
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      TqlCompiler.run(events(s, dir),
          "select max_rows(value) where event_type = 'purchase'")
        .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"), col("value"))
        .orderBy("event_id")
    },

    // ---- grammar-fidelity cluster (tql.cpp rules 16-77) ----

    // bit operators & | << >> (rule 56) at their own precedence level:
    // EQ binds looser, so `user_id & 3 = 1` is `(user_id & 3) = 1`
    Q.df("q_tql_bit_ops",
      duck = """SELECT event_id, user_id, event_type, value FROM events
        |WHERE (user_id & 3) = 1 AND ((user_id >> 2) & 1) = 0
        |  AND (user_id | 8) < 2000 AND (user_id << 1) > 10
        |ORDER BY event_id LIMIT 100""".stripMargin) { (s, dir) =>
      TqlCompiler.run(events(s, dir),
          "select * where user_id & 3 = 1 and user_id >> 2 & 1 = 0 " +
            "and (user_id | 8) < 2000 and user_id << 1 > 10 " +
            "order by event_id limit 100")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    },

    // NAN / INF literals (rules 40-41): NaN sorts greatest and equals
    // itself in both engines (Spark NaN semantics == DuckDB/Postgres), so
    // `value <> NAN` keeps every non-NaN row and `value < INF` every
    // finite one
    Q.df("q_tql_nan_inf",
      duck = """SELECT COUNT(*) AS count FROM events
        |WHERE value < 'Infinity'::DOUBLE AND value <> 'NaN'::DOUBLE
        |  AND value > -'Infinity'::DOUBLE""".stripMargin) { (s, dir) =>
      TqlCompiler.run(events(s, dir),
        "select count(*) where value < INF and value <> NAN and value > -INF")
    },

    // ORDER BY expression (rules 22-23) — negated value as the sort key,
    // event_id desc as the total-order tie-break
    Q.df("q_tql_order_by_expr",
      duck = """SELECT event_id, user_id, value FROM events
        |WHERE value IS NOT NULL
        |ORDER BY value * -1.0 ASC, event_id DESC LIMIT 30""".stripMargin) { (s, dir) =>
      TqlCompiler.run(events(s, dir),
          "select * where value is not null " +
            "order by value * -1.0 asc, event_id desc limit 30")
        .select(col("event_id"), col("user_id"), col("value"))
    },

    // general IS at the EQ precedence level (rules 76-77): comparisons
    // bind tighter, so `value > 100.0 IS NOT NULL` tests the comparison's
    // null-ness — null only where value is null
    Q.df("q_tql_is_general",
      duck = """SELECT COUNT(*) AS count FROM events
        |WHERE ((value > 100.0) IS NOT NULL) AND (props IS NULL) = FALSE""".stripMargin) {
      (s, dir) =>
        TqlCompiler.run(events(s, dir),
          "select count(*) where (value > 100.0 is not null) " +
            "and (props is null) = false")
    },

    // BLOB literals X'..' (rule 38): constant blob comparison (unsigned
    // lexicographic in both engines) under a real column guard — the
    // testdata schema has no BLOB column to compare against
    Q.df("q_tql_blob_literal",
      duck = """SELECT COUNT(*) AS count FROM events
        |WHERE '\x01\x02'::BLOB < '\x01\x03'::BLOB AND value IS NOT NULL""".stripMargin) {
      (s, dir) =>
        TqlCompiler.run(events(s, dir),
          "select count(*) where X'0102' < X'0103' and value is not null")
    },

    // db-qualified FROM (rules 16/19): the qualifier must name the
    // connection's database — this engine's `public`
    Q.df("q_tql_from_qualified",
      duck = "SELECT COUNT(*) AS count FROM events WHERE value > 100.0") { (s, dir) =>
      TqlCompiler.run(events(s, dir),
        "select count(*) from public.events where value > 100.0")
    },

    // PRAGMA (rules 59-63): validated no-op, empty result over the
    // container row type (Query::setPragma recognizes only `trace`,
    // query.cpp:464-481)
    Q.df("q_tql_pragma",
      duck = """SELECT event_id, user_id, event_type, value FROM events
        |WHERE 1 = 0""".stripMargin) { (s, dir) =>
      TqlCompiler.run(events(s, dir), "pragma trace.flag = on")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    },

    // ---- array functions: ARRAY_LENGTH + 0-based ELEMENT
    // (/root/reference/server/function_map.cpp:86-87) over the embeddings
    // container; DuckDB lists are 1-based, so ELEMENT(e, 0) == e[1] ----
    Q.df("q_tql_array",
      duck = """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS alen,
        |  embedding[1] AS e0
        |FROM embeddings
        |WHERE len(embedding) >= 1 AND embedding[1] > 0.1
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      TqlCompiler.run(Tables.container(s, dir, "embeddings"),
          "select * where array_length(embedding) >= 1 " +
            "and element(embedding, 0) > 0.1 order by vec_id")
        .select(col("vec_id"), size(col("embedding")).cast("long").as("alen"),
          element_at(col("embedding"), 1).as("e0"))
    }
  )
}

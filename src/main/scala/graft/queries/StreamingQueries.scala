package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType
import graft.engine.Tables
import graft.streaming.StreamingOps

/** Structured-Streaming parity, oracle-checked: the events parquet is
  * replayed through `readStream`, aggregated with the SAME windowed
  * expressions as the batch TIME_WINDOW_AGG, and the final (complete-mode)
  * result must equal the batch oracle. Proves the batch/streaming semantics
  * line up end-to-end (SURVEY §2.8). */
object StreamingQueries {

  /** Stage the events table into a temp dir (file stream sources need a
    * directory), replay it through `build` into a memory sink with
    * AvailableNow, and return the sink table. One definition for every
    * streaming query; the staged copy is removed afterwards. */
  private def replayEvents(s: org.apache.spark.sql.SparkSession, dir: String,
                           sink: String, outputMode: String)
                          (build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val schema = Tables.read(s, dir, "events").schema
    val stage = java.nio.file.Files.createTempDirectory("graft_replay")
    val staged = stage.resolve("events.parquet")
    java.nio.file.Files.copy(java.nio.file.Paths.get(dir, "events.parquet"), staged)
    try {
      val ev = Tables.normalizeEvents(s.readStream.schema(schema).parquet(stage.toString))
      val q = build(ev).writeStream.format("memory").queryName(sink)
        .outputMode(outputMode).trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
      s.table(sink)
    } finally {
      java.nio.file.Files.deleteIfExists(staged)
      java.nio.file.Files.deleteIfExists(stage)
    }
  }

  /** Replay the documents table as a file stream through `build`. Same
    * staging discipline as [[replayEvents]]. */
  private def replayDocs(s: org.apache.spark.sql.SparkSession, dir: String,
                         sink: String)
                        (build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val schema = Tables.read(s, dir, "documents").schema
    val stage = java.nio.file.Files.createTempDirectory("graft_replay_docs")
    val staged = stage.resolve("documents.parquet")
    java.nio.file.Files.copy(java.nio.file.Paths.get(dir, "documents.parquet"), staged)
    try {
      val docs = s.readStream.schema(schema).parquet(stage.toString)
      val q = build(docs).writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
      s.table(sink)
    } finally {
      java.nio.file.Files.deleteIfExists(staged)
      java.nio.file.Files.deleteIfExists(stage)
    }
  }

  val qs: Seq[Q] = Seq(

    // Streaming C4 cleaning: the line filter is a stateless per-row map,
    // so the continuous result must equal the batch operator row-for-row —
    // the oracle IS q_text_c4's (same multi-line projection, same rules).
    Q.df("q_stream_text_c4",
      duck = """WITH src AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 17 = 0 THEN text || ' {' ELSE
        |      replace(replace(text, ' table ', '.' || chr(10)), 'spark', 'javascript')
        |    END AS text
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, text,
        |    list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
        |      x -> length(x) > 0) AS l
        |  FROM src),
        |k AS (
        |  SELECT doc_id, text, l,
        |    list_filter(l, x ->
        |      (ends_with(x, '.') OR ends_with(x, '!') OR ends_with(x, '?')
        |        OR ends_with(x, '"') OR ends_with(x, chr(39)))
        |      AND len(list_filter(string_split_regex(x, '\s+'), t -> length(t) > 0)) >= 3
        |      AND NOT contains(lower(x), 'javascript')) AS kl,
        |    (contains(lower(text), 'lorem ipsum') OR contains(text, '{')) AS drop_doc
        |  FROM base)
        |SELECT doc_id,
        |  CASE WHEN drop_doc THEN ''
        |    ELSE COALESCE(array_to_string(kl, chr(10)), '') END AS clean_text,
        |  len(l) AS n_lines,
        |  CASE WHEN drop_doc THEN 0 ELSE len(kl) END AS n_kept_lines,
        |  (NOT drop_doc AND len(kl) > 0) AS kept
        |FROM k ORDER BY doc_id""".stripMargin) { (s, dir) =>
      replayDocs(s, dir, "q_stream_text_c4_sink") { d =>
        val src = d.select(col("doc_id"),
          when(col("doc_id") % 17 === 0, concat(col("text"), lit(" {")))
            .otherwise(regexp_replace(
              regexp_replace(col("text"), " table ", ".\n"), "spark", "javascript"))
            .as("text"))
        graft.pipeline.TextAnalysis.c4Filters(src, "text", "doc_id")
      }.orderBy("doc_id")
    },

    // Streaming Gopher quality gate: stateless per-row metric map — the
    // continuous result equals the batch operator row-for-row and shares
    // q_text_gopher's oracle verbatim.
    Q.df("q_stream_text_gopher",
      duck = """WITH base AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(text, '\s+'), x -> length(x) > 0) AS w,
        |    list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
        |      x -> length(x) > 0) AS l
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    len(w) AS n_words, len(l) AS n_lines,
        |    CASE WHEN len(w) > 0 THEN CAST(COALESCE(list_sum(list_transform(w, x -> length(x))), 0) AS DOUBLE) / len(w) ELSE 0.0 END AS mean_word_len,
        |    CASE WHEN len(w) > 0 THEN CAST((length(text) - length(replace(text, '#', ''))) + (length(text) - length(replace(text, '...', ''))) / 3 AS DOUBLE) / len(w) ELSE 0.0 END AS symbol_word_ratio,
        |    CASE WHEN len(l) > 0 THEN CAST(len(list_filter(l, x -> starts_with(x, chr(8226)) OR starts_with(x, '-') OR starts_with(x, '*'))) AS DOUBLE) / len(l) ELSE 0.0 END AS bullet_line_frac,
        |    CASE WHEN len(l) > 0 THEN CAST(len(list_filter(l, x -> ends_with(x, '...'))) AS DOUBLE) / len(l) ELSE 0.0 END AS ellipsis_line_frac,
        |    CASE WHEN len(w) > 0 THEN CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE) / len(w) ELSE 0.0 END AS alpha_word_frac,
        |    len(list_filter(w, x -> lower(x) IN ('the','be','to','of','and','that','have','with'))) AS stopword_hits
        |  FROM base)
        |SELECT doc_id, n_words, ROUND(mean_word_len, 4) AS mean_word_len,
        |  ROUND(symbol_word_ratio, 4) AS symbol_word_ratio,
        |  ROUND(bullet_line_frac, 4) AS bullet_line_frac,
        |  ROUND(ellipsis_line_frac, 4) AS ellipsis_line_frac,
        |  ROUND(alpha_word_frac, 4) AS alpha_word_frac, stopword_hits,
        |  (n_words BETWEEN 30 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
        |   AND symbol_word_ratio <= 0.1 AND bullet_line_frac <= 0.9
        |   AND ellipsis_line_frac <= 0.3 AND alpha_word_frac >= 0.8
        |   AND stopword_hits >= 2) AS gopher_pass
        |FROM m ORDER BY doc_id""".stripMargin) { (s, dir) =>
      replayDocs(s, dir, "q_stream_text_gopher_sink") { d =>
        graft.pipeline.TextAnalysis.gopherQuality(d, "text", "doc_id", minWords = 30)
      }.orderBy("doc_id")
    },

    // Streaming MinHash-LSH near-dup candidates (xxhash family: rows-only
    // golden; batch parity + state eviction are spec-asserted). ts is
    // synthesized from doc_id so arrival order follows ids and the pair
    // orientation matches the batch operator.
    Q.rowsOnly("q_stream_dedup_minhash",
      NoOracle.Terminal("xxhash64 minhash sketch has no SQL replay",
        companions = Seq("q_stream_dedup_minhash_parity"))) { (s, dir) =>
      implicit val sp: org.apache.spark.sql.SparkSession = s
      replayDocs(s, dir, "q_stream_dedup_minhash_sink") { d =>
        val withTs = d.select(col("doc_id"), col("text"),
          timestamp_millis(lit(1704067200000L) + col("doc_id") * 1000L).as("ts"))
        graft.streaming.StreamingOps.minhashCandidatesStream(
          withTs, "ts", "text", "doc_id", watermark = "1 hour")
      }.select(col("a"), col("b"), round(col("est_jaccard"), 4).as("est_jaccard"))
        .distinct().orderBy("a", "b")
    },

    // ---- Streaming-vs-batch MinHash parity as a DRIVER-checked row (r13):
    //      both sides are xxhash-seeded (no SQL replay exists), but their
    //      AGREEMENT is exact — the streamed replay must produce the batch
    //      operator's candidate set, pair for pair, est for est. Symmetric-
    //      difference counters pinned zero; n_docs is the oracle's one
    //      data-derived column. (The same property is spec-asserted; this
    //      registers it so a parity break fails CORRECTNESS, not only CI.)
    Q.df("q_stream_dedup_minhash_parity",
      duck = """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(0 AS BIGINT) AS n_stream_only,
        |  CAST(0 AS BIGINT) AS n_batch_only,
        |  CAST(0 AS BIGINT) AS n_est_mismatch
        |FROM documents""".stripMargin) { (s, dir) =>
      implicit val sp: org.apache.spark.sql.SparkSession = s
      val stream = replayDocs(s, dir, "q_stream_dedup_minhash_parity_sink") { d =>
        val withTs = d.select(col("doc_id"), col("text"),
          timestamp_millis(lit(1704067200000L) + col("doc_id") * 1000L).as("ts"))
        graft.streaming.StreamingOps.minhashCandidatesStream(
          withTs, "ts", "text", "doc_id", watermark = "1 hour")
      }.select(col("a"), col("b"), round(col("est_jaccard"), 4).as("est_s"))
        .distinct()
      val batch = graft.pipeline.Dedup.minhashCandidates(
          Tables.read(s, dir, "documents"), "text", "doc_id")
        .select(col("a"), col("b"), round(col("est_jaccard"), 4).as("est_b"))
      val j = stream.join(batch, Seq("a", "b"), "full_outer")
      val nDocs = Tables.read(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
      val viol = j.agg(
        coalesce(sum(when(col("est_b").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_stream_only"),
        coalesce(sum(when(col("est_s").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_batch_only"),
        coalesce(sum(when(col("est_s") =!= col("est_b"), 1L).otherwise(0L)),
          lit(0L)).as("n_est_mismatch"))
      nDocs.crossJoin(viol) // 1x1 anchor join
    },

    Q.df("q_stream_window_agg",
      duck = """SELECT epoch_ms(date_trunc('hour', ts)) AS bucket_ms,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      replayEvents(s, dir, "q_stream_window_agg_sink", "complete") { ev =>
        StreamingOps.timeWindowAggStream(ev, "ts", "1 hour",
          watermark = "1 hour",
          aggs = Seq(
            count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value")))
      }.orderBy("bucket_ms")
    },

    // Streaming bounded top-k replay: per (1-day window, event_type) the 3
    // highest-value events via the graft_top_k mergeable aggregate running
    // INSIDE a streaming aggregation — its k-capped buffers are what the
    // state store persists per group, so streaming state is bounded by
    // k * groups, never by events seen. Complete-mode result equals the
    // batch window oracle.
    Q.df("q_stream_top_k",
      duck = """SELECT epoch_ms(date_trunc('day', ts)) AS bucket_ms, event_type,
        |  event_id, value
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY date_trunc('day', ts), event_type
        |        ORDER BY value DESC, event_id) AS rn
        |      FROM events)
        |WHERE rn <= 3
        |ORDER BY bucket_ms, event_type, value DESC, event_id""".stripMargin) { (s, dir) =>
      replayEvents(s, dir, "q_stream_top_k_sink", "complete") { ev =>
        ev.withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(expr("graft_top_k(struct(event_id, value), value, event_id, 3)").as("kept"))
          .select(unix_millis(col("window.start")).as("bucket_ms"),
            col("event_type"), explode(col("kept")).as("k"))
          .select(col("bucket_ms"), col("event_type"),
            col("k.event_id").as("event_id"), col("k.value").as("value"))
      }.orderBy(col("bucket_ms"), col("event_type"), col("value").desc, col("event_id"))
    },

    // Streaming MATCH_RECOGNIZE replay: view-runs (V{3,}) detected
    // continuously with a 1h watermark. The oracle replicates the finality
    // protocol: an island is emitted iff its successor row is final at the
    // stream's final watermark (max ts - 1h) — a greedy V{3,} attempt probes
    // exactly one row past its run, so that successor being final closes it.
    Q.df("q_stream_mr_runs",
      duck = """WITH x AS (
        |  SELECT user_id, ts, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
        |  FROM events),
        |wm AS (SELECT epoch_ms(max(ts)) - 3600000 AS w FROM events),
        |v AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
        |      FROM x WHERE event_type = 'view'),
        |g AS (SELECT user_id, MIN(rn) AS start_rn, MAX(rn) AS end_rn,
        |             COUNT(*) AS n_rows, MIN(ts) AS start_ts, MAX(ts) AS end_ts
        |      FROM v GROUP BY user_id, grp HAVING COUNT(*) >= 3),
        |ok AS (SELECT g.* FROM g
        |       JOIN x nx ON nx.user_id = g.user_id AND nx.rn = g.end_rn + 1
        |       JOIN wm ON epoch_ms(nx.ts) <= wm.w)
        |SELECT user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY start_rn) AS match_num,
        |  epoch_ms(start_ts) AS start_ms, epoch_ms(end_ts) AS end_ms, n_rows
        |FROM ok ORDER BY user_id, match_num""".stripMargin) { (s, dir) =>
      implicit val sp: org.apache.spark.sql.SparkSession = s
      replayEvents(s, dir, "q_stream_mr_runs_sink", "append") { ev =>
        graft.streaming.StreamingMatch.matchRecognizeStream(
          ev, "ts", "user_id", pattern = "V{3,}",
          defines = Map("V" -> (col("event_type") === "view")),
          watermark = "1 hour", maxSpan = "60 days")
      }.select(col("user_id").cast("long").as("user_id"), col("match_num"),
          col("start_ms"), col("end_ms"), col("n_rows"))
        .orderBy("user_id", "match_num")
    },

    // Streaming GROUP BY RANGE FILL(PREVIOUS) replay: per event_type, 1h
    // epoch-aligned buckets incl. empty ones, previous-fill, emitted as the
    // watermark closes them. Oracle rebuilds the closed grid (per-key first
    // bucket .. last closed bucket at final watermark = max ts - 1h) and
    // applies the same fill with an IGNORE NULLS running window.
    Q.df("q_stream_group_range",
      duck = """WITH e AS (SELECT event_type AS k, epoch_ms(ts) AS ms, value
        |       FROM events WHERE value IS NOT NULL),
        |wm AS (SELECT epoch_ms(max(ts)) - 3600000 AS w FROM events),
        |agg AS (SELECT k, ms // 3600000 AS b, COUNT(*) AS n,
        |          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS v
        |        FROM e GROUP BY 1, 2),
        |rng AS (SELECT k, MIN(b) AS b0 FROM agg GROUP BY 1),
        |grid AS (SELECT r.k, gs.b FROM rng r, wm,
        |         LATERAL (SELECT unnest(generate_series(r.b0, (wm.w // 3600000) - 1)) AS b) gs),
        |j AS (SELECT g.k, g.b, a.n, a.v FROM grid g
        |      LEFT JOIN agg a ON a.k = g.k AND a.b = g.b)
        |SELECT k AS event_type, b * 3600000 AS bucket_ms, n,
        |  last_value(v IGNORE NULLS) OVER (
        |    PARTITION BY k ORDER BY b
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |  n IS NULL AS filled
        |FROM j ORDER BY event_type, bucket_ms""".stripMargin) { (s, dir) =>
      implicit val sp: org.apache.spark.sql.SparkSession = s
      // decimal-cents accumulation makes the value exact — no rounding
      replayEvents(s, dir, "q_stream_group_range_sink", "append") { ev =>
        graft.streaming.StreamingGroupByRange.groupByRangeStream(
          ev, "ts", "value", "event_type", "1 hour", "1 hour",
          graft.ts.GroupByRange.FillPrevious)
      }.select(col("event_type"), col("bucket_ms"), col("n"),
          col("value"), col("filled"))
        .orderBy("event_type", "bucket_ms")
    },

    // Sliding windows (2h length, 1h slide): every event lands in exactly
    // two hour-aligned windows, which the oracle materializes as a
    // two-branch UNION ALL before re-aggregating.
    Q.df("q_stream_sliding_window",
      duck = """WITH x AS (
        |  SELECT epoch_ms(date_trunc('hour', ts)) AS h, value FROM events
        |), m AS (
        |  SELECT h AS ws, value FROM x
        |  UNION ALL SELECT h - 3600000 AS ws, value FROM x)
        |SELECT ws AS bucket_ms, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      replayEvents(s, dir, "q_stream_sliding_window_sink", "complete") { ev =>
        StreamingOps.slidingWindowAggStream(ev, "ts", "2 hours", "1 hour",
          watermark = "1 hour",
          aggs = Seq(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value")))
      }.orderBy("bucket_ms")
    },

    // Streaming exact dedup: dropDuplicatesWithinWatermark on a content
    // digest (state evicted as the watermark passes). Which physical row
    // survives per key is processing-order dependent, so the query projects
    // only columns functionally determined by the dedup key — making the
    // result the exact distinct set.
    Q.df("q_stream_dedup",
      duck = """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
      replayEvents(s, dir, "q_stream_dedup_sink", "append") { ev =>
        StreamingOps.dedupStream(
          ev.withColumn("__pair",
            concat_ws("|", col("user_id"), col("event_type"))),
          "ts", "__pair", watermark = "1 hour")
          .select(col("user_id"), col("event_type"))
      }.orderBy("user_id", "event_type")
    },

    // Stream-static AS-OF join: streaming click probes enriched with the
    // latest preceding static view reading per user — the continuous face
    // of q_asof_join_prev, sharing its DuckDB ASOF JOIN oracle verbatim.
    // Complete-mode replay emits every probe group.
    Q.df("q_stream_asof_prev",
      duck = """WITH p AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'),
        |s AS (SELECT user_id, ts AS view_ts, value AS view_value FROM events WHERE event_type = 'view')
        |SELECT p.event_id, epoch_ms(p.ts) AS ts_ms, p.user_id,
        |  epoch_ms(s.view_ts) AS view_ts_ms, s.view_value
        |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND s.view_ts <= p.ts
        |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
      replayEvents(s, dir, "q_stream_asof_sink", "complete") { ev =>
        val probe = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("ts"), col("user_id"))
        val series = Tables.events(s, dir)
          .filter(col("event_type") === "view")
          .select(col("user_id"), col("ts").as("view_ts"),
            col("value").as("view_value"))
        StreamingOps.asOfJoinStream(probe, series, keys = Seq("user_id"),
          probeTs = "ts", seriesTs = "view_ts")
      }.select(col("event_id"), unix_millis(col("ts")).as("ts_ms"),
          col("user_id"), unix_millis(col("view_ts")).as("view_ts_ms"),
          col("view_value"))
        .orderBy("event_id")
    },

    // Stream-stream INTERVAL join: clicks attributed to same-user views of
    // the preceding hour, both sides streaming — watermark-bounded join
    // state, inner/append semantics. Oracle is the plain range join.
    Q.df("q_stream_interval_join",
      duck = """WITH p AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'),
        |s AS (SELECT user_id, ts AS view_ts, value AS view_value FROM events WHERE event_type = 'view')
        |SELECT p.event_id, epoch_ms(p.ts) AS ts_ms, p.user_id,
        |  epoch_ms(s.view_ts) AS view_ts_ms, s.view_value
        |FROM p JOIN s ON p.user_id = s.user_id
        |  AND s.view_ts >= p.ts - INTERVAL 1 HOUR AND s.view_ts <= p.ts
        |ORDER BY p.event_id, view_ts_ms""".stripMargin) { (s, dir) =>
      replayEvents(s, dir, "q_stream_interval_sink", "append") { ev =>
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("ts"), col("user_id"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts").as("view_ts"),
            col("value").as("view_value"))
        StreamingOps.intervalJoinStream(clicks, views, keys = Seq("user_id"),
          lTs = "ts", rTs = "view_ts", lower = "-1 hour", upper = "0 seconds")
      }.select(col("event_id"), unix_millis(col("ts")).as("ts_ms"),
          col("user_id"), unix_millis(col("view_ts")).as("view_ts_ms"),
          col("view_value"))
        .orderBy("event_id", "view_ts_ms")
    },

    // Streaming gap sessions via the native session_window aggregation.
    // session_window merges events whose gap is STRICTLY under the gap
    // duration (window end = last event + gap), so the oracle opens a new
    // session on gap >= 30 min — one tick stricter than the batch
    // sessionize's strict-> semantics (both documented). Complete-mode
    // replay emits every session, so no watermark-finality protocol is
    // needed in the oracle.
    Q.df("q_stream_sessionize",
      duck = """WITH f AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |         THEN 1 ELSE 0 END AS opens
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(opens) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        |  FROM f)
        |SELECT user_id,
        |  epoch_ms(min(ts)) AS session_start_ms,
        |  epoch_ms(max(ts)) + 1800000 AS session_end_ms,
        |  count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_ms""".stripMargin) { (s, dir) =>
      replayEvents(s, dir, "q_stream_sessionize_sink", "complete") { ev =>
        StreamingOps.sessionize(ev, "ts", gap = "30 minutes",
          watermark = "1 hour",
          aggs = Seq(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value")),
          keys = Seq("user_id"))
      }.select(col("user_id"), col("session_start_ms"), col("session_end_ms"),
          col("n"), col("sum_value"))
        .orderBy("user_id", "session_start_ms")
    },

    // ---- streaming filtered-ANN SERVING (r14): query vectors arrive as a
    //      stream and are served per micro-batch against the persisted
    //      label-attributed IVF index with a predicate — the production
    //      retrieval loop. Serving is stateless per query, so the union of
    //      per-batch results must equal the one-shot batch serve EXACTLY,
    //      pair for pair — proven against the same FULL DuckDB oracle as
    //      q_sim_ivf_filtered (two forced micro-batches via
    //      maxFilesPerTrigger=1 over a two-file staging). ----
    Q.df("q_stream_ann_filtered", duck = PipelineQueries.IvfFilteredOracle) { (s, dir) =>
      val e = Tables.read(s, dir, "embeddings")
      val idx = PipelineQueries.ivfIndexPath(s, dir)
      val stage = java.nio.file.Files.createTempDirectory("graft_replay_annq")
      e.filter(col("vec_id") < 5).repartition(2)
        .write.mode("overwrite").parquet(stage.toString)
      val buf = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
      val outSchema =
        try {
          val qStream = s.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", "1").parquet(stage.toString)
          var schema: org.apache.spark.sql.types.StructType = null
          val q = qStream.writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
              val served = graft.pipeline.IvfIndex.topK(s, idx, batch,
                "vec_id", "embedding", k = 10,
                predicate = Some(col("label") < 5))
              schema = served.schema
              buf.synchronized { buf ++= served.collect() }
              ()
            }
            .trigger(Trigger.AvailableNow()).start()
          try q.awaitTermination() finally q.stop()
          schema
        } finally {
          org.apache.commons.io.FileUtils.deleteDirectory(stage.toFile)
        }
      s.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.BufferHasAsJava(buf).asJava),
          outSchema)
        .orderBy("q_id", "rk")
    },

    // ---- STREAMING incremental dedup (the continuous ingest gate): docs
    //      arrive in micro-batches, each batch dedups against a persisted
    //      MinhashIndex, survivors are APPENDED so later batches dedup
    //      against them too. DRIVER row: the stream's per-batch survivors
    //      must equal a sequential batch-by-batch fold of
    //      incrementalMinhashDedup over the SAME captured batch sequence
    //      with a growing corpus — counters pinned 0. maxSf: the parity
    //      fold collects per-batch id lists to the driver. ----
    Q.df("q_stream_dedup_incremental", maxSf = 0.1,
      duck = """SELECT CAST(COUNT(*) AS BIGINT) AS n_batch_docs,
        |  CAST(0 AS BIGINT) AS n_stream_only,
        |  CAST(0 AS BIGINT) AS n_fold_only
        |FROM documents WHERE doc_id % 10 >= 7""".stripMargin) { (s, dir) =>
      val d = Tables.read(s, dir, "documents")
      val ingest = d.filter(col("doc_id") % 10 >= 7)
      val corpus0 = d.filter(col("doc_id") % 10 < 7)
      // fresh index per run — the stream MUTATES it by appending survivors
      val idxPath = java.nio.file.Files.createTempDirectory("graft_mh_stream").toString
      graft.pipeline.MinhashIndex.build(corpus0, "text", "doc_id", idxPath)
      val stage = java.nio.file.Files.createTempDirectory("graft_replay_incr")
      ingest.repartition(3).write.mode("overwrite").parquet(stage.toString)
      val recorded =
        scala.collection.mutable.ArrayBuffer[(Long, Seq[Long], Seq[Long])]()
      try {
        val stream = s.readStream.schema(d.schema)
          .option("maxFilesPerTrigger", "1").parquet(stage.toString)
        val q = graft.streaming.StreamingOps.incrementalDedupStream(
            stream, "text", "doc_id", idxPath) { (batch, surv, id) =>
          val b = batch.select("doc_id").collect().map(_.getLong(0)).toSeq
          val sv = surv.select("doc_id").collect().map(_.getLong(0)).toSeq
          recorded.synchronized { recorded += ((id, b, sv)); () }
        }.trigger(Trigger.AvailableNow()).start()
        try q.awaitTermination() finally q.stop()
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(stage.toFile)
      }
      // sequential fold over the captured batch sequence, corpus growing by
      // each round's survivors — the batch-mode ground truth of the stream
      var corp = corpus0.select(col("doc_id"), col("text"))
      val foldSurvivors = scala.collection.mutable.ArrayBuffer[Long]()
      recorded.sortBy(_._1).foreach { case (_, bIds, _) =>
        val bdf = ingest.filter(col("doc_id").isin(bIds: _*))
        val sv = graft.pipeline.Dedup.incrementalMinhashDedup(
          bdf, corp, "text", "doc_id")
        val svIds = sv.select("doc_id").collect().map(_.getLong(0))
        foldSurvivors ++= svIds
        corp = corp.unionByName(sv.select(col("doc_id"), col("text")))
          .localCheckpoint()
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idxPath))
      val streamSurvivors = recorded.flatMap(_._3).toSet
      val fold = foldSurvivors.toSet
      import s.implicits._
      Seq((recorded.map(_._2.size.toLong).sum,
          (streamSurvivors -- fold).size.toLong,
          (fold -- streamSurvivors).size.toLong))
        .toDF("n_batch_docs", "n_stream_only", "n_fold_only")
    }
  )
}

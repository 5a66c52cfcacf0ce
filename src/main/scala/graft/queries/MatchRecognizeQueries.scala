package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables
import graft.mr.{MatchRecognize, Measures}

/** MATCH_RECOGNIZE queries. Run-detection, anchors, MEASURES, the V-shape
  * pattern and SKIP TO FIRST overlap all have exact gaps-and-islands SQL
  * oracles. */
object MatchRecognizeQueries {

  val qs: Seq[Q] = Seq(

    // runs of >= 3 consecutive 'view' events per user: PATTERN (V{3,})
    Q.df("q_mr_view_runs",
      duck = """WITH x AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |v AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
        |      FROM x WHERE event_type = 'view'),
        |g AS (SELECT user_id, grp, MIN(rn) AS start_rn FROM v
        |      GROUP BY user_id, grp HAVING COUNT(*) >= 3),
        |m AS (SELECT user_id, grp,
        |        row_number() OVER (PARTITION BY user_id ORDER BY start_rn) AS match_num
        |      FROM g)
        |SELECT v.user_id AS user_id, v.event_id AS event_id, m.match_num, 'V' AS classifier
        |FROM v JOIN m ON v.user_id = m.user_id AND v.grp = m.grp
        |ORDER BY v.user_id, m.match_num, v.event_id""".stripMargin,
      bench = true) { (s, dir) =>
      // project BEFORE the NFA (r19, guide §2.3): MapPartitions is opaque
      // to Catalyst, so the final 4-column select cannot prune the
      // exchange feeding it — unprojected, every row shipped `value` and
      // `props` (the widest column of events) into the shuffle and the
      // row-object region for nothing. Output columns are unchanged.
      MatchRecognize.allRowsPerMatch(
          Tables.events(s, dir)
            .select("user_id", "event_id", "ts", "event_type"),
          keys = Seq("user_id"),
          orderCols = Seq("ts", "event_id"),
          pattern = "V{3,}",
          defines = Map("V" -> (col("event_type") === "view")))
        .select(col("user_id"), col("event_id"), col("match_num"), col("classifier"))
        .orderBy("user_id", "match_num", "event_id")
    },

    // MEASURES over the same view-run pattern: per-match FIRST/LAST/COUNT/
    // SUM(V.value)/CLASSIFIER (reference rules 163-168)
    Q.df("q_mr_measures",
      duck = """WITH x AS (
        |  SELECT user_id, event_id, ts, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |v AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
        |      FROM x WHERE event_type = 'view'),
        |g AS (SELECT user_id, grp, MIN(rn) AS start_rn,
        |        arg_min(event_id, rn) AS start_event, arg_max(event_id, rn) AS end_event,
        |        COUNT(*) AS n_rows,
        |        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |      FROM v GROUP BY user_id, grp HAVING COUNT(*) >= 3)
        |SELECT user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY start_rn) AS match_num,
        |  start_event, end_event, n_rows, sum_value, 'V' AS cls
        |FROM g ORDER BY user_id, match_num""".stripMargin) { (s, dir) =>
      MatchRecognize.measures(
          Tables.events(s, dir), keys = Seq("user_id"),
          orderCols = Seq("ts", "event_id"),
          pattern = "V{3,}",
          defines = Map("V" -> (col("event_type") === "view")),
          ms = Seq(
            "start_event" -> Measures.firstVal(col("event_id")),
            "end_event" -> Measures.lastVal(col("event_id")),
            "n_rows" -> count(lit(1)),
            "sum_value" -> sum(Measures.ofVar("V", col("value")).cast("decimal(18,6)")).cast("double"),
            "cls" -> Measures.classifier))
        .orderBy("user_id", "match_num")
    },

    // ALL ROWS PER MATCH + MEASURES (reference combination, rules 162-194):
    // every matched row carries the input columns, match_num, classifier,
    // AND the per-match FINAL measure values duplicated onto it
    Q.df("q_mr_all_rows_measures",
      duck = """WITH x AS (
        |  SELECT user_id, event_id, ts, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |v AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
        |      FROM x WHERE event_type = 'view'),
        |g AS (SELECT user_id, grp, MIN(rn) AS start_rn,
        |        arg_min(event_id, rn) AS start_event, arg_max(event_id, rn) AS end_event,
        |        COUNT(*) AS n_rows,
        |        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |      FROM v GROUP BY user_id, grp HAVING COUNT(*) >= 3),
        |m AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY start_rn) AS match_num
        |      FROM g)
        |SELECT v.user_id AS user_id, v.event_id AS event_id, m.match_num,
        |  'V' AS classifier, m.start_event, m.end_event, m.n_rows, m.sum_value
        |FROM v JOIN m ON v.user_id = m.user_id AND v.grp = m.grp
        |ORDER BY user_id, match_num, event_id""".stripMargin) { (s, dir) =>
      MatchRecognize.allRowsWithMeasures(
          Tables.events(s, dir), keys = Seq("user_id"),
          orderCols = Seq("ts", "event_id"),
          pattern = "V{3,}",
          defines = Map("V" -> (col("event_type") === "view")),
          ms = Seq(
            "start_event" -> Measures.firstVal(col("event_id")),
            "end_event" -> Measures.lastVal(col("event_id")),
            "n_rows" -> count(lit(1)),
            "sum_value" -> sum(Measures.ofVar("V", col("value")).cast("decimal(18,6)"))))
        .select(col("user_id"), col("event_id"), col("match_num"), col("classifier"),
          col("start_event"), col("end_event"), col("n_rows"),
          col("sum_value").cast("double").as("sum_value"))
        .orderBy("user_id", "match_num", "event_id")
    },

    // `^V+`: the run of views that begins at the partition's FIRST row
    // (start anchor, reference rule 190) — at most one match per user
    Q.df("q_mr_anchor_start",
      duck = """WITH x AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |v AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
        |      FROM x WHERE event_type = 'view')
        |SELECT user_id, event_id, CAST(1 AS BIGINT) AS match_num, 'V' AS classifier
        |FROM v WHERE grp = 0
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      MatchRecognize.allRowsPerMatch(
          Tables.events(s, dir), keys = Seq("user_id"),
          orderCols = Seq("ts", "event_id"),
          pattern = "^V+",
          defines = Map("V" -> (col("event_type") === "view")))
        .select(col("user_id"), col("event_id"), col("match_num"), col("classifier"))
        .orderBy("user_id", "event_id")
    },

    // `V+$`: the run of views that reaches the partition's LAST row
    // (end anchor, reference rule 187) — at most one match per user
    Q.df("q_mr_anchor_end",
      duck = """WITH x AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n_all
        |  FROM events),
        |v AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
        |      FROM x WHERE event_type = 'view'),
        |t AS (SELECT user_id, grp FROM v GROUP BY user_id, grp
        |      HAVING MAX(rn) = MAX(n_all))
        |SELECT v.user_id AS user_id, v.event_id AS event_id,
        |  CAST(1 AS BIGINT) AS match_num, 'V' AS classifier
        |FROM v JOIN t ON v.user_id = t.user_id AND v.grp = t.grp
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      MatchRecognize.allRowsPerMatch(
          Tables.events(s, dir), keys = Seq("user_id"),
          orderCols = Seq("ts", "event_id"),
          pattern = "V+$",
          defines = Map("V" -> (col("event_type") === "view")))
        .select(col("user_id"), col("event_id"), col("match_num"), col("classifier"))
        .orderBy("user_id", "event_id")
    },

    // V-shape in value per user: strictly-down runs then strictly-up runs.
    // Greedy DOWN{2,} UP{2,} matches exactly the maximal D-run immediately
    // followed by a maximal U-run (both >= 2), which islands SQL expresses:
    // classify each row D/U/F vs its predecessor, group into maximal runs,
    // join adjacent (D, U) run pairs.
    Q.df("q_mr_vshape",
      duck = """WITH x AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn,
        |    lag(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS pv
        |  FROM events),
        |c AS (SELECT user_id, rn,
        |        CASE WHEN pv IS NULL THEN 'F' WHEN value < pv THEN 'D'
        |             WHEN value > pv THEN 'U' ELSE 'F' END AS cls
        |      FROM x),
        |r AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id, cls ORDER BY rn) AS grp
        |      FROM c),
        |runs AS (SELECT user_id, cls, grp, MIN(rn) AS srn, MAX(rn) AS ern, COUNT(*) AS len
        |         FROM r GROUP BY user_id, cls, grp),
        |v AS (SELECT d.user_id AS user_id, d.srn AS start_rn, d.len + u.len AS n_rows
        |      FROM runs d JOIN runs u
        |        ON d.user_id = u.user_id AND d.cls = 'D' AND u.cls = 'U'
        |       AND u.srn = d.ern + 1 AND d.len >= 2 AND u.len >= 2)
        |SELECT user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY start_rn) AS match_num,
        |  n_rows
        |FROM v ORDER BY user_id, match_num""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val prev = lag(col("value"), 1).over(w)
      MatchRecognize.oneRowPerMatch(
        ev.withColumn("__prev", prev), keys = Seq("user_id"),
        orderCols = Seq("ts", "event_id"),
        pattern = "DOWN{2,} UP{2,}",
        defines = Map(
          "DOWN" -> (col("value") < col("__prev")),
          "UP" -> (col("value") > col("__prev"))))
        .select(col("user_id"), col("match_num"), col("n_rows"))
        .orderBy("user_id", "match_num")
    },

    // AFTER MATCH SKIP TO FIRST B over an always-true A B{2}: a sliding
    // 3-row window per user — every position with 2 successors starts an
    // (overlapping) match, so match_num equals the start row's ordinal
    // (reference grammar rule 174)
    Q.df("q_mr_skip_first",
      duck = """WITH x AS (
        |  SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n
        |  FROM events WHERE event_type = 'view'),
        |m AS (SELECT user_id, rn AS match_num FROM x WHERE rn + 2 <= n)
        |SELECT x.user_id AS user_id, x.event_id AS event_id, m.match_num,
        |  CASE WHEN x.rn = m.match_num THEN 'A' ELSE 'B' END AS classifier
        |FROM m JOIN x ON x.user_id = m.user_id
        |  AND x.rn BETWEEN m.match_num AND m.match_num + 2
        |ORDER BY user_id, match_num, event_id""".stripMargin) { (s, dir) =>
      MatchRecognize.allRowsPerMatch(
          Tables.events(s, dir).filter(col("event_type") === "view"),
          keys = Seq("user_id"), orderCols = Seq("ts", "event_id"),
          pattern = "A B{2}",
          defines = Map("A" -> lit(true), "B" -> lit(true)),
          skip = MatchRecognize.AfterMatchSkip.ToFirstVar("B"))
        .select(col("user_id"), col("event_id"), col("match_num"), col("classifier"))
        .orderBy("user_id", "match_num", "event_id")
    },

    // NEXT(col) physical lookahead in DEFINE (FUNC_NEXT, reference
    // sql_type.h:196): runs of >= 2 rows whose value strictly exceeds the
    // NEXT row's value. Goes through the GraftMrSql TEXT lowering (the
    // lead() materialization is what's under test). The partition's last
    // row has NULL lookahead -> condition UNKNOWN -> never matches P,
    // which the lead()-based oracle mirrors with `nv IS NOT NULL`.
    Q.df("q_mr_next",
      duck = """WITH x AS (
        |  SELECT user_id, event_id, ts, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn,
        |    lead(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS nv
        |  FROM events),
        |p AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
        |      FROM x WHERE nv IS NOT NULL AND value > nv),
        |g AS (SELECT user_id, grp, MIN(rn) AS srn FROM p
        |      GROUP BY user_id, grp HAVING COUNT(*) >= 2),
        |m AS (SELECT user_id, grp,
        |        row_number() OVER (PARTITION BY user_id ORDER BY srn) AS match_num
        |      FROM g)
        |SELECT p.user_id AS user_id, p.event_id AS event_id, m.match_num,
        |  'P' AS classifier
        |FROM p JOIN m ON p.user_id = m.user_id AND p.grp = m.grp
        |ORDER BY user_id, match_num, event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir).createOrReplaceTempView("mr_next_events")
      graft.engine.GraftMrSql.run(s,
        """SELECT * FROM mr_next_events MATCH_RECOGNIZE (
          |  PARTITION BY user_id ORDER BY ts, event_id
          |  ALL ROWS PER MATCH
          |  PATTERN (P{2,})
          |  DEFINE P AS value > NEXT(value)
          |)""".stripMargin)
        .select(col("user_id"), col("event_id"), col("match_num"), col("classifier"))
        .orderBy("user_id", "match_num", "event_id")
    },

    // ---- UNKEYED bounded-pattern match: exercises the chunk-parallel scan
    // (no coalesce(1) — the series is chunked with an L-row overlap and the
    // entry/exit composition reproduces the sequential AFTER MATCH SKIP
    // discipline). H{2} = pairs of consecutive high-value events taken
    // greedily from each run start; a run of n highs yields floor(n/2)
    // matches. Oracle: gaps-and-islands runs, pairwise offsets ----
    Q.df("q_mr_unkeyed_pairs",
      duck = """WITH x AS (
        |  SELECT event_id, value,
        |    row_number() OVER (ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |h AS (SELECT *, rn - row_number() OVER (ORDER BY rn) AS grp
        |      FROM x WHERE value > 150),
        |o AS (SELECT event_id, rn, grp,
        |        row_number() OVER (PARTITION BY grp ORDER BY rn) - 1 AS off,
        |        count(*) OVER (PARTITION BY grp) AS len
        |      FROM h),
        |p AS (SELECT event_id, rn, grp, off FROM o WHERE off < 2 * (len // 2)),
        |m AS (SELECT grp, off // 2 AS pi, MIN(rn) AS srn
        |      FROM p GROUP BY grp, off // 2),
        |mm AS (SELECT grp, pi, row_number() OVER (ORDER BY srn) AS match_num
        |       FROM m)
        |SELECT p.event_id, mm.match_num, 'H' AS classifier
        |FROM p JOIN mm ON p.grp = mm.grp AND p.off // 2 = mm.pi
        |ORDER BY mm.match_num, p.event_id""".stripMargin) { (s, dir) =>
      MatchRecognize.allRowsPerMatch(
          Tables.events(s, dir), keys = Nil, orderCols = Seq("ts", "event_id"),
          pattern = "H{2}",
          defines = Map("H" -> (col("value") > 150)))
        .select(col("event_id"), col("match_num"), col("classifier"))
        .orderBy("match_num", "event_id")
    }
  )
}

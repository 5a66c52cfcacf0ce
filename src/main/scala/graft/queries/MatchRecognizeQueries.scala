package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables
import graft.mr.MatchRecognize

/** MATCH_RECOGNIZE queries. The run-detection pattern has an exact
  * gaps-and-islands SQL oracle; the V-shape pattern is rows-only (covered by
  * hand-computed fixtures in MatchRecognizeSpec). */
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
      MatchRecognize.allRowsPerMatch(
          Tables.events(s, dir), keys = Seq("user_id"),
          orderCols = Seq("ts", "event_id"),
          pattern = "V{3,}",
          defines = Map("V" -> (col("event_type") === "view")))
        .select(col("user_id"), col("event_id"), col("match_num"), col("classifier"))
        .orderBy("user_id", "match_num", "event_id")
    },

    // V-shape in value per user: strictly-down runs then strictly-up runs
    Q.rowsOnly("q_mr_vshape") { (s, dir) =>
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
    }
  )
}

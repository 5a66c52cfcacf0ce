package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GridDB TimeSeries selection / aggregation operators, re-expressed as
  * Spark DataFrame transforms.
  *
  * Reference semantics:
  *  - TIME_NEXT / TIME_PREV (+_ONLY): /root/reference/server/selection_func.h:126
  *  - TIME_INTERPOLATED: /root/reference/server/selection_func.h:148
  *  - TIME_SAMPLING: /root/reference/server/selection_func.h:173-199
  *  - TIME_WINDOW_AGG: /root/reference/server/selection_func.h:201-228
  *  - MAX_ROWS / MIN_ROWS: /root/reference/server/selection_func.h:230-298
  *  - TIME_AVG (weighted avg): /root/reference/server/aggregation_func.h:780-899
  *
  * All operators accept optional partition `keys`. GridDB's TimeSeries is a
  * single container, i.e. `keys = Nil`; at 100 TB one series per device/user
  * is the realistic layout, so every operator is written to scale out over
  * `keys` (window partitioning / groupBy) and only degenerates to a single
  * partition when keys are empty — matching the reference's per-container
  * semantics.
  *
  * Time arithmetic is done on epoch MICROSECONDS (Spark's native timestamp
  * resolution) so interpolation weights are exact and reproducible.
  */
object TimeSeriesOps {

  private def usec(c: Column): Column = unix_micros(c)

  /** TIME_NEXT: earliest row with ts >= t (TIME_NEXT_ONLY: ts > t). */
  def timeNext(df: DataFrame, tsCol: String, t: Column, only: Boolean = false,
               tieBreak: Seq[String] = Nil): DataFrame = {
    val cmp = if (only) col(tsCol) > t else col(tsCol) >= t
    df.filter(cmp)
      .orderBy((col(tsCol).asc +: tieBreak.map(col(_).asc)): _*)
      .limit(1)
  }

  /** TIME_PREV: latest row with ts <= t (TIME_PREV_ONLY: ts < t). */
  def timePrev(df: DataFrame, tsCol: String, t: Column, only: Boolean = false,
               tieBreak: Seq[String] = Nil): DataFrame = {
    val cmp = if (only) col(tsCol) < t else col(tsCol) <= t
    df.filter(cmp)
      .orderBy(col(tsCol).desc +: tieBreak.map(col(_).desc): _*)
      .limit(1)
  }

  /** TIME_INTERPOLATED(valCol, t): linear interpolation of valCol at time t
    * between the neighboring rows (exact row wins if one exists at t).
    * Returns (ts_ms, <valCol>) with a single row, or zero rows when t is
    * outside the series range. */
  def timeInterpolated(df: DataFrame, tsCol: String, valCol: String, t: Column): DataFrame = {
    val prev = timePrev(df, tsCol, t)
      .select(usec(col(tsCol)).as("p_us"), col(valCol).cast("double").as("p_v"))
    val next = timeNext(df, tsCol, t)
      .select(usec(col(tsCol)).as("n_us"), col(valCol).cast("double").as("n_v"))
    prev.crossJoin(next)
      .select(
        (usec(t) / lit(1000)).cast("long").as("ts_ms"),
        when(col("n_us") === col("p_us"), col("p_v"))
          .otherwise(col("p_v") + (col("n_v") - col("p_v")) *
            ((usec(t) - col("p_us")).cast("double") /
              (col("n_us") - col("p_us")).cast("double")))
          .as(valCol))
  }

  /** TIME_SAMPLING(valCol, start, end, interval): resample the series onto a
    * regular grid; at each grid instant emit the exact value if a row exists,
    * else the linear interpolation between neighbors; grid points outside the
    * observed range produce no row.
    *
    * Implemented shuffle-lean: the grid is unioned with the data and a single
    * window pass (per key) computes the bracketing rows — no join per grid
    * point. Scales with `keys` partitioning.
    */
  def timeSampling(df: DataFrame, tsCol: String, valCol: String,
                   start: Column, end: Column, intervalUs: Long,
                   keys: Seq[String] = Nil): DataFrame = {
    val keyCols = keys.map(col)
    val data = df.select(
      (keyCols :+ usec(col(tsCol)).as("t_us")
        :+ col(valCol).cast("double").as("v")
        :+ lit(0).as("is_grid")): _*)
    val gridTimes = explode(sequence(usec(start), usec(end), lit(intervalUs))).as("t_us")
    val grid =
      if (keys.isEmpty) df.sparkSession.range(1).select(gridTimes, lit(null).cast("double").as("v"), lit(1).as("is_grid"))
      else df.select(keyCols: _*).distinct()
        .select((keyCols :+ gridTimes :+ lit(null).cast("double").as("v") :+ lit(1).as("is_grid")): _*)

    // grid rows sort after data rows at the same instant (exact match wins)
    val all = data.unionByName(grid)
    val wAsc = Window.partitionBy(keyCols: _*)
      .orderBy(col("t_us").asc, col("is_grid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy(keyCols: _*)
      .orderBy(col("t_us").desc, col("is_grid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dataT = when(col("is_grid") === 0, col("t_us"))
    val out = all
      .withColumn("p_us", last(dataT, ignoreNulls = true).over(wAsc))
      .withColumn("p_v", last(when(col("is_grid") === 0, col("v")), ignoreNulls = true).over(wAsc))
      .withColumn("n_us", last(dataT, ignoreNulls = true).over(wDesc))
      .withColumn("n_v", last(when(col("is_grid") === 0, col("v")), ignoreNulls = true).over(wDesc))
      .filter(col("is_grid") === 1 && col("p_us").isNotNull && col("n_us").isNotNull)
    out.select(
      (keyCols :+ (col("t_us") / lit(1000)).cast("long").as("ts_ms") :+
        when(col("n_us") === col("p_us"), col("p_v"))
          .otherwise(col("p_v") + (col("n_v") - col("p_v")) *
            ((col("t_us") - col("p_us")).cast("double") /
              (col("n_us") - col("p_us")).cast("double"))).as(valCol)): _*)
  }

  /** TIME_WINDOW_AGG: tumbling-window aggregation (window start aligned to
    * the epoch). `aggs` are applied per (keys, bucket). */
  def timeWindowAgg(df: DataFrame, tsCol: String, every: String,
                    aggs: Seq[Column], keys: Seq[String] = Nil): DataFrame = {
    val grouped = df.groupBy((window(col(tsCol), every) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
    grouped.select(
      (unix_millis(col("window.start")).as("bucket_ms") +:
        grouped.columns.filter(_ != "window").map(col).toSeq): _*)
  }

  /** TIME_AVG: time-weighted average — each row weighted by half the span
    * between its neighboring timestamps; boundary rows weighted by half the
    * span to their single neighbor. Single row per key group. */
  def timeAvg(df: DataFrame, tsCol: String, valCol: String,
              keys: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val tus = usec(col(tsCol))
    val prevT = lag(tus, 1).over(w)
    val nextT = lead(tus, 1).over(w)
    // interior: (next-prev)/2 ; first: (next-t)/2 ; last: (t-prev)/2 ;
    // single row: weight 1 (plain value).
    val weight = when(prevT.isNull && nextT.isNull, lit(1.0))
      .when(prevT.isNull, (nextT - tus).cast("double") / 2.0)
      .when(nextT.isNull, (tus - prevT).cast("double") / 2.0)
      .otherwise((nextT - prevT).cast("double") / 2.0)
    val weighted = df.select(
      (keys.map(col) :+ col(valCol).cast("double").as("v") :+ weight.as("w")): _*)
    val agg = (sum(col("v") * col("w")) / sum(col("w"))).as(s"time_avg_$valCol")
    if (keys.isEmpty) weighted.agg(agg)
    else weighted.groupBy(keys.map(col): _*).agg(agg)
  }

  /** Distributed as-of join: TIME_PREV/TIME_NEXT for a whole table of probe
    * timestamps at once (the reference answers one `t` per TQL query —
    * /root/reference/server/selection_func.h:126; batching them is the form
    * that matters at scale).
    *
    * For every probe row, attaches the payload of the latest series row
    * at-or-before its timestamp (`forward = true`: earliest at-or-after),
    * equi-matched on `keys`; unmatched probes keep null payload (left join).
    *
    * Spark-first plan: tag + union both sides, ONE shuffle on `keys`, sort
    * within partitions, and carry payloads to probe rows with a
    * last/first(ignoreNulls) running window — no range cross-join, no
    * per-probe lookup; cost is linear in |probe| + |series| and the sort.
    * `series` must contain `keys` + `seriesTs`; every other series column
    * becomes output payload and must not collide with probe column names
    * (rename in a prior select). `tolerance` (an interval literal, e.g.
    * "1 hour") null-outs matches further than that from the probe time. */
  def asOfJoin(probe: DataFrame, series: DataFrame, keys: Seq[String],
               probeTs: String, seriesTs: String, forward: Boolean = false,
               tolerance: Option[String] = None): DataFrame = {
    val payload = series.columns.filterNot(c => keys.contains(c) || c == seriesTs).toSeq
    val probeCols = probe.columns.toSeq
    require(payload.intersect(probeCols).isEmpty,
      s"series payload ${payload.intersect(probeCols)} collides with probe columns; rename first")
    val t = "__asof_t"; val isP = "__asof_probe"; val pl = "__asof_payload"

    // the whole series row (matched ts + payloads) travels as ONE struct:
    // filling per-column would let a null payload field fall through to a
    // DIFFERENT series row's value (struct-level ignoreNulls keeps the
    // matched row intact — its null fields stay null, like a real join)
    val pSide = probe.select(
      probeCols.map(col) ++ Seq(
        col(probeTs).as(t), lit(1).as(isP),
        lit(null).cast(org.apache.spark.sql.types.StructType(
          series.schema(seriesTs).copy(name = "__mts") +:
            payload.map(c => series.schema(c)))).as(pl)): _*)
    val sSide = series.select(
      probeCols.map(c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(probe.schema(c).dataType).as(c)) ++ Seq(
        col(seriesTs).as(t), lit(0).as(isP),
        struct(col(seriesTs).as("__mts") +: payload.map(col): _*).as(pl)): _*)

    // ties: a series row at exactly the probe time matches in both
    // directions, so it must sort on the window side of the probe row
    val ord =
      if (forward) Seq(col(t).asc, col(isP).desc) else Seq(col(t).asc, col(isP).asc)
    val w0 = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val w =
      if (forward) w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fill =
      if (forward) first(col(pl), ignoreNulls = true).over(w)
      else last(col(pl), ignoreNulls = true).over(w)

    val matched = pSide.unionByName(sSide)
      .withColumn(pl, fill)
      .filter(col(isP) === 1)
    val mts = col(pl).getField("__mts")
    val within = tolerance.fold(lit(true)) { tol =>
      val iv = expr(s"INTERVAL '$tol'")
      if (forward) mts <= col(t) + iv else mts >= col(t) - iv
    }
    val unpacked = payload.foldLeft(matched) { (d, c) =>
      d.withColumn(c, when(within, col(pl).getField(c)))
    }
    unpacked.drop(t, isP, pl)
  }

  /** MAX_ROWS / MIN_ROWS: every row achieving the extreme of `valCol`. */
  def extremeRows(df: DataFrame, valCol: String, isMax: Boolean,
                  keys: Seq[String] = Nil): DataFrame = {
    val ext = (if (isMax) max(col(valCol)) else min(col(valCol))).as("__ext")
    if (keys.isEmpty) {
      val m = df.agg(ext)
      df.join(broadcast(m), df(valCol) === m("__ext")).drop("__ext")
    } else {
      val m = df.groupBy(keys.map(col): _*).agg(ext)
      df.join(broadcast(m), keys).filter(col(valCol) === col("__ext")).drop("__ext")
    }
  }
}

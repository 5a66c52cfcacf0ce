package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.ts.GroupByRange

/** Continuous GROUP BY RANGE ... EVERY ... FILL — the streaming face of
  * [[graft.ts.GroupByRange]] (reference OP_GROUP_RANGE,
  * /root/reference/server/sql_operator_group.h:181-441; the reference has no
  * continuous engine, so this is additive Spark-native surface).
  *
  * Built-in `groupBy(window(...))` emits only NON-EMPTY buckets; GridDB's
  * operator also materializes empty buckets and fills them. A single
  * flatMapGroupsWithState stage keeps decomposable per-bucket partials
  * ((n, sum) per open bucket — fixed-size state per in-flight bucket, not
  * per row) and, as the watermark closes buckets, emits them IN ORDER with
  * gap semantics identical to the batch operator:
  *
  *  - NONE:     closed empty buckets are skipped
  *  - NULL:     emitted with null value
  *  - PREVIOUS: emitted with the previous non-empty bucket's value
  *              (leading gaps null)
  *  - LINEAR:   held until the next non-empty bucket closes, then emitted
  *              interpolated between the two anchors (leading gaps null;
  *              a trailing run of gaps is held as a constant-size
  *              (start, count) pair, not a growing list). A gap run that
  *              never sees a next anchor is flushed by `linearFlush`: once
  *              the run spans that much event time with no anchor, it emits
  *              as NULL — the batch operator's beyond-the-last-anchor
  *              semantics ("fills only between anchors") — and the previous
  *              anchor expires, so later gaps are leading (null) until a
  *              fresh anchor re-arms interpolation. With `linearFlush=None`
  *              (default) the run is held indefinitely, which matches batch
  *              exactly on bounded streams but never emits a trailing gap.
  *
  * Each key's grid starts at its first observed bucket and — for NULL and
  * PREVIOUS — keeps extending as the watermark advances even when the key
  * goes quiet (event-time timeouts re-fire), exactly like the batch
  * operator's [start, end] grid evaluated up to the watermark.
  *
  * The aggregate is avg(valCol); rows whose value is null (or overflows
  * decimal(18,2)) are ignored ENTIRELY — they contribute to neither the
  * average nor the bucket's row count, like GridDB aggregation over null
  * fields (a bucket of only-null rows is a fill gap). The sum accumulates as decimal(18,2)
  * scaled to Long "cents": integer addition is associative, so the result
  * is independent of arrival/partition order — double sums would drift
  * run-to-run and against the oracle on bigger buckets.
  * Output: key, bucket_ms, n (null on fills), value, filled. */
object StreamingGroupByRange {

  // (partials: bucket -> (n, sumCents), emittedUpTo, prevAnchor, gapStart, gapN)
  private type RState =
    (Map[Long, (Long, Long)], Option[Long], Option[Double], Option[Long], Long)

  def groupByRangeStream(
      stream: DataFrame, tsCol: String, valCol: String, keyCol: String,
      every: String, watermark: String, fill: GroupByRange.Fill,
      linearFlush: Option[String] = None)
      (implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._

    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(every))
    require(iv.months == 0,
      s"EVERY '$every': calendar months are not fixed-width; use day/hour/... units")
    val everyMs = iv.days.toLong * 86400000L + iv.microseconds / 1000L
    require(everyMs > 0, s"EVERY '$every' must be a positive interval")
    val linearFlushMs = linearFlush.map(StreamingMatch.intervalMs)
    require(linearFlushMs.forall(_ > 0), s"linearFlush must be a positive interval")
    val continuousFill =
      fill == GroupByRange.FillNull || fill == GroupByRange.FillPrevious

    val typed = stream
      .withWatermark(tsCol, watermark)
      .select(col(keyCol).cast("string").as("k"), col(tsCol).as("ts"),
        (col(valCol).cast("decimal(18,2)") * 100).cast("long").as("cents"))
      // null values are ignored like the batch avg; a decimal(18,2)
      // overflow also nulls and would crash the primitive Long encoder
      .where(col("cents").isNotNull)
      .as[(String, java.sql.Timestamp, Long)]

    typed.groupByKey(_._1)
      .flatMapGroupsWithState[RState,
        (String, Long, Option[Long], Option[Double], Boolean)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state) =>
          val wm = state.getCurrentWatermarkMs()
          var (partials, emittedUpTo, prev, gapStart, gapN) =
            state.getOption.getOrElse(
              (Map.empty[Long, (Long, Long)], None, None, None, 0L))
          rows.foreach { case (_, ts, cents) =>
            val b = Math.floorDiv(ts.getTime, everyMs)
            // flatMapGroupsWithState does not drop late rows itself: a row
            // whose bucket the watermark has already closed is discarded
            // (watermark contract), else its partial could never be emitted.
            // State-independent, so it also covers keys whose state was
            // dropped after draining.
            if ((b + 1) * everyMs > wm) {
              val (n, s) = partials.getOrElse(b, (0L, 0L))
              partials = partials.updated(b, (n + 1, s + cents))
            }
          }
          // bucket b = [b*e, (b+1)*e) is closed once wm >= (b+1)*e
          val bMax = Math.floorDiv(wm, everyMs) - 1
          val out = Vector.newBuilder[(String, Long, Option[Long], Option[Double], Boolean)]
          // resume after the last decided bucket; a key's grid starts at its
          // first observed bucket (min over ALL partials — a bucket can
          // appear below a previously-seen one while both are still open)
          val start = emittedUpTo.map(_ + 1)
            .orElse(if (partials.nonEmpty) Some(partials.keys.min) else None)
          var b = start.getOrElse(bMax + 1)
          while (b <= bMax) {
            partials.get(b) match {
              case Some((n, s)) =>
                // double(decimal sum) first, then /n — the exact sequence a
                // CAST(SUM(decimal) AS DOUBLE)/COUNT(*) oracle performs
                val v = (s / 100.0) / n
                gapStart.foreach { g0 => // LINEAR: interpolate held gaps
                  val p = prev.get
                  val a0 = g0 - 1 // previous anchor bucket
                  (g0 until g0 + gapN).foreach { g =>
                    val t = (g - a0).toDouble / (b - a0)
                    out += ((key, g * everyMs, None, Some(p + (v - p) * t), true))
                  }
                  gapStart = None; gapN = 0L
                }
                out += ((key, b * everyMs, Some(n), Some(v), false))
                prev = Some(v)
                partials = partials.removed(b)
              case None => fill match {
                case GroupByRange.FillNone =>
                case GroupByRange.FillNull =>
                  out += ((key, b * everyMs, None, None, true))
                case GroupByRange.FillPrevious =>
                  out += ((key, b * everyMs, None, prev, true))
                case GroupByRange.FillLinear =>
                  if (prev.isDefined) {
                    if (gapStart.isEmpty) gapStart = Some(b)
                    gapN += 1
                  } else out += ((key, b * everyMs, None, None, true))
              }
            }
            b += 1
          }
          if (start.exists(_ <= bMax)) emittedUpTo = Some(bMax)
          // LINEAR trailing-gap flush: the held run has spanned linearFlush
          // of event time with no next anchor -> it is trailing, emit NULL
          // (batch fills only BETWEEN anchors) and expire the prev anchor
          for (f <- linearFlushMs; g0 <- gapStart
               if (bMax + 1 - g0) * everyMs >= f) {
            (g0 until g0 + gapN).foreach { g =>
              out += ((key, g * everyMs, None, None, true))
            }
            gapStart = None; gapN = 0L; prev = None
          }
          // idle-TTL on the LINEAR anchor (the same trade-off as
          // StreamingMatch's idleTTL): once the watermark is linearFlush past
          // the anchor's bucket with nothing held, the anchor expires — so a
          // drained key's state can drop under key churn instead of living
          // forever. Without linearFlush the anchor is held indefinitely
          // (batch-exact on bounded streams, unbounded state under churn).
          for (f <- linearFlushMs
               if fill == GroupByRange.FillLinear && partials.isEmpty &&
                 gapStart.isEmpty && prev.isDefined;
               e <- emittedUpTo if wm - (e + 1) * everyMs >= f)
            prev = None
          val live = partials.nonEmpty || gapStart.isDefined ||
            (continuousFill && emittedUpTo.isDefined) ||
            // a live LINEAR anchor must survive quiet spells (it is the
            // interpolation base for the next closed gap)
            (fill == GroupByRange.FillLinear && prev.isDefined)
          if (!live) {
            // everything emitted and no anchor left: drop the key's state —
            // new data can only land in buckets past the watermark, which
            // re-initializes correctly (no unbounded state under key churn)
            state.remove()
          } else {
            state.update((partials, emittedUpTo, prev, gapStart, gapN))
            // re-fire on watermark advance while buckets are open/held, or
            // forever for the continuously-extending fill modes
            if (partials.nonEmpty || gapStart.isDefined ||
                (continuousFill && emittedUpTo.isDefined))
              state.setTimeoutTimestamp(wm + 1)
            else for (f <- linearFlushMs)
              // bare LINEAR anchor: fire once linearFlush of event time has
              // passed so the expiry above can run for a quiet key
              state.setTimeoutTimestamp(wm + f)
          }
          out.result().iterator
      }
      .toDF(keyCol, "bucket_ms", "n", "value", "filled")
  }
}

package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.mr.PatternRegex

/** Continuous MATCH_RECOGNIZE over an event-time stream — the streaming face
  * of [[graft.mr.MatchRecognize]] (reference operator: WindowMatch,
  * /root/reference/server/sql_operator_sort.cpp:4323+; the reference itself
  * has no streaming engine, so this is additive Spark-native surface).
  *
  * Spark-first design: DEFINE predicates are ordinary row-local Columns,
  * evaluated by codegen BEFORE the stateful stage, so per-key state carries
  * only (event-time, define-booleans) — not the payload. The NFA is the
  * exact batch matcher ([[PatternRegex.matchAt]]); what streaming adds is a
  * *finality* protocol deciding when a greedy match can no longer change:
  *
  *  - rows with ts <= watermark are "final" (withWatermark guarantees no
  *    older arrivals); later rows are "pending" — future input can still
  *    sort between/around them.
  *  - a match attempt is run against the buffer with one virtual probe row
  *    appended; any probe at a position >= the final prefix marks the
  *    attempt "open" (its outcome could still change).
  *  - closed successful attempts are emitted and their rows evicted
  *    (AFTER MATCH SKIP PAST LAST ROW); closed failures evict the dead row;
  *    the first open attempt freezes the frontier — everything after waits,
  *    preserving batch-identical in-order semantics.
  *
  * So state per key is exactly the suffix of rows an in-flight match might
  * still use, and a no-data micro-batch (event-time timeout at wm+1) drains
  * matches as the watermark advances. `maxSpan` is a hard bound on match
  * duration: frontier rows older than wm - maxSpan are force-evicted, which
  * bounds state even under pathological DEFINEs (the Flink-CEP `within`
  * contract). Patterns with `^`/`$` anchors are rejected — a stream never
  * observes its partition end.
  *
  * Emission (ONE ROW PER MATCH): key, match_num (per key, 1-based),
  * start_ms, end_ms, n_rows.
  *
  * State retention: a key that ever matched keeps a tiny
  * (emptyBuffer, matchNum) entry so match_num stays a per-key sequence.
  * Under unbounded key churn that still grows without bound — pass
  * `idleTTL` to drop drained keys once they have been idle past the TTL
  * (accepted trade-off: a key that reappears later restarts match_num at 1).
  */
object StreamingMatch {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  // (bufferedRows as (tsMs, defineBits), matchesEmitted)
  private type MrState = (Seq[(Long, Seq[Boolean])], Long)

  private[streaming] def intervalMs(s: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    iv.months.toLong * 2592000000L + iv.days.toLong * 86400000L +
      iv.microseconds / 1000L
  }

  def matchRecognizeStream(
      stream: DataFrame, tsCol: String, keyCol: String,
      pattern: String, defines: Map[String, Column],
      watermark: String, maxSpan: String = "7 days",
      idleTTL: Option[String] = None)
      (implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._

    val node = PatternRegex.parse(pattern)
    require(!PatternRegex.hasAnchor(node),
      "streaming MATCH_RECOGNIZE does not support ^/$ anchors")
    val vars = PatternRegex.variables(node)
    vars.foreach(v => require(defines.contains(v), s"no DEFINE for pattern variable $v"))
    val defNames = defines.keys.toSeq.sorted
    val defIdx = defNames.zipWithIndex.toMap
    // parse "<n> <unit>" the same way Spark's interval literals do
    val spanMs = intervalMs(maxSpan)
    val idleTtlMs = idleTTL.map(intervalMs)
    // r17 (r16 verdict #7): STREAM_r16 proved state is bounded only under
    // the maxSpan/within contract PLUS a bounded key domain — without
    // idleTTL every distinct key retains its (match_num) entry forever,
    // so a key-churn stream grows state monotonically and the operator
    // only finds out when the state store exhausts memory. Say so at
    // stream START, loudly; deployments that want the guard hard set
    // graft.stream.mr.requireBoundedKeys=true.
    if (idleTtlMs.isEmpty) {
      val msg = "matchRecognizeStream without idleTTL keeps a per-key " +
        "match_num entry for every key ever seen — state is bounded only " +
        "if the key domain is. Under key churn pass idleTTL (a key " +
        "returning after the TTL restarts match_num at 1), or set " +
        "graft.stream.mr.requireBoundedKeys=true to make this an error."
      if (spark.conf.get("graft.stream.mr.requireBoundedKeys", "false")
          .toBoolean)
        throw new IllegalArgumentException(msg)
      log.warn(msg)
    }

    val typed = stream
      .withWatermark(tsCol, watermark)
      .select(
        col(keyCol).cast("string").as("k"),
        col(tsCol).as("ts"),
        array(defNames.map(v =>
          coalesce(defines(v).cast("boolean"), lit(false))): _*).as("defs"))
      .as[(String, java.sql.Timestamp, Seq[Boolean])]

    typed.groupByKey(_._1)
      .flatMapGroupsWithState[MrState, (String, Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, java.sql.Timestamp, Seq[Boolean])],
         state: GroupState[MrState]) =>
          val wm = state.getCurrentWatermarkMs()
          val (oldBuf, oldMatches) = state.getOption.getOrElse((Seq.empty, 0L))
          val buf = (oldBuf ++ rows.map(r => (r._2.getTime, r._3)))
            .sortBy(_._1).toVector
          // idle-TTL expiry: a drained key (empty buffer) whose TTL timeout
          // fired with no new rows is dropped entirely
          if (state.hasTimedOut && buf.isEmpty) {
            state.remove()
            Iterator.empty[(String, Long, Long, Long, Long)]
          } else {
          val n = buf.size
          // length of the final prefix (ts <= watermark)
          val finalN = buf.segmentLength(_._1 <= wm)

          var probedOpen = false
          def sym(pos: Int, v: String): Boolean = {
            if (pos >= finalN) probedOpen = true
            pos < n && buf(pos)._2(defIdx(v))
          }

          val out = Vector.newBuilder[(String, Long, Long, Long, Long)]
          var matchNum = oldMatches
          var i = 0
          var frontier = -1
          while (i < n && frontier < 0) {
            probedOpen = false
            // n + 1 virtual length: a greedy attempt that runs out of rows
            // probes position n via sym and registers as open
            PatternRegex.matchAt(node, i, n + 1, sym) match {
              case Some(assign) if assign.nonEmpty && !probedOpen =>
                val end = i + assign.size - 1
                if (buf(end)._1 - buf(i)._1 <= spanMs) {
                  matchNum += 1
                  out += ((key, matchNum, buf(i)._1, buf(end)._1, assign.size.toLong))
                  i += assign.size // SKIP PAST LAST ROW: consume + evict
                } else {
                  i += 1 // greedy match exceeds maxSpan: discard, advance
                }
              case _ if !probedOpen =>
                i += 1 // closed failure: this row can never start a match
              case _ =>
                // open attempt: future rows may change the outcome — unless
                // the start row is already past the span horizon
                if (buf(i)._1 < wm - spanMs) i += 1 else frontier = i
            }
          }
          val result = out.result()
          val kept = buf.drop(i)
          if (kept.isEmpty && matchNum == 0L) {
            state.remove()
          } else {
            // matchNum is retained across drains so match_num stays a per-key
            // sequence; the empty-buffer state is two machine words per key
            state.update((kept, matchNum))
            // re-examine when the watermark moves (no-data batches fire this);
            // a drained key with an idle-TTL gets an expiry timeout instead
            if (kept.nonEmpty) state.setTimeoutTimestamp(wm + 1)
            else idleTtlMs.foreach(ttl => state.setTimeoutTimestamp(wm + ttl))
          }
          result.iterator
          }
      }
      .toDF(keyCol, "match_num", "start_ms", "end_ms", "n_rows")
  }
}

package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Structured-Streaming parity for the reference's time-series features.
  *
  * The reference has no continuous-query engine — its streaming-ish surface
  * is TimeSeries ingestion (TimeSeries.append/put,
  * /root/reference/java_client/.../TimeSeries.java:136,198), event triggers
  * firing on put (/root/reference/server/transaction_service_base.cpp:5058),
  * and TTL expiry. Here those become: readStream ingestion, windowed
  * aggregation with watermarks (continuous TIME_WINDOW_AGG / GROUP BY RANGE),
  * and foreachBatch callbacks (trigger parity). Batch semantics stay the
  * source of truth; these operators reuse the same expressions.
  */
object StreamingOps {

  /** Continuous TIME_WINDOW_AGG: tumbling-window aggregation with a
    * watermark for late data. Output: keys..., bucket_ms, aggs... */
  def timeWindowAggStream(stream: DataFrame, tsCol: String, every: String,
                          watermark: String, aggs: Seq[Column],
                          keys: Seq[String] = Nil): DataFrame = {
    val agged = stream
      .withWatermark(tsCol, watermark)
      .groupBy((window(col(tsCol), every) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
    agged.select(
      (unix_millis(col("window.start")).as("bucket_ms") +:
        agged.columns.filter(_ != "window").map(col).toSeq): _*)
  }

  /** Sliding-window variant (window length + slide). */
  def slidingWindowAggStream(stream: DataFrame, tsCol: String, length: String,
                             slide: String, watermark: String,
                             aggs: Seq[Column], keys: Seq[String] = Nil): DataFrame = {
    val agged = stream
      .withWatermark(tsCol, watermark)
      .groupBy((window(col(tsCol), length, slide) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
    agged.select(
      (unix_millis(col("window.start")).as("bucket_ms") +:
        agged.columns.filter(_ != "window").map(col).toSeq): _*)
  }

  /** Stream-static AS-OF join: every streaming probe row picks the latest
    * static series row with `seriesTs` <= its `probeTs` for its keys — the
    * continuous face of TimeSeriesOps.asOfJoin (batched TIME_PREV), e.g.
    * live events enriched with the most recent reference reading.
    *
    * Spark-native, no custom state: the stream-static LEFT range join is
    * stateless per micro-batch (the static side follows ordinary
    * broadcast/shuffle size planning — broadcast when small, the 100 TB
    * default for reference tables), and the per-probe argmax collapses
    * through a windowed max(struct) aggregation whose event-time window
    * rides in the grouping key, making it append-mode legal under the
    * watermark (complete-mode replays emit everything). Probes sharing all
    * projected columns merge — include a unique probe id.
    *
    * `series` must carry its own column names disjoint from the probe's
    * (rename before the call); `keys` name probe columns with same-named
    * series columns. Output: probe columns + the matched series payload
    * (null when nothing preceded the probe). */
  def asOfJoinStream(probe: DataFrame, series: DataFrame, keys: Seq[String],
                     probeTs: String, seriesTs: String,
                     watermark: String = "1 hour",
                     windowSize: String = "1 hour"): DataFrame = {
    val sren = keys.zipWithIndex.foldLeft(series) { case (df, (k, i)) =>
      df.withColumnRenamed(k, s"__k$i")
    }
    val payload = sren.columns.filterNot(_.startsWith("__k")).toSeq
    require(!payload.contains(probeTs) && probe.columns.forall(!payload.contains(_)),
      s"series columns ${payload.mkString(",")} must be disjoint from the probe's")
    val cond = keys.zipWithIndex.map { case (k, i) => col(k) === col(s"__k$i") }
      .reduce(_ && _) && col(seriesTs) <= col(probeTs)
    val joined = probe.withWatermark(probeTs, watermark)
      .join(sren, cond, "left_outer")
    // max(struct(seriesTs, rest...)): latest preceding row wins; an
    // unmatched probe's all-null struct loses to any real match and
    // surfaces as null payload fields
    val best = struct((col(seriesTs) +: payload.filterNot(_ == seriesTs).map(col)): _*)
    joined
      .groupBy((window(col(probeTs), windowSize) +: probe.columns.map(col).toSeq): _*)
      .agg(max(best).as("__best"))
      .select((probe.columns.map(col) ++ payload.map(p => col(s"__best.$p").as(p))): _*)
  }

  /** Stream-stream INTERVAL join: left rows paired with right rows of the
    * same keys whose `rTs` falls in [lTs + lower, lTs + upper] — the
    * continuous face of ts/RangeJoin (attribute a click to the views of
    * the preceding hour, correlate two sensor feeds within a tolerance).
    *
    * Spark-native stateful join: BOTH sides carry watermarks and the join
    * condition carries the time bound, so each side's buffered state is
    * evicted once the other side's watermark passes the bound — state is
    * watermark-bounded, the 100 TB continuous shape. Inner join semantics:
    * every qualifying pair is emitted exactly once (append mode, no
    * aggregation), late rows beyond the watermark are dropped.
    *
    * `right` must carry column names disjoint from `left`'s except `keys`
    * (rename before the call); `lower`/`upper` are signed durations like
    * "-1 hour" / "0 seconds". */
  def intervalJoinStream(left: DataFrame, right: DataFrame, keys: Seq[String],
                         lTs: String, rTs: String,
                         lower: String, upper: String,
                         watermark: String = "1 hour"): DataFrame = {
    val rren = keys.zipWithIndex.foldLeft(right.withWatermark(rTs, watermark)) {
      case (df, (k, i)) => df.withColumnRenamed(k, s"__k$i")
    }
    val cond = keys.zipWithIndex.map { case (k, i) => col(k) === col(s"__k$i") }
      .reduce(_ && _) &&
      col(rTs) >= col(lTs) + expr(s"INTERVAL $lower") &&
      col(rTs) <= col(lTs) + expr(s"INTERVAL $upper")
    left.withWatermark(lTs, watermark)
      .join(rren, cond, "inner")
      .drop(keys.indices.map(i => s"__k$i"): _*)
  }

  /** Streaming exact dedup: drop rows whose digest was already seen, with
    * state bounded by the watermark (the streaming face of Dedup.exactGroups
    * — what a continuous ingestion pipeline runs before writing).
    *
    * Uses dropDuplicatesWithinWatermark so digest state is evicted once the
    * watermark passes it: plain dropDuplicates("__digest") would keep every
    * digest forever because the event-time column is not part of the key. */
  def dedupStream(stream: DataFrame, tsCol: String, textCol: String,
                  watermark: String): DataFrame =
    stream
      .withColumn("__digest", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /** Gap-based session windows (built-in session_window — state managed by
    * Spark, watermark bounds it). Output: keys..., session_start_ms,
    * session_end_ms, aggs... */
  def sessionize(stream: DataFrame, tsCol: String, gap: String,
                 watermark: String, aggs: Seq[Column],
                 keys: Seq[String]): DataFrame = {
    val agged = stream
      .withWatermark(tsCol, watermark)
      .groupBy((session_window(col(tsCol), gap) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
    agged.select(
      (unix_millis(col("session_window.start")).as("session_start_ms") +:
        unix_millis(col("session_window.end")).as("session_end_ms") +:
        agged.columns.filter(_ != "session_window").map(col).toSeq): _*)
  }

  /** Custom keyed state via flatMapGroupsWithState: emits one row per input
    * batch element carrying the running count + running sum for its key —
    * the shape an incremental TIME_AVG / anomaly tracker uses. `idleTTL`
    * drops a key's state after that much processing time without input
    * (the counters restart from zero if the key returns — the price of
    * bounded state under key churn). The default `None` keeps state forever:
    * that is ONLY safe for bounded key domains (demos, bounded entity sets);
    * production deployments over unbounded keys must set an idleTTL. */
  def runningStats(stream: DataFrame, keyCol: String, valCol: String,
                   idleTTL: Option[String] = None)
                  (implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val ttlMs = idleTTL.map(StreamingMatch.intervalMs)
    require(ttlMs.forall(_ > 0), "idleTTL must be a positive interval")
    val typed = stream.select(col(keyCol).cast("string"), col(valCol).cast("double"))
      .as[(String, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (String, Long, Double)](
        OutputMode.Append,
        if (ttlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Double)], state: GroupState[(Long, Double)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var (n, s) = state.getOption.getOrElse((0L, 0.0))
            val out = rows.map { case (_, v) =>
              n += 1; s += v
              (key, n, s)
            }.toVector
            state.update((n, s))
            ttlMs.foreach(t => state.setTimeoutDuration(t))
            out.iterator
          }
      }
      .toDF(keyCol, "running_n", "running_sum")
  }

  /** Streaming MinHash-LSH near-duplicate candidates — the continuous face
    * of Dedup.minhashCandidates, for suppressing near-dups at ingestion
    * time instead of in a nightly batch.
    *
    * Shape: signatures are the same codegen'd `graft_minhash_sig` kernel
    * (a stateless projection), banded into (band, bucket) keys exactly as
    * the batch operator; the state lives per (band, bucket) group —
    * signatures seen in that bucket — so an arriving document compares
    * only against its bucket cohort, never the corpus. Emits one evidence
    * row per band collision `(a, b, band, est_jaccard, b_ts_ms)` with
    * `a` = the EARLIER document (same orientation as the batch operator
    * when arrival order follows ids); distinct over (a, b) downstream
    * collapses multi-band hits.
    *
    * State bound: entries older than `watermark` behind the stream's
    * event-time horizon are evicted on the group's event-time timeout, so
    * per-bucket state is O(bucket arrival rate x watermark window). The
    * price is the standard one: a near-dup arriving later than the
    * watermark horizon after its original is admitted as new.
    * StreamingSpec asserts batch parity AND that numRowsRemoved > 0 as
    * the watermark advances. */
  def minhashCandidatesStream(stream: DataFrame, tsCol: String,
                              textCol: String, idCol: String,
                              watermark: String, shingleN: Int = 3,
                              k: Int = 16, bands: Int = 4,
                              minEstSim: Double = 0.5)
                             (implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(k % bands == 0, "bands must divide k")
    graft.functions.GridDbScalarFunctions.register(spark)
    val r = k / bands
    val sig = stream
      .withWatermark(tsCol, watermark)
      .where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(tsCol).as("__ts"),
        call_function("graft_minhash_sig",
          coalesce(lower(col(textCol)), lit("")), lit(shingleN), lit(k)).as("sig"))
    val bandCols = (0 until bands).map { b =>
      xxhash64(concat_ws(",",
        (0 until r).map(i => col("sig").getItem(b * r + i).cast("string")): _*))
    }
    // the watermarked TIMESTAMP column must reach the stateful operator
    // as-is — converting to millis upstream severs the watermark and
    // EventTimeTimeout refuses to plan
    val banded = sig
      .select(col("id"), col("__ts"), col("sig"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .select(col("band"), col("bucket"), col("id"), col("__ts"), col("sig"))
      .as[(Int, Long, Long, java.sql.Timestamp, Seq[Long])]
    val wmMs = StreamingMatch.intervalMs(watermark)
    banded.groupByKey(x => (x._1, x._2))
      .flatMapGroupsWithState[
          List[(Long, Long, Seq[Long])],          // state: (id, tsMs, sig)
          (Long, Long, Int, Double, Long)](        // out: (a, b, band, est, b_ts_ms)
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Int, Long), rows: Iterator[(Int, Long, Long, java.sql.Timestamp, Seq[Long])],
         state: GroupState[List[(Long, Long, Seq[Long])]]) =>
          val horizon = state.getCurrentWatermarkMs()
          if (state.hasTimedOut) {
            // evict entries the watermark has passed; drop the group when
            // nothing younger survives
            val kept = state.getOption.getOrElse(Nil)
              .filter(_._2 >= horizon - wmMs)
            if (kept.isEmpty) state.remove()
            else { state.update(kept); state.setTimeoutTimestamp(horizon + wmMs) }
            Iterator.empty
          } else {
            var seen = state.getOption.getOrElse(Nil)
            val out = Vector.newBuilder[(Long, Long, Int, Double, Long)]
            // arrival order within the batch: event time then id, so the
            // earlier doc is always `a` and parity with the batch operator
            // (a < b by id under id-ordered replays) holds
            rows.toVector.sortBy(x => (x._4.getTime, x._3)).foreach {
              case (band, _, id, ts, sg) =>
                val tsMs = ts.getTime
                seen.foreach { case (pid, _, psig) =>
                  if (pid != id) {
                    val agree = (0 until k).count(i => psig(i) == sg(i))
                    val est = agree.toDouble / k
                    if (est >= minEstSim) out += ((pid, id, band, est, tsMs))
                  }
                }
                seen = (id, tsMs, sg) :: seen
            }
            state.update(seen)
            state.setTimeoutTimestamp(math.max(horizon, 0L) + wmMs)
            out.result().iterator
          }
      }
      .toDF("a", "b", "band", "est_jaccard", "b_ts_ms")
  }

  /** One micro-batch of the incremental ingest gate, REPLAY-IDEMPOTENT
    * (foreachBatch is at-least-once — a crash between the index append and
    * the streaming checkpoint re-delivers the batch):
    *  - an `applied/<batchId>` marker written AFTER the append commits
    *    records the batch's surviving ids; a replayed batch reads it and
    *    reproduces the original decision without touching the index;
    *  - the index append is tag-idempotent (ingest=<batchId> partition
    *    overwrite), so even the marker-less crash window cannot duplicate
    *    index rows;
    *  - the gate applies the keep-min rule to candidates whose corpus id
    *    is a current-batch id (MinhashIndex.dedupBatch), so a marker-less
    *    replay recomputes survivors against an index already containing
    *    them without self-emptying AND without letting a within-batch dup
    *    group eliminate itself — the smallest-id representative of each
    *    group survives; the replay emits a subset of the original
    *    survivors that still covers every content group, never a
    *    duplicate.
    * Survivors are eagerly materialized (localCheckpoint) BEFORE the
    * append: the probe plan is lazy, and re-evaluating it after the append
    * would read its own freshly-written buckets.
    *
    * Inherits [[graft.pipeline.MinhashIndex.dedupBatch]]'s id-space
    * contract: stream ids and indexed corpus ids must be disjoint as
    * documents (one monotone id space), or the keep-min replay rule can
    * mistake a colliding corpus id for a replayed self-match. */
  def incrementalDedupBatch(batch: DataFrame, textCol: String, idCol: String,
                            indexPath: String, minEstSim: Double,
                            batchId: Long,
                            autoCompactTags: Int = 0): DataFrame = {
    val spark = batch.sparkSession
    val tag = graft.pipeline.MinhashIndex.batchTag(batchId)
    graft.pipeline.MinhashIndex.appliedMarker(spark, indexPath, tag) match {
      case Some(ids) =>
        val sid = ids.select(col(ids.columns.head).as("__sid"))
        batch.join(sid, col(idCol) === col("__sid"), "left_semi")
      case None =>
        val survivors = graft.pipeline.MinhashIndex
          .dedupBatch(batch, textCol, idCol, indexPath, minEstSim)
          .localCheckpoint()
        // append + marker as ONE locked operation: a marker written after
        // the lock released could race a concurrent compact's marker
        // snapshot and strand in the outgoing version (r15 review)
        graft.pipeline.MinhashIndex.appendApplied(survivors, textCol, idCol,
          indexPath, tag, survivors.select(col(idCol)))
        // auto-compaction (r15 verdict #7): a long-running gate accumulates
        // one ingest partition per micro-batch; once the APPLIED tags still
        // holding their own partition reach the threshold, fold them —
        // reader-safe (versioned commit) and crash-safe (unmarked tags are
        // never folded, markers survive the flip). DISK NOTE: each compact
        // commits a full index version that the GC age floor retains for
        // graft.index.gc.minRetainMs (bounded by graft.index.gc.maxRetained
        // copies) — size the threshold so floor / compaction-period stays
        // within the retained-copy budget (IndexVersions.maxRetained).
        if (autoCompactTags > 0 &&
            graft.pipeline.MinhashIndex.pendingCompactionTags(spark, indexPath) >= autoCompactTags)
          graft.pipeline.MinhashIndex.compact(spark, indexPath)
        survivors
    }
  }

  /** Continuous ingest dedup gate against a persisted
    * [[graft.pipeline.MinhashIndex]]: each micro-batch drops docs with an
    * indexed near-duplicate, hands (batch, survivors, batchId) to
    * `onBatch`, and APPENDS the survivors to the index so later batches
    * dedup against them too — the streaming face of
    * [[graft.pipeline.Dedup.incrementalMinhashDedup]] with a corpus that
    * advances per micro-batch (q_stream_dedup_incremental pins the
    * equality with the sequential batch fold). Replay-idempotent — see
    * [[incrementalDedupBatch]]. */
  def incrementalDedupStream(docs: DataFrame, textCol: String, idCol: String,
                             indexPath: String, minEstSim: Double = 0.5,
                             autoCompactTags: Int = 0)
                            (onBatch: (DataFrame, DataFrame, Long) => Unit)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val survivors = incrementalDedupBatch(batch, textCol, idCol,
        indexPath, minEstSim, id, autoCompactTags)
      onBatch(batch, survivors, id)
      ()
    }

  /** One micro-batch of the EXACT incremental ingest gate — the
    * [[incrementalDedupBatch]] protocol over [[graft.pipeline.ExactIndex]]
    * (marker replay, tag-idempotent append, keep-min crash-window rule;
    * same id-space contract). */
  def incrementalExactDedupBatch(batch: DataFrame, textCol: String,
                                 idCol: String, indexPath: String,
                                 batchId: Long,
                                 autoCompactTags: Int = 0): DataFrame = {
    val spark = batch.sparkSession
    val tag = graft.pipeline.ExactIndex.batchTag(batchId)
    graft.pipeline.ExactIndex.appliedMarker(spark, indexPath, tag) match {
      case Some(ids) =>
        val sid = ids.select(col(ids.columns.head).as("__sid"))
        batch.join(sid, col(idCol) === col("__sid"), "left_semi")
      case None =>
        val survivors = graft.pipeline.ExactIndex
          .dedupBatch(batch, textCol, idCol, indexPath)
          .localCheckpoint()
        // one locked append+marker step — see incrementalDedupBatch
        graft.pipeline.ExactIndex.appendApplied(survivors, textCol, idCol,
          indexPath, tag, survivors.select(col(idCol)))
        // auto-compaction — see incrementalDedupBatch
        if (autoCompactTags > 0 &&
            graft.pipeline.ExactIndex.pendingCompactionTags(spark, indexPath) >= autoCompactTags)
          graft.pipeline.ExactIndex.compact(spark, indexPath)
        survivors
    }
  }

  /** Continuous EXACT ingest dedup gate against a persisted
    * [[graft.pipeline.ExactIndex]] — the streaming face of
    * [[graft.pipeline.Dedup.incrementalExactDedup]] with a corpus that
    * advances per micro-batch. Replay-idempotent — see
    * [[incrementalExactDedupBatch]]. */
  def incrementalExactDedupStream(docs: DataFrame, textCol: String,
                                  idCol: String, indexPath: String,
                                  autoCompactTags: Int = 0)
                                 (onBatch: (DataFrame, DataFrame, Long) => Unit)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val survivors = incrementalExactDedupBatch(batch, textCol, idCol,
        indexPath, id, autoCompactTags)
      onBatch(batch, survivors, id)
      ()
    }

  /** Event-trigger parity: run `onBatch` for every micro-batch of rows
    * matching `condition` (the reference fires a notification per put on a
    * trigger-registered container). */
  def withTrigger(stream: DataFrame, condition: Column)
                 (onBatch: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.filter(condition).writeStream
      .foreachBatch { (batch: DataFrame, id: Long) => onBatch(batch, id) }

  /** Stream-to-container ingest: every micro-batch PUTs into the catalog
    * container, after which the container's registered event triggers fire
    * (CREATE TRIGGER DDL -> notification per micro-batch). This is the
    * streaming face of the reference's trigger-on-put semantics
    * (transaction_service_base.cpp:5058) — batch put and streaming ingest
    * share one firing path, GraftCatalog.put. */
  def intoContainer(stream: DataFrame, table: String): DataStreamWriter[org.apache.spark.sql.Row] = {
    // resolve the catalog against the DRIVING session now — inside
    // foreachBatch the batch carries a cloned micro-batch session, which
    // must not key a fresh (empty) catalog
    val cat = graft.engine.GraftCatalog.forSession(stream.sparkSession)
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      cat.put(table, batch)
      ()
    }
  }

  /** Ingest a stream into an in-memory sink table (smoke/testing) and block
    * until all available data is processed. */
  def runToMemory(df: DataFrame, name: String, outputMode: String = "append"): StreamingQuery = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q
  }
}

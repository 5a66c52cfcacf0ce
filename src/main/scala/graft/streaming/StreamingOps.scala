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

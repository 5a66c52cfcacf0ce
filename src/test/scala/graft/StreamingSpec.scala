package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("continuous TIME_WINDOW_AGG with watermark over a memory stream") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "k", "v")

    val agg = StreamingOps.timeWindowAggStream(df, "ts", "1 hour", "2 hours",
      Seq(count(lit(1)).as("n"), sum($"v").as("s")), keys = Seq("k"))

    input.addData(
      (Timestamp.valueOf("2024-01-01 00:10:00"), "a", 1.0),
      (Timestamp.valueOf("2024-01-01 00:40:00"), "a", 2.0),
      (Timestamp.valueOf("2024-01-01 01:10:00"), "b", 5.0),
      (Timestamp.valueOf("2024-01-01 09:00:00"), "a", 9.0)) // advances watermark

    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val out = spark.table("win_out").orderBy("bucket_ms", "k")
        .select("k", "n", "s").as[(String, Long, Double)].collect()
      // first two windows are closed by the watermark advance
      assert(out.take(2).toSeq == Seq(("a", 2L, 3.0), ("b", 1L, 5.0)))
    } finally q.stop()
  }

  test("trigger parity: foreachBatch fires on matching rows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val df = input.toDF().toDF("ts", "v")
    val seen = new java.util.concurrent.atomic.AtomicLong(0)

    val q = StreamingOps.withTrigger(df, $"v" > 10.0) { (batch, _) =>
      seen.addAndGet(batch.count())
    }.start()
    try {
      input.addData((Timestamp.valueOf("2024-01-01 00:00:00"), 5.0),
        (Timestamp.valueOf("2024-01-01 00:01:00"), 15.0),
        (Timestamp.valueOf("2024-01-01 00:02:00"), 25.0))
      q.processAllAvailable()
      assert(seen.get() == 2)
    } finally q.stop()
  }

  test("session windows close by gap + watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "k", "v")
    val sess = StreamingOps.sessionize(df, "ts", gap = "10 minutes",
      watermark = "1 hour", aggs = Seq(count(lit(1)).as("n")), keys = Seq("k"))
    input.addData(
      (Timestamp.valueOf("2024-01-01 00:00:00"), "a", 1.0),
      (Timestamp.valueOf("2024-01-01 00:05:00"), "a", 2.0), // same session
      (Timestamp.valueOf("2024-01-01 00:30:00"), "a", 3.0), // new session
      (Timestamp.valueOf("2024-01-01 09:00:00"), "a", 9.0)) // advance watermark
    val q = sess.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val out = spark.table("sess_out").orderBy("session_start_ms")
        .select("n").as[Long].collect()
      assert(out.take(2).toSeq == Seq(2L, 1L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState running stats") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val input = MemoryStream[(String, Double)]
    val df = input.toDF().toDF("k", "v")
    val stats = StreamingOps.runningStats(df, "k", "v")
    val q = stats.writeStream.format("memory").queryName("stats_out")
      .outputMode("append").start()
    try {
      input.addData(("a", 1.0), ("a", 2.0), ("b", 5.0))
      q.processAllAvailable()
      input.addData(("a", 3.0)) // state persists across batches
      q.processAllAvailable()
      val out = spark.table("stats_out")
        .orderBy("k", "running_n")
        .as[(String, Long, Double)].collect()
      assert(out.toSeq == Seq(("a", 1L, 1.0), ("a", 2L, 3.0), ("a", 3L, 6.0), ("b", 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming exact dedup drops repeated content across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "text")
    val deduped = StreamingOps.dedupStream(df, "ts", "text", "1 hour")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        (Timestamp.valueOf("2024-01-01 00:00:00"), "hello"),
        (Timestamp.valueOf("2024-01-01 00:01:00"), "world"),
        (Timestamp.valueOf("2024-01-01 00:02:00"), "hello")) // dup in-batch
      q.processAllAvailable()
      input.addData((Timestamp.valueOf("2024-01-01 00:10:00"), "hello")) // dup across batches
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally q.stop()
  }

  test("file-source streaming ingest of the events table shape") {
    val schema = graft.engine.Tables.events(spark, sfDir).schema
    val stream = spark.readStream.schema(schema)
      .parquet("/tmp/graft_stream_in_*") // empty glob: just verifies plan builds
    assert(stream.isStreaming)
  }
}

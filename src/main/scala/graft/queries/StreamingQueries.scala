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

  val qs: Seq[Q] = Seq(
    Q.df("q_stream_window_agg",
      duck = """SELECT epoch_ms(date_trunc('hour', ts)) AS bucket_ms,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val schema = Tables.read(s, dir, "events").schema
      // the file stream source wants a directory; stage the table file into one
      val stage = java.nio.file.Files.createTempDirectory("graft_stream")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(dir, "events.parquet"),
        stage.resolve("events.parquet"))
      val raw = s.readStream.schema(schema).parquet(stage.toString)
      val ev = Tables.normalizeEvents(raw)
      val agg = StreamingOps.timeWindowAggStream(ev, "ts", "1 hour",
        watermark = "1 hour",
        aggs = Seq(
          count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value")))
      val sink = "q_stream_window_agg_sink"
      val q = agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
      s.table(sink).orderBy("bucket_ms")
    }
  )
}

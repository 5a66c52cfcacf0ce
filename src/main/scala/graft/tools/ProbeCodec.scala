package graft.tools

import org.apache.spark.sql.SparkSession

/** Shuffle-bytes codec A/B at rehearsal SFs (r12 verdict #2).
  *
  * ProbeQ3Variance pinned q3's sf100z spread to ~15 GB of shuffle files
  * through one local disk — compression ratio is the direct lever on
  * those bytes. `spark.io.compression.codec` is STATIC (read once at
  * SparkEnv creation), so unlike ProbeShj this cannot alternate sides in
  * one JVM: each invocation measures ONE codec and the caller brackets
  * machine drift by re-running the first side last (lz4, zstd, lz4).
  * Prints per-iteration walls, min, and the job's shuffle write volume
  * (from the first iteration's SparkListener totals) so the ratio claim
  * is on the record, not inferred. Usage:
  *   runMain graft.tools.ProbeCodec <codec> [sfDir] [iters] [zstdLevel]
  */
object ProbeCodec {
  def main(args: Array[String]): Unit = {
    val codec = args.headOption.getOrElse("lz4")
    val sfDir = args.lift(1).getOrElse("/root/repo/scaledata/sf100z")
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val zstdLevel = args.lift(3).map(_.toInt).getOrElse(1)
    val width = graft.engine.GraftSession.shuffleWidthFor(
      graft.engine.TableStats.treeSize(sfDir), 32)
    val spark = graft.engine.GraftSession.configure(
      SparkSession.builder().master("local[32]"), shufflePartitions = width)
      .config("spark.io.compression.codec", codec)
      .config("spark.io.compression.zstd.level", zstdLevel.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.GraftSession.prepare(spark)
    println(s"PROBE codec=$codec zstdLevel=$zstdLevel width=$width")

    // AtomicLong + a drain pause before each reset/read: task-end events
    // arrive on the ASYNC listener-bus thread after count() returns, so an
    // unsynchronized read undercounts and the next iteration's reset races
    // late events (r13 review). The pauses sit outside the timed window.
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          shuffleWrite.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    // optional 5th arg: comma-separated query subset (one ~6-min invocation
    // per query keeps detached runs restartable; sf100z probes also need
    // SPARK_DRIVER_MEM=24g — q5's stats-era plans OOM the 8g default)
    val wanted = args.lift(4).map(_.split(",").toSet)
      .getOrElse(Set("q3_join_agg_topk", "q5_join_region", "q_mr_view_runs"))
    for (name <- Seq("q3_join_agg_topk", "q5_join_region", "q_mr_view_runs")
         if wanted(name)) {
      val q = graft.queries.Registry.byName(name)
      graft.queries.Registry.assertScaleSafe(Seq(q), sfDir)
      q.build(spark, sfDir).count() // untimed: registration + page cache
      // drain = poll until the counter is STABLE (3 consecutive unchanged
      // 200ms samples, 15s cap) — a fixed sleep is not a guaranteed drain
      // of the async listener bus under sf100z task volumes (r13 review,
      // 2nd pass); stability is, short of dropped events, which Spark
      // logs loudly ("Dropped events") if the queue ever overflows
      def drainStable(): Long = {
        var last = shuffleWrite.get
        var stable = 0
        var waited = 0
        while (stable < 3 && waited < 15000) {
          Thread.sleep(200); waited += 200
          val now = shuffleWrite.get
          if (now == last) stable += 1 else { stable = 0; last = now }
        }
        last
      }
      val times = (1 to iters).map { i =>
        drainStable() // settle stragglers from the previous job
        shuffleWrite.set(0L)
        val t0 = System.nanoTime()
        q.build(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        val bytes = drainStable() // outside the timed window
        println(f"PROBE $name%-18s codec=$codec iter=$i wall=$dt%6.2f s " +
          f"shuffleWrite=${bytes / 1e9}%.2f GB")
        dt
      }
      println(f"PROBE $name codec=$codec min=${times.min}%.2f s")
    }
    spark.stop()
  }
}

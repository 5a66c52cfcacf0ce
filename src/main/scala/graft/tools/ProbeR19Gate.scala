package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{GraftSession, TableStats}
import graft.pipeline.IvfIndex

/** Job-count evidence for the r19 filtered-serve gate fusion (VERDICT #2):
  * counts Spark jobs per IvfIndex.topK serve — unfiltered, filtered at
  * ~50% selectivity (overfetch path), and filtered at ~0.1% (brute path).
  * r18's filtered overfetch serve ran `filtered.count()` PLUS a
  * `queries.limit(max+1).count()` before the probe-gate aggregate; the
  * r19 form defers the limit-count to the brute branch, so the overfetch
  * path is one job lighter per serve.
  * Usage: runMain graft.tools.ProbeR19Gate [sfDir]
  */
object ProbeR19Gate {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scaledata/sf10z")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = GraftSession.shuffleWidthFor(
        TableStats.treeSize(dir), cpus.toInt)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // count SQL EXECUTIONS (one per action — head/count/collect), not raw
    // Spark jobs: AQE materializes every exchange stage as its own job, so
    // job counts measure plan stage-iness, not how many times the serve
    // evaluates a query
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case _: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            jobs.incrementAndGet(); ()
          case _ => ()
        }
    })
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("probe_gate_ivf").toString
    IvfIndex.build(e, "vec_id", "embedding", idx, nLists = 16,
      attrCols = Seq("label"))
    val q = e.filter(col("vec_id") < 5)
    def serve(tag: String, pred: Option[org.apache.spark.sql.Column]): Unit = {
      IvfIndex.topK(spark, idx, q, "vec_id", "embedding", k = 10,
        predicate = pred).count() // warm (plan-time costs settle)
      Thread.sleep(1000)
      jobs.set(0)
      val t0 = System.nanoTime()
      // the gate jobs are the EAGER driver jobs topK runs before returning
      // its lazy frame — count them separately from the action's own jobs
      // (AQE materializes each exchange stage as a job, so the action side
      // is noisy by design)
      val df = IvfIndex.topK(spark, idx, q, "vec_id", "embedding", k = 10,
        predicate = pred)
      Thread.sleep(500)
      val gateJobs = jobs.get
      df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      println(f"[gate] $tag%-28s gateJobs=$gateJobs%2d totalJobs=${jobs.get}%2d wall=$dt%.3f s")
    }
    serve("unfiltered", None)
    serve("filtered ~50% (overfetch)", Some(col("label") < 5))
    serve("filtered ~0.1% (brute)", Some(col("label") < 5 && col("vec_id") % 997 === 0))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

/** Scale posture probe for declarative TTL (r12): on an interval-
  * partitioned parquet layout, partition expiry must be METADATA-speed —
  * O(#expired buckets) filesystem deletes, zero Spark jobs, independent of
  * row count — because that is the whole point of mapping the reference's
  * `checkExpirableInterval` partition expiry onto directory drops instead
  * of row deletes. Reports write wall (context), drop wall (the claim),
  * buckets dropped, and survivor parity. Usage:
  *   runMain graft.tools.ProbeTtl [sfDir]
  */
object ProbeTtl {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/scaledata/sf10z")
    val spark = graft.engine.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.engine.{PartitionedTables => PT, Tables}

    val ev = Tables.events(spark, sfDir)
    val nRows = ev.count()
    val dayMs = 86400000L
    val dir = java.nio.file.Files.createTempDirectory("graft_ttl_probe").toString

    val t0 = System.nanoTime()
    PT.write(ev, dir, PT.Interval("ts", dayMs))
    val writeS = (System.nanoTime() - t0) / 1e9
    val buckets = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("__itv="))
    println(f"PROBE layout: $nRows rows, $buckets day buckets, write ${writeS}%.1f s")

    // a 7-day TTL observed at (max ts + 1h): everything older than the
    // watermark drops as whole directories
    val maxMs = ev.agg(max(unix_millis(col("ts")))).collect()(0).getLong(0)
    val now = maxMs + 3600000L
    val wm = PT.ttlWatermark(now, 7 * dayMs, dayMs)
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val t1 = System.nanoTime()
    val dropped = PT.dropPartitionsBefore(spark, dir, wm)
    val dropS = (System.nanoTime() - t1) / 1e9
    val jobsAfter = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    println(f"PROBE expiry: dropped ${dropped.size} buckets in ${dropS}%.3f s " +
      f"(${if (jobsAfter == jobsBefore) "ZERO Spark jobs" else s"${jobsAfter - jobsBefore} jobs!"})")

    val survivors = PT.read(spark, dir)
    val got = survivors.count()
    val expected = ev.filter(
      (floor(unix_millis(col("ts")) / dayMs) * dayMs).cast("long") >= wm).count()
    println(s"PROBE survivors: $got rows (expected $expected, " +
      s"${if (got == expected) "MATCH" else "MISMATCH"})")
    require(got == expected, "survivor mismatch")
    spark.stop()
  }
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine.{PartitionedTables => PT, Tables}

class PartitionedTablesSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft_pt").toString

  test("interval partitioning: layout, pruning, row parity") {
    val dir = tmpDir()
    val ev = Tables.events(spark, sfDir)
    val dayMs = 86400000L
    PT.write(ev, dir, PT.Interval("ts", 7 * dayMs))

    val back = PT.read(spark, dir)
    assert(back.count() == ev.count())

    // partition pruning: filter on __itv must reduce files read
    val pruned = PT.timeRangeFilter(back, "ts", 7 * dayMs,
      fromMs = 1704672000000L, untilMs = 1705276800000L) // [Jan 8, Jan 15)
    val expected = ev.filter(
      unix_millis($"ts") >= 1704672000000L && unix_millis($"ts") < 1705276800000L).count()
    assert(pruned.count() == expected)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("__itv"), "partition filter should reach the scan")

    // TTL drop: remove partitions before Jan 15
    val dropped = PT.dropPartitionsBefore(spark, dir, 1705276800000L)
    assert(dropped.nonEmpty)
    val after = PT.read(spark, dir)
    assert(after.count() < ev.count())
    assert(after.agg(min(unix_millis($"ts"))).as[Long].head() >= 1704585600000L)
  }

  test("declarative TTL watermark drives layout expiry with row-parity to the catalog sweep") {
    val dir = tmpDir()
    val ev = Tables.events(spark, sfDir)
    val dayMs = 86400000L
    PT.write(ev, dir, PT.Interval("ts", dayMs))
    // a 3-day TTL observed at Jan 15 12:00 UTC: partitions whose end+TTL
    // passed are exactly the days <= Jan 11 (watermark Jan 12 00:00)
    val now = 1705320000000L // 2024-01-15T12:00:00Z
    val wm = PT.ttlWatermark(now, 3 * dayMs, dayMs)
    assert(wm == 1705017600000L) // 2024-01-12T00:00:00Z
    val dropped = PT.dropPartitionsBefore(spark, dir, wm)
    assert(dropped.forall(b => b + dayMs + 3 * dayMs <= now))
    val survivors = PT.read(spark, dir)
    // row parity with the definition: survivors = rows in partitions whose
    // end+TTL has NOT passed
    val expected = ev.filter(
      (floor(unix_millis($"ts") / dayMs) * dayMs).cast("long") >= wm).count()
    assert(survivors.count() == expected)
    assert(survivors.agg(min(unix_millis($"ts"))).as[Long].head() >= wm)
  }

  test("hash partitioning spreads rows over n buckets") {
    val dir = tmpDir()
    val cust = Tables.read(spark, sfDir, "customer")
    PT.write(cust, dir, PT.Hash("c_custkey", 8))
    val back = PT.read(spark, dir)
    assert(back.count() == cust.count())
    val buckets = back.select("__p").distinct().as[Int].collect().sorted
    assert(buckets.length == 8 && buckets.forall(b => b >= 0 && b < 8))
  }

  test("bucketed tables join without exchange") {
    val cust = Tables.read(spark, sfDir, "customer")
    val ords = Tables.read(spark, sfDir, "orders")
      .withColumnRenamed("o_custkey", "c_custkey")
    PT.writeBucketed(cust, "b_customer", "c_custkey", 8)
    PT.writeBucketed(ords, "b_orders", "c_custkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    val joined = spark.table("b_customer").join(spark.table("b_orders"), "c_custkey")
    try assert(joined.count() > 0)
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"))
    // co-located: no shuffle exchange feeding the join
    val exchanges = joined.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, s"expected no shuffle, got:\n$plan")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
  }

  test("schema evolution: partitions written before ALTER ADD merge as NULL") {
    val dir = tmpDir()
    // batch 1 written before the ALTER (no `tag` column)
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .withColumn("__p", pmod(hash($"id"), lit(2)))
      .write.partitionBy("__p").mode("overwrite").parquet(dir)
    // batch 2 appended after ALTER TABLE ADD COLUMN tag STRING
    Seq((3L, 30.0, "new")).toDF("id", "v", "tag")
      .withColumn("__p", pmod(hash($"id"), lit(2)))
      .write.partitionBy("__p").mode("append").parquet(dir)

    val back = PT.read(spark, dir)
    assert(back.columns.contains("tag"), "mergeSchema should surface the added column")
    val rows = back.orderBy("id").select("id", "tag").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows.take(2).forall(_.isNullAt(1)) && rows(2).getString(1) == "new")
  }

  test("interval-hash composite layout") {
    val dir = tmpDir()
    val ev = Tables.events(spark, sfDir)
    PT.write(ev, dir, PT.IntervalHash("ts", 7 * 86400000L, "user_id", 4))
    val back = PT.read(spark, dir)
    assert(back.count() == ev.count())
    assert(back.columns.contains("__itv") && back.columns.contains("__p"))
    // a point query prunes on both partition columns
    val (itv, p) = back.select($"__itv", $"__p").as[(Long, Int)].head()
    val q = back.filter($"__itv" === itv && $"__p" === p)
    assert(q.count() > 0)
  }
}

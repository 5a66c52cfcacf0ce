package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.GraftCatalog
import graft.tql.TqlCompiler
import graft.ts.TimeSeriesOps

/** Parity with the reference's own sample programs — the only correctness
  * fixtures the reference ships (SURVEY §5):
  *  - Sample1 (/root/reference/docs/sample/program/Sample1.java):
  *    Collection CRUD by row key + TQL `select * where name = 'name02'`
  *    + update of the fetched row.
  *  - Sample2 (Sample2.java): TimeSeries append + time-range query.
  *  - Sample3 (Sample3.java): TQL filter over a TimeSeries, then a
  *    windowed `aggregate(start, end, "voltage", Aggregation.AVERAGE)`
  *    around each hit.
  */
class SamplesSpec extends SparkTestBase {
  import spark.implicits._

  private def cat = new GraftCatalog(spark)

  test("Sample1: Collection CRUD + TQL query + row update") {
    val c = cat
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("status", BooleanType),
      StructField("count", LongType), StructField("lob", BinaryType)))
    c.createCollection("col01", schema, keyColumns = Seq("name"))

    val lob = Array[Byte](65, 66, 67, 68, 69, 70, 71, 72, 73, 74)
    val p1 = Seq(("name01", false, 1L, lob)).toDF("name", "status", "count", "lob")
    c.put("col01", p1)                                  // add
    assert(c.getRows("col01", Seq("name01")).count() == 1) // get
    c.remove("col01", Seq("name01"))                    // delete
    assert(c.getRows("col01", Seq("name01")).count() == 0)

    c.put("col01", p1.withColumn("name", lit("name02"))) // put with key
    val hit = TqlCompiler.run(c.get("col01"), "select * where name = 'name02'")
    assert(hit.count() == 1)

    // fetched-row update: count = 2, like rs.update(person) in the sample
    c.update("col01", Map("count" -> lit(2L)), col("name") === "name02")
    val updated = TqlCompiler.run(c.get("col01"), "select * where name = 'name02'")
    assert(updated.select("count").as[Long].head() == 2L)
    c.dropContainer("col01")
  }

  test("Sample2: TimeSeries append + range query") {
    val c = cat
    val schema = StructType(Seq(
      StructField("timestamp", TimestampType), StructField("active", BooleanType),
      StructField("voltage", DoubleType)))
    c.createTimeSeries("point01", schema, timeColumn = "timestamp")

    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    c.put("point01", Seq(
      (ts(0), false, 100.0), (ts(60), true, 200.0), (ts(400), false, 300.0))
      .toDF("timestamp", "active", "voltage"))

    // rows of the last 6 hours from "now" (= latest row), like ts.query(before, now)
    val now = ts(400); val before = ts(400 - 360)
    val got = c.get("point01").df
      .filter(col("timestamp") >= lit(before) && col("timestamp") <= lit(now))
    assert(got.count() == 2) // ts(60) and ts(400); ts(0) is older than 6h
    c.dropContainer("point01")
  }

  test("Sample3: TQL filter + windowed AVERAGE aggregation around each hit") {
    val c = cat
    val schema = StructType(Seq(
      StructField("timestamp", TimestampType), StructField("active", BooleanType),
      StructField("voltage", DoubleType)))
    c.createTimeSeries("point01", schema, timeColumn = "timestamp")
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    c.put("point01", Seq(
      (ts(0), false, 40.0), (ts(5), false, 60.0),   // hit at ts(5)
      (ts(8), true, 80.0), (ts(12), false, 44.0))
      .toDF("timestamp", "active", "voltage"))

    // "not active and voltage > 50" — the sample's occurrence query
    val hits = TqlCompiler.run(c.get("point01"),
      "select * where not active and voltage > 50")
    val hot = hits.select("timestamp").as[Timestamp].collect()
    assert(hot.toSeq == Seq(ts(5)))

    // ±10 minutes around the hit, Aggregation.AVERAGE on voltage
    val start = new Timestamp(hot.head.getTime - 600000L)
    val end = new Timestamp(hot.head.getTime + 600000L)
    val avgV = c.get("point01").df
      .filter(col("timestamp") >= lit(start) && col("timestamp") <= lit(end))
      .agg(avg("voltage")).as[Double].head()
    assert(avgV == (40.0 + 60.0 + 80.0 + 44.0) / 4)
    c.dropContainer("point01")
  }
}

package graft

import org.apache.spark.sql.types._
import graft.engine.GraftCatalog

class CatalogSpec extends SparkTestBase {
  import spark.implicits._

  private def schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("v", DoubleType)))

  test("create/put/get/remove with PUT-replaces-by-key semantics") {
    val cat = new GraftCatalog(spark)
    cat.createCollection("c1", schema, keyColumns = Seq("id"))
    cat.put("c1", Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "v"))
    assert(cat.get("c1").df.count() == 2)

    // PUT with existing key replaces
    cat.put("c1", Seq((2L, "b2", 2.5), (3L, "c", 3.0)).toDF("id", "name", "v"))
    val rows = cat.get("c1").df.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(1).getString(1) == "b2" && rows(1).getDouble(2) == 2.5)

    assert(cat.getRows("c1", Seq(3L)).collect().head.getString(1) == "c")
    cat.remove("c1", Seq(1L))
    assert(cat.get("c1").df.count() == 2)
    assert(cat.getRows("c1", Seq(1L)).count() == 0)
  }

  test("timeseries container requires the time column; sql runs over views") {
    val cat = new GraftCatalog(spark)
    val ts = StructType(Seq(
      StructField("ts", TimestampType, nullable = false),
      StructField("v", DoubleType)))
    cat.createTimeSeries("ts1", ts, "ts")
    cat.put("ts1", Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.5),
      (java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 2.5)).toDF("ts", "v"))
    val n = spark.sql("SELECT COUNT(*) FROM ts1 WHERE v > 2").collect()(0).getLong(0)
    assert(n == 1)
    intercept[IllegalArgumentException](cat.createTimeSeries("bad", schema, "nope"))
  }

  test("metadata tables #tables / #columns") {
    val cat = new GraftCatalog(spark)
    cat.createCollection("m1", schema, keyColumns = Seq("id"))
    val ts = StructType(Seq(StructField("ts", TimestampType, nullable = false)))
    cat.createTimeSeries("m2", ts, "ts")
    val t = cat.metaTables.orderBy("TABLE_NAME").collect()
    assert(t.map(_.getString(0)).toSeq == Seq("m1", "m2"))
    assert(t(1).getString(1) == "TIMESERIES")
    val c = cat.metaColumns.filter($"TABLE_NAME" === "m1").orderBy("ORDINAL").collect()
    assert(c.map(_.getString(2)).toSeq == Seq("id", "name", "v"))
    assert(c(0).getBoolean(5)) // id is key
  }

  test("multiGet and keyRange batch APIs") {
    val cat = new GraftCatalog(spark)
    cat.createCollection("mg", schema, keyColumns = Seq("id"))
    cat.put("mg", (1L to 10L).map(i => (i, s"n$i", i * 1.5)).toDF("id", "name", "v"))
    assert(cat.multiGet("mg", Seq(2L, 5L, 99L)).count() == 2)
    assert(cat.keyRange("mg", Some(3L), Some(7L)).select("id").as[Long]
      .collect().sorted.toSeq == Seq(3L, 4L, 5L, 6L))
    assert(cat.keyRange("mg", None, Some(3L)).count() == 2)
    assert(cat.keyRange("mg", Some(9L), None).count() == 2)
  }

  test("drop removes container and view") {
    val cat = new GraftCatalog(spark)
    cat.createCollection("d1", schema)
    assert(cat.exists("d1"))
    cat.dropContainer("d1")
    assert(!cat.exists("d1"))
    intercept[NoSuchElementException](cat.get("d1"))
  }
}

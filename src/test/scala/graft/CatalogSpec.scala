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

  test("metadata tables #event_triggers / #databases / #sqls") {
    val cat = new GraftCatalog(spark)
    cat.createCollection("mt1", schema, keyColumns = Seq("id"))

    // #databases: the default database only (meta_store.cpp:1294)
    val dbs = cat.metaDatabases.collect()
    assert(cat.metaDatabases.columns.toSeq == Seq("DATABASE_ID", "DATABASE_NAME"))
    assert(dbs.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((0L, "public")))

    // #sqls: typed, empty (no in-flight statement tracking)
    assert(cat.metaSqls.columns.toSeq == Seq("DATABASE_NAME", "NODE_ADDRESS",
      "NODE_PORT", "START_TIME", "APPLICATION_NAME", "SQL", "QUERY_ID",
      "JOB_ID", "USER_NAME"))
    assert(cat.metaSqls.count() == 0)

    // #event_triggers: columns match meta_store.cpp:1084-1097; rows appear
    // on CREATE TRIGGER with per-table ordinals, vanish on DROP
    assert(cat.metaEventTriggers.columns.toSeq == Seq("DATABASE_NAME",
      "TABLE_NAME", "ORDINAL_POSITION", "TRIGGER_NAME", "EVENT_TYPE",
      "COLUMN_NAME", "TRIGGER_TYPE", "URI", "JMS_DESTINATION_TYPE",
      "JMS_DESTINATION_NAME", "USER", "PASSWORD"))
    assert(cat.metaEventTriggers.count() == 0)
    cat.createTrigger(graft.engine.TriggerDef("t_put", "mt1", Seq("PUT"),
      columns = Seq("id"), triggerType = "REST", uri = "http://example.invalid/hook"))
    cat.createTrigger(graft.engine.TriggerDef("t_del", "mt1", Seq("DELETE"),
      triggerType = "JMS", uri = "jms://example.invalid",
      jmsDestinationType = Some("TOPIC"), jmsDestinationName = Some("events")))
    val tr = cat.metaEventTriggers.orderBy("ORDINAL_POSITION").collect()
    assert(tr.map(r => (r.getString(3), r.getInt(2), r.getString(4))).toSeq ==
      Seq(("t_put", 1, "PUT"), ("t_del", 2, "DELETE")))
    assert(tr(1).getString(8) == "TOPIC" && tr(1).getString(9) == "events")
    assert(tr.forall(_.isNullAt(11))) // PASSWORD never surfaced
    cat.dropTrigger("t_put")
    assert(cat.metaEventTriggers.count() == 1)
    intercept[NoSuchElementException](cat.dropTrigger("t_put"))
    cat.dropTrigger("t_put", ifExists = true)
  }

  test("event triggers fire on put and delete with affected-row counts") {
    val cat = new GraftCatalog(spark)
    cat.createCollection("ft1", schema, keyColumns = Seq("id"))
    cat.createTrigger(graft.engine.TriggerDef("f_both", "ft1",
      Seq("PUT", "DELETE"), uri = "http://example.invalid/hook"))
    cat.put("ft1", Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "v"))
    cat.remove("ft1", Seq(1L))
    cat.deleteWhere("ft1", $"v" > 1.5)
    val fired = cat.firedTriggers
    assert(fired.map(e => (e.event, e.rows)) ==
      Seq(("PUT", 2L), ("DELETE", 1L), ("DELETE", 1L)))
    assert(fired.forall(_.trigger.name == "f_both"))
    // unmatched event type stays silent: a PUT-only trigger on a fresh
    // table never fires for deletes
    cat.createCollection("ft2", schema, keyColumns = Seq("id"))
    cat.createTrigger(graft.engine.TriggerDef("f_put", "ft2", Seq("PUT"),
      uri = "u"))
    cat.put("ft2", Seq((1L, "a", 1.0)).toDF("id", "name", "v"))
    cat.deleteWhere("ft2", $"id" === 1L)
    assert(cat.firedTriggers.count(_.trigger.name == "f_put") == 1)
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

  test("DML stays distributed: no driver-side collect in put/update/delete plans") {
    val cat = new GraftCatalog(spark)
    cat.createCollection("dml", schema, keyColumns = Seq("id"))
    cat.put("dml", (1L to 100L).map(i => (i, s"n$i", i * 1.0)).toDF("id", "name", "v"))
    cat.update("dml", Map("v" -> ($"v" * 2)), $"id" <= 50L)
    cat.deleteWhere("dml", $"id" > 90L)
    // localCheckpoint keeps blocks on executors; a driver materialization
    // would show up as LocalTableScan/LocalRelation in the stored plan.
    val plan = cat.get("dml").df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("LocalRelation"), s"driver-side materialization:\n$plan")
    assert(cat.get("dml").df.count() == 90)
    assert(cat.getRows("dml", Seq(10L)).collect().head.getDouble(2) == 20.0)
    assert(cat.getRows("dml", Seq(60L)).collect().head.getDouble(2) == 60.0)
  }

  test("composite row keys: getRows/multiGet/keyRange/remove over 2- and 3-column keys") {
    val cat = new GraftCatalog(spark)
    val s2 = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType, nullable = false),
      StructField("v", DoubleType)))
    cat.createCollection("ck2", s2, keyColumns = Seq("a", "b"))
    cat.put("ck2", Seq(
      (1L, "x", 1.0), (1L, "y", 2.0), (2L, "x", 3.0),
      (2L, "y", 4.0), (3L, "x", 5.0)).toDF("a", "b", "v"))

    // put replaces on the FULL composite key
    cat.put("ck2", Seq((2L, "y", 44.0)).toDF("a", "b", "v"))
    assert(cat.get("ck2").df.count() == 5)
    assert(cat.getRows("ck2", Seq(2L, "y")).collect().head.getDouble(2) == 44.0)

    // multiGet with composite tuples is one In-predicate scan
    val mg = cat.multiGet("ck2", Seq(Seq(1L, "y"), Seq(3L, "x"), Seq(9L, "z")))
    assert(mg.select("v").as[Double].collect().sorted.toSeq == Seq(2.0, 5.0))

    // lexicographic range: [(1,"y"), (3,"x")) — full-width bounds
    val r = cat.keyRange("ck2", Some(Seq(1L, "y")), Some(Seq(3L, "x")))
    assert(r.select("v").as[Double].collect().sorted.toSeq == Seq(2.0, 3.0, 44.0))
    // prefix bound: everything with a >= 2
    assert(cat.keyRange("ck2", Some(Seq(2L)), None).count() == 3)

    cat.remove("ck2", Seq(1L, "x"))
    assert(cat.get("ck2").df.count() == 4)

    // 3-column key round-trip
    val s3 = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType, nullable = false),
      StructField("c", LongType, nullable = false),
      StructField("v", DoubleType)))
    cat.createCollection("ck3", s3, keyColumns = Seq("a", "b", "c"))
    cat.put("ck3", Seq((1L, "x", 1L, 1.0), (1L, "x", 2L, 2.0),
      (1L, "y", 1L, 3.0)).toDF("a", "b", "c", "v"))
    assert(cat.multiGet("ck3", Seq(Seq(1L, "x", 2L))).count() == 1)
    assert(cat.keyRange("ck3", Some(Seq(1L, "x", 2L)), Some(Seq(1L, "y", 1L)))
      .select("v").as[Double].collect().toSeq == Seq(2.0))
    // scalar key against a composite container is rejected
    intercept[IllegalArgumentException](cat.multiGet("ck3", Seq(1L)))
  }

  test("ALTER TABLE ADD COLUMN / RENAME COLUMN") {
    val cat = new GraftCatalog(spark)
    cat.createCollection("alt", schema, keyColumns = Seq("id"))
    cat.put("alt", Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "v"))

    cat.alterAddColumn("alt", "tag", StringType)
    // old rows see NULL in the new column; SQL over the view sees it too
    val withTag = spark.sql("SELECT id, tag FROM alt ORDER BY id").collect()
    assert(withTag.forall(_.isNullAt(1)))
    cat.put("alt", Seq((3L, "c", 3.0, "new")).toDF("id", "name", "v", "tag"))
    assert(spark.sql("SELECT tag FROM alt WHERE id = 3").collect().head.getString(0) == "new")
    intercept[IllegalArgumentException](cat.alterAddColumn("alt", "TAG", StringType))

    cat.alterRenameColumn("alt", "id", "pk")
    assert(cat.get("alt").keyColumns == Seq("pk"))
    assert(spark.sql("SELECT pk FROM alt WHERE pk = 3").count() == 1)
    // key semantics survive the rename: put still replaces by (renamed) key
    cat.put("alt", Seq((3L, "c2", 3.5, "upd")).toDF("pk", "name", "v", "tag"))
    assert(cat.get("alt").df.count() == 3)
    assert(cat.getRows("alt", Seq(3L)).collect().head.getString(1) == "c2")
    intercept[IllegalArgumentException](cat.alterRenameColumn("alt", "gone", "x"))

    // rename follows the time column on a TimeSeries
    val ts = StructType(Seq(
      StructField("ts", TimestampType, nullable = false),
      StructField("v", DoubleType)))
    cat.createTimeSeries("altts", ts, "ts")
    cat.alterRenameColumn("altts", "ts", "event_time")
    assert(cat.get("altts").timeColumn.contains("event_time"))
  }

  test("drop removes container and view") {
    val cat = new GraftCatalog(spark)
    cat.createCollection("d1", schema)
    assert(cat.exists("d1"))
    cat.dropContainer("d1")
    assert(!cat.exists("d1"))
    intercept[NoSuchElementException](cat.get("d1"))
  }

  test("spatial + batch client APIs: QSF form, multiPut/fetchAll edges") {
    import org.apache.spark.sql.functions._
    import graft.geometry.Geo
    import spark.implicits._
    val cat = new GraftCatalog(spark)
    cat.createCollection("geo3d", StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("wkt", StringType))), keyColumns = Seq("id"))
    // two 3D boxes: one near the origin, one far away
    cat.put("geo3d", Seq(
      1 -> "POLYHEDRALSURFACE(((0 0 0, 1 0 0, 1 1 0, 0 1 0, 0 0 0)), ((0 0 1, 1 0 1, 1 1 1, 0 1 1, 0 0 1)))",
      2 -> "POLYHEDRALSURFACE(((90 90 90, 91 90 90, 91 91 90, 90 91 90, 90 90 90)), ((90 90 91, 91 90 91, 91 91 91, 90 91 91, 90 90 91)))"
    ).toDF("id", "wkt"))
    val sphere = Geo.stMakeSphere(lit(0.5), lit(0.5), lit(0.5), lit(1.0))
    val hit = cat.geometryQueryQsf("geo3d", "wkt", sphere)
      .select("id").as[Int].collect().toSeq
    assert(hit == Seq(1), s"sphere at the origin must hit box 1 only: $hit")
    // fetchAll surfaces a TQL error for the failing entry, names intact
    intercept[Exception](
      cat.fetchAll(Seq("geo3d" -> "select * where nonsense &&& 1")).head.count())
    intercept[NoSuchElementException](cat.tqlQuery("absent_tab", "select *"))
    // multiPut into a missing container fails whole-call, like put
    intercept[NoSuchElementException](
      cat.multiPut(Map("absent_tab" -> Seq(1 -> "x").toDF("id", "wkt"))))
  }

  test("multiGetAll KeyRange finish is inclusive (RowKeyPredicate.setFinish); keyRange until stays half-open") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cat = new GraftCatalog(spark)
    cat.createCollection("kr_tab", StructType(Seq(
      StructField("id", IntegerType, nullable = false))), keyColumns = Seq("id"))
    cat.put("kr_tab", Seq(10, 11, 12, 13).toDF("id"))
    val viaPred = cat.multiGetAll(Map(
        "kr_tab" -> GraftCatalog.KeyRange(Some(11), Some(12))))("kr_tab")
      .as[Int].collect().sorted
    assert(viaPred.toSeq == Seq(11, 12), "setFinish semantics: 12 conforms")
    val halfOpen = cat.keyRange("kr_tab", Some(11), Some(12))
      .as[Int].collect().sorted
    assert(halfOpen.toSeq == Seq(11), "native until stays exclusive")
  }

  test("tsAggregate COUNT counts rows, not non-null column values (Aggregation.java:173)") {
    import org.apache.spark.sql.types.{DoubleType, TimestampType}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cat = new GraftCatalog(spark)
    cat.createTimeSeries("ts_cnt", StructType(Seq(
      StructField("ts", TimestampType, nullable = false),
      StructField("value", DoubleType))), timeColumn = "ts")
    cat.put("ts_cnt",
      Seq((1000L, Some(1.0)), (2000L, None), (3000L, Some(3.0)))
        .toDF("ms", "value")
        .select(timestamp_millis($"ms").as("ts"), $"value"))
    assert(cat.tsAggregate("ts_cnt", 0, 5000, "value", "COUNT")
      .head().getLong(0) == 3L, "the null-value row is still a row")
  }

  test("TimeSeries point APIs: edge and error paths") {
    import org.apache.spark.sql.types.{DoubleType, TimestampType}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cat = new GraftCatalog(spark)
    cat.createTimeSeries("ts_api", StructType(Seq(
      StructField("ts", TimestampType, nullable = false),
      StructField("value", DoubleType))), timeColumn = "ts")
    cat.put("ts_api", Seq(1000L -> 10.0, 3000L -> 30.0).toDF("ms", "value")
      .select(timestamp_millis($"ms").as("ts"), $"value"))
    // out-of-range lookups return zero rows (the client's null)
    assert(cat.tsGet("ts_api", 500, "PREVIOUS").count() == 0)
    assert(cat.tsGet("ts_api", 3500, "NEXT").count() == 0)
    assert(cat.tsInterpolate("ts_api", 500, "value").count() == 0)
    // exact hit wins over interpolation
    assert(cat.tsInterpolate("ts_api", 3000, "value")
      .select("value").head().getDouble(0) == 30.0)
    // empty aggregation range: COUNT 0, AVERAGE null
    assert(cat.tsAggregate("ts_api", 4000, 5000, "value", "COUNT")
      .head().getLong(0) == 0L)
    assert(cat.tsAggregate("ts_api", 4000, 5000, "value", "AVERAGE")
      .head().isNullAt(0))
    // errors: not a timeseries / unknown enum values
    val col2 = StructType(Seq(StructField("id", IntegerType, nullable = false)))
    cat.createCollection("not_ts", col2)
    intercept[IllegalArgumentException](cat.tsGet("not_ts", 0, "NEXT"))
    intercept[IllegalArgumentException](cat.tsGet("ts_api", 0, "SIDEWAYS"))
    intercept[IllegalArgumentException](
      cat.tsAggregate("ts_api", 0, 1, "value", "MODE"))
  }
}

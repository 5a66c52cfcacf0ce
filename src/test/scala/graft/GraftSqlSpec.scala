package graft

import graft.engine.{GraftSql, Tables}

class GraftSqlSpec extends SparkTestBase {

  test("hint rewrite: INDEX_JOIN -> BROADCAST, advisory hints stripped") {
    assert(GraftSql.rewrite("SELECT /*+ INDEX_JOIN(nation) */ * FROM t")
      == "SELECT /*+ BROADCAST(nation) */ * FROM t")
    assert(GraftSql.rewrite("SELECT /*+ NO_INDEX_JOIN(a) */ 1")
      == "SELECT /*+ MERGE(a) */ 1")
    assert(GraftSql.rewrite(
      "SELECT /*+ MAX_DEGREE_OF_PARALLELISM(4) LEADING(a b) */ x FROM t")
      == "SELECT  x FROM t")
    assert(GraftSql.rewrite("SELECT 1") == "SELECT 1")
    assert(GraftSql.rewrite(
      "SELECT /*+ TABLE_ROW_COUNT(t 100) INDEX_JOIN(dim) */ * FROM t")
      == "SELECT /*+ BROADCAST(dim) */ * FROM t")
  }

  test("hinted GridDB SQL executes and broadcasts the hinted side") {
    Tables.registerAll(spark, sfDir)
    val df = GraftSql.sql(spark,
      """SELECT /*+ INDEX_JOIN(nation) MAX_DEGREE_OF_PARALLELISM(8) */
        |  n_name, COUNT(*) AS n
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }

  test("TQL EXPLAIN returns a plan; EXPLAIN ANALYZE runs first") {
    val ev = Tables.container(spark, sfDir, "events")
    val plan = graft.tql.TqlCompiler.run(ev, "explain select * where value > 100")
      .collect().map(_.getString(0)).mkString("\n")
    assert(plan.contains("Scan parquet") || plan.contains("PushedFilters"))
    val plan2 = graft.tql.TqlCompiler.run(ev,
      "explain analyze select count(*) where value > 100")
      .collect().map(_.getString(0)).mkString("\n")
    assert(plan2.contains("HashAggregate"))
  }

  test("GROUP BY RANGE ... EVERY ... FILL as GridDB SQL text") {
    Tables.registerAll(spark, sfDir)
    val df = GraftSql.sql(spark,
      """SELECT ts, avg(value) AS avg_value, count(*) AS n FROM events
        |WHERE ts BETWEEN TIMESTAMP '2024-01-01 00:00:00' AND TIMESTAMP '2024-01-05 00:00:00'
        |GROUP BY RANGE(ts) EVERY (6, HOUR) FILL (PREVIOUS)""".stripMargin)
    val rows = df.orderBy("ts_ms").collect()
    assert(rows.length == 17) // 4 days / 6h + 1
    assert(rows.head.getLong(0) == 1704067200000L)
    // FILL(PREVIOUS): after the first non-empty bucket nothing is null
    val vals = rows.map(r => Option(r.get(1)))
    assert(vals.dropWhile(_.isEmpty).forall(_.isDefined))
    // FILL(NONE) drops empty buckets
    val none = GraftSql.sql(spark,
      """SELECT ts, count(*) AS n FROM events
        |WHERE ts BETWEEN TIMESTAMP '2024-01-01 00:00:00' AND TIMESTAMP '2024-01-05 00:00:00'
        |GROUP BY RANGE(ts) EVERY (6, HOUR)""".stripMargin)
    assert(none.count() <= 17)
  }

  test("GROUP BY RANGE bounds come only from the ranged column's comparisons") {
    val d0 = 1704067200000L // 2024-01-01T00:00:00Z
    val d5 = 1704412800000L // 2024-01-05T00:00:00Z
    // BETWEEN
    assert(GraftSql.rangeBounds(
      "ts BETWEEN TIMESTAMP '2024-01-01 00:00:00' AND TIMESTAMP '2024-01-05 00:00:00'",
      "ts") == (d0, d5))
    // explicit comparisons, 'Z'-suffixed literal
    assert(GraftSql.rangeBounds(
      "ts >= TIMESTAMP '2024-01-01T00:00:00Z' AND ts <= TIMESTAMP '2024-01-05 00:00:00'",
      "ts") == (d0, d5))
    // exclusive bounds tighten by 1 ms; reversed operand order
    assert(GraftSql.rangeBounds(
      "TIMESTAMP '2024-01-01 00:00:00' < ts AND ts < TIMESTAMP '2024-01-05 00:00:00'",
      "ts") == (d0 + 1, d5 - 1))
    // a timestamp predicate on ANOTHER column must not widen/narrow the range
    assert(GraftSql.rangeBounds(
      "ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts <= TIMESTAMP '2024-01-05 00:00:00' " +
        "AND created_ts > TIMESTAMP '1999-01-01 00:00:00'",
      "ts") == (d0, d5))
    // offset literal
    assert(GraftSql.rangeBounds(
      "ts >= TIMESTAMP '2024-01-01 09:00:00+09:00' AND ts <= TIMESTAMP '2024-01-05 00:00:00'",
      "ts") == (d0, d5))
    // missing upper bound errors
    intercept[IllegalArgumentException] {
      GraftSql.rangeBounds("ts >= TIMESTAMP '2024-01-01 00:00:00'", "ts")
    }
    // literal on a different column only → still errors
    intercept[IllegalArgumentException] {
      GraftSql.rangeBounds(
        "other_ts BETWEEN TIMESTAMP '2024-01-01 00:00:00' AND TIMESTAMP '2024-01-05 00:00:00'",
        "ts")
    }
  }

  test("MATCH_RECOGNIZE as GridDB SQL text with PREV()") {
    import spark.implicits._
    Seq(("k1", 1L, 5.0), ("k1", 2L, 4.0), ("k1", 3L, 3.0), ("k1", 4L, 4.0),
      ("k1", 5L, 5.0), ("k2", 1L, 1.0), ("k2", 2L, 2.0))
      .toDF("k", "seq", "value").createOrReplaceTempView("mr_t")
    val out = GraftSql.sql(spark,
      """SELECT * FROM mr_t MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  ALL ROWS PER MATCH
        |  PATTERN ( DOWN{2,} UP{2,} )
        |  DEFINE DOWN AS value < PREV(value), UP AS value > PREV(value)
        |)""".stripMargin)
      .select("k", "seq", "match_num", "classifier")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSet == Set(
      ("k1", 2L, 1L, "DOWN"), ("k1", 3L, 1L, "DOWN"),
      ("k1", 4L, 1L, "UP"), ("k1", 5L, 1L, "UP")))

    val one = GraftSql.sql(spark,
      """SELECT * FROM mr_t MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  ONE ROW PER MATCH
        |  PATTERN ( DOWN{2,} UP{2,} )
        |  DEFINE DOWN AS value < PREV(value), UP AS value > PREV(value)
        |)""".stripMargin).collect()
    assert(one.length == 1)

    // grouped alternation in PATTERN
    val alt = GraftSql.sql(spark,
      """SELECT * FROM mr_t MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  PATTERN ( (DOWN|UP)+ )
        |  DEFINE DOWN AS value < PREV(value), UP AS value > PREV(value)
        |)""".stripMargin).collect()
    assert(alt.nonEmpty)
  }

  test("catalog UPDATE / DELETE WHERE / views") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cat = new graft.engine.GraftCatalog(spark)
    cat.register(graft.engine.Container("u1",
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v"),
      graft.engine.Collection, Seq("id")))
    cat.update("u1", Map("v" -> (col("v") * 2)), col("id") >= 2)
    assert(cat.get("u1").df.orderBy("id").select("v").as[Double].collect().toSeq
      == Seq(10.0, 40.0, 60.0))
    cat.deleteWhere("u1", col("v") > 50)
    assert(cat.get("u1").df.count() == 2)
    cat.createView("u1_big", "SELECT id FROM u1 WHERE v > 15")
    assert(spark.sql("SELECT COUNT(*) FROM u1_big").collect()(0).getLong(0) == 1)
  }
}

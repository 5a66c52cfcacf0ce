package graft

import org.apache.spark.sql.Row

/** RollupEmptyGlobalRow: SQL:2011 grand-total row for grouping-set queries
  * over empty input (found by fuzz v3 seed 2 — DuckDB returns the `()`
  * row, stock Spark returns nothing). */
class RollupEmptySpec extends SparkTestBase {

  private def rows(sql: String): Seq[Row] = {
    graft.engine.Tables.registerAll(spark, sfDir)
    spark.sql(sql).collect().toSeq
  }

  test("ROLLUP over empty input yields the grand-total row") {
    val rs = rows(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g0,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g1
        |FROM lineitem WHERE l_suppkey < l_suppkey
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin)
    assert(rs.size == 1)
    val r = rs.head
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getLong(2) == 0L)
    assert(r.isNullAt(3))
    assert(r.getInt(4) == 1 && r.getInt(5) == 1)
  }

  test("CUBE over empty input yields the grand-total row, GROUPING_ID all-ones") {
    val rs = rows(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
        |  CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS INT) AS gid
        |FROM orders WHERE o_orderkey < 0
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin)
    assert(rs.size == 1)
    assert(rs.head.getLong(2) == 0L && rs.head.getInt(3) == 3)
  }

  test("GROUPING SETS without the global set stays empty on empty input") {
    val rs = rows(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
        |FROM lineitem WHERE l_suppkey < l_suppkey
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin)
    assert(rs.isEmpty)
  }

  test("GROUPING SETS including () gains the row; HAVING still filters above") {
    val withUnit = rows(
      """SELECT l_returnflag, COUNT(*) AS cnt
        |FROM lineitem WHERE l_suppkey < l_suppkey
        |GROUP BY GROUPING SETS ((l_returnflag), ())""".stripMargin)
    assert(withUnit.size == 1 && withUnit.head.getLong(1) == 0L)
    val havingGate = rows(
      """SELECT l_returnflag, COUNT(*) AS cnt
        |FROM lineitem WHERE l_suppkey < l_suppkey
        |GROUP BY GROUPING SETS ((l_returnflag), ())
        |HAVING COUNT(*) > 0""".stripMargin)
    assert(havingGate.isEmpty)
  }

  test("partial rollup GROUP BY a, ROLLUP(b): not rewritten, works, empty stays empty") {
    // review finding: the variance-based global-set detection misread the
    // coarsest PARTIAL set as () and broke every partial-rollup query
    val nonEmpty = rows(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
        |FROM lineitem
        |GROUP BY l_returnflag, ROLLUP(l_linestatus)
        |ORDER BY l_returnflag, l_linestatus NULLS FIRST""".stripMargin)
    assert(nonEmpty.nonEmpty && nonEmpty.forall(!_.isNullAt(0)))
    // no set is global (every set keeps l_returnflag) -> empty input
    // yields zero rows, per the standard
    val empty = rows(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
        |FROM lineitem WHERE l_suppkey < l_suppkey
        |GROUP BY l_returnflag, ROLLUP(l_linestatus)""".stripMargin)
    assert(empty.isEmpty)
  }

  test("GROUPING SETS ((a,b),(a)) without () stays empty on empty input") {
    val rs = rows(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
        |FROM lineitem WHERE l_suppkey < l_suppkey
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag))""".stripMargin)
    assert(rs.isEmpty)
  }

  test("lone GROUPING SETS (()) gains the grand-total row on empty input") {
    val rs = rows(
      """SELECT COUNT(*) AS cnt FROM lineitem WHERE l_suppkey < l_suppkey
        |GROUP BY GROUPING SETS (())""".stripMargin)
    assert(rs.size == 1 && rs.head.getLong(0) == 0L)
  }

  test("idempotent across re-analysis: write path emits exactly one grand-total row") {
    graft.engine.Tables.registerAll(spark, sfDir)
    // coalesce + write re-analyze the plan twice more; the guard-leg
    // detection must keep the rewrite single-shot or rows duplicate
    val df = graft.engine.GraftSql.sql(spark,
      """SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem
        |WHERE l_suppkey < l_suppkey GROUP BY ROLLUP(l_returnflag)""".stripMargin)
    val out = java.nio.file.Files.createTempDirectory("rollup_empty").toString
    df.coalesce(1).write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out).collect()
    assert(back.length == 1 && back.head.getLong(1) == 0L)
  }

  test("non-empty input: results identical to stock Spark's expansion") {
    val rs = rows(
      """SELECT l_returnflag, COUNT(*) AS cnt,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag)
        |ORDER BY g, l_returnflag NULLS FIRST""".stripMargin)
    // grand-total row present exactly once, equal to the sum of the groups
    val (total, groups) = rs.partition(_.getInt(2) == 1)
    assert(total.size == 1)
    assert(total.head.getLong(1) == groups.map(_.getLong(1)).sum)
    assert(groups.forall(!_.isNullAt(0)))
  }

  private def guardLegs(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int = {
    import org.apache.spark.sql.catalyst.plans.logical._
    var n = 0
    plan.foreach {
      case u: Union if u.children.size == 2 && (u.children(1) match {
            case Project(_, Filter(cond, _: Aggregate)) =>
              cond.references.exists(_.name == "__graft_rollup_cnt")
            case _ => false
          }) => n += 1
      case _ => ()
    }
    n
  }

  test("non-deterministic child: rule bails, stock Spark behavior kept") {
    // the guard leg re-evaluates the child; with rand() in the filter the
    // two evaluations could disagree — skip the rewrite entirely
    graft.engine.Tables.registerAll(spark, sfDir)
    val df = spark.sql(
      """SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem
        |WHERE rand() < -1.0 GROUP BY ROLLUP(l_returnflag)""".stripMargin)
    assert(guardLegs(df.queryExecution.analyzed) == 0)
    assert(df.collect().isEmpty) // stock Spark: no grand-total row
    // deterministic control: same shape without rand() IS rewritten
    val det = spark.sql(
      """SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem
        |WHERE l_suppkey < 0 GROUP BY ROLLUP(l_returnflag)""".stripMargin)
    assert(guardLegs(det.queryExecution.analyzed) == 1)
  }

  test("streaming child: rule bails (no Union of streaming aggregates)") {
    val stream = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    val agg = stream.rollup("value").count()
    assert(guardLegs(agg.queryExecution.analyzed) == 0)
  }

  test("idempotent across plan clone: tag survives copy, no duplicate leg") {
    // a clone breaks object identity (the old IdentityHashMap tracking
    // would re-match); the TreeNodeTag must survive makeCopy and keep the
    // rewrite single-shot
    graft.engine.Tables.registerAll(spark, sfDir)
    val analyzed = spark.sql(
      """SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem
        |WHERE l_suppkey < 0 GROUP BY ROLLUP(l_returnflag)""".stripMargin)
      .queryExecution.analyzed
    assert(guardLegs(analyzed) == 1)
    val recloned = analyzed.clone()
    val again = graft.engine.RollupEmptyGlobalRow(recloned)
    assert(guardLegs(again) == 1)
    val thrice = graft.engine.RollupEmptyGlobalRow(again.clone())
    assert(guardLegs(thrice) == 1)
  }

  test("empty-leg guard: non-empty plan still aggregates once per row set") {
    // the added leg must not change the grouped values — spot-check against
    // a plain GROUP BY of the same data
    val rolled = rows(
      """SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem
        |GROUP BY ROLLUP(l_returnflag) HAVING GROUPING(l_returnflag) = 0
        |ORDER BY l_returnflag""".stripMargin)
    val plain = rows(
      "SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")
    assert(rolled == plain)
  }
}

package graft

import graft.engine.{Collection, Container}
import graft.tql.PartialFetch

/** FetchOption.PARTIAL_EXECUTION parity: range-divided lazy execution,
  * bounded buffering, LIMIT/OFFSET composition, the reference's mode
  * restrictions, and the forbidden size() call. */
class PartialFetchSpec extends SparkTestBase {
  import spark.implicits._

  // 8 ranges x 25 rows (parallelize keeps the plan narrow — a repartition
  // would plant the very Exchange the mode exists to avoid), value = id so
  // results are checkable as a set
  private def cont = Container("t",
    spark.sparkContext.parallelize(0L until 200L, 8).toDF("id").select(
      org.apache.spark.sql.functions.col("id"),
      (org.apache.spark.sql.functions.col("id") % 10).as("m")),
    Collection)

  test("partial fetch returns exactly the full result, one range at a time") {
    val rs = PartialFetch.fetch(cont, "select * where m < 5")
    assert(rs.rangesExecuted == 0) // nothing executes before iteration
    val got = rs.map(_.getLong(0)).toVector
    assert(got.sorted == (0L until 200L).filter(_ % 10 < 5).toVector)
    assert(rs.rangesExecuted == rs.totalRanges)
  }

  test("later ranges are not executed until iteration reaches them") {
    val rs = PartialFetch.fetch(cont, "select *")
    rs.next()
    assert(rs.rangesExecuted == 1,
      s"first fetch should execute one range, got ${rs.rangesExecuted}")
    // draining one range's worth still leaves later ranges unexecuted
    (1 until 25).foreach(_ => rs.next())
    assert(rs.rangesExecuted <= 2)
  }

  test("LIMIT stops iteration and skips the remaining ranges entirely") {
    val rs = PartialFetch.fetch(cont, "select * limit 10")
    val got = rs.toVector
    assert(got.size == 10)
    assert(rs.rangesExecuted == 1,
      s"limit 10 should touch one 25-row range, executed ${rs.rangesExecuted}")
  }

  test("OFFSET consumes rows before serving; composes with LIMIT") {
    val all = PartialFetch.fetch(cont, "select *").map(_.getLong(0)).toVector
    val page = PartialFetch.fetch(cont, "select * limit 7 offset 30")
      .map(_.getLong(0)).toVector
    assert(page == all.slice(30, 37))
  }

  test("the plan has no Exchange: each range is independently computable") {
    // the narrow-plan property is WHY the reference restricts the mode to
    // SELECT * without ORDER BY; assert we keep it
    val df = graft.tql.TqlCompiler.run(cont, "select * where m < 5")
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("empty container / fully-filtered query: cursor exhausts cleanly") {
    val empty = Container("t",
      spark.sparkContext.parallelize(Seq.empty[Long], 4).toDF("id"), Collection)
    val rs = PartialFetch.fetch(empty, "select *")
    assert(!rs.hasNext)
    intercept[NoSuchElementException] { rs.next() }
    // a predicate matching nothing still walks every range exactly once
    val none = PartialFetch.fetch(cont, "select * where m > 100")
    assert(!none.hasNext)
    assert(none.rangesExecuted == none.totalRanges)
  }

  test("reference mode restrictions and size() are enforced") {
    intercept[IllegalArgumentException] {
      PartialFetch.fetch(cont, "select * order by id")
    }
    intercept[IllegalArgumentException] {
      PartialFetch.fetch(cont, "select count(*)")
    }
    val rs = PartialFetch.fetch(cont, "select *")
    intercept[IllegalStateException] { rs.size }
  }
}

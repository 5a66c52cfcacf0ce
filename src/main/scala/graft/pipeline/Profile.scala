package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One-pass column profiling for data-quality checks over large tables:
  * per column, the row count, null count, exact distinct count, and
  * numeric min/max/mean. The whole profile is ONE aggregation over the
  * input (multiple COUNT(DISTINCT) columns lower to Spark's standard
  * Expand + partial-agg plan — one shuffle regardless of table size),
  * followed by a stack() unpivot of the single result row, so it scales
  * to arbitrarily wide scans with no per-column jobs.
  *
  * Mean accumulates in DECIMAL(18,2) cents and divides once, so the
  * result is sum-order-independent and reproducible across engines
  * (doubles summed in shuffle order are not).
  *
  * Output: (column, n_rows, n_nulls, n_distinct, min_value, max_value,
  * avg_value) — one row per profiled column, numerics cast to double.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: at least one column required")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        (count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c).cast("double")).as(s"__min_$c"),
        max(col(c).cast("double")).as(s"__max_$c"),
        (sum(col(c).cast(DecimalType(18, 2))).cast("double") / count(col(c)))
          .as(s"__avg_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      s"'$c', __n_$c, __nulls_$c, __nd_$c, __min_$c, __max_$c, __avg_$c"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stacked) AS " +
        "(column, n_rows, n_nulls, n_distinct, min_value, max_value, avg_value)"))
  }
}

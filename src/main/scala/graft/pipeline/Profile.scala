package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One-pass column profiling for data-quality checks over large tables:
  * per column, the row count, null count, distinct count, and numeric
  * min/max/mean. The whole profile is ONE aggregation over the input,
  * followed by a stack() unpivot of the single result row, so it scales
  * to arbitrarily wide scans with no per-column jobs.
  *
  * Distinct counts are exact by default (multiple COUNT(DISTINCT) columns
  * lower to Spark's standard Expand + partial-agg plan — one shuffle, but
  * the Expand multiplies scanned rows by the profiled-column count). For
  * wide tables at large scale, pass `approxDistinct = true` to switch to
  * `approx_count_distinct` (HLL++, rsd 5%): no Expand, rows scanned once
  * regardless of column count — the true one-cheap-pass profile.
  *
  * Mean accumulates in DECIMAL(18,2) cents and divides once, so the
  * result is sum-order-independent and reproducible across engines
  * (doubles summed in shuffle order are not).
  *
  * Output: (column, n_rows, n_nulls, n_distinct, min_value, max_value,
  * avg_value) — one row per profiled column, numerics cast to double.
  */
object Profile {

  // exact-name column reference: col("a.b") would resolve as a struct
  // field, so backtick-quote (doubling embedded backticks per Spark rules)
  private def ref(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false, rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile: at least one column required")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      val v = ref(c)
      Seq(
        count(lit(1)).as(s"__n_$i"),
        (count(lit(1)) - count(v)).as(s"__nulls_$i"),
        (if (approxDistinct) approx_count_distinct(v, rsd) else countDistinct(v))
          .as(s"__nd_$i"),
        min(v.cast("double")).as(s"__min_$i"),
        max(v.cast("double")).as(s"__max_$i"),
        (sum(v.cast(DecimalType(18, 2))).cast("double") / count(v))
          .as(s"__avg_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // labels are string literals in the stack() text — escape quote chars;
    // the value references use only the index-based internal aliases above,
    // so arbitrary user column names never reach the SQL parser
    val stacked = cols.zipWithIndex.map { case (c, i) =>
      val label = c.replace("\\", "\\\\").replace("'", "\\'")
      s"'$label', __n_$i, __nulls_$i, __nd_$i, __min_$i, __max_$i, __avg_$i"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stacked) AS " +
        "(column, n_rows, n_nulls, n_distinct, min_value, max_value, avg_value)"))
  }
}

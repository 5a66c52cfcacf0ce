package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: points against [start, end] intervals.
  *
  * The reference reaches this shape through its comparator-merge join
  * (JoinCompMerge, /root/reference/server/sql_operator_join.h:153 — non-equi
  * primary conditions); Spark's default plan for `ts BETWEEN s AND e` with no
  * equi-key is a broadcast nested-loop join, which is O(|points| x
  * |intervals|) and dies at scale.
  *
  * Spark-first decomposition: quantize time into fixed buckets; a point
  * belongs to exactly one bucket, an interval covers a contiguous bucket
  * range (explode via `sequence`). The bucket id becomes an equi-join key,
  * so Catalyst plans an ordinary shuffled/broadcast HASH join over
  * (keys..., bucket) and the residual BETWEEN filter runs inside the join —
  * cost is linear in points + interval-bucket pairs. Choose `bucket` near
  * the typical interval length: shorter buckets multiply exploded interval
  * rows, longer ones widen hash groups (both degrade gracefully, not
  * quadratically). Equal timestamps at interval edges are inclusive, like
  * SQL BETWEEN.
  *
  * `points` and `intervals` must have disjoint column names apart from
  * `keys` (rename in a prior select); output = points.* ++ intervals.*.
  */
object RangeJoin {

  def intervalJoin(points: DataFrame, tsCol: String,
                   intervals: DataFrame, startCol: String, endCol: String,
                   keys: Seq[String] = Nil,
                   bucket: String = "1 hour"): DataFrame = {
    val clash = intervals.columns.filterNot(keys.contains)
      .intersect(points.columns.filterNot(keys.contains))
    require(clash.isEmpty, s"column names $clash appear on both sides; rename first")
    require(!points.columns.contains("__rj_b") && !intervals.columns.contains("__rj_b"),
      "column name __rj_b is reserved by intervalJoin; rename it first")

    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(bucket))
    val bucketUs = iv.months.toLong * 2592000000000L +
      iv.days.toLong * 86400000000L + iv.microseconds
    require(bucketUs > 0, s"bucket '$bucket' must be a positive interval")

    def b(c: Column): Column = floor(unix_micros(c) / bucketUs)
    val pts = points.withColumn("__rj_b", b(col(tsCol)))
    val ivs = intervals.withColumn("__rj_b",
      explode(sequence(b(col(startCol)), b(col(endCol)))))

    pts.join(ivs, keys :+ "__rj_b")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__rj_b")
  }
}

package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for 100 TB joins/aggregations.
  *
  * AQE's skew-join splitting (enabled in GraftSession) covers sort-merge
  * joins; these helpers cover the cases AQE can't: skewed aggregation keys
  * and broadcast-infeasible skewed equi-joins. The reference handles the
  * analogous problem by hash-bucketing group input
  * (OP_GROUP_BUCKET_HASH, /root/reference/server/sql_operator_group.h:153).
  */
object Skew {

  /** Two-phase (salted) aggregation: groupBy (keys, salt) with partial
    * aggs, then merge by keys. Use when one key dominates the input.
    *
    * `partials` aggregate within a salt bucket and are aliased; `merges`
    * combine the per-salt partials to finals (referencing the partial
    * aliases). Example: sum -> partial sum(x) as s, merge sum(s) as total.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val partial = salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
    partial.groupBy(keys.map(col): _*).agg(merges.head, merges.tail: _*)
  }

  /** Salted equi-join for a skewed LEFT side against a small-ish right side:
    * left rows get a random salt in [0, salts); right rows are replicated
    * `salts` times; join on (key, salt). Right replication costs salts x
    * its size — use when right is too big to broadcast but far smaller
    * than left. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(pmod(hash(monotonically_increasing_id(), spark_partition_id()), lit(salts)) + lit(salts), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}

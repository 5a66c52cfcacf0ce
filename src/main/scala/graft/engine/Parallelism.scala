package graft.engine

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for compute-heavy per-row stages.
  *
  * Sketch/kernel stages (MinHash signatures, SimHash, SRP signatures,
  * cosine scans, chunk explodes) are pure per-row maps — their parallelism
  * is whatever the upstream scan's split count is. Parquet splits on
  * row-group boundaries, so a small corpus (one row group — the sf0.001..1
  * test dirs, or any dimension-sized table) plans as ONE task and
  * serializes the whole kernel on a single core while the rest of the
  * cluster idles. Worse, AQE materializes each exchange leg as its own
  * stage, so an unspread sketch subtree can run single-threaded more than
  * once per query.
  *
  * `spread` round-robin-repartitions such inputs to the default
  * parallelism. The cost is bounded by the threshold itself (we only ever
  * shuffle inputs the optimizer sizes below `cores x 4 MiB`); a 100 TB
  * corpus never takes this path — its scan already carries thousands of
  * splits, and a blind repartition there would be a catastrophic full-text
  * shuffle. Streaming inputs are passed through untouched (no stats, and
  * micro-batches are already split by the source).
  */
object Parallelism {
  def spread(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val sc = df.sparkSession.sparkContext
    val p = sc.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes < BigInt(p) * 4L * 1024 * 1024) df.repartition(p) else df
  }
}

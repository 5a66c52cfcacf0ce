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
  * parallelism. The cost is bounded by the ceiling (we only ever shuffle
  * inputs the optimizer sizes below `cores x 4 MiB`); a 100 TB corpus
  * never takes this path — its scan already carries thousands of splits,
  * and a blind repartition there would be a catastrophic full-text
  * shuffle. Streaming inputs are passed through untouched (no stats, and
  * micro-batches are already split by the source).
  *
  * The FLOOR matters as much as the ceiling (round-8 bench finding: the
  * floorless round-7 version cost 2-4x on every sketch query at sf0.1).
  * Below ~4 MiB compressed the whole kernel finishes on one core faster
  * than the exchange + extra AQE stage the repartition inserts — the
  * repartition's fixed cost (local sort-before-round-robin, shuffle write
  * + fetch, one more stage boundary) is ~0.1-0.2 s regardless of size.
  * Spread only pays off when single-task kernel time clears that bar:
  * megabytes of compressed text, i.e. seconds of single-core sketching.
  */
object Parallelism {
  private val disabled = sys.env.get("SPARK_GRAFT_NO_SPREAD").contains("1")
  private val FloorBytes = 4L * 1024 * 1024
  def spread(df: DataFrame): DataFrame = {
    if (disabled || df.isStreaming) return df
    val sc = df.sparkSession.sparkContext
    val p = sc.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes >= FloorBytes && bytes < BigInt(p) * 4L * 1024 * 1024)
      df.repartition(p)
    else df
  }
}

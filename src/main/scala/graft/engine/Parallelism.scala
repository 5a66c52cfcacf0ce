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
  * Below the floor the whole kernel finishes on one core faster than the
  * exchange + extra AQE stage the repartition inserts — the repartition's
  * fixed cost (local sort-before-round-robin, shuffle write + fetch, one
  * more stage boundary) is ~0.1-0.2 s regardless of size. Measured A/B on
  * q_dedup_minhash (spread vs no-spread, local[32], best of 3):
  *   - sf0.1 documents (0.6 MiB):  0.73 s vs 0.53 s  -> spread LOSES
  *   - sf1   documents (5.7 MiB):  1.11 s vs 0.98 s  -> spread loses
  *   - sf10  documents (57 MiB):   2.00 s vs 4.93 s  -> spread WINS 2.4x
  * (the 57 MiB file is one parquet row group = one scan task without the
  * spread — exactly the serialization the operator exists to break). The
  * 32 MiB floor splits the sf1/sf10 bracket; the break-even moves with
  * kernel cost per byte, but every sketch kernel here is within ~2x of
  * minhash's.
  */
object Parallelism {
  private val disabled = sys.env.get("SPARK_GRAFT_NO_SPREAD").contains("1")
  private val FloorBytes = 32L * 1024 * 1024
  def spread(df: DataFrame): DataFrame = {
    if (disabled || df.isStreaming) return df
    val sc = df.sparkSession.sparkContext
    val p = sc.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // ceiling: past this the scan already carries enough splits; floored
    // at 4x FloorBytes so low-core sessions keep a non-empty window
    val ceiling = (BigInt(p) * 4L * 1024 * 1024).max(BigInt(4L * FloorBytes))
    if (bytes >= FloorBytes && bytes < ceiling) df.repartition(p) else df
  }
}

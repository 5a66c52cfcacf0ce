package graft.tql

import org.apache.spark.sql.Row
import graft.engine.Container

/** GridDB `FetchOption.PARTIAL_EXECUTION` on Spark — real range-divided
  * query suspend/resume, not a paged view over a collected result.
  *
  * Reference semantics (java_client/.../FetchOption.java:100-148,
  * server/result_set.cpp): with the option set, the server divides the
  * target data into ranges and executes the query per range as the client
  * iterates, so the intermediate buffer stays bounded regardless of result
  * size; the query is only ever partially executed until iteration reaches
  * the later ranges. The mode is restricted to TQL `SELECT *` without
  * ORDER BY (combinable with LIMIT) — exactly the queries with no global
  * operator, so each range is independently computable.
  *
  * The Spark mapping is faithful because the same restriction does the
  * same work here: a `SELECT * WHERE ...` plan is narrow (scan + filter,
  * no Exchange), so each input partition IS an independently executable
  * range. [[PartialRowSet]] holds the analyzed plan and runs ONE Spark job
  * per partition (`sparkContext.runJob(rdd, Seq(partition))`) only when
  * iteration first touches that range — suspend is simply not calling
  * next(); resume picks up at the recorded (range, offset) position with
  * no state server-side beyond the immutable plan. The driver buffer is
  * bounded by one range, never the full result.
  *
  * Reference-parity details pinned by PartialFetchSpec:
  *  - `size()` throws IllegalStateException (RowSet.java:155-180: in
  *    partial mode the total "cannot be obtained despite the status of
  *    the query processing progress");
  *  - ORDER BY / aggregation / selection-function queries are rejected up
  *    front (FetchOption.java: "SELECT clause must be consisted of only
  *    '*' and an ORDER BY clause must not be specified");
  *  - LIMIT composes: iteration ends after `limit` rows and later ranges
  *    are never executed.
  */
object PartialFetch {

  /** Execute `tql` over `container` in partial-execution mode. */
  def fetch(container: Container, tql: String): PartialRowSet = {
    val q = TqlParser.parse(tql)
    if (q.selection != TqlAst.Star)
      throw new IllegalArgumentException(
        "PARTIAL_EXECUTION requires a SELECT * query (FetchOption.java:121)")
    if (q.orderBy.nonEmpty)
      throw new IllegalArgumentException(
        "PARTIAL_EXECUTION cannot be combined with ORDER BY (FetchOption.java:122)")
    if (q.explain > 0)
      throw new IllegalArgumentException("PARTIAL_EXECUTION cannot EXPLAIN")
    // compile WITHOUT limit/offset: paging is the cursor's job, and a
    // Spark limit would plan a CollectLimit barrier (a global operator —
    // the thing this mode exists to avoid)
    val df = TqlCompiler.compile(container, q.copy(limit = None, offset = None))
    new PartialRowSet(df, skip = q.offset.getOrElse(0L), limit = q.limit)
  }

  /** A RowSet in partial-execution mode: an Iterator[Row] that executes
    * one underlying range (plan partition) per fetch, lazily. */
  final class PartialRowSet private[tql] (
      df: org.apache.spark.sql.DataFrame,
      skip: Long,
      limit: Option[Long]) extends Iterator[Row] {

    private val rdd = df.rdd
    private val nRanges = rdd.getNumPartitions
    private val sc = df.sparkSession.sparkContext

    private var range = 0
    private var buffer: Array[Row] = Array.empty
    private var pos = 0
    private var served = 0L
    private var skipped = 0L
    private var executed = 0

    /** Ranges (partitions) actually executed so far — the observability
      * hook the specs use to prove later ranges stay unexecuted. */
    def rangesExecuted: Int = executed

    def totalRanges: Int = nRanges

    /** Reference parity: the row count is unobtainable in partial mode. */
    override def size: Int = throw new IllegalStateException(
      "size() cannot be obtained under PARTIAL_EXECUTION (RowSet.java:180)")

    private def exhaustedByLimit: Boolean = limit.exists(served >= _)

    @annotation.tailrec
    private def fill(): Unit = {
      if (pos < buffer.length || range >= nRanges || exhaustedByLimit) return
      val p = range
      buffer = sc.runJob(rdd, (it: Iterator[Row]) => it.toArray, Seq(p)).head
      executed += 1
      range += 1
      pos = 0
      // OFFSET consumes rows before any are served
      while (pos < buffer.length && skipped < skip) { pos += 1; skipped += 1 }
      if (pos >= buffer.length) fill()
    }

    override def hasNext: Boolean = {
      if (exhaustedByLimit) return false
      fill()
      pos < buffer.length
    }

    override def next(): Row = {
      if (!hasNext) throw new NoSuchElementException("row set exhausted")
      val r = buffer(pos)
      pos += 1
      served += 1
      r
    }
  }
}

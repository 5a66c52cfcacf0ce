package graft.mr

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** MATCH_RECOGNIZE — row-pattern matching over partitioned, ordered rows.
  *
  * Reference: WindowMatch
  * (/root/reference/server/sql_operator_sort.cpp:4323+), grammar rules
  * 162-194 (/root/reference/server/sql_internal_parser.cpp:996-1028).
  *
  * Spark-first design: DEFINE predicates are ordinary `Column`s (they may
  * use window functions like `lag` for PREV semantics) and are materialized
  * as boolean columns BEFORE the match, so the NFA only reads booleans —
  * the predicate evaluation stays in codegen'd Spark expressions. The match
  * itself runs per partition-key group via repartition + sortWithinPartitions
  * + mapPartitions (one shuffle, streaming group detection; only the current
  * match attempt's rows are buffered — at 100 TB even a single unkeyed
  * container-wide series streams through one task without materializing).
  *
  * AFTER MATCH SKIP PAST LAST ROW (default), SKIP TO NEXT ROW, or
  * SKIP TO <var> (reference rule 174; SQL-standard SKIP TO LAST semantics).
  * Output = ALL ROWS PER MATCH: input columns + match_num (per key, 1-based)
  * + classifier (matched DEFINE variable). `oneRowPerMatch` aggregates that
  * into per-match summary rows; `measures` evaluates MEASURES aggregate
  * expressions per match (helpers in [[Measures]]).
  */
object MatchRecognize {

  /** AFTER MATCH SKIP modes (reference rules 172-174). */
  sealed trait AfterMatchSkip
  object AfterMatchSkip {
    case object PastLastRow extends AfterMatchSkip
    case object ToNextRow extends AfterMatchSkip
    /** Resume matching AT the last row the finished match assigned to
      * `variable` (SQL-standard SKIP TO [LAST] semantics — matches may
      * overlap). If that row is the match's first row (no progress possible)
      * or the variable matched no row, advances one row instead. */
    final case class ToVar(variable: String) extends AfterMatchSkip
    /** Resume matching AT the first row the finished match assigned to
      * `variable` (SKIP TO FIRST semantics, reference grammar rule 174 —
      * matches may overlap more aggressively than LAST). Same progress
      * guard: a resume point at the match's first row, or a variable that
      * matched no row, advances one row instead. */
    final case class ToFirstVar(variable: String) extends AfterMatchSkip
  }

  /** Name of the internal per-match row-position column carried by
    * [[matchedWithPos]] (0-based offset of the row within its match). */
  val PosCol = "__mr_pos"

  def allRowsPerMatch(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
                      pattern: String, defines: Map[String, Column],
                      skipPastLastRow: Boolean = true): DataFrame =
    allRowsPerMatch(df, keys, orderCols, pattern, defines,
      if (skipPastLastRow) AfterMatchSkip.PastLastRow else AfterMatchSkip.ToNextRow)

  def allRowsPerMatch(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
                      pattern: String, defines: Map[String, Column],
                      skip: AfterMatchSkip): DataFrame =
    matchedWithPos(df, keys, orderCols, pattern, defines, skip).drop(PosCol)

  /** ALL ROWS PER MATCH plus the internal `__mr_pos` column (0-based row
    * offset within the match) that [[measures]] aggregates order by.
    *
    * Unkeyed (whole-container) series scale out when the pattern has a
    * finite maximum match length L (no unbounded `*`/`+`/`{n,}`): the series
    * is chunked with an L-row overlap and matched chunk-parallel — see
    * [[matchedUnkeyedChunked]]. Unbounded patterns stay sequential (a single
    * match can span the entire series, so the scan is sequential by
    * semantics — the memory-bounded streaming GroupMatcher below). */
  private[graft] def matchedWithPos(
      df: DataFrame, keys: Seq[String], orderCols: Seq[String],
      pattern: String, defines: Map[String, Column],
      skip: AfterMatchSkip, chunkRows: Int = 65536): DataFrame = {
    require(orderCols.nonEmpty, "MATCH_RECOGNIZE requires ORDER BY")
    val node = PatternRegex.parse(pattern)
    val vars = PatternRegex.variables(node)
    vars.foreach(v => require(defines.contains(v), s"no DEFINE for pattern variable $v"))
    skip match {
      case AfterMatchSkip.ToVar(v) =>
        require(vars.contains(v), s"AFTER MATCH SKIP TO $v: no such pattern variable")
      case AfterMatchSkip.ToFirstVar(v) =>
        require(vars.contains(v), s"AFTER MATCH SKIP TO FIRST $v: no such pattern variable")
      case _ =>
    }

    val defNames = defines.keys.toSeq.sorted
    val withDefs = defNames.foldLeft(df) { (d, v) =>
      d.withColumn(s"__def_$v", coalesce(defines(v).cast("boolean"), lit(false)))
    }
    if (keys.isEmpty) {
      PatternRegex.maxMatchLen(node) match {
        case Some(l) if l <= MaxChunkedMatchLen =>
          return matchedUnkeyedChunked(withDefs, orderCols, node, defNames,
            skip, math.max(l, 1), chunkRows)
        case _ => // unbounded match length: sequential by semantics
      }
    }
    val parted =
      if (keys.nonEmpty) withDefs.repartition(keys.map(col): _*)
      else withDefs.coalesce(1)
    val sorted = parted.sortWithinPartitions((keys ++ orderCols).map(col): _*)

    val schema = sorted.schema
    val keyIdx = keys.map(schema.fieldIndex).toArray
    val defIdx = defNames.map(v => v -> schema.fieldIndex(s"__def_$v")).toMap
    val outSchema = StructType(schema.fields)
      .add("match_num", LongType).add("classifier", StringType)
      .add(PosCol, LongType)

    val matched = sorted.mapPartitions { it =>
      new Iterator[Row] {
        private val rowsIt = it.buffered
        private var pending: Iterator[Row] = Iterator.empty
        override def hasNext: Boolean = {
          // a group iterator that produced no (more) output has fully
          // consumed its group's input rows, so the next head starts a group
          while (!pending.hasNext && rowsIt.hasNext) {
            pending = new GroupMatcher(rowsIt, keyIdx, node, defIdx, skip)
          }
          pending.hasNext
        }
        override def next(): Row = { if (!hasNext) throw new NoSuchElementException; pending.next() }
      }
    }(Encoders.row(outSchema))

    matched.drop(defNames.map(v => s"__def_$v"): _*)
  }

  /** Largest finite max-match-length still eligible for the chunked unkeyed
    * path (the L-row overlap duplicates L/chunkRows of the data; beyond this
    * the pattern is effectively unbounded and runs sequentially). */
  private val MaxChunkedMatchLen = 4096

  /** Rows to advance past a completed match starting at its first row
    * (AFTER MATCH SKIP semantics; always ≥ 1 so the scan makes progress). */
  private def skipOffset(assign: Vector[String], skip: AfterMatchSkip): Int =
    skip match {
      case AfterMatchSkip.PastLastRow => assign.size
      case AfterMatchSkip.ToNextRow => 1
      case AfterMatchSkip.ToVar(v) => math.max(assign.lastIndexOf(v), 1)
      case AfterMatchSkip.ToFirstVar(v) => math.max(assign.indexOf(v), 1)
    }

  /** Chunk-parallel unkeyed matching for patterns with finite maximum match
    * length L — the parallel composition of the sequential match scan:
    *
    *  1. rows are globally ordered (range-partitioned sort + per-partition
    *     counts via zipWithIndex) and cut into chunks of `chunkRows`, each
    *     chunk also receiving the next chunk's first L rows (overlap) — a
    *     match starting at a chunk's last region row probes at most L rows
    *     ahead, so every probe (including the `$` end-anchor's existence
    *     check) is answered truthfully from the slice;
    *  2. per chunk, one backward memoized pass computes, for each of the
    *     L+1 possible scan entry offsets, where the sequential scan would
    *     exit the chunk and how many matches it would emit — O(rows) match
    *     attempts total, not O(rows · L);
    *  3. the per-chunk tables (one tiny row per chunk) are folded left to
    *     right in a single task — the same stitch discipline as the chunked
    *     window paths — resolving each chunk's actual entry offset and
    *     global match-number base;
    *  4. each chunk re-runs the scan forward from its resolved entry,
    *     emitting its region's matches with globally sequential match_num.
    *
    * Output is row-identical to the sequential GroupMatcher: the AFTER MATCH
    * SKIP discipline is what the entry/exit composition reproduces exactly.
    * Reference: WindowMatch (/root/reference/server/sql_operator_sort.cpp:
    * 4323+) runs this scan on a single node; the chunked form is the
    * 1000-executor layout of the same semantics. */
  private def matchedUnkeyedChunked(
      withDefs: DataFrame, orderCols: Seq[String], node: PatternRegex.Node,
      defNames: Seq[String], skip: AfterMatchSkip, maxLen: Int,
      chunkRows: Int): DataFrame = {
    val spark = withDefs.sparkSession
    val sorted = withDefs.sort(orderCols.map(col): _*)
    val schema = sorted.schema
    val defIdx = defNames.map(v => v -> schema.fieldIndex(s"__def_$v")).toMap
    val outSchema = StructType(schema.fields)
      .add("match_num", LongType).add("classifier", StringType)
      .add(PosCol, LongType)

    val L = maxLen
    val C = math.max(chunkRows, 2 * L)
    val nd = node; val sk = skip; val dIdx = defIdx

    val indexed = sorted.rdd.zipWithIndex()
    // region rows -> own chunk; the first L rows of a chunk also feed the
    // previous chunk's overlap
    val byChunk = indexed.flatMap { case (row, g) =>
      val c = g / C
      val self = (c, (g, row))
      if (c > 0 && g % C < L) Seq((c - 1, (g, row)), self) else Seq(self)
    }
    val nPart = math.max(spark.sparkContext.defaultParallelism, 1)
    val grouped = byChunk.groupByKey(nPart)

    // pass 2 of 3: per chunk, entry-offset -> (global exit, match count)
    // via one backward memoized sweep (each region position attempts one
    // match; results chain through the skip recurrence)
    val tables = grouped.map { case (c, rows0) =>
      val rows = rows0.toArray.sortBy(_._1)
      val base = c * C
      val n = rows.length
      val regionEnd = math.min(C.toLong, n.toLong).toInt
      val has = (p: Int) => p >= 0 && p < n
      val sym = (p: Int, v: String) => rows(p)._2.getBoolean(dIdx(v))
      val partStart = if (c == 0L) 0 else Int.MinValue
      val exitArr = new Array[Int](regionEnd)
      val cntArr = new Array[Long](regionEnd)
      var p = regionEnd - 1
      while (p >= 0) {
        PatternRegex.matchAt(nd, p, has, sym, partStart) match {
          case Some(a) if a.nonEmpty =>
            val s2 = p + skipOffset(a, sk)
            exitArr(p) = if (s2 >= regionEnd) s2 else exitArr(s2)
            cntArr(p) = 1L + (if (s2 >= regionEnd) 0L else cntArr(s2))
          case _ =>
            exitArr(p) = if (p + 1 >= regionEnd) p + 1 else exitArr(p + 1)
            cntArr(p) = if (p + 1 >= regionEnd) 0L else cntArr(p + 1)
        }
        p -= 1
      }
      val exits = Array.tabulate(L + 1)(e =>
        if (e >= regionEnd) base + e else base + exitArr(e))
      val counts = Array.tabulate(L + 1)(e => if (e >= regionEnd) 0L else cntArr(e))
      (c, exits, counts)
    }

    // pass 3 of 3 (stitch): fold the tiny per-chunk tables sequentially —
    // one element per chunk in a single ordered task — resolving each
    // chunk's actual entry offset and cumulative match-number base
    val resolved = tables.sortBy(_._1).coalesce(1).mapPartitions { it =>
      var entry = 0L
      var matchBase = 0L
      it.map { case (c, exits, counts) =>
        val base = c * C
        val eLoc = (entry - base).toInt
        // scan can only enter a chunk within [0, L] of its region start
        // (the previous chunk's last match starts before the boundary and
        // spans at most L rows)
        val out = (c, (eLoc, matchBase))
        if (eLoc >= 0 && eLoc <= L) {
          matchBase += counts(eLoc)
          entry = exits(eLoc)
        }
        out
      }
    }

    val emitted = grouped.join(resolved, nPart).flatMap {
      case (c, (rows0, (eLoc, matchBase))) =>
        if (eLoc < 0 || eLoc > L) Iterator.empty
        else {
          val rows = rows0.toArray.sortBy(_._1)
          val n = rows.length
          val regionEnd = math.min(C.toLong, n.toLong).toInt
          val has = (p: Int) => p >= 0 && p < n
          val sym = (p: Int, v: String) => rows(p)._2.getBoolean(dIdx(v))
          val partStart = if (c == 0L) 0 else Int.MinValue
          val out = scala.collection.mutable.ArrayBuffer[Row]()
          var m = 0L
          var pos = eLoc
          while (pos < regionEnd) {
            PatternRegex.matchAt(nd, pos, has, sym, partStart) match {
              case Some(a) if a.nonEmpty =>
                m += 1
                val mn = matchBase + m
                var j = 0
                while (j < a.size) {
                  out += Row.fromSeq(rows(pos + j)._2.toSeq :+ mn :+ a(j) :+ j.toLong)
                  j += 1
                }
                pos += skipOffset(a, sk)
              case _ => pos += 1
            }
          }
          out.iterator
        }
    }
    spark.createDataFrame(emitted, outSchema)
      .drop(defNames.map(v => s"__def_$v"): _*)
  }

  /** ONE ROW PER MATCH: keys, match_num, start/end order-column values and
    * per-match row count. */
  def oneRowPerMatch(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
                     pattern: String, defines: Map[String, Column],
                     skipPastLastRow: Boolean = true): DataFrame =
    oneRowPerMatch(df, keys, orderCols, pattern, defines,
      if (skipPastLastRow) AfterMatchSkip.PastLastRow else AfterMatchSkip.ToNextRow)

  def oneRowPerMatch(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
                     pattern: String, defines: Map[String, Column],
                     skip: AfterMatchSkip): DataFrame = {
    val all = allRowsPerMatch(df, keys, orderCols, pattern, defines, skip)
    val oc = orderCols.head
    all.groupBy((keys :+ "match_num").map(col): _*)
      .agg(
        min(col(oc)).as(s"start_$oc"),
        max(col(oc)).as(s"end_$oc"),
        count(lit(1)).as("n_rows"))
  }

  /** MEASURES (reference rules 163-168): one output row per match carrying
    * the partition keys, `match_num`, and each named aggregate evaluated
    * over that match's rows. Measure Columns are ordinary Spark aggregate
    * expressions over the matched rows — `classifier` and the match-order
    * position are in scope via the [[Measures]] helpers, so the whole
    * per-match evaluation is one codegen'd hash-aggregate (the only shuffle
    * beyond the match itself, and it is keyed by (keys, match_num) so it
    * scales with match count, not row count). */
  def measures(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
               pattern: String, defines: Map[String, Column],
               ms: Seq[(String, Column)],
               skip: AfterMatchSkip = AfterMatchSkip.PastLastRow): DataFrame = {
    require(ms.nonEmpty, "MEASURES requires at least one measure")
    val all = matchedWithPos(df, keys, orderCols, pattern, defines, skip)
    val aggs = ms.map { case (name, c) => c.as(name) }
    all.groupBy((keys :+ "match_num").map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** ALL ROWS PER MATCH combined with MEASURES (reference WindowMatch,
    * /root/reference/server/sql_operator_sort.cpp:4323+; grammar allows the
    * combination, rules 162-194): every matched row is emitted with its
    * input columns, `match_num`, `classifier`, AND each measure evaluated
    * over the COMPLETE match duplicated onto the row — FINAL measure
    * semantics, matching the reference executor (the per-row classifier is
    * still available as the `classifier` column).
    *
    * Each measure Column must be a single aggregate call (e.g. the
    * [[Measures]] helpers); it is evaluated as a window aggregate over
    * (keys, match_num), so the whole operator adds ONE window Exchange over
    * the matched rows — no join back to a per-match aggregate (which would
    * re-run the match scan on the second plan branch), no second shuffle.
    * Compose/cast measures AFTER this operator (`LAST(v) - FIRST(v)` =
    * two measures and a post-select); the SQL front-end (GraftMrSql) lowers
    * compound measure expressions that way automatically. */
  def allRowsWithMeasures(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
                          pattern: String, defines: Map[String, Column],
                          ms: Seq[(String, Column)],
                          skip: AfterMatchSkip = AfterMatchSkip.PastLastRow): DataFrame = {
    require(ms.nonEmpty, "MEASURES requires at least one measure")
    val all = matchedWithPos(df, keys, orderCols, pattern, defines, skip)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((keys :+ "match_num").map(col): _*)
    ms.foldLeft(all) { case (d, (name, c)) => d.withColumn(name, c.over(w)) }
      .drop(PosCol)
  }

  /** Matches one key group, streaming: rows are pulled from the shared
    * BufferedIterator on demand (the non-matching head row is left for the
    * next group) and only the rows from the current match attempt's start to
    * the furthest row the NFA has probed stay buffered — so an unkeyed
    * (whole-container) series never materializes in memory; residency is
    * bounded by the longest attempted match, exactly the reference's
    * WindowMatch working set (/root/reference/server/sql_operator_sort.cpp:
    * 4323+). Output rows for a found match are emitted eagerly per match
    * (bounded by the match length), then the buffer advances to the skip
    * position. */
  private final class GroupMatcher(
      it: scala.collection.BufferedIterator[Row], keyIdx: Array[Int],
      node: PatternRegex.Node, defIdx: Map[String, Int],
      skip: AfterMatchSkip) extends Iterator[Row] {

    private val key: Array[Any] = keyIdx.map(it.head.get)
    private val buf = new scala.collection.mutable.ArrayDeque[Row]()
    private var base = 0          // group index of buf(0)
    private var ended = false     // group end observed on the input
    private var i = 0             // scan position (group index)
    private var matchNum = 0L
    private var out: Iterator[Row] = Iterator.empty

    /** Pull rows until group index `j` is resident; false once past the
      * group's last row. */
    private def has(j: Int): Boolean = {
      while (!ended && base + buf.size <= j) {
        if (it.hasNext && keyIdx.map(k => it.head.get(k)).sameElements(key))
          buf.append(it.next())
        else ended = true
      }
      j < base + buf.size
    }
    private def rowAt(j: Int): Row = buf(j - base)
    private def sym(j: Int, v: String): Boolean = rowAt(j).getBoolean(defIdx(v))
    private def advanceTo(j: Int): Unit = { buf.dropInPlace(j - base); base = j; i = j }

    override def hasNext: Boolean = {
      while (!out.hasNext && has(i)) {
        PatternRegex.matchAt(node, i, has _, sym _) match {
          case Some(assign) if assign.nonEmpty =>
            matchNum += 1
            val m = matchNum
            val s = i
            out = Vector.tabulate(assign.size) { j =>
              Row.fromSeq(rowAt(s + j).toSeq :+ m :+ assign(j) :+ j.toLong)
            }.iterator
            advanceTo(s + skipOffset(assign, skip))
          case _ => advanceTo(i + 1)
        }
      }
      // when the scan loop exits without output, has(i) has already pulled
      // and dropped every remaining group row — the shared iterator's head
      // is the next group's first row
      out.hasNext
    }
    override def next(): Row = { if (!hasNext) throw new NoSuchElementException; out.next() }
  }
}

/** Builders for MEASURES aggregate expressions (reference pattern-navigation
  * functions FIRST/LAST/CLASSIFIER/MATCH_NUMBER,
  * /root/reference/server/sql_type.h:193-198), for use inside
  * [[MatchRecognize.measures]]. */
object Measures {
  import MatchRecognize.PosCol

  /** FIRST(expr): `expr` on the match's first row (null stays null —
    * SQL:2016 row selection is positional; use [[firstOfVar]] to navigate
    * to a pattern variable's first row). */
  def firstVal(c: Column): Column = min_by(c, col(PosCol))

  /** LAST(expr): `expr` on the match's last row. */
  def lastVal(c: Column): Column = max_by(c, col(PosCol))

  /** FIRST(V.col): `c` on the first row mapped to `variable` — the row is
    * selected by classifier, so a genuinely-null value stays null. */
  def firstOfVar(variable: String, c: Column): Column =
    min_by(ofVar(variable, c), when(col("classifier") === variable, col(PosCol)))

  /** LAST(V.col): `c` on the last row mapped to `variable`. */
  def lastOfVar(variable: String, c: Column): Column =
    max_by(ofVar(variable, c), when(col("classifier") === variable, col(PosCol)))

  /** CLASSIFIER(): pattern variable of the last matched row. */
  def classifier: Column = max_by(col("classifier"), col(PosCol))

  /** MATCH_NUMBER(): constant within the group (it is a grouping key). */
  def matchNumber: Column = max(col("match_num"))

  /** Scope a column to rows matched as `variable` (VAR.col references):
    * e.g. `sum(Measures.ofVar("B", col("value")))` = SUM(B.value). */
  def ofVar(variable: String, c: Column): Column =
    when(col("classifier") === variable, c)
}

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
  * group is buffered — at 100 TB one series per key stays executor-local).
  *
  * AFTER MATCH SKIP PAST LAST ROW (default) or SKIP TO NEXT ROW.
  * Output = ALL ROWS PER MATCH: input columns + match_num (per key, 1-based)
  * + classifier (matched DEFINE variable). `oneRowPerMatch` aggregates that
  * into per-match summary rows.
  */
object MatchRecognize {

  def allRowsPerMatch(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
                      pattern: String, defines: Map[String, Column],
                      skipPastLastRow: Boolean = true): DataFrame = {
    require(orderCols.nonEmpty, "MATCH_RECOGNIZE requires ORDER BY")
    val node = PatternRegex.parse(pattern)
    val vars = PatternRegex.variables(node)
    vars.foreach(v => require(defines.contains(v), s"no DEFINE for pattern variable $v"))

    val defNames = defines.keys.toSeq.sorted
    val withDefs = defNames.foldLeft(df) { (d, v) =>
      d.withColumn(s"__def_$v", coalesce(defines(v).cast("boolean"), lit(false)))
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
    val skip = skipPastLastRow

    val matched = sorted.mapPartitions { it =>
      new Iterator[Row] {
        private val grouped = new GroupIterator(it, keyIdx)
        private var pending: Iterator[Row] = Iterator.empty
        override def hasNext: Boolean = {
          while (!pending.hasNext && grouped.hasNext) {
            pending = matchGroup(grouped.next())
          }
          pending.hasNext
        }
        override def next(): Row = { if (!hasNext) throw new NoSuchElementException; pending.next() }

        private def matchGroup(rows: Vector[Row]): Iterator[Row] = {
          val out = Vector.newBuilder[Row]
          val n = rows.size
          var i = 0
          var matchNum = 0L
          def sym(j: Int, v: String): Boolean = rows(j).getBoolean(defIdx(v))
          while (i < n) {
            PatternRegex.matchAt(node, i, n, sym) match {
              case Some(assign) if assign.nonEmpty =>
                matchNum += 1
                var j = 0
                while (j < assign.size) {
                  val r = rows(i + j)
                  out += Row.fromSeq(r.toSeq :+ matchNum :+ assign(j))
                  j += 1
                }
                i = if (skip) i + assign.size else i + 1
              case _ => i += 1
            }
          }
          out.result().iterator
        }
      }
    }(Encoders.row(outSchema))

    matched.drop(defNames.map(v => s"__def_$v"): _*)
  }

  /** ONE ROW PER MATCH: keys, match_num, start/end order-column values and
    * per-match row count. */
  def oneRowPerMatch(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
                     pattern: String, defines: Map[String, Column],
                     skipPastLastRow: Boolean = true): DataFrame = {
    val all = allRowsPerMatch(df, keys, orderCols, pattern, defines, skipPastLastRow)
    val oc = orderCols.head
    all.groupBy((keys :+ "match_num").map(col): _*)
      .agg(
        min(col(oc)).as(s"start_$oc"),
        max(col(oc)).as(s"end_$oc"),
        count(lit(1)).as("n_rows"))
  }

  /** Streams a sorted partition iterator as per-key row groups. */
  private final class GroupIterator(it: Iterator[Row], keyIdx: Array[Int])
      extends Iterator[Vector[Row]] {
    private var lookahead: Option[Row] = None
    override def hasNext: Boolean = lookahead.isDefined || it.hasNext
    override def next(): Vector[Row] = {
      val first = lookahead.getOrElse(it.next())
      lookahead = None
      val key = keyIdx.map(first.get)
      val buf = Vector.newBuilder[Row]
      buf += first
      var done = false
      while (!done && it.hasNext) {
        val r = it.next()
        if (keyIdx.map(r.get).sameElements(key)) buf += r
        else { lookahead = Some(r); done = true }
      }
      buf.result()
    }
  }
}

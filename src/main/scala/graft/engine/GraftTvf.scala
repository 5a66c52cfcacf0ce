package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Table-valued forms exposing the serving-path pipeline operators to SQL
  * and (through the injected [[GraftSqlParser]]) to every wire client —
  * r15 verdict #1: the reference's NewSQL engine is its JDBC-facing face
  * (/root/reference/server/sql_service.cpp:774), so parity means a
  * GridDB-migrating analyst on JDBC can reach the ANN and dedup-gate
  * surface, not just the §2 dialect. Both forms lower onto the SAME
  * oracle-checked kernels the Scala API uses ([[graft.pipeline.IvfIndex]]
  * .topK, [[graft.pipeline.ExactIndex]]/[[graft.pipeline.MinhashIndex]]
  * .dedupBatch) — q_sql_ann_topk and friends pin hash-identical results
  * against the Scala-path rows.
  *
  * Grammar (whole-statement, like the GROUP BY RANGE lowering):
  *
  * {{{
  * SELECT * FROM GRAFT_ANN_TOPK('<indexPath>', '<queries>', '<idCol>',
  *                              '<vecCol>', k [, nProbe]
  *                              [, '<predicate over index attr columns>'])
  *   [ORDER BY cols]
  *
  * SELECT * FROM GRAFT_DEDUP_GATE('<indexPath>', '<batch>', '<textCol>',
  *                                '<idCol>', '<exact|minhash>'
  *                                [, minEstSim]) [ORDER BY cols]
  * }}}
  *
  * `<queries>`/`<batch>` name a table/view, or carry a full SELECT (the
  * string is parsed through the session's own SQL front door, dialect
  * included). The ANN predicate is evaluated INSIDE the pruned index scan
  * exactly as the Scala path's `predicate` argument.
  */
object GraftTvf {

  private val tvfRe =
    """(?is)^\s*SELECT\s+\*\s+FROM\s+(GRAFT_ANN_TOPK|GRAFT_DEDUP_GATE)\s*\((.*)\)\s*(?:ORDER\s+BY\s+([\w\s,]+?))?\s*;?\s*$""".r
  private val mentionsRe = """(?i)\bGRAFT_(ANN_TOPK|DEDUP_GATE)\s*\(""".r

  /** Whole-statement TVF form — routed through [[run]]. */
  def matches(text: String): Boolean = tvfRe.pattern.matcher(text).matches()

  /** The statement carries a CALL-shaped TVF mention but not in the
    * supported form — routed to [[reject]] so the grammar diagnostic
    * reaches the injected-parser path too (review r16: Catalyst's
    * "could not resolve table-valued function" was all a JDBC client saw
    * for a projected-columns variant). Call-shaped (name + paren), so a
    * string literal merely naming the function stays out. */
  def mentions(text: String): Boolean =
    mentionsRe.findFirstIn(text).isDefined

  def reject(text: String): Nothing =
    throw new IllegalArgumentException(
      "unsupported GRAFT table-function form. Supported: SELECT * FROM " +
        "GRAFT_ANN_TOPK('<indexPath>', '<queries table or SELECT>', " +
        "'<idCol>', '<vecCol>', k [, nProbe] [, '<predicate>']) and " +
        "SELECT * FROM GRAFT_DEDUP_GATE('<indexPath>', '<batch table or " +
        "SELECT>', '<textCol>', '<idCol>', '<exact|minhash>' " +
        "[, minEstSim]), each optionally followed by ORDER BY")

  /** Strip one level of single quotes ('' unescapes to '). */
  private def unquote(s: String): Option[String] =
    if (s.length >= 2 && s.head == '\'' && s.last == '\'')
      Some(s.substring(1, s.length - 1).replace("''", "'"))
    else None

  private def str(args: Seq[String], i: Int, what: String): String =
    unquote(args(i)).getOrElse(throw new IllegalArgumentException(
      s"$what (argument ${i + 1}) must be a quoted string, got: ${args(i)}"))

  private def num(arg: String, what: String): Double =
    try arg.toDouble
    catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(s"$what must be numeric, got: $arg") }

  /** A table/view name resolves via the catalog; anything else is parsed
    * as a query through the session's SQL front door (dialect included —
    * the injected parser makes this recursion idempotent). */
  private def inputFrame(spark: SparkSession, s: String): DataFrame =
    if (s.matches("(?i)[A-Za-z_][\\w.]*")) spark.table(s) else spark.sql(s)

  def run(spark: SparkSession, text: String): DataFrame = text match {
    case tvfRe(fn, argText, orderBy) =>
      val args = GraftSql.splitArgs(argText)
      val out = fn.toUpperCase match {
        case "GRAFT_ANN_TOPK" => annTopK(spark, args)
        case "GRAFT_DEDUP_GATE" => dedupGate(spark, args)
      }
      Option(orderBy) match {
        case Some(cols) =>
          // each item: a bare column, optionally ASC/DESC (review r16: a
          // JDBC analyst's first instinct is ORDER BY cos DESC)
          val sorts = cols.split(",").map(_.trim).map { item =>
            item.split("\\s+").toSeq match {
              case Seq(c) => col(c)
              case Seq(c, dir) if dir.equalsIgnoreCase("ASC") => col(c).asc
              case Seq(c, dir) if dir.equalsIgnoreCase("DESC") => col(c).desc
              case _ => throw new IllegalArgumentException(
                s"unsupported ORDER BY item '$item' after a GRAFT table " +
                  "function: use <column> [ASC|DESC]")
            }
          }
          out.orderBy(sorts.toSeq: _*)
        case None => out
      }
    case _ => reject(text)
  }

  private def annTopK(spark: SparkSession, args: Seq[String]): DataFrame = {
    require(args.size >= 5 && args.size <= 7,
      s"GRAFT_ANN_TOPK takes 5-7 arguments, got ${args.size}")
    val path = str(args, 0, "index path")
    val queries = inputFrame(spark, str(args, 1, "queries"))
    val idCol = str(args, 2, "id column")
    val vecCol = str(args, 3, "vector column")
    val k = num(args(4), "k").toInt
    // optional tail: a bare number is nProbe, a quoted string the predicate
    val tail = args.drop(5)
    val nProbe = tail.find(unquote(_).isEmpty)
      .map(a => num(a, "nProbe").toInt).getOrElse(4)
    val predicate = tail.flatMap(unquote).headOption.map(expr)
    require(tail.count(unquote(_).isEmpty) <= 1 && tail.flatMap(unquote).size <= 1,
      "GRAFT_ANN_TOPK optional arguments are [nProbe][, 'predicate'] — one of each")
    graft.pipeline.IvfIndex.topK(spark, path, queries, idCol, vecCol, k,
      nProbe = nProbe, predicate = predicate)
  }

  private def dedupGate(spark: SparkSession, args: Seq[String]): DataFrame = {
    require(args.size == 5 || args.size == 6,
      s"GRAFT_DEDUP_GATE takes 5-6 arguments, got ${args.size}")
    val path = str(args, 0, "index path")
    val textCol = str(args, 2, "text column")
    val idCol = str(args, 3, "id column")
    // validate the kind BEFORE resolving the batch frame, so a typo'd kind
    // reports itself instead of a table-resolution error
    val kind = str(args, 4, "gate kind").toLowerCase
    require(kind == "exact" || kind == "minhash",
      s"unknown dedup gate kind '$kind' (exact|minhash)")
    val batch = inputFrame(spark, str(args, 1, "batch"))
    kind match {
      case "exact" =>
        require(args.size == 5, "the exact gate takes no minEstSim")
        graft.pipeline.ExactIndex.dedupBatch(batch, textCol, idCol, path)
      case "minhash" =>
        val minEstSim =
          if (args.size == 6) num(args(5), "minEstSim") else 0.5
        graft.pipeline.MinhashIndex.dedupBatch(batch, textCol, idCol, path,
          minEstSim)
    }
  }
}

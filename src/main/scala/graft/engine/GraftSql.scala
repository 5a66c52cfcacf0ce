package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** GridDB-dialect SQL entry point: accepts GridDB hint comments and maps
  * them onto Spark's hint surface before handing the text to Catalyst.
  *
  * Reference hints (SQLHint::Id /root/reference/server/sql_compiler.h:34-66,
  * grammar rules 124-141): MAX_DEGREE_OF_PARALLELISM, DISTRIBUTED_POLICY,
  * INDEX_SCAN/NO_INDEX_SCAN, INDEX_JOIN/NO_INDEX_JOIN, LEADING,
  * COST_BASED_JOIN, TABLE_ROW_COUNT.
  *
  * Mapping: INDEX_JOIN(t) -> BROADCAST(t) (index-driven join's closest Spark
  * analogue is broadcasting the probe side); NO_INDEX_JOIN -> MERGE;
  * LEADING is honored by Catalyst's CostBasedJoinReorder, so it is dropped;
  * scan/parallelism/row-count hints have no Spark equivalent and are
  * stripped (Catalyst + AQE own those decisions). Unknown hints are removed
  * rather than erroring — GridDB also treats hints as advisory.
  */
object GraftSql {

  private val hintBlock = """(?s)/\*\+(.*?)\*/""".r
  private val hintCall = """(?i)([A-Z_]+)\s*(\(([^)]*)\))?""".r

  /** Translate one GridDB hint body into Spark hint calls. */
  private[engine] def translateHints(body: String): Seq[String] =
    hintCall.findAllMatchIn(body).toSeq.flatMap { m =>
      val name = m.group(1).toUpperCase
      val args = Option(m.group(3)).getOrElse("").trim
      name match {
        case "INDEX_JOIN" if args.nonEmpty => Some(s"BROADCAST($args)")
        case "NO_INDEX_JOIN" if args.nonEmpty => Some(s"MERGE($args)")
        case "MAX_DEGREE_OF_PARALLELISM" | "MAX_DEGREE_OF_TASK_INPUT" |
             "MAX_DEGREE_OF_EXPANSION" | "DISTRIBUTED_POLICY" |
             "INDEX_SCAN" | "NO_INDEX_SCAN" | "LEADING" | "COST_BASED_JOIN" |
             "NO_COST_BASED_JOIN" | "TABLE_ROW_COUNT" | "LEGACY_PLAN" => None
        case _ => None
      }
    }

  /** Rewrite GridDB hint comments into Spark hints (or strip them). */
  def rewrite(sql: String): String =
    hintBlock.replaceAllIn(sql, m => {
      val spark = translateHints(m.group(1))
      if (spark.isEmpty) "" else s"/*+ ${spark.mkString(", ")} */"
    })

  def sql(spark: SparkSession, text: String): DataFrame =
    spark.sql(rewrite(text))
}

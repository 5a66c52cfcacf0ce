package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Textual lowering of GridDB's MATCH_RECOGNIZE SQL clause (grammar rules
  * 162-194, /root/reference/server/sql_internal_parser.cpp:996-1028) onto
  * graft.mr.MatchRecognize.
  *
  * Supported form:
  * {{{
  * SELECT * FROM <table> MATCH_RECOGNIZE (
  *   [PARTITION BY c1, c2]
  *   ORDER BY o1 [, o2 ...]
  *   [MEASURES m1 AS n1, m2 AS n2, ...]
  *   [ALL ROWS PER MATCH | ONE ROW PER MATCH]
  *   [AFTER MATCH SKIP PAST LAST ROW | AFTER MATCH SKIP TO NEXT ROW
  *    | AFTER MATCH SKIP TO [FIRST | LAST] <var>]
  *   PATTERN ( <row-pattern regex> )
  *   DEFINE V1 AS <cond>, V2 AS <cond> ...
  * )
  * }}}
  * DEFINE conditions are Spark SQL boolean expressions over the row; the
  * pattern-navigation calls `PREV(col [, n])` / `NEXT(col [, n])`
  * (FUNC_PREV/FUNC_NEXT, /root/reference/server/sql_type.h:195-196) are
  * supported and translated to `lag`/`lead` windows over (PARTITION BY,
  * ORDER BY) — physical navigation over the input stream, evaluated before
  * the match, which matches the reference's single-pass semantics.
  *
  * MEASURES (reference rules 163-168) defaults to ONE ROW PER MATCH output:
  * partition keys + match_num + the measures. With ALL ROWS PER MATCH, the
  * per-match (FINAL) measure values are instead duplicated onto every
  * matched row alongside the input columns, match_num and classifier —
  * the reference executor's combination semantics (WindowMatch,
  * /root/reference/server/sql_operator_sort.cpp:4323). Measure expressions
  * may use the pattern-navigation functions `FIRST(col)`, `LAST(col)`,
  * `CLASSIFIER()`, `MATCH_NUMBER()` (reference
  * /root/reference/server/sql_type.h:193-198), un-nested `PREV(col[, n])` /
  * `NEXT(col[, n])` (SQL:2016: measure-side physical navigation evaluates
  * at the match's LAST row), and var-scoped column references `VAR.col`
  * inside ordinary aggregates (e.g. `SUM(B.value)`), which lower to
  * classifier-filtered aggregates.
  */
object GraftMrSql {

  private val mrRe =
    """(?is)^\s*SELECT\s+\*\s+FROM\s+(\w+)\s+MATCH_RECOGNIZE\s*\((.*)\)\s*;?\s*$""".r
  private val partRe = """(?is)PARTITION\s+BY\s+(.*?)(?=ORDER\s+BY|PATTERN|MEASURES|ALL\s+ROWS|ONE\s+ROW|AFTER\s+MATCH|DEFINE|$)""".r
  private val orderRe = """(?is)ORDER\s+BY\s+(.*?)(?=PATTERN|MEASURES|ALL\s+ROWS|ONE\s+ROW|AFTER\s+MATCH|DEFINE|$)""".r
  private val measuresRe = """(?is)MEASURES\s+(.*?)(?=ALL\s+ROWS|ONE\s+ROW|AFTER\s+MATCH|PATTERN|DEFINE|$)""".r
  private val patternRe = """(?is)PATTERN\s*\(((?:[^()]|\([^()]*\))*)\)""".r
  private val defineRe = """(?is)DEFINE\s+(.*)$""".r
  private val oneRowRe = """(?is)ONE\s+ROW\s+PER\s+MATCH""".r
  private val allRowsRe = """(?is)ALL\s+ROWS\s+PER\s+MATCH""".r
  private val skipNextRe = """(?is)AFTER\s+MATCH\s+SKIP\s+TO\s+NEXT\s+ROW""".r
  private val skipToVarRe =
    """(?is)AFTER\s+MATCH\s+SKIP\s+TO\s+(?:(LAST|FIRST)\s+)?(\w+)""".r
  private val prevRe = """(?i)PREV\s*\(\s*(\w+)\s*(?:,\s*(\d+)\s*)?\)""".r
  private val nextRe = """(?i)NEXT\s*\(\s*(\w+)\s*(?:,\s*(\d+)\s*)?\)""".r
  private val classifierRe = """(?i)CLASSIFIER\s*\(\s*\)""".r
  private val matchNumberRe = """(?i)MATCH_NUMBER\s*\(\s*\)""".r

  def matches(sql: String): Boolean = mrRe.findFirstIn(sql).isDefined

  /** The statement references MATCH_RECOGNIZE at all (supported or not). */
  def mentions(sql: String): Boolean =
    """(?is)\bMATCH_RECOGNIZE\b""".r.findFirstIn(sql).isDefined

  /** MATCH_RECOGNIZE present but not in the supported lowering form — fail
    * with a diagnostic naming the limitation instead of handing the clause
    * to Catalyst (which has no MATCH_RECOGNIZE and errors unhelpfully). */
  def reject(sql: String): Nothing = {
    val why =
      if ("""(?is)\bFROM\s*\(""".r.findFirstIn(sql).isDefined)
        "a subquery in FROM is not supported with MATCH_RECOGNIZE"
      else if ("""(?is)\bJOIN\b""".r.findFirstIn(sql).isDefined)
        "a JOIN in FROM is not supported with MATCH_RECOGNIZE"
      else if ("""(?is)^\s*SELECT\s+\*""".r.findFirstIn(sql).isEmpty)
        "only SELECT * is supported over MATCH_RECOGNIZE (project afterwards)"
      else
        "statement does not match the supported form"
    throw new IllegalArgumentException(
      "unsupported MATCH_RECOGNIZE form: " + why + ". Supported: " +
        "SELECT * FROM <table> MATCH_RECOGNIZE ([PARTITION BY ...] ORDER BY " +
        "... [MEASURES ...] [ONE|ALL ROWS PER MATCH] [AFTER MATCH SKIP ...] " +
        "PATTERN (...) DEFINE ...)")
  }

  def run(spark: SparkSession, sql: String): DataFrame = sql match {
    case mrRe(table, body) =>
      val keys = partRe.findFirstMatchIn(body)
        .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
      val orderCols = orderRe.findFirstMatchIn(body)
        .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(throw new IllegalArgumentException("MATCH_RECOGNIZE requires ORDER BY"))
      val pattern = patternRe.findFirstMatchIn(body)
        .map(_.group(1).trim)
        .getOrElse(throw new IllegalArgumentException("MATCH_RECOGNIZE requires PATTERN"))
      val defBody = defineRe.findFirstMatchIn(body)
        .map(_.group(1).trim)
        .getOrElse(throw new IllegalArgumentException("MATCH_RECOGNIZE requires DEFINE"))
      val oneRow = oneRowRe.findFirstIn(body).isDefined
      val skip: graft.mr.MatchRecognize.AfterMatchSkip =
        if (skipNextRe.findFirstIn(body).isDefined)
          graft.mr.MatchRecognize.AfterMatchSkip.ToNextRow
        else skipToVarRe.findFirstMatchIn(body) match {
          case Some(m) =>
            // SKIP TO var ≡ SKIP TO LAST var; SKIP TO FIRST var resumes at
            // the variable's first matched row (reference rule 174)
            if ("FIRST".equalsIgnoreCase(m.group(1)))
              graft.mr.MatchRecognize.AfterMatchSkip.ToFirstVar(m.group(2))
            else
              graft.mr.MatchRecognize.AfterMatchSkip.ToVar(m.group(2))
          case None => graft.mr.MatchRecognize.AfterMatchSkip.PastLastRow
        }

      var df = spark.table(table)
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(orderCols.map(col): _*)

      // translate PREV(col[, n]) / NEXT(col[, n]) -> materialized lag/lead
      // columns (FUNC_PREV/FUNC_NEXT, /root/reference/server/sql_type.h:195-196).
      // Both are PHYSICAL navigation over the input stream (SQL:2016): the
      // offset row comes from the ordered partition, matched or not, so a
      // pre-match window materialization is exact. NEXT at the partition
      // tail is NULL — a DEFINE condition over it is UNKNOWN and the row
      // does not satisfy the variable (MatchRecognizeSpec pins this).
      var prevCols = Map.empty[(String, Int, Boolean), String]
      def translateNav(cond: String): String = {
        val p = prevRe.replaceAllIn(cond, m => {
          val (c, n) = (m.group(1), Option(m.group(2)).map(_.toInt).getOrElse(1))
          prevCols.getOrElse((c, n, false), {
            val nm = s"__prev_${c}_$n"
            prevCols += ((c, n, false) -> nm)
            nm
          })
        })
        nextRe.replaceAllIn(p, m => {
          val (c, n) = (m.group(1), Option(m.group(2)).map(_.toInt).getOrElse(1))
          prevCols.getOrElse((c, n, true), {
            val nm = s"__next_${c}_$n"
            prevCols += ((c, n, true) -> nm)
            nm
          })
        })
      }

      // DEFINE V AS cond, V2 AS cond2 ... (split on top-level commas)
      val defs = GraftSql.splitSelectList(defBody).map { d =>
        val parts = d.split("(?i)\\s+AS\\s+", 2)
        require(parts.length == 2, s"bad DEFINE entry: $d")
        parts(0).trim -> translateNav(parts(1).trim)
      }

      // PREV/NEXT in MEASURES (SQL:2016 6.4: physical offset over the
      // input stream, evaluated with the mode's default navigation
      // semantics). ONE ROW PER MATCH: FINAL — PREV(c, n) lowers to
      // LAST(__prev_c_n), the materialized lag/lead column read at the
      // match's last row, which translateMeasure turns into its
      // max_by-by-pos aggregate. ALL ROWS PER MATCH: RUNNING — each output
      // row sees the nav value AT THAT ROW, so the measure references the
      // materialized column directly (r11 ADVICE: wrapping in LAST here
      // silently gave last-row-only values on every row).
      val allRows = allRowsRe.findFirstIn(body).isDefined
      def translateMeasureNav(e: String): String = {
        val p = prevRe.replaceAllIn(e, m => {
          val (c, n) = (m.group(1), Option(m.group(2)).map(_.toInt).getOrElse(1))
          val nm = prevCols.getOrElse((c, n, false), {
            val v = s"__prev_${c}_$n"; prevCols += ((c, n, false) -> v); v
          })
          if (allRows) nm else s"LAST($nm)"
        })
        nextRe.replaceAllIn(p, m => {
          val (c, n) = (m.group(1), Option(m.group(2)).map(_.toInt).getOrElse(1))
          val nm = prevCols.getOrElse((c, n, true), {
            val v = s"__next_${c}_$n"; prevCols += ((c, n, true) -> v); v
          })
          if (allRows) nm else s"LAST($nm)"
        })
      }

      // MEASURES m AS n, ... (rules 163-168; bare measures get m1, m2, ...)
      val measureAsRe = """(?is)^(.*)\s+AS\s+(\w+)\s*$""".r
      val ms: Seq[(String, String)] =
        measuresRe.findFirstMatchIn(body).map(_.group(1).trim) match {
          case Some(mtext) if mtext.nonEmpty =>
            GraftSql.splitSelectList(mtext).zipWithIndex.map {
              case (measureAsRe(e, n), _) => n.trim -> translateMeasureNav(e.trim)
              case (e, idx) => s"m${idx + 1}" -> translateMeasureNav(e.trim)
            }
          case _ => Nil
        }

      // materialize AFTER both DEFINE and MEASURES registered their nav
      // columns (measures may add offsets the conditions never used)
      prevCols.foreach { case ((c, n, isNext), nm) =>
        df = df.withColumn(nm,
          (if (isNext) lead(col(c), n) else lag(col(c), n)).over(w))
      }
      val defines = defs.map { case (v, cond) => v -> expr(cond) }.toMap
      val varNames = defs.map(_._1)

      val out =
        if (ms.nonEmpty && allRows) {
          // ALL ROWS PER MATCH + MEASURES (reference combination, rules
          // 162-194; executor duplicates the per-match measure values onto
          // every matched row — FINAL semantics): each aggregate inside the
          // translated measure is windowized over (keys, match_num), so
          // compound measures (LAST(v) - FIRST(v)) lower to arithmetic over
          // window aggregates and the operator costs one window Exchange
          val partText = (keys :+ "match_num").mkString(", ")
          val all = graft.mr.MatchRecognize.matchedWithPos(
            df, keys, orderCols, pattern, defines, skip)
          ms.foldLeft(all) { case (d, (n, e)) =>
            d.withColumn(n,
              expr(windowizeAggs(translateMeasure(e, varNames), partText)))
          }.drop(graft.mr.MatchRecognize.PosCol)
        } else if (ms.nonEmpty) {
          val cols = ms.map { case (n, e) =>
            n -> expr(translateMeasure(e, varNames))
          }
          graft.mr.MatchRecognize.measures(df, keys, orderCols, pattern, defines, cols, skip)
        } else if (oneRow)
          graft.mr.MatchRecognize.oneRowPerMatch(df, keys, orderCols, pattern, defines, skip)
        else
          graft.mr.MatchRecognize.allRowsPerMatch(df, keys, orderCols, pattern, defines, skip)
      out.drop(prevCols.values.toSeq: _*)

    case _ => throw new IllegalArgumentException("not a MATCH_RECOGNIZE statement")
  }

  /** Replace every `fname(<balanced args>)` call in `s` (nested parens
    * allowed, unlike a regex) with `wrap(args)`; args are rewritten first so
    * nested calls compose. The call token itself is located with the same
    * quote parity used for paren counting, so `first(x)` inside a
    * single-quoted SQL string literal (with '' escapes — each ' flips
    * parity, a doubled '' flips twice and stays inside) is left alone. */
  private def replaceCall(s: String, fname: String, wrap: String => String): String = {
    val token = s"(?i)\\b$fname\\s*\\(".r
    val hit = token.findAllMatchIn(s).find { m =>
      var quotes = 0; var i = 0
      while (i < m.start) { if (s(i) == '\'') quotes += 1; i += 1 }
      quotes % 2 == 0
    }
    hit match {
      case None => s
      case Some(m) =>
        var depth = 1; var i = m.end; var inQuote = false
        while (i < s.length && depth > 0) {
          s(i) match {
            case '\'' => inQuote = !inQuote
            case '(' if !inQuote => depth += 1
            case ')' if !inQuote => depth -= 1
            case _ =>
          }
          i += 1
        }
        require(depth == 0, s"unbalanced parentheses in $fname(...) of '$s'")
        val inner = replaceCall(s.substring(m.end, i - 1).trim, fname, wrap)
        s.substring(0, m.start) + wrap(inner) + replaceCall(s.substring(i), fname, wrap)
    }
  }

  private val varColRe = """^(\w+)\.(\w+)$""".r

  /** Aggregate heads a translated MEASURES expression can contain (the nav
    * translations emit min_by/max_by/max; user measures use the reference's
    * aggregate set). Closed set on purpose: windowization must touch exactly
    * the aggregate calls, and the reference grammar's MEASURES aggregates
    * are enumerable (sql_internal_parser.cpp rules 163-168). */
  private val aggHeads = Seq(
    "min_by", "max_by", "stddev_samp", "stddev_pop", "var_samp", "var_pop",
    "stddev", "variance", "avg", "sum", "count", "min", "max",
    "first", "last", "collect_list", "collect_set")

  /** Rewrite every aggregate call in `e` to a window aggregate over
    * `PARTITION BY partText` — the ALL ROWS PER MATCH + MEASURES lowering:
    * the measure keeps its compound shape (arithmetic over aggregates is
    * fine once each aggregate is a window function) and evaluates per
    * (keys, match_num) frame, duplicated onto every row of the match. */
  private def windowizeAggs(e: String, partText: String): String =
    aggHeads.foldLeft(e) { (t, fn) =>
      replaceCall(t, fn, inner => s"$fn($inner) OVER (PARTITION BY $partText)")
    }

  /** Lower a MEASURES expression to a Spark SQL aggregate over the match's
    * rows. `FIRST(V.col)` / `LAST(V.col)` navigate by pattern variable: the
    * value of the first/last row MAPPED TO V (null stays null, SQL:2016
    * semantics — the row selection is by classifier, not value-nullness);
    * unscoped `FIRST(expr)` is the match's first row's value. CLASSIFIER /
    * MATCH_NUMBER become their per-match aggregates, and bare `VAR.col`
    * inside other aggregates references classifier-filtered columns (so
    * `SUM(B.value)` sums only B-rows). */
  private def translateMeasure(e: String, vars: Seq[String]): String = {
    val pos = graft.mr.MatchRecognize.PosCol
    def nav(agg: String)(a: String): String = a match {
      case varColRe(v0, c) if vars.exists(_.equalsIgnoreCase(v0)) =>
        val v = vars.find(_.equalsIgnoreCase(v0)).get // classifier holds the DEFINE spelling
        s"$agg(CASE WHEN classifier = '$v' THEN $c END, CASE WHEN classifier = '$v' THEN $pos END)"
      case other => s"$agg($other, $pos)"
    }
    var t = replaceCall(e, "FIRST", nav("min_by"))
    t = replaceCall(t, "LAST", nav("max_by"))
    t = classifierRe.replaceAllIn(t, s"max_by(classifier, $pos)")
    t = matchNumberRe.replaceAllIn(t, "max(match_num)")
    for (v <- vars)
      t = t.replaceAll(s"(?i)\\b$v\\.(\\w+)",
        s"(CASE WHEN classifier = '$v' THEN $$1 END)")
    t
  }
}

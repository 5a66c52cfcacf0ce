package graft.queries

import scala.util.Random

/** Seeded TQL grammar fuzz queries, driver-oracle-checked.
  *
  * The SQL fuzzer (FuzzQueries) differentially checks the GraftSql path;
  * this one covers the OTHER front door — TQL parse -> compile ->
  * DataFrame — whose hand-written queries exercise each grammar rule once.
  * Each seed draws ONE random query as an AST-shaped pair: the TQL text
  * and the equivalent DuckDB SQL are generated from the same draw, so any
  * hash mismatch is a TQL parser/compiler bug (or a genuine semantics
  * divergence), never a generator skew.
  *
  * Comparison-soundness rules (same discipline as FuzzQueries):
  *  - predicates are guarded `value is not null and (...)` so three-valued
  *    XOR/NOT never feeds an engine-specific null-ordering path;
  *  - `SELECT *` results are projected to (event_id, user_id, event_type,
  *    value) — the timestamp column is compared via epoch in the
  *    hand-written queries already, and fuzz adds nothing there;
  *  - ORDER BY always ends on the unique event_id, a total order;
  *  - aggregates are COUNT/MIN/MAX only (exact under both engines; AVG
  *    and double-SUM reassociate).
  */
object TqlFuzz {

  private def pick[T](r: Random, xs: Vector[T]): T = xs(r.nextInt(xs.size))

  /** One predicate as (tql, duck). */
  private def pred(r: Random, depth: Int = 0): (String, String) = {
    val atom: (String, String) = r.nextInt(6) match {
      case 0 =>
        val op = pick(r, Vector("<", "<=", ">", ">=", "<>"))
        val v = 50 + r.nextInt(150)
        (s"value $op $v.0", s"value $op $v.0")
      case 1 =>
        val k = r.nextInt(7) + 2; val m = r.nextInt(2)
        (s"user_id % $k = $m", s"user_id % $k = $m")
      case 2 =>
        val p = pick(r, Vector("s%", "c%", "%or%", "%k"))
        (s"event_type like '$p'", s"event_type LIKE '$p'")
      case 3 =>
        val d = 10 + r.nextInt(10)
        (s"ts >= TIMESTAMP('2024-01-${d}T00:00:00Z')",
          s"ts >= TIMESTAMP '2024-01-$d 00:00:00'")
      case 4 =>
        val t = pick(r, Vector("click", "view", "scroll", "error"))
        (s"event_type = '$t'", s"event_type = '$t'")
      case _ =>
        val v = 100 + r.nextInt(100)
        (s"not (value > $v.0)", s"NOT (value > $v.0)")
    }
    if (depth >= 2 || r.nextInt(3) == 0) atom
    else {
      val (tl, dl) = atom
      val (tr, dr) = pred(r, depth + 1)
      r.nextInt(3) match {
        case 0 => (s"($tl and $tr)", s"($dl AND $dr)")
        // XOR: TQL keyword; DuckDB spells boolean xor as <>
        case 1 => (s"($tl xor $tr)", s"(($dl) <> ($dr))")
        case _ => (s"($tl or $tr)", s"($dl OR $dr)")
      }
    }
  }

  /** Generate (tql, duckSql) for a seed — a pure function of the seed;
    * widening the set means ADDING seeds, never reinterpreting old ones. */
  private[graft] def gen(seed: Int): (String, String) = {
    val r = new Random(seed)
    val (tp, dp) = pred(r)
    val guardT = s"value is not null and $tp"
    val guardD = s"value IS NOT NULL AND $dp"
    r.nextInt(3) match {
      case 0 => // SELECT * with order/limit/offset
        val desc = r.nextBoolean()
        val lim = 20 + r.nextInt(80)
        val off = if (r.nextBoolean()) r.nextInt(20) else 0
        val dir = if (desc) "desc" else "asc"
        val offT = if (off > 0) s" offset $off" else ""
        val offD = if (off > 0) s" OFFSET $off" else ""
        (s"select * where $guardT order by event_id $dir limit $lim$offT",
          s"SELECT event_id, user_id, event_type, value FROM events " +
            s"WHERE $guardD ORDER BY event_id ${dir.toUpperCase} LIMIT $lim$offD")
      case 1 => // COUNT(*)
        (s"select count(*) where $guardT",
          s"SELECT COUNT(*) AS count FROM events WHERE $guardD")
      case _ => // MIN/MAX
        val fn = pick(r, Vector("min", "max"))
        val c = pick(r, Vector("value", "user_id", "event_id"))
        (s"select $fn($c) where $guardT",
          s"SELECT ${fn.toUpperCase}($c) AS $fn FROM events WHERE $guardD")
    }
  }

  /** TS-selection-function fuzz: TIME_PREV/NEXT(_ONLY) at random probes
    * under random predicates, MAX_ROWS/MIN_ROWS, and TIME_WINDOW_AGG with
    * random exact aggregates/grids — the most custom compiled paths in
    * the engine. Sound because the events container's ts is UNIQUE (the
    * GridDB TimeSeries row key), so the at-most-one-row selections need
    * no tie-break in either engine. Exact aggregates only (MIN/MAX/COUNT)
    * — bucket SUM/AVG of doubles reassociates differently per engine. */
  private[graft] def genTs(seed: Int): (String, String) = {
    val r = new Random(0x7501 + seed)
    val (tp, dp) = pred(r)
    val guardT = s"value is not null and $tp"
    val guardD = s"value IS NOT NULL AND $dp"
    val d = 2 + r.nextInt(26); val h = r.nextInt(24)
    val probeT = f"2024-01-$d%02dT$h%02d:30:00Z"
    val probeD = f"2024-01-$d%02d $h%02d:30:00"
    r.nextInt(8) match {
      case c @ (0 | 1 | 2 | 3) =>
        val (fn, cmp, dir) = c match {
          case 0 => ("time_prev", "<=", "DESC")
          case 1 => ("time_next", ">=", "ASC")
          case 2 => ("time_prev_only", "<", "DESC")
          case _ => ("time_next_only", ">", "ASC")
        }
        (s"select $fn(TIMESTAMP('$probeT')) where $guardT",
          s"SELECT event_id, user_id, event_type, value FROM events " +
            s"WHERE $guardD AND ts $cmp TIMESTAMP '$probeD' " +
            s"ORDER BY ts $dir LIMIT 1")
      case c @ (4 | 5) =>
        val (fn, mm) = if (c == 4) ("max_rows", "MAX") else ("min_rows", "MIN")
        (s"select $fn(value) where $guardT",
          s"SELECT event_id, user_id, event_type, value FROM events " +
            s"WHERE $guardD AND value = (SELECT $mm(value) FROM events WHERE $guardD)")
      case _ =>
        val agg = pick(r, Vector("MIN", "MAX", "COUNT"))
        val iv = pick(r, Vector(6, 12, 24)); val ivMs = iv * 3600000L
        val startMs = 1704067200000L // 2024-01-01T00:00:00Z
        val endD = 10 + r.nextInt(20)
        // day-of-month endD is (endD - 1) days after Jan 1
        val endMs = startMs + (endD - 1) * 86400000L
        val alias = agg.toLowerCase
        val dAgg = if (agg == "COUNT") "COUNT(value)" else s"$agg(value)"
        (s"select time_window_agg(value, $agg, TIMESTAMP('2024-01-01T00:00:00Z'), " +
            s"TIMESTAMP('2024-01-${endD}T00:00:00Z'), $iv, HOUR)",
          s"SELECT $startMs + (epoch_ms(ts) - $startMs) // $ivMs * $ivMs AS ts_ms, " +
            s"$dAgg AS $alias FROM events " +
            s"WHERE epoch_ms(ts) >= $startMs AND epoch_ms(ts) <= $endMs " +
            s"GROUP BY 1 ORDER BY 1")
    }
  }

  /** r14 grammar-cluster fuzz: bit ops, NAN/INF literals, ORDER BY
    * expressions, general IS, qualified FROM — the forms the r13 verdict
    * found missing (tql.cpp rules 16-77). A NEW generator so the shipped
    * gen/genTs seed draws stay pinned. The DuckDB side parenthesizes the
    * grouping the TQL precedence rules are SUPPOSED to produce, so a
    * precedence bug in the parser is a hash mismatch, not a generator skew.
    * Shift counts stay in 0..8 (user_id <= 149: no overflow ambiguity;
    * DuckDB zeroes shifts >= 64 where Java masks — never drawn). */
  private[graft] def genGrammar(seed: Int): (String, String) = {
    val r = new Random(0x6214 + seed)
    // one bit-op atom: (tqlUnparenthesized, duckParenthesized)
    def bitAtom(): (String, String) = r.nextInt(4) match {
      case 0 =>
        val k = 1 + r.nextInt(15); val m = r.nextInt(k + 1)
        (s"user_id & $k = $m", s"(user_id & $k) = $m")
      case 1 =>
        val sft = r.nextInt(5); val k = 1 + r.nextInt(7); val m = r.nextInt(2)
        (s"user_id >> $sft & $k = $m", s"((user_id >> $sft) & $k) = $m")
      case 2 =>
        val sft = 1 + r.nextInt(4); val v = 40 + r.nextInt(400)
        (s"user_id << $sft > $v", s"(user_id << $sft) > $v")
      case _ =>
        val k = 1 + r.nextInt(15); val v = 20 + r.nextInt(160)
        (s"(user_id | $k) <= $v", s"(user_id | $k) <= $v")
    }
    val (bt, bd) = bitAtom()
    // guard drawn unconditionally (seed-stability discipline)
    val guardKind = r.nextInt(3)
    val (gt, gd) = guardKind match {
      case 0 => ("value < INF", "value < 'Infinity'::DOUBLE")
      case 1 => ("value <> NAN", "value <> 'NaN'::DOUBLE")
      case _ => ("(value is null) = false", "(value IS NULL) = FALSE")
    }
    val fromT = if (r.nextBoolean()) " from public.events" else ""
    r.nextInt(3) match {
      case 0 => // SELECT * + ORDER BY expression
        val lim = 20 + r.nextInt(60)
        val negate = r.nextBoolean()
        val (ot, od) =
          if (negate) ("value * -1.0 asc", "value * -1.0 ASC")
          else {
            val k = 2 + r.nextInt(5)
            (s"user_id % $k asc", s"user_id % $k ASC")
          }
        (s"select *$fromT where $gt and $bt order by $ot, event_id desc limit $lim",
          s"SELECT event_id, user_id, event_type, value FROM events " +
            s"WHERE $gd AND $bd ORDER BY $od, event_id DESC LIMIT $lim")
      case 1 => // COUNT(*) with a general-IS wrapper
        val v = 50 + r.nextInt(150)
        (s"select count(*)$fromT where (value > $v.0 is not null) and $bt",
          s"SELECT COUNT(*) AS count FROM events " +
            s"WHERE ((value > $v.0) IS NOT NULL) AND $bd")
      case _ => // MIN/MAX over a bit-filtered set
        val fn = pick(r, Vector("min", "max"))
        val c = pick(r, Vector("value", "user_id", "event_id"))
        (s"select $fn($c)$fromT where $gt and $bt",
          s"SELECT ${fn.toUpperCase}($c) AS $fn FROM events WHERE $gd AND $bd")
    }
  }

  private val seeds: Seq[Int] = 0 until 12
  private val tsSeeds: Seq[Int] = 0 until 10
  private val grammarSeeds: Seq[Int] = 0 until 12

  /** Shared by the registered queries AND FuzzSweep's dump blocks — the
    * comparison-soundness projection (`select *` → the 4 compared
    * columns) must live in ONE place (r14 review). */
  private[graft] def runTql(spark: org.apache.spark.sql.SparkSession, dir: String,
                            tql: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val out = graft.tql.TqlCompiler.run(
      graft.engine.Tables.container(spark, dir, "events"), tql)
    if (out.columns.contains("event_id") && out.columns.length > 4)
      out.select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    else out
  }

  val qs: Seq[Q] = seeds.map { s =>
    val (tql, duck) = gen(s)
    Q.df(f"q_tqlfuzz_$s%02d", duck = duck)((spark, dir) => runTql(spark, dir, tql))
  } ++ tsSeeds.map { s =>
    val (tql, duck) = genTs(s)
    Q.df(f"q_tqlfuzz_ts_$s%02d", duck = duck)((spark, dir) => runTql(spark, dir, tql))
  } ++ grammarSeeds.map { s =>
    val (tql, duck) = genGrammar(s)
    Q.df(f"q_tqlfuzz_gram_$s%02d", duck = duck)((spark, dir) => runTql(spark, dir, tql))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.mr.{MatchRecognize, PatternRegex}

class MatchRecognizeSpec extends SparkTestBase {
  import spark.implicits._

  test("pattern regex parses quantifiers, alternation, groups") {
    import PatternRegex._
    assert(parse("A B+ C") == Cat(Seq(Sym("A"), Rep(Sym("B"), 1, Int.MaxValue), Sym("C"))))
    assert(parse("A{2,3}") == Rep(Sym("A"), 2, 3))
    assert(parse("(A|B)* C?") ==
      Cat(Seq(Rep(Alt(Seq(Sym("A"), Sym("B"))), 0, Int.MaxValue), Rep(Sym("C"), 0, 1))))
    intercept[PatternParseException](parse("A{"))
    intercept[PatternParseException](parse("A)"))
  }

  test("greedy backtracking matcher") {
    import PatternRegex._
    // symbols: B matches idx 0..3, C matches idx 2..4
    def sym(i: Int, v: String): Boolean = v match {
      case "B" => i <= 3
      case "C" => i >= 2
      case _ => false
    }
    // B+ C anchored at 0 over 5 rows: greedy B+ takes 0..3 then backtracks to
    // let C match at 4? No — C matches 4, so B+ = 0..3, C = 4.
    val m = matchAt(parse("B+ C"), 0, 5, sym)
    assert(m.contains(Vector("B", "B", "B", "B", "C")))
    // bounded quantifier
    assert(matchAt(parse("B{2}"), 0, 5, sym).contains(Vector("B", "B")))
    assert(matchAt(parse("B{5,}"), 0, 5, sym).isEmpty)
  }

  test("allRowsPerMatch finds non-overlapping greedy matches per key") {
    // key k1: values 5 4 3 4 5 (V-shape), k2: monotonic up (no match)
    val df = Seq(
      ("k1", 1L, 5.0), ("k1", 2L, 4.0), ("k1", 3L, 3.0), ("k1", 4L, 4.0), ("k1", 5L, 5.0),
      ("k2", 1L, 1.0), ("k2", 2L, 2.0), ("k2", 3L, 3.0)
    ).toDF("k", "seq", "value")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("seq")
    val withPrev = df.withColumn("p", lag($"value", 1).over(w))
    val out = MatchRecognize.allRowsPerMatch(withPrev, Seq("k"), Seq("seq"),
      "DOWN+ UP+",
      Map("DOWN" -> ($"value" < $"p"), "UP" -> ($"value" > $"p")))
      .select("k", "seq", "match_num", "classifier")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSet == Set(
      ("k1", 2L, 1L, "DOWN"), ("k1", 3L, 1L, "DOWN"),
      ("k1", 4L, 1L, "UP"), ("k1", 5L, 1L, "UP")))
  }

  test("skip past last row vs skip to next row") {
    val df = Seq(("k", 1L, "a"), ("k", 2L, "a"), ("k", 3L, "a"), ("k", 4L, "b"))
      .toDF("k", "seq", "t")
    // A{2}: with skip-past-last -> matches (1,2); (3) alone can't complete
    val past = MatchRecognize.allRowsPerMatch(df, Seq("k"), Seq("seq"),
      "A{2}", Map("A" -> ($"t" === "a")))
      .select("seq", "match_num").as[(Long, Long)].collect().toSet
    assert(past == Set((1L, 1L), (2L, 1L)))
    // with skip-to-next-row -> overlapping matches (1,2) and (2,3)
    val nxt = MatchRecognize.allRowsPerMatch(df, Seq("k"), Seq("seq"),
      "A{2}", Map("A" -> ($"t" === "a")), skipPastLastRow = false)
      .select("seq", "match_num").as[(Long, Long)].collect()
    assert(nxt.toSet == Set((1L, 1L), (2L, 1L), (2L, 2L), (3L, 2L)))
  }

  test("oneRowPerMatch summarizes runs") {
    val df = Seq(("k", 1L, "v"), ("k", 2L, "v"), ("k", 3L, "v"), ("k", 4L, "x"),
      ("k", 5L, "v"), ("k", 6L, "v"), ("k", 7L, "v"), ("k", 8L, "v"))
      .toDF("k", "seq", "t")
    val out = MatchRecognize.oneRowPerMatch(df, Seq("k"), Seq("seq"),
      "V{3,}", Map("V" -> ($"t" === "v")))
      .orderBy("match_num")
      .select("match_num", "start_seq", "end_seq", "n_rows")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 1L, 3L, 3L), (2L, 5L, 8L, 4L)))
  }

  test("alternation prefers earlier choice; classifier reflects variable") {
    val df = Seq(("k", 1L, 10.0), ("k", 2L, 10.0)).toDF("k", "seq", "v")
    val out = MatchRecognize.allRowsPerMatch(df, Seq("k"), Seq("seq"),
      "(HI|LO)", Map("HI" -> ($"v" >= 5.0), "LO" -> ($"v" < 5.0)))
      .select("seq", "classifier").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "HI"), (2L, "HI")))
  }

  test("pattern regex parses anchors and {,m} bound") {
    import PatternRegex._
    assert(parse("^A+") == Rep(Cat(Seq(Start, Sym("A"))), 1, Int.MaxValue))
    assert(parse("A+$") == Cat(Seq(Rep(Sym("A"), 1, Int.MaxValue), End)))
    assert(parse("A{,3}") == Rep(Sym("A"), 0, 3))
    // ^ is zero-width: `^A` consumes one row only at partition start
    def sym(i: Int, v: String): Boolean = true
    assert(matchAt(parse("^A"), 0, 3, sym).contains(Vector("A")))
    assert(matchAt(parse("^A"), 1, 3, sym).isEmpty)
    // $ only succeeds when the match reaches the partition end
    assert(matchAt(parse("A$"), 2, 3, sym).contains(Vector("A")))
    assert(matchAt(parse("A$"), 0, 3, sym).isEmpty)
    assert(matchAt(parse("A+$"), 0, 3, sym).contains(Vector("A", "A", "A")))
  }

  test("start/end anchors bound matches to partition edges") {
    // k1 starts with two 'v' rows; k2 starts with 'x' but ends with 'v' run
    val df = Seq(("k1", 1L, "v"), ("k1", 2L, "v"), ("k1", 3L, "x"), ("k1", 4L, "v"),
      ("k2", 1L, "x"), ("k2", 2L, "v"), ("k2", 3L, "v"))
      .toDF("k", "seq", "t")
    val startRuns = MatchRecognize.allRowsPerMatch(df, Seq("k"), Seq("seq"),
      "^V+", Map("V" -> ($"t" === "v")))
      .select("k", "seq").as[(String, Long)].collect().toSet
    assert(startRuns == Set(("k1", 1L), ("k1", 2L)))
    val endRuns = MatchRecognize.allRowsPerMatch(df, Seq("k"), Seq("seq"),
      "V+$", Map("V" -> ($"t" === "v")))
      .select("k", "seq").as[(String, Long)].collect().toSet
    assert(endRuns == Set(("k1", 4L), ("k2", 2L), ("k2", 3L)))
  }

  test("AFTER MATCH SKIP TO var resumes at the last var row (overlap)") {
    import MatchRecognize.AfterMatchSkip
    // A always true, B{2} bounded: skip-to-B makes each match start at the
    // previous match's last B row -> overlapping matches sharing one row
    val df = (1L to 7L).map(i => ("k", i)).toDF("k", "seq")
    val out = MatchRecognize.allRowsPerMatch(df, Seq("k"), Seq("seq"),
      "A B{2}", Map("A" -> lit(true), "B" -> lit(true)),
      AfterMatchSkip.ToVar("B"))
      .select("seq", "match_num").as[(Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 1L), (2L, 1L), (3L, 1L),
      (3L, 2L), (4L, 2L), (5L, 2L),
      (5L, 3L), (6L, 3L), (7L, 3L)))
    // skipping to a var that is the match's first row must still progress
    val degenerate = MatchRecognize.allRowsPerMatch(df, Seq("k"), Seq("seq"),
      "B{2}", Map("B" -> lit(true)), AfterMatchSkip.ToVar("B"))
      .select("seq", "match_num").as[(Long, Long)].collect()
    assert(degenerate.map(_._2).max >= 2) // terminated, multiple matches
  }

  test("measures evaluates per-match aggregates with FIRST/LAST/CLASSIFIER") {
    import graft.mr.Measures
    val df = Seq(("k", 1L, "v", 10.0), ("k", 2L, "v", 20.0), ("k", 3L, "v", 30.0),
      ("k", 4L, "x", 99.0), ("k", 5L, "v", 1.0), ("k", 6L, "v", 2.0), ("k", 7L, "v", 3.0))
      .toDF("k", "seq", "t", "value")
    val out = MatchRecognize.measures(df, Seq("k"), Seq("seq"),
      "V{3,}", Map("V" -> ($"t" === "v")),
      ms = Seq(
        "first_seq" -> Measures.firstVal($"seq"),
        "last_seq" -> Measures.lastVal($"seq"),
        "n" -> count(lit(1)),
        "total" -> sum(Measures.ofVar("V", $"value")),
        "cls" -> Measures.classifier))
      .orderBy("match_num")
      .select("match_num", "first_seq", "last_seq", "n", "total", "cls")
      .as[(Long, Long, Long, Long, Double, String)].collect()
    assert(out.toSeq == Seq(
      (1L, 1L, 3L, 3L, 60.0, "V"),
      (2L, 5L, 7L, 3L, 6.0, "V")))
  }

  test("MEASURES + SKIP TO var via the SQL clause lowering") {
    val df = Seq(("k", 1L, "v", 5.0), ("k", 2L, "v", 6.0), ("k", 3L, "v", 7.0),
      ("k", 4L, "x", 0.0), ("k", 5L, "v", 1.0), ("k", 6L, "v", 2.0), ("k", 7L, "v", 4.0))
      .toDF("k", "seq", "t", "value")
    df.createOrReplaceTempView("mr_meas_t")
    val out = graft.engine.GraftMrSql.run(spark,
      """SELECT * FROM mr_meas_t MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES FIRST(seq) AS s0, LAST(seq) AS s1, COUNT(*) AS n,
        |           SUM(V.value) AS sv, CLASSIFIER() AS c, MATCH_NUMBER() AS mn
        |  ONE ROW PER MATCH
        |  PATTERN (V{3,})
        |  DEFINE V AS t = 'v')""".stripMargin)
      .orderBy("match_num")
      .select("s0", "s1", "n", "sv", "c", "mn")
      .as[(Long, Long, Long, Double, String, Long)].collect()
    assert(out.toSeq == Seq((1L, 3L, 3L, 18.0, "V", 1L), (5L, 7L, 3L, 7.0, "V", 2L)))

    val skipTo = graft.engine.GraftMrSql.run(spark,
      """SELECT * FROM mr_meas_t MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  AFTER MATCH SKIP TO B
        |  PATTERN (A B{2})
        |  DEFINE A AS true, B AS true)""".stripMargin)
      .select("seq", "match_num").as[(Long, Long)].collect().toSet
    assert(skipTo == Set(
      (1L, 1L), (2L, 1L), (3L, 1L),
      (3L, 2L), (4L, 2L), (5L, 2L),
      (5L, 3L), (6L, 3L), (7L, 3L)))
  }

  test("NEXT(col[, n]) in DEFINE: lead materialization, tail NULL, PREV composition") {
    // values per seq: 5,4,3,9,8,2 — P AS value > NEXT(value) holds at
    // seq 1,2 (5>4, 4>3), fails at 3 (3<9), holds at 4,5 (9>8, 8>2) and is
    // UNKNOWN at seq 6 (partition tail: NEXT is NULL -> row never matches,
    // FUNC_NEXT reference semantics). PATTERN (P{2}) -> two matches.
    val df = Seq(("k", 1L, 5.0), ("k", 2L, 4.0), ("k", 3L, 3.0),
      ("k", 4L, 9.0), ("k", 5L, 8.0), ("k", 6L, 2.0))
      .toDF("k", "seq", "value")
    df.createOrReplaceTempView("mr_next_t")
    val out = graft.engine.GraftMrSql.run(spark,
      """SELECT * FROM mr_next_t MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  ALL ROWS PER MATCH
        |  PATTERN (P{2})
        |  DEFINE P AS value > NEXT(value))""".stripMargin)
      .select("seq", "match_num").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 1L), (2L, 1L), (4L, 2L), (5L, 2L)))
    // the helper columns are dropped from the output schema
    assert(!graft.engine.GraftMrSql.run(spark,
      """SELECT * FROM mr_next_t MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  ALL ROWS PER MATCH
        |  PATTERN (P{2})
        |  DEFINE P AS value > NEXT(value))""".stripMargin)
      .columns.exists(_.startsWith("__next")))

    // offset form NEXT(col, 2) + PREV in the SAME condition: rows where
    // the value two ahead is higher AND the previous value is higher
    // (seq 2: next2=9>4, prev=5>4; seq 3: next2=8>3, prev=4>3). seq 5/6
    // have no next2 (UNKNOWN), seq 1 has no prev.
    val out2 = graft.engine.GraftMrSql.run(spark,
      """SELECT * FROM mr_next_t MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  ALL ROWS PER MATCH
        |  PATTERN (B)
        |  DEFINE B AS NEXT(value, 2) > value AND PREV(value) > value)""".stripMargin)
      .select("seq").as[Long].collect().toSet
    assert(out2 == Set(2L, 3L))

    // PREV/NEXT in MEASURES evaluate at the match's LAST row (SQL:2016):
    // match1 = seq 1,2 -> PREV@2 = 5, NEXT@2 = 3 (outside the match —
    // physical navigation); match2 = seq 4,5 -> PREV@5 = 9, NEXT@5 = 2
    val meas = graft.engine.GraftMrSql.run(spark,
      """SELECT * FROM mr_next_t MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES PREV(value) AS pv, NEXT(value) AS nv, LAST(seq) AS ls
        |  ONE ROW PER MATCH
        |  PATTERN (P{2})
        |  DEFINE P AS value > NEXT(value))""".stripMargin)
      .orderBy("match_num").select("pv", "nv", "ls")
      .as[(Double, Double, Long)].collect()
    assert(meas.toSeq == Seq((5.0, 3.0, 2L), (9.0, 2.0, 5L)))
  }

  test("MEASURES: FIRST composes with VAR scoping and nested calls") {
    val df = Seq(("k", 1L, "a", 10.0), ("k", 2L, "b", -20.0), ("k", 3L, "b", 30.0))
      .toDF("k", "seq", "t", "value")
    df.createOrReplaceTempView("mr_first_t")
    val out = graft.engine.GraftMrSql.run(spark,
      """SELECT * FROM mr_first_t MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES FIRST(B.value) AS fb, LAST(B.value) AS lb,
        |           FIRST(abs(value)) AS fa, FIRST(A.value) AS fav
        |  ONE ROW PER MATCH
        |  PATTERN (A B+)
        |  DEFINE A AS t = 'a', B AS t = 'b')""".stripMargin)
      .select("fb", "lb", "fa", "fav")
      .as[(Double, Double, Double, Double)].collect()
    // FIRST(B.value): first B-row (seq 2), not the match's first row (A);
    // FIRST(abs(value)): nested call translated, not Spark's first() agg
    assert(out.toSeq == Seq((-20.0, 30.0, 10.0, 10.0)))
  }

  test("MEASURES navigation keeps genuinely-null values (SQL:2016)") {
    // B-rows' values: [null, 30.0] -> FIRST(B.value) is NULL (first B-row),
    // not 30.0 (first non-null); quoted parens in args must not confuse
    // the call rewriter
    val df = Seq(
      ("k", 1L, "a", Some(10.0)), ("k", 2L, "b", None), ("k", 3L, "b", Some(30.0)))
      .toDF("k", "seq", "t", "value")
    df.createOrReplaceTempView("mr_nullnav_t")
    val out = graft.engine.GraftMrSql.run(spark,
      """SELECT * FROM mr_nullnav_t MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES FIRST(B.value) AS fb, LAST(B.value) AS lb,
        |           FIRST(concat(t, ')')) AS ft
        |  ONE ROW PER MATCH
        |  PATTERN (A B+)
        |  DEFINE A AS t = 'a', B AS t = 'b')""".stripMargin)
      .select("fb", "lb", "ft")
      .as[(Option[Double], Option[Double], String)].collect()
    assert(out.toSeq == Seq((None, Some(30.0), "a)")))

    // Scala API parity
    import graft.mr.Measures
    val m = MatchRecognize.measures(df, Seq("k"), Seq("seq"), "A B+",
      Map("A" -> ($"t" === "a"), "B" -> ($"t" === "b")),
      ms = Seq(
        "fb" -> Measures.firstOfVar("B", $"value"),
        "f0" -> Measures.firstVal($"value")))
      .select("fb", "f0").as[(Option[Double], Option[Double])].collect()
    assert(m.toSeq == Seq((None, Some(10.0))))
  }

  test("AFTER MATCH SKIP TO LAST/FIRST/bare var all accepted") {
    val df = Seq(("k", 1L, "a"), ("k", 2L, "b"), ("k", 3L, "b"))
      .toDF("k", "seq", "t")
    df.createOrReplaceTempView("mr_skip_t")
    val base = """SELECT * FROM mr_skip_t MATCH_RECOGNIZE (
      |  PARTITION BY k ORDER BY seq
      |  AFTER MATCH SKIP TO %s
      |  PATTERN (A B+)
      |  DEFINE A AS t = 'a', B AS t = 'b')""".stripMargin
    val withLast = graft.engine.GraftMrSql.run(spark, base.format("LAST B"))
      .select("seq").as[Long].collect().toSet
    val bare = graft.engine.GraftMrSql.run(spark, base.format("B"))
      .select("seq").as[Long].collect().toSet
    assert(withLast == bare && bare == Set(1L, 2L, 3L))
    // no second match here under FIRST either: the resume row (first B) is
    // not an 'a', so the single match is identical
    val withFirst = graft.engine.GraftMrSql.run(spark, base.format("FIRST B"))
      .select("seq").as[Long].collect().toSet
    assert(withFirst == bare)
  }

  test("SKIP TO FIRST var overlaps more aggressively than LAST") {
    val df = (1L to 7L).map(i => ("k", i)).toDF("k", "seq")
    df.createOrReplaceTempView("mr_skipfirst_t")
    val base = """SELECT * FROM mr_skipfirst_t MATCH_RECOGNIZE (
      |  PARTITION BY k ORDER BY seq
      |  AFTER MATCH SKIP TO %s
      |  PATTERN (A B{2})
      |  DEFINE A AS true, B AS true)""".stripMargin
    // LAST B resumes at each match's last row: (1,2,3),(3,4,5),(5,6,7)
    val last = graft.engine.GraftMrSql.run(spark, base.format("LAST B"))
      .select("seq", "match_num").as[(Long, Long)].collect().toSet
    assert(last.map(_._2).max == 3L)
    // FIRST B resumes at each match's first B row: 5 overlapping matches
    val first = graft.engine.GraftMrSql.run(spark, base.format("FIRST B"))
      .select("seq", "match_num").as[(Long, Long)].collect().toSet
    assert(first == Set(
      (1L, 1L), (2L, 1L), (3L, 1L),
      (2L, 2L), (3L, 2L), (4L, 2L),
      (3L, 3L), (4L, 3L), (5L, 3L),
      (4L, 4L), (5L, 4L), (6L, 4L),
      (5L, 5L), (6L, 5L), (7L, 5L)))
  }

  test("measure call rewriter leaves quoted 'first(x)' literals alone") {
    val df = Seq(("k", 1L, "a"), ("k", 2L, "b")).toDF("k", "seq", "t")
    df.createOrReplaceTempView("mr_quote_t")
    val out = graft.engine.GraftMrSql.run(spark,
      """SELECT * FROM mr_quote_t MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES LAST(concat('first(', t, ')')) AS lbl, LAST(seq) AS s1
        |  ONE ROW PER MATCH
        |  PATTERN (A B)
        |  DEFINE A AS t = 'a', B AS t = 'b')""".stripMargin)
      .select("lbl", "s1").as[(String, Long)].collect()
    // the quoted literal 'first(' must survive the FIRST-call rewriter
    assert(out.toSeq == Seq(("first(b)", 2L)))
  }

  test("ALL ROWS PER MATCH + MEASURES duplicates FINAL measures onto every row") {
    val df = Seq(("k", 1L, "a", 10.0), ("k", 2L, "b", 20.0), ("k", 3L, "b", 30.0),
      ("k", 4L, "x", 0.0), ("k", 5L, "a", 1.0), ("k", 6L, "b", 2.0))
      .toDF("k", "seq", "t", "value")
    df.createOrReplaceTempView("mr_allrows_meas_t")
    // compound measure LAST(value) - FIRST(value) exercises the per-aggregate
    // windowization (arithmetic over two window aggregates)
    val out = graft.engine.GraftMrSql.run(spark,
      """SELECT * FROM mr_allrows_meas_t MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES LAST(value) - FIRST(value) AS delta, SUM(B.value) AS sb,
        |           COUNT(*) AS n, MATCH_NUMBER() AS mn
        |  ALL ROWS PER MATCH
        |  PATTERN (A B+)
        |  DEFINE A AS t = 'a', B AS t = 'b')""".stripMargin)
      .select("seq", "match_num", "classifier", "delta", "sb", "n", "mn")
      .as[(Long, Long, String, Double, Double, Long, Long)].collect().sortBy(_._1)
    // match 1 = rows 1-3 (delta 30-10=20, sum B 50, n 3); match 2 = rows 5-6
    assert(out.toSeq == Seq(
      (1L, 1L, "A", 20.0, 50.0, 3L, 1L),
      (2L, 1L, "B", 20.0, 50.0, 3L, 1L),
      (3L, 1L, "B", 20.0, 50.0, 3L, 1L),
      (5L, 2L, "A", 1.0, 2.0, 2L, 2L),
      (6L, 2L, "B", 1.0, 2.0, 2L, 2L)))

    // API form: single-aggregate measures over (keys, match_num) windows
    val api = graft.mr.MatchRecognize.allRowsWithMeasures(
        df, Seq("k"), Seq("seq"), "A B+",
        Map("A" -> (col("t") === "a"), "B" -> (col("t") === "b")),
        ms = Seq("s0" -> graft.mr.Measures.firstVal(col("seq")),
                 "nb" -> count(graft.mr.Measures.ofVar("B", col("seq")))))
      .select("seq", "match_num", "s0", "nb")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(api.toSeq == Seq((1L, 1L, 1L, 2L), (2L, 1L, 1L, 2L), (3L, 1L, 1L, 2L),
      (5L, 2L, 5L, 1L), (6L, 2L, 5L, 1L)))
  }

  test("ALL ROWS PER MATCH measure PREV/NEXT uses running (per-row) semantics") {
    val df = Seq(("k", 1L, 10.0), ("k", 2L, 20.0), ("k", 3L, 30.0), ("k", 4L, 5.0))
      .toDF("k", "seq", "value")
    df.createOrReplaceTempView("mr_allrows_nav_t")
    // SQL:2016 6.4: under ALL ROWS PER MATCH the default navigation
    // semantics is RUNNING — PREV(value) on each output row is the value
    // of the PHYSICALLY previous row at that row, not the last row's
    // (r11 ADVICE: FINAL-only lowering gave every row the last row's nav)
    val out = graft.engine.GraftMrSql.run(spark,
      """SELECT * FROM mr_allrows_nav_t MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES PREV(value) AS pv, NEXT(value) AS nv, COUNT(*) AS n
        |  ALL ROWS PER MATCH
        |  PATTERN (U{2,})
        |  DEFINE U AS value > PREV(value))""".stripMargin)
      .select("seq", "pv", "nv", "n")
      .as[(Long, Option[Double], Option[Double], Long)].collect().sortBy(_._1)
    // match = rows 2,3 (each above its predecessor); per-row nav:
    // row 2 sees prev=10/next=30, row 3 sees prev=20/next=5
    assert(out.toSeq == Seq(
      (2L, Some(10.0), Some(30.0), 2L),
      (3L, Some(20.0), Some(5.0), 2L)))
    // ONE ROW PER MATCH keeps FINAL semantics: nav evaluated at last row
    val one = graft.engine.GraftMrSql.run(spark,
      """SELECT * FROM mr_allrows_nav_t MATCH_RECOGNIZE (
        |  PARTITION BY k ORDER BY seq
        |  MEASURES PREV(value) AS pv, NEXT(value) AS nv
        |  ONE ROW PER MATCH
        |  PATTERN (U{2,})
        |  DEFINE U AS value > PREV(value))""".stripMargin)
      .select("pv", "nv").as[(Option[Double], Option[Double])].collect()
    assert(one.toSeq == Seq((Some(20.0), Some(5.0))))
  }

  test("PERMUTE matches the elements in any order, lexical preference") {
    import graft.mr.PatternRegex._
    // A then B
    assert(matchAt(parse("PERMUTE(A, B)"), 0, 2,
      (i, v) => (i == 0 && v == "A") || (i == 1 && v == "B")) ==
      Some(Vector("A", "B")))
    // B then A also matches
    assert(matchAt(parse("PERMUTE(A, B)"), 0, 2,
      (i, v) => (i == 0 && v == "B") || (i == 1 && v == "A")) ==
      Some(Vector("B", "A")))
    // both orders possible (all predicates true): lexical order A B wins
    assert(matchAt(parse("PERMUTE(A, B)"), 0, 2, (_, _) => true) ==
      Some(Vector("A", "B")))
    // quantified elements participate: PERMUTE(A+, B) consumes the A-run
    assert(matchAt(parse("PERMUTE(A+, B)"), 0, 3,
      (i, v) => if (i < 2) v == "A" else v == "B") ==
      Some(Vector("A", "A", "B")))
    // a variable merely named PERMUTE_X is not the operator
    assert(variables(parse("PERMUTE_X")) == Seq("PERMUTE_X"))

    // end to end over a tiny frame: pattern (V then C) in either order
    val df = Seq(
      (1L, 1L, "c"), (1L, 2L, "v"),   // c v -> match (C V)
      (2L, 1L, "v"), (2L, 2L, "c"),   // v c -> match (V C)
      (3L, 1L, "v"), (3L, 2L, "v")    // v v -> no match
    ).toDF("k", "seq", "typ")
    val m = MatchRecognize.oneRowPerMatch(df, Seq("k"), Seq("seq"),
      "PERMUTE(V, C)", Map(
        "V" -> (col("typ") === "v"), "C" -> (col("typ") === "c")))
      .select("k", "n_rows").as[(Long, Long)].collect().toSet
    assert(m == Set((1L, 2L), (2L, 2L)))
  }

  test("maxMatchLen: finite for bounded quantifiers, None for unbounded") {
    import PatternRegex._
    assert(maxMatchLen(parse("A B{1,3} C?")) == Some(5))
    assert(maxMatchLen(parse("(A|B C){2}")) == Some(4))
    assert(maxMatchLen(parse("^A B$")) == Some(2))
    assert(maxMatchLen(parse("A+")).isEmpty)
    assert(maxMatchLen(parse("A B{2,}")).isEmpty)
    assert(maxMatchLen(parse("(A*|B)")).isEmpty)
  }

  /** Sequential-path reference output: a constant key forces the streaming
    * GroupMatcher; output columns align after dropping the key. */
  private def seqReference(df: org.apache.spark.sql.DataFrame, order: Seq[String],
                           pattern: String,
                           defines: Map[String, org.apache.spark.sql.Column],
                           skip: MatchRecognize.AfterMatchSkip) =
    MatchRecognize.matchedWithPos(df.withColumn("__k", lit(1)), Seq("__k"),
        order, pattern, defines, skip)
      .drop("__k")

  test("chunked unkeyed MR is row-identical to the sequential scan (all skip modes)") {
    val rnd = new scala.util.Random(42)
    val df = (0 until 500).map(i => (i.toLong, rnd.nextInt(10)))
      .toDF("seq", "v")
    val defines = Map(
      "A" -> (col("v") % 3 === 0),
      "B" -> (col("v") % 2 === 1),
      "C" -> (col("v") > 5))
    val skips = Seq(
      MatchRecognize.AfterMatchSkip.PastLastRow,
      MatchRecognize.AfterMatchSkip.ToNextRow,
      MatchRecognize.AfterMatchSkip.ToVar("B"),
      MatchRecognize.AfterMatchSkip.ToFirstVar("B"))
    for (skip <- skips; pattern <- Seq("A B{1,3}", "A (B|C){0,2} C")) {
      // chunkRows=16 over 500 rows -> ~32 chunks; matches cross boundaries
      val chunked = MatchRecognize.matchedWithPos(df, Nil, Seq("seq"), pattern,
          defines, skip, chunkRows = 16)
        .select("seq", "v", "match_num", "classifier", MatchRecognize.PosCol)
        .collect().map(_.toSeq).toSeq
      val expected = seqReference(df, Seq("seq"), pattern, defines, skip)
        .select("seq", "v", "match_num", "classifier", MatchRecognize.PosCol)
        .collect().map(_.toSeq).toSeq
      assert(chunked.sortBy(_.toString) == expected.sortBy(_.toString),
        s"mismatch for $pattern / $skip: ${chunked.size} vs ${expected.size} rows")
      assert(expected.nonEmpty, s"degenerate test: no matches for $pattern")
    }
  }

  test("chunked unkeyed MR: match spanning a chunk boundary is found once") {
    // rows 0..99; exactly one A at 14 (boundary-1 for chunkRows=8 after
    // doubling: C = max(8, 2*3)=8 -> chunks of 8; match A B B spans 14,15,16
    // crossing the chunk 1|2 boundary at 16
    val df = (0 until 100).map { i =>
      val t = if (i == 14) "a" else if (i == 15 || i == 16) "b" else "x"
      (i.toLong, t)
    }.toDF("seq", "t")
    val out = MatchRecognize.matchedWithPos(df, Nil, Seq("seq"), "A B{2}",
        Map("A" -> (col("t") === "a"), "B" -> (col("t") === "b")),
        MatchRecognize.AfterMatchSkip.PastLastRow, chunkRows = 8)
      .select("seq", "match_num", "classifier")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((14L, 1L, "A"), (15L, 1L, "B"), (16L, 1L, "B")))
  }

  test("chunked unkeyed MR honors ^/$ anchors globally, and runs multi-partition") {
    val df = (0 until 64).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("seq", "t")
    val defines = Map("A" -> (col("t") === "a"), "B" -> (col("t") === "b"))
    // ^A B: only the global first row can start the match — chunk-local
    // starts must not re-anchor
    val startAnchored = MatchRecognize.matchedWithPos(df, Nil, Seq("seq"),
        "^A B", defines, MatchRecognize.AfterMatchSkip.PastLastRow, chunkRows = 8)
      .select("seq").as[Long].collect().sorted
    assert(startAnchored.toSeq == Seq(0L, 1L))
    // A B$: only the match ending at the global last row survives — a chunk's
    // slice end must not read as partition end
    val endAnchored = MatchRecognize.matchedWithPos(df, Nil, Seq("seq"),
        "A B$", defines, MatchRecognize.AfterMatchSkip.PastLastRow, chunkRows = 8)
      .select("seq").as[Long].collect().sorted
    assert(endAnchored.toSeq == Seq(62L, 63L))
    // the bounded-pattern plan is chunk-parallel: no single-task bottleneck
    val parts = MatchRecognize.matchedWithPos(df, Nil, Seq("seq"), "A B",
        defines, MatchRecognize.AfterMatchSkip.PastLastRow, chunkRows = 8)
      .rdd.getNumPartitions
    assert(parts > 1, s"expected multi-partition chunked output, got $parts")
  }

  test("unkeyed match_num is globally sequential across chunks") {
    val df = (0 until 120).map(i => (i.toLong, if (i % 10 == 3) "a" else "x"))
      .toDF("seq", "t")
    val out = MatchRecognize.matchedWithPos(df, Nil, Seq("seq"), "A",
        Map("A" -> (col("t") === "a")),
        MatchRecognize.AfterMatchSkip.PastLastRow, chunkRows = 16)
      .select("seq", "match_num").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == (1L to 12L).toSeq)
    assert(out.map(_._1).toSeq == (0 until 12).map(i => i * 10L + 3L))
  }
}

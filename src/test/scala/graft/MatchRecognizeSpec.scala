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
}

package graft

import graft.tql.{TqlAst => A, TqlParseException, TqlParser}

class TqlParserSpec extends SparkTestBase {

  test("select star with where/order/limit/offset") {
    val q = TqlParser.parse(
      "select * where a > 1 and b = 'x''y' order by a desc, b limit 10 offset 5")
    assert(q.selection == A.Star)
    assert(q.orderBy == Seq(("a", false), ("b", true)))
    assert(q.limit.contains(10L) && q.offset.contains(5L))
    q.where.get match {
      case A.Bin("and", A.Bin(">", A.ColRef("a"), A.NumLit(1.0, true)),
                  A.Bin("=", A.ColRef("b"), A.StrLit("x'y"))) => ()
      case other => fail(s"unexpected AST: $other")
    }
  }

  test("operator precedence: or over and over not over cmp over arith") {
    val q = TqlParser.parse("select * where a + 1 * 2 > 3 or not b = 1 and c < 2")
    q.where.get match {
      case A.Bin("or",
        A.Bin(">", A.Bin("+", A.ColRef("a"), A.Bin("*", _, _)), _),
        A.Bin("and", A.Un("not", _), A.Bin("<", A.ColRef("c"), _))) => ()
      case other => fail(s"unexpected AST: $other")
    }
  }

  test("xor, like escape, is null") {
    val q = TqlParser.parse(
      "select * where a like 'x!_%' escape '!' xor b is not null")
    q.where.get match {
      case A.Bin("xor", A.LikeExpr(A.ColRef("a"), A.StrLit("x!_%"), Some("!"), false),
                  A.IsNullExpr(A.ColRef("b"), true)) => ()
      case other => fail(s"unexpected AST: $other")
    }
  }

  test("timestamp literal parses ISO with Z and offset") {
    assert(TqlParser.parseIso("2024-01-15T00:00:00Z") == 1705276800000000L)
    assert(TqlParser.parseIso("2024-01-15T01:00:00+01:00") == 1705276800000000L)
    assert(TqlParser.parseIso("2024-01-15T00:00:00.123Z") == 1705276800123000L)
  }

  test("aggregation and selection function calls") {
    val q = TqlParser.parse("select time_interpolated(v, TIMESTAMP('2024-01-15T00:00:00Z'))")
    q.selection match {
      case A.FuncSelection(A.FuncCall("TIME_INTERPOLATED",
        Seq(A.ColRef("v"), A.TsLit(_)), false)) => ()
      case other => fail(s"unexpected: $other")
    }
    val c = TqlParser.parse("select count(*)")
    assert(c.selection == A.FuncSelection(A.FuncCall("COUNT", Nil, true)))
  }

  test("parse errors are reported") {
    intercept[TqlParseException](TqlParser.parse("select"))
    intercept[TqlParseException](TqlParser.parse("select * where"))
    intercept[TqlParseException](TqlParser.parse("select a, b"))
    intercept[TqlParseException](TqlParser.parse("select * limit 1 garbage"))
  }
}

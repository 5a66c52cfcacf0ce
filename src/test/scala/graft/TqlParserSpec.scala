package graft

import graft.tql.{TqlAst => A, TqlParseException, TqlParser}

class TqlParserSpec extends SparkTestBase {

  test("select star with where/order/limit/offset") {
    val q = TqlParser.parse(
      "select * where a > 1 and b = 'x''y' order by a desc, b limit 10 offset 5")
    assert(q.selection == A.Star)
    assert(q.orderBy == Seq((A.ColRef("a"), false), (A.ColRef("b"), true)))
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

  // ---- grammar fidelity cluster (tql.cpp rules 16-77) ----

  test("bit ops parse at their own precedence level (rule 56)") {
    // EQ binds LOOSER than & (token order: EQ=28 < BITAND=34), so
    // `flags & 4 <> 0` is `(flags & 4) <> 0`
    TqlParser.parse("select * where flags & 4 <> 0").where.get match {
      case A.Bin("<>", A.Bin("&", A.ColRef("flags"), A.NumLit(4.0, true)),
                  A.NumLit(0.0, true)) => ()
      case other => fail(s"unexpected AST: $other")
    }
    // bit ops bind looser than +: `a << 2 + 1` is `a << (2 + 1)`
    TqlParser.parse("select * where a << 2 + 1 > 8").where.get match {
      case A.Bin(">", A.Bin("<<", A.ColRef("a"), A.Bin("+", _, _)), _) => ()
      case other => fail(s"unexpected AST: $other")
    }
    // left-assoc chain
    TqlParser.parse("select * where a & 3 | 1 = 3").where.get match {
      case A.Bin("=", A.Bin("|", A.Bin("&", _, _), _), _) => ()
      case other => fail(s"unexpected AST: $other")
    }
    TqlParser.parse("select * where a >> 1 >= 2").where.get match {
      case A.Bin(">=", A.Bin(">>", _, _), _) => ()
      case other => fail(s"unexpected AST: $other")
    }
  }

  test("EQ/NE bind looser than LT/GT (token order 27-28 vs 29-32)") {
    TqlParser.parse("select * where a = b < c").where.get match {
      case A.Bin("=", A.ColRef("a"), A.Bin("<", A.ColRef("b"), A.ColRef("c"))) => ()
      case other => fail(s"unexpected AST: $other")
    }
  }

  test("NAN and INF are literals, not columns (rules 40-41, kw.cpp:46-62)") {
    TqlParser.parse("select * where value <> NAN").where.get match {
      case A.Bin("<>", A.ColRef("value"), A.NumLit(v, false)) if v.isNaN => ()
      case other => fail(s"unexpected AST: $other")
    }
    TqlParser.parse("select * where value < inf").where.get match {
      case A.Bin("<", _, A.NumLit(Double.PositiveInfinity, false)) => ()
      case other => fail(s"unexpected AST: $other")
    }
    TqlParser.parse("select * where value > -INF").where.get match {
      case A.Bin(">", _, A.Un("neg", A.NumLit(Double.PositiveInfinity, false))) => ()
      case other => fail(s"unexpected AST: $other")
    }
  }

  test("BLOB literals X'..' (rule 38, lexer.cpp:354-371)") {
    TqlParser.parse("select * where b = X'0aFF'").where.get match {
      case A.Bin("=", A.ColRef("b"), A.BlobLit("0AFF")) => ()
      case other => fail(s"unexpected AST: $other")
    }
    // odd digit count / non-hex / unterminated are lexer errors
    intercept[TqlParseException](TqlParser.parse("select * where b = X'0aF'"))
    intercept[TqlParseException](TqlParser.parse("select * where b = X'0G'"))
    intercept[TqlParseException](TqlParser.parse("select * where b = X'0a"))
    // x NOT followed by a quote is still an identifier
    TqlParser.parse("select * where x1 = 1").where.get match {
      case A.Bin("=", A.ColRef("x1"), _) => ()
      case other => fail(s"unexpected AST: $other")
    }
  }

  test("ORDER BY accepts expressions (rules 22-23)") {
    val q = TqlParser.parse("select * order by value * -1.0 asc, a + b desc, c")
    q.orderBy match {
      case Seq((A.Bin("*", A.ColRef("value"), _), true),
               (A.Bin("+", A.ColRef("a"), A.ColRef("b")), false),
               (A.ColRef("c"), true)) => ()
      case other => fail(s"unexpected sortlist: $other")
    }
  }

  test("general IS parses left-associatively at the EQ level (rules 76-77)") {
    // `a = b IS NULL` is `(a = b) IS NULL`
    TqlParser.parse("select * where a = b is null").where.get match {
      case A.IsNullExpr(A.Bin("=", A.ColRef("a"), A.ColRef("b")), false) => ()
      case other => fail(s"unexpected AST: $other")
    }
    // comparisons bind tighter than IS: `value > 1.0 IS NOT NULL`
    TqlParser.parse("select * where value > 1.0 is not null").where.get match {
      case A.IsNullExpr(A.Bin(">", _, _), true) => ()
      case other => fail(s"unexpected AST: $other")
    }
    // non-NULL right side parses to IsExpr...
    TqlParser.parse("select * where a is b").where.get match {
      case A.IsExpr(A.ColRef("a"), A.ColRef("b"), false) => ()
      case other => fail(s"unexpected AST: $other")
    }
  }

  test("db-qualified, quoted, and parenthesized FROM (rules 13, 16-19)") {
    assert(TqlParser.parse("select * from public.events").from
      .contains(A.TableRef(Some("public"), "events")))
    assert(TqlParser.parse("select * from 'events'").from
      .contains(A.TableRef(None, "events")))
    assert(TqlParser.parse("select * from ((events))").from
      .contains(A.TableRef(None, "events")))
    assert(TqlParser.parse("select * from (public.events)").from
      .contains(A.TableRef(Some("public"), "events")))
  }

  test("PRAGMA commands parse as validated no-ops (rules 59-63)") {
    TqlParser.parse("pragma trace").selection match {
      case A.PragmaSel("trace", None, None) => ()
      case other => fail(s"unexpected: $other")
    }
    TqlParser.parse("pragma trace.flag = on;").selection match {
      case A.PragmaSel("trace", Some("flag"), Some("on")) => ()
      case other => fail(s"unexpected: $other")
    }
    TqlParser.parse("pragma cache_size(-500)").selection match {
      case A.PragmaSel("cache_size", None, Some("-500")) => ()
      case other => fail(s"unexpected: $other")
    }
    TqlParser.parse("pragma opt = 2.5").selection match {
      case A.PragmaSel("opt", None, Some("2.5")) => ()
      case other => fail(s"unexpected: $other")
    }
    intercept[TqlParseException](TqlParser.parse("pragma"))
    intercept[TqlParseException](TqlParser.parse("pragma a = "))
  }

  test("|| lexes as one unconsumed token — faithful syntax error") {
    intercept[TqlParseException](TqlParser.parse("select * where a || b = 'x'"))
  }
}

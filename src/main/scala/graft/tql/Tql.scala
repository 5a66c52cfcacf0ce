package graft.tql

/** TQL — GridDB's per-container NoSQL query language.
  *
  * Grammar per the reference LEMON rules (/root/reference/server/tql.cpp:
  * 199-284): `[EXPLAIN [ANALYZE]] SELECT (*|function) [FROM nm[.nm]]
  * [WHERE expr] [ORDER BY sortlist] [LIMIT n [OFFSET m]]` and
  * `PRAGMA nm[.nm] [= value | (value)]`. WHERE with AND/OR/XOR/NOT,
  * comparisons (EQ/NE looser than LT/GT per the token precedence order,
  * tql_token.h:38-59), IS [NOT], LIKE..ESCAPE, bit ops `& | << >>`
  * (rule 56), arithmetic, NAN/INF literals (rules 40-41), BLOB `X'..'`
  * literals (rule 38, lexed per lexer.cpp:354-371). Single container, no
  * joins, no GROUP BY; the selection is `*`, one aggregation, or one
  * selection function. This is a fresh recursive-descent implementation
  * (the reference uses a generated LEMON parser — nothing to port).
  */
object TqlAst {
  sealed trait Expr
  final case class ColRef(name: String) extends Expr
  final case class NumLit(v: Double, isIntegral: Boolean) extends Expr
  final case class StrLit(v: String) extends Expr
  final case class BoolLit(v: Boolean) extends Expr
  case object NullLit extends Expr
  final case class TsLit(epochMicros: Long) extends Expr
  /** X'..' hex literal (rule 38); `hex` holds the digits only. */
  final case class BlobLit(hex: String) extends Expr
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  final case class Un(op: String, e: Expr) extends Expr
  final case class FuncCall(name: String, args: Seq[Expr], star: Boolean) extends Expr
  final case class LikeExpr(e: Expr, pattern: Expr, escape: Option[String], not: Boolean) extends Expr
  final case class IsNullExpr(e: Expr, not: Boolean) extends Expr
  /** General `expr IS [NOT] expr` (rules 76-77) with a non-NULL-literal
    * right side; the reference accepts the shape but requires the right
    * operand to EVALUATE to null (expression.cpp:1725-1731). */
  final case class IsExpr(l: Expr, r: Expr, not: Boolean) extends Expr

  sealed trait Selection
  case object Star extends Selection
  final case class FuncSelection(call: FuncCall) extends Selection
  /** `PRAGMA nm dbnm [EQ nmnum | LP nmnum RP]` (rules 59-63). The
    * reference recognizes only `trace` and ignores everything else
    * (Query::setPragma, query.cpp:464-481) — a validated no-op. */
  final case class PragmaSel(name1: String, name2: Option[String],
      value: Option[String]) extends Selection

  /** `FROM [db.]container` (rules 16/19); with a qualifier the db must be
    * the connection's database (Query::setFromCollection, query.cpp:369). */
  final case class TableRef(db: Option[String], name: String)

  final case class Query(
      selection: Selection,
      from: Option[TableRef],
      where: Option[Expr],
      orderBy: Seq[(Expr, Boolean)], // (sort expr, ascending) — rules 22-23
      limit: Option[Long],
      offset: Option[Long],
      explain: Int = 0) // 0 = none, 1 = EXPLAIN, 2 = EXPLAIN ANALYZE
}

final class TqlParseException(msg: String) extends RuntimeException(msg)

object TqlParser {
  import TqlAst._

  private final case class Tok(kind: String, text: String) // kind: id,num,str,blob,op,eof

  private def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if ((c == 'x' || c == 'X') && i + 1 < n && s(i + 1) == '\'') {
        // BLOB literal X'hexdigits' — even digit count, hex only
        // (lexer.cpp:354-371)
        val start = i + 2
        var j = start
        while (j < n && s(j) != '\'') j += 1
        if (j >= n) throw new TqlParseException("unterminated blob literal")
        val hex = s.substring(start, j)
        if (hex.length % 2 != 0 || !hex.forall(ch => Character.digit(ch, 16) >= 0))
          throw new TqlParseException(s"malformed blob literal X'$hex'")
        out += Tok("blob", hex.toUpperCase)
        i = j + 1
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        out += Tok("id", s.substring(start, i))
      } else if (c.isDigit || (c == '.' && i + 1 < n && s(i + 1).isDigit)) {
        val start = i
        while (i < n && (s(i).isDigit || s(i) == '.' || s(i) == 'e' || s(i) == 'E' ||
          ((s(i) == '+' || s(i) == '-') && (s(i - 1) == 'e' || s(i - 1) == 'E')))) i += 1
        out += Tok("num", s.substring(start, i))
      } else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        var done = false
        while (!done) {
          if (i >= n) throw new TqlParseException("unterminated string literal")
          if (s(i) == '\'') {
            if (i + 1 < n && s(i + 1) == '\'') { sb += '\''; i += 2 }
            else { i += 1; done = true }
          } else { sb += s(i); i += 1 }
        }
        out += Tok("str", sb.toString)
      } else {
        val two = if (i + 1 < n) s.substring(i, i + 2) else ""
        // `<<` / `>>` (TK_LSHIFT/TK_RSHIFT, lexer.cpp:236-255); `||` lexes
        // as one token (TK_CONCAT) that no TQL rule consumes — faithful
        // syntax error rather than two stray `|`s
        if (Set("<=", ">=", "<>", "!=", "==", "<<", ">>", "||").contains(two)) {
          out += Tok("op", two); i += 2
        }
        else { out += Tok("op", c.toString); i += 1 }
      }
    }
    out += Tok("eof", "")
    out.result()
  }

  def parse(tql: String): Query = new P(lex(tql)).command()

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Tok = toks(pos)
    // never advances past the eof sentinel — a consumer that `next()`s at
    // end of input gets the eof token back (and its `fail` can still peek)
    private def next(): Tok = { val t = toks(pos); if (t.kind != "eof") pos += 1; t }
    private def isKw(k: String): Boolean =
      peek.kind == "id" && peek.text.equalsIgnoreCase(k)
    private def eatKw(k: String): Boolean = { if (isKw(k)) { pos += 1; true } else false }
    private def expectKw(k: String): Unit =
      if (!eatKw(k)) fail(s"expected $k")
    private def isOp(o: String): Boolean = peek.kind == "op" && peek.text == o
    private def eatOp(o: String): Boolean = { if (isOp(o)) { pos += 1; true } else false }
    private def expectOp(o: String): Unit =
      if (!eatOp(o)) fail(s"expected '$o'")
    private def fail(msg: String): Nothing =
      throw new TqlParseException(s"$msg at token ${pos} ('${peek.text}')")

    def command(): Query = {
      // ecmd ::= explain cmd [SEMICOLON]; cmd ::= select | PRAGMA...
      // (rules 0-5, 59-63)
      val explain =
        if (eatKw("explain")) { if (eatKw("analyze")) 2 else 1 } else 0
      val q = if (isKw("pragma")) pragma() else select()
      eatOp(";")
      if (peek.kind != "eof") fail("trailing input")
      q.copy(explain = explain)
    }

    /** `nm ::= COLID | ID | STRING` (rules 11-13). */
    private def nm(): String = {
      val t = next()
      if (t.kind == "id" || t.kind == "str") t.text else fail("expected name")
    }

    private def pragma(): Query = {
      expectKw("pragma")
      val n1 = nm()
      val n2 = if (eatOp(".")) Some(nm()) else None
      // nmnum ::= [+|-] number | nm | ON | DELETE | DEFAULT (rules 64-75)
      def nmnum(): String = {
        val sign = if (eatOp("-")) "-" else { eatOp("+"); "" }
        val t = next()
        if (t.kind == "num" || t.kind == "id" || t.kind == "str") sign + t.text
        else fail("expected pragma value")
      }
      val v =
        if (eatOp("=")) Some(nmnum())
        else if (eatOp("(")) { val x = nmnum(); expectOp(")"); Some(x) }
        else None
      Query(PragmaSel(n1, n2, v), None, None, Nil, None, None)
    }

    private def select(): Query = {
      expectKw("select")
      val sel =
        if (eatOp("*")) Star
        else {
          val e = expr()
          e match {
            case f: FuncCall => FuncSelection(f)
            case _ => fail("selection must be *, an aggregation, or a selection function")
          }
        }
      // seltablist ::= nm dbnm | LP seltablist RP (rules 16-17)
      def seltablist(): TableRef =
        if (eatOp("(")) { val t = seltablist(); expectOp(")"); t }
        else {
          val n1 = nm()
          if (eatOp(".")) TableRef(Some(n1), nm()) else TableRef(None, n1)
        }
      val from = if (eatKw("from")) Some(seltablist()) else None
      val where = if (eatKw("where")) Some(expr()) else None
      var order: Seq[(Expr, Boolean)] = Nil
      if (eatKw("order")) {
        expectKw("by")
        // sortlist ::= expr sortorder (, expr sortorder)* (rules 22-26)
        val items = scala.collection.mutable.ArrayBuffer[(Expr, Boolean)]()
        var more = true
        while (more) {
          val e = expr()
          val asc = if (eatKw("desc")) false else { eatKw("asc"); true }
          items += ((e, asc))
          if (eatOp(",")) () else more = false
        }
        order = items.toSeq
      }
      // LIMIT INTEGER [OFFSET INTEGER] (rules 28-29) — a non-integer here
      // is a TQL syntax error, not a NumberFormatException (r14 review)
      def intTok(): Long = {
        val t = next()
        if (t.kind != "num" || t.text.exists(ch => !ch.isDigit))
          fail("expected a non-negative integer")
        try t.text.toLong catch { case _: NumberFormatException =>
          fail("integer out of range") }
      }
      var limit: Option[Long] = None
      var offset: Option[Long] = None
      if (eatKw("limit")) {
        limit = Some(intTok())
        if (eatKw("offset")) offset = Some(intTok())
      }
      Query(sel, from, where, order, limit, offset)
    }

    // Precedence (loosest to tightest), from the token declaration order
    // (tql_token.h:34-59 — LEMON assigns precedence in declaration order):
    // OR < XOR < AND < NOT < {EQ NE IS LIKE} < {LT LE GT GE} <
    // {BITAND BITOR LSHIFT RSHIFT} < {PLUS MINUS} < {STAR SLASH REM} < unary.
    def expr(): Expr = orExpr()

    private def orExpr(): Expr = {
      var l = xorExpr()
      while (eatKw("or")) l = Bin("or", l, xorExpr())
      l
    }

    private def xorExpr(): Expr = {
      var l = andExpr()
      while (eatKw("xor")) l = Bin("xor", l, andExpr())
      l
    }

    private def andExpr(): Expr = {
      var l = notExpr()
      while (eatKw("and")) l = Bin("and", l, notExpr())
      l
    }

    private def notExpr(): Expr =
      if (eatKw("not")) Un("not", notExpr()) else eqExpr()

    /** EQ/NE/IS/LIKE — one level, left-associative (rules 55, 76-77, 84;
      * LIKE_KW and IS share the EQ precedence line, tql_token.h:11,21,27-28).
      */
    private def eqExpr(): Expr = {
      var l = relExpr()
      var go = true
      while (go) {
        if (peek.kind == "op" && Set("=", "==", "<>", "!=").contains(peek.text)) {
          val op = next().text
          l = Bin(if (op == "==") "=" else op, l, relExpr())
        } else if (isKw("is")) {
          next()
          val not = eatKw("not")
          relExpr() match {
            case NullLit => l = IsNullExpr(l, not)
            case r => l = IsExpr(l, r, not)
          }
        } else if (isKw("like") || (isKw("not") && pos + 1 < toks.size &&
            toks(pos + 1).kind == "id" && toks(pos + 1).text.equalsIgnoreCase("like"))) {
          val not = eatKw("not")
          expectKw("like")
          val pat = relExpr()
          val esc = if (eatKw("escape")) {
            val t = next(); if (t.kind != "str") fail("ESCAPE expects a string"); Some(t.text)
          } else None
          l = LikeExpr(l, pat, esc, not)
        } else go = false
      }
      l
    }

    private def relExpr(): Expr = {
      var l = bitExpr()
      while (peek.kind == "op" && Set("<", "<=", ">", ">=").contains(peek.text)) {
        val op = next().text; l = Bin(op, l, bitExpr())
      }
      l
    }

    /** `expr BITAND|BITOR|LSHIFT|RSHIFT expr` (rule 56). */
    private def bitExpr(): Expr = {
      var l = addExpr()
      while (peek.kind == "op" && Set("&", "|", "<<", ">>").contains(peek.text)) {
        val op = next().text; l = Bin(op, l, addExpr())
      }
      l
    }

    private def addExpr(): Expr = {
      var l = mulExpr()
      while (peek.kind == "op" && (peek.text == "+" || peek.text == "-")) {
        val op = next().text; l = Bin(op, l, mulExpr())
      }
      l
    }

    private def mulExpr(): Expr = {
      var l = unaryExpr()
      while (peek.kind == "op" && Set("*", "/", "%").contains(peek.text)) {
        val op = next().text; l = Bin(op, l, unaryExpr())
      }
      l
    }

    private def unaryExpr(): Expr = {
      if (isOp("-")) { next(); Un("neg", unaryExpr()) }
      else if (isOp("+")) { next(); unaryExpr() }
      else primary()
    }

    private def primary(): Expr = {
      val t = peek
      t.kind match {
        case "num" =>
          next()
          val isInt = !t.text.exists(ch => ch == '.' || ch == 'e' || ch == 'E')
          NumLit(t.text.toDouble, isInt)
        case "str" => next(); StrLit(t.text)
        case "blob" => next(); BlobLit(t.text)
        case "op" if t.text == "(" =>
          next(); val e = expr(); expectOp(")"); e
        case "id" if t.text.equalsIgnoreCase("true") => next(); BoolLit(true)
        case "id" if t.text.equalsIgnoreCase("false") => next(); BoolLit(false)
        case "id" if t.text.equalsIgnoreCase("null") => next(); NullLit
        // NAN/INF are keywords (kw.cpp:46-62), not column references
        case "id" if t.text.equalsIgnoreCase("nan") =>
          next(); NumLit(Double.NaN, isIntegral = false)
        case "id" if t.text.equalsIgnoreCase("inf") =>
          next(); NumLit(Double.PositiveInfinity, isIntegral = false)
        case "id" =>
          next()
          if (peek.kind == "op" && peek.text == "(") {
            next()
            if (t.text.equalsIgnoreCase("timestamp")) {
              // TIMESTAMP('iso8601') literal
              val a = next()
              if (a.kind != "str") fail("TIMESTAMP() expects a string literal")
              expectOp(")")
              TsLit(parseIso(a.text))
            } else {
              var args = Seq.empty[Expr]
              var star = false
              if (peek.kind == "op" && peek.text == "*") {
                // FUNC(*) or FUNC(*, args...) — the reference selection
                // grammar allows a leading * with trailing arguments
                // (TIME_SAMPLING(*|col, start, end, ...), selection_func.h:173)
                next(); star = true
                val buf = scala.collection.mutable.ArrayBuffer[Expr]()
                while (eatOp(",")) buf += expr()
                args = buf.toSeq
              }
              else if (!(peek.kind == "op" && peek.text == ")")) {
                val buf = scala.collection.mutable.ArrayBuffer[Expr](expr())
                while (eatOp(",")) buf += expr()
                args = buf.toSeq
              }
              expectOp(")")
              FuncCall(t.text.toUpperCase, args, star)
            }
          } else ColRef(t.text)
        case _ => fail("unexpected token")
      }
    }
  }

  /** GridDB accepts ISO-8601 with 'Z' or ±hh:mm offsets, ms/µs/ns fractions
    * (/root/reference/server/function_timestamp.h). Truncates to µs. */
  def parseIso(s: String): Long = {
    val inst =
      try java.time.OffsetDateTime.parse(s).toInstant
      catch {
        case _: Exception =>
          java.time.LocalDateTime
            .parse(s, java.time.format.DateTimeFormatter.ISO_LOCAL_DATE_TIME)
            .toInstant(java.time.ZoneOffset.UTC)
      }
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
  }
}

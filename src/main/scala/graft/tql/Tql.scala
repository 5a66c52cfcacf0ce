package graft.tql

/** TQL — GridDB's per-container NoSQL query language.
  *
  * Grammar per the reference LEMON rules (/root/reference/server/tql.cpp:
  * 200-284): `SELECT (*|function) [WHERE expr] [ORDER BY sortlist]
  * [LIMIT n [OFFSET m]]`, WHERE with AND/OR/XOR/NOT, comparisons,
  * arithmetic, LIKE..ESCAPE, IS [NOT] NULL. Single container, no joins,
  * no GROUP BY; the selection is `*`, one aggregation, or one selection
  * function. This is a fresh recursive-descent implementation (the
  * reference uses a generated LEMON parser — nothing to port).
  */
object TqlAst {
  sealed trait Expr
  final case class ColRef(name: String) extends Expr
  final case class NumLit(v: Double, isIntegral: Boolean) extends Expr
  final case class StrLit(v: String) extends Expr
  final case class BoolLit(v: Boolean) extends Expr
  case object NullLit extends Expr
  final case class TsLit(epochMicros: Long) extends Expr
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  final case class Un(op: String, e: Expr) extends Expr
  final case class FuncCall(name: String, args: Seq[Expr], star: Boolean) extends Expr
  final case class LikeExpr(e: Expr, pattern: Expr, escape: Option[String], not: Boolean) extends Expr
  final case class IsNullExpr(e: Expr, not: Boolean) extends Expr

  sealed trait Selection
  case object Star extends Selection
  final case class FuncSelection(call: FuncCall) extends Selection

  final case class Query(
      selection: Selection,
      from: Option[String],
      where: Option[Expr],
      orderBy: Seq[(String, Boolean)], // (col, ascending)
      limit: Option[Long],
      offset: Option[Long],
      explain: Int = 0) // 0 = none, 1 = EXPLAIN, 2 = EXPLAIN ANALYZE
}

final class TqlParseException(msg: String) extends RuntimeException(msg)

object TqlParser {
  import TqlAst._

  private final case class Tok(kind: String, text: String) // kind: id,num,str,op,eof

  private def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_') {
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
        if (Set("<=", ">=", "<>", "!=", "==").contains(two)) { out += Tok("op", two); i += 2 }
        else { out += Tok("op", c.toString); i += 1 }
      }
    }
    out += Tok("eof", "")
    out.result()
  }

  def parse(tql: String): Query = new P(lex(tql)).query()

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def isKw(k: String): Boolean =
      peek.kind == "id" && peek.text.equalsIgnoreCase(k)
    private def eatKw(k: String): Boolean = { if (isKw(k)) { pos += 1; true } else false }
    private def expectKw(k: String): Unit =
      if (!eatKw(k)) fail(s"expected $k")
    private def expectOp(o: String): Unit = {
      if (peek.kind == "op" && peek.text == o) pos += 1 else fail(s"expected '$o'")
    }
    private def fail(msg: String): Nothing =
      throw new TqlParseException(s"$msg at token ${pos} ('${peek.text}')")

    def query(): Query = {
      // EXPLAIN [ANALYZE] select ... (reference rules 4-5, server/tql.cpp:203-204)
      val explain =
        if (eatKw("explain")) { if (eatKw("analyze")) 2 else 1 } else 0
      expectKw("select")
      val sel =
        if (peek.kind == "op" && peek.text == "*") { next(); Star }
        else {
          val e = expr()
          e match {
            case f: FuncCall => FuncSelection(f)
            case _ => fail("selection must be *, an aggregation, or a selection function")
          }
        }
      val from = if (eatKw("from")) Some(next().text) else None
      val where = if (eatKw("where")) Some(expr()) else None
      var order: Seq[(String, Boolean)] = Nil
      if (eatKw("order")) {
        expectKw("by")
        val items = scala.collection.mutable.ArrayBuffer[(String, Boolean)]()
        var more = true
        while (more) {
          val c = next()
          if (c.kind != "id") fail("expected column in ORDER BY")
          val asc = if (eatKw("desc")) false else { eatKw("asc"); true }
          items += ((c.text, asc))
          if (peek.kind == "op" && peek.text == ",") next() else more = false
        }
        order = items.toSeq
      }
      var limit: Option[Long] = None
      var offset: Option[Long] = None
      if (eatKw("limit")) {
        limit = Some(next().text.toLong)
        if (eatKw("offset")) offset = Some(next().text.toLong)
      }
      if (peek.kind != "eof") fail("trailing input")
      Query(sel, from, where, order, limit, offset, explain)
    }

    def expr(): Expr = orExpr()

    private def orExpr(): Expr = {
      var l = andExpr()
      var go = true
      while (go) {
        if (eatKw("or")) l = Bin("or", l, andExpr())
        else if (eatKw("xor")) l = Bin("xor", l, andExpr())
        else go = false
      }
      l
    }

    private def andExpr(): Expr = {
      var l = notExpr()
      while (eatKw("and")) l = Bin("and", l, notExpr())
      l
    }

    private def notExpr(): Expr =
      if (eatKw("not")) Un("not", notExpr()) else cmpExpr()

    private def cmpExpr(): Expr = {
      val l = addExpr()
      if (peek.kind == "op" && Set("=", "==", "<>", "!=", "<", "<=", ">", ">=").contains(peek.text)) {
        val op = next().text
        Bin(if (op == "==") "=" else op, l, addExpr())
      } else if (isKw("is")) {
        next()
        val not = eatKw("not")
        expectKw("null"); IsNullExpr(l, not)
      } else if (isKw("like") || isKw("not")) {
        val not = eatKw("not")
        if (not && !isKw("like")) fail("expected LIKE after NOT")
        expectKw("like")
        val pat = addExpr()
        val esc = if (eatKw("escape")) {
          val t = next(); if (t.kind != "str") fail("ESCAPE expects a string"); Some(t.text)
        } else None
        LikeExpr(l, pat, esc, not)
      } else l
    }

    private def addExpr(): Expr = {
      var l = mulExpr()
      var go = true
      while (go) {
        if (peek.kind == "op" && (peek.text == "+" || peek.text == "-")) {
          val op = next().text; l = Bin(op, l, mulExpr())
        } else go = false
      }
      l
    }

    private def mulExpr(): Expr = {
      var l = unaryExpr()
      var go = true
      while (go) {
        if (peek.kind == "op" && Set("*", "/", "%").contains(peek.text)) {
          val op = next().text; l = Bin(op, l, unaryExpr())
        } else go = false
      }
      l
    }

    private def unaryExpr(): Expr = {
      if (peek.kind == "op" && peek.text == "-") { next(); Un("neg", unaryExpr()) }
      else if (peek.kind == "op" && peek.text == "+") { next(); unaryExpr() }
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
        case "op" if t.text == "(" =>
          next(); val e = expr(); expectOp(")"); e
        case "id" if t.text.equalsIgnoreCase("true") => next(); BoolLit(true)
        case "id" if t.text.equalsIgnoreCase("false") => next(); BoolLit(false)
        case "id" if t.text.equalsIgnoreCase("null") => next(); NullLit
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
                while (peek.kind == "op" && peek.text == ",") { next(); buf += expr() }
                args = buf.toSeq
              }
              else if (!(peek.kind == "op" && peek.text == ")")) {
                val buf = scala.collection.mutable.ArrayBuffer[Expr](expr())
                while (peek.kind == "op" && peek.text == ",") { next(); buf += expr() }
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

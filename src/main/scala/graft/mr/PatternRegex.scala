package graft.mr

/** Row-pattern regex for MATCH_RECOGNIZE.
  *
  * Grammar (reference rules 162-194,
  * /root/reference/server/sql_internal_parser.cpp:996-1028): variables
  * composed with concatenation, alternation `|`, grouping `()`, quantifiers
  * `* + ? {n} {n,} {n,m} {,m}` (greedy), and the zero-width anchors
  * `^` (partition start, prefix on a base — rule 190 `rp_base ::= CARET
  * rp_base`) and `$` (partition end, postfix on a factor — rule 187
  * `rp_factor ::= rp_factor DOLLAR`). Matching is greedy backtracking —
  * quantifiers prefer the longest alternative first, per SQL row-pattern
  * semantics.
  */
object PatternRegex {

  sealed trait Node
  final case class Sym(name: String) extends Node
  final case class Cat(parts: Seq[Node]) extends Node
  final case class Alt(choices: Seq[Node]) extends Node
  final case class Rep(child: Node, min: Int, max: Int) extends Node // max = Int.MaxValue for unbounded
  case object Start extends Node // `^`: matches the empty string at partition start
  case object End extends Node   // `$`: matches the empty string at partition end

  final class PatternParseException(msg: String) extends RuntimeException(msg)

  def parse(pattern: String): Node = {
    val p = new Parser(pattern)
    val n = p.alt()
    p.expectEnd()
    n
  }

  private final class Parser(s: String) {
    private var i = 0
    private def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def peek: Char = { skipWs(); if (i < s.length) s(i) else '\u0000' }

    def alt(): Node = {
      val first = cat()
      val choices = scala.collection.mutable.ArrayBuffer(first)
      while (peek == '|') { i += 1; choices += cat() }
      if (choices.size == 1) first else Alt(choices.toSeq)
    }

    def cat(): Node = {
      val parts = scala.collection.mutable.ArrayBuffer[Node]()
      var go = true
      while (go) {
        peek match {
          case c if c.isLetter || c == '_' || c == '(' || c == '^' =>
            parts += factor()
          case _ => go = false
        }
      }
      if (parts.isEmpty) fail("empty pattern term")
      if (parts.size == 1) parts.head else Cat(parts.toSeq)
    }

    // factor ::= base quantifier? ('$')*  — `$` binds after the quantifier
    // (reference rule 187), so `A*$` anchors the whole repetition's end.
    private def factor(): Node = {
      var node = quantified(base())
      while (peek == '$') { i += 1; node = Cat(Seq(node, End)) }
      node
    }

    // base ::= '^' base | '(' alt ')' | PERMUTE '(' alt (',' alt)* ')'
    //        | symbol  — `^` binds before the quantifier (reference rule
    // 190), so `^A+` requires the run to begin at the partition's first row.
    private def base(): Node = peek match {
      case '^' => i += 1; Cat(Seq(Start, base()))
      case '(' =>
        i += 1
        val inner = alt()
        if (peek != ')') fail("expected )")
        i += 1
        inner
      case _ =>
        val s0 = symbol()
        s0 match {
          case Sym(name) if name.equalsIgnoreCase("PERMUTE") && peek == '(' =>
            permute()
          case other => other
        }
    }

    // PERMUTE(p1, ..., pk) = alternation of every ordering of the elements,
    // tried in lexical order of the permutation (SQL row-pattern semantics).
    private def permute(): Node = {
      i += 1 // consume '('
      val elems = scala.collection.mutable.ArrayBuffer(alt())
      while (peek == ',') { i += 1; elems += alt() }
      if (peek != ')') fail("expected ) in PERMUTE")
      i += 1
      if (elems.size > 7) fail(s"PERMUTE of ${elems.size} elements (max 7)")
      if (elems.size == 1) elems.head
      else Alt(elems.toSeq.permutations.map(p => Cat(p)).toSeq)
    }

    private def symbol(): Node = {
      skipWs()
      val start = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
      if (start == i) fail("expected pattern variable")
      Sym(s.substring(start, i))
    }

    private def quantified(n: Node): Node = peek match {
      case '*' => i += 1; Rep(n, 0, Int.MaxValue)
      case '+' => i += 1; Rep(n, 1, Int.MaxValue)
      case '?' => i += 1; Rep(n, 0, 1)
      case '{' =>
        i += 1
        // `{,m}` (reference rule 186) = `{0,m}`
        val lo = if (peek == ',') 0 else number()
        val node = peek match {
          case ',' =>
            i += 1
            if (peek == '}') Rep(n, lo, Int.MaxValue)
            else { val hi = number(); Rep(n, lo, hi) }
          case _ => Rep(n, lo, lo)
        }
        if (peek != '}') fail("expected }")
        i += 1
        node
      case _ => n
    }

    private def number(): Int = {
      skipWs()
      val start = i
      while (i < s.length && s(i).isDigit) i += 1
      if (start == i) fail("expected number")
      s.substring(start, i).toInt
    }

    def expectEnd(): Unit = { skipWs(); if (i < s.length) fail(s"trailing '${s.substring(i)}'") }
    private def fail(msg: String): Nothing =
      throw new PatternParseException(s"$msg at offset $i in pattern '$s'")
  }

  /** Whether the pattern uses the `^` / `$` anchors (unsupported in
    * streaming, where the partition end is never observed). */
  def hasAnchor(n: Node): Boolean = n match {
    case Start | End => true
    case Cat(ps) => ps.exists(hasAnchor)
    case Alt(cs) => cs.exists(hasAnchor)
    case Rep(c, _, _) => hasAnchor(c)
    case Sym(_) => false
  }

  /** Maximum number of rows a single match can span — None when any
    * quantifier is unbounded (`*`, `+`, `{n,}`), in which case one match can
    * cover an entire series and the unkeyed scan is sequential by semantics.
    * Finite bounds let the unkeyed scan chunk with an L-row overlap. */
  def maxMatchLen(n: Node): Option[Int] = n match {
    case Sym(_) => Some(1)
    case Start | End => Some(0)
    case Cat(ps) =>
      ps.foldLeft(Option(0))((a, p) => for (x <- a; y <- maxMatchLen(p)) yield x + y)
    case Alt(cs) =>
      cs.foldLeft(Option(0))((a, c) => for (x <- a; y <- maxMatchLen(c)) yield math.max(x, y))
    case Rep(c, _, mx) =>
      if (mx == Int.MaxValue) None
      else maxMatchLen(c).map(l => math.min(l.toLong * mx, Int.MaxValue.toLong).toInt)
  }

  /** Variables referenced by the pattern, in first-appearance order. */
  def variables(n: Node): Seq[String] = n match {
    case Sym(v) => Seq(v)
    case Cat(ps) => ps.flatMap(variables).distinct
    case Alt(cs) => cs.flatMap(variables).distinct
    case Rep(c, _, _) => variables(c)
    case Start | End => Nil
  }

  /** Greedy backtracking match of `node` against rows [start, n) where
    * `sym(rowIdx, varName)` tests the DEFINE predicate. Returns the row->var
    * assignment of the first (greedy-longest) match anchored at `start`,
    * or None. */
  def matchAt(node: Node, start: Int, n: Int,
              sym: (Int, String) => Boolean): Option[Vector[String]] =
    matchAt(node, start, (j: Int) => j < n, sym)

  def matchAt(node: Node, start: Int, has: Int => Boolean,
              sym: (Int, String) => Boolean): Option[Vector[String]] =
    matchAt(node, start, has, sym, partStart = 0)

  /** Variant for streaming row sources: `has(i)` reports whether row `i`
    * exists, pulling it into the caller's buffer on demand — the matcher
    * never needs the group's size up front, so a group can be matched with
    * only the current attempt's rows resident. Row indices are probed in
    * non-decreasing reach, and `has(i)` false means `i` is at/past the
    * group's end (indices are contiguous). `partStart` is the index of the
    * partition's first row in the caller's index space (a chunk of a larger
    * series passes the chunk-local index of the global first row, or any
    * unreachable value when the chunk does not contain it) — the `^` anchor
    * matches only a match starting there. */
  def matchAt(node: Node, start: Int, has: Int => Boolean,
              sym: (Int, String) => Boolean, partStart: Int): Option[Vector[String]] = {

    // continuation-passing backtracking; assignment carried as a Vector
    def go(nd: Node, pos: Int, acc: Vector[String],
           k: (Int, Vector[String]) => Option[Vector[String]]): Option[Vector[String]] =
      nd match {
        // reference semantics (sql_operator_sort.cpp:6879): the top anchor
        // requires the MATCH to begin at the partition's first row (firstPos_
        // check), not the anchor's own NFA position — so `^V+` (which parses
        // as `(^V)+` per rules 180/190) still matches the whole leading run.
        case Start => if (start == partStart) k(pos, acc) else None
        case End => if (!has(pos)) k(pos, acc) else None
        case Sym(v) =>
          if (has(pos) && sym(pos, v)) k(pos + 1, acc :+ v) else None
        case Cat(parts) =>
          def chain(idx: Int, p: Int, a: Vector[String]): Option[Vector[String]] =
            if (idx == parts.size) k(p, a)
            else go(parts(idx), p, a, (p2, a2) => chain(idx + 1, p2, a2))
          chain(0, pos, acc)
        case Alt(choices) =>
          choices.view.flatMap(c => go(c, pos, acc, k)).headOption
        case Rep(child, min, max) =>
          // greedy: consume as many as possible, then backtrack
          def rep(cnt: Int, p: Int, a: Vector[String]): Option[Vector[String]] = {
            val more =
              if (cnt < max)
                go(child, p, a, (p2, a2) =>
                  if (p2 == p) None // zero-width guard
                  else rep(cnt + 1, p2, a2))
              else None
            more.orElse(if (cnt >= min) k(p, a) else None)
          }
          rep(0, pos, acc)
      }

    go(node, start, Vector.empty, (_, a) => Some(a))
  }
}

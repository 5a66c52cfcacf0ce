package graft

import org.apache.spark.sql.functions._
import graft.mr.{MatchRecognize, PatternRegex}
import scala.util.Random

/** Differential fuzz for MATCH_RECOGNIZE against an INDEPENDENT oracle.
  *
  * Every prior MR test either hand-pins expected rows or compares the
  * chunk-parallel path to the sequential path — both sides of that parity
  * share `PatternRegex.matchAt`. This spec re-expresses each fuzzed row
  * pattern as a `java.util.regex` pattern over a string that encodes, per
  * row, the SET of DEFINE variables the row satisfies (one char per
  * subset), and replays the AFTER MATCH SKIP enumeration loop with
  * `Matcher.lookingAt` extents. Both matchers implement greedy,
  * left-to-right-alternation backtracking, so the first (greedy-longest)
  * match anchored at a position must have the same extent; the skip loop
  * over extents is then semantics, not implementation.
  *
  * Oracle-translatable surface (generator stays inside it):
  *  - `^` gates the MATCH's start row, not an NFA position
  *    (sql_operator_sort.cpp:6879 firstPos_ check) — translated by
  *    compiling two regex variants and picking per attempt: at the
  *    partition's first row `Start` becomes a no-op, elsewhere `(?!)`
  *    (always-fail), exactly the engine's `start == partStart` test.
  *  - `$` → java `$` under anchoring bounds with `region(i, n)`.
  *  - Quantified terms are never nullable (the generator guarantees a
  *    min-length ≥ 1 child), so the engine's zero-width repetition guard
  *    never fires and java's own zero-length-loop rule is never consulted
  *    — the one place the two backtracking engines could disagree.
  *  - Skip modes PAST LAST ROW / TO NEXT ROW are replayed fully; the
  *    classifier-dependent TO [FIRST] var modes get a HYBRID oracle (last
  *    test): per-match extents and inter-match gaps are fully
  *    regex-verified, with only the resume POSITION derived from the
  *    engine's classifier sequence.
  *
  * Classifier columns are beyond the regex oracle (java.util.regex keeps
  * only the last capture of a repeated group) — the classifier tests use
  * a second independent oracle instead: a lazy ENUMERATOR of all
  * variable-assignment paths in backtracking preference order, whose
  * greedy-first path must equal the engine's assignment row by row.
  */
class MrFuzzSpec extends SparkTestBase {
  import spark.implicits._
  import PatternRegex._

  // ---- pattern generation (legal, oracle-translatable) ----

  /** Minimum rows a node must consume (anchors are zero-width). */
  private def minLen(n: Node): Int = n match {
    case Sym(_) => 1
    case Start | End => 0
    case Cat(ps) => ps.map(minLen).sum
    case Alt(cs) => cs.map(minLen).min
    case Rep(c, mn, _) => mn * minLen(c)
  }

  /** Random pattern AST over `vars`. `unboundedBudget` caps unbounded
    * quantifiers at one per pattern (avoids nested-unbounded blowup in
    * BOTH backtracking engines); quantified children are never nullable. */
  private def genNode(rnd: Random, vars: Seq[String], depth: Int,
                      budget: Array[Int]): Node = {
    val leaf = depth <= 0 || rnd.nextInt(10) < 3
    if (leaf) Sym(vars(rnd.nextInt(vars.size)))
    else rnd.nextInt(10) match {
      case r if r < 4 => // Cat of 2-3
        Cat(Seq.fill(2 + rnd.nextInt(2))(genNode(rnd, vars, depth - 1, budget)))
      case r if r < 7 => // Alt of 2-3
        Alt(Seq.fill(2 + rnd.nextInt(2))(genNode(rnd, vars, depth - 1, budget)))
      case _ => // Rep over a non-nullable child
        var child = genNode(rnd, vars, depth - 1, budget)
        if (minLen(child) == 0) child = Sym(vars(rnd.nextInt(vars.size)))
        val unbounded = budget(0) > 0 && rnd.nextInt(4) == 0
        if (unbounded) {
          budget(0) -= 1
          // single-symbol children only: unbounded repetition of an
          // ambiguous group is the classic catastrophic-backtracking shape
          // in BOTH engines (`(a|aa)*` on failure) — a hang, not a finding
          val mn = rnd.nextInt(3) // 0..2 -> *, +, {2,}
          Rep(Sym(vars(rnd.nextInt(vars.size))), mn, Int.MaxValue)
        } else {
          val mn = rnd.nextInt(3)
          Rep(child, mn, mn + rnd.nextInt(3)) // bounded, max <= mn+2
        }
    }
  }

  /** Render an AST back to the MATCH_RECOGNIZE pattern string — also
    * exercises the parser (the spec asserts parse(render(ast)) round-trips
    * to an equivalent matcher, not the identical tree). */
  private def render(n: Node): String = n match {
    case Sym(v) => v
    case Cat(ps) => ps.map(renderAtomInCat).mkString(" ")
    case Alt(cs) => cs.map(render).mkString(" | ")
    case Rep(c, mn, mx) =>
      val atom = c match {
        case Sym(v) => v
        case other => "(" + render(other) + ")"
      }
      val q =
        if (mn == 0 && mx == Int.MaxValue) "*"
        else if (mn == 1 && mx == Int.MaxValue) "+"
        else if (mn == 0 && mx == 1) "?"
        else if (mx == Int.MaxValue) s"{$mn,}"
        else if (mn == mx) s"{$mn}"
        else s"{$mn,$mx}"
      atom + q
    case Start => "^"
    case End => "$"
  }
  private def renderAtomInCat(n: Node): String = n match {
    case Alt(_) => "(" + render(n) + ")"
    case other => render(other)
  }

  // ---- java.util.regex oracle ----

  /** Char encoding of a row's satisfied-variable set: bitmask over `vars`
    * order, offset from 'a' (≤ 4 vars → ≤ 16 distinct chars). */
  private def maskChar(mask: Int): Char = ('a' + mask).toChar

  /** Character class matching every subset-char that contains `v`. */
  private def classOf(v: String, vars: Seq[String]): String = {
    val bit = vars.indexOf(v)
    val chars = (0 until (1 << vars.size)).filter(m => ((m >> bit) & 1) == 1)
      .map(maskChar)
    "[" + chars.mkString + "]"
  }

  private def toJava(n: Node, vars: Seq[String], startOk: Boolean): String = n match {
    case Sym(v) => classOf(v, vars)
    case Cat(ps) => ps.map(p => "(?:" + toJava(p, vars, startOk) + ")").mkString
    case Alt(cs) => "(?:" + cs.map(toJava(_, vars, startOk)).mkString("|") + ")"
    case Rep(c, mn, mx) =>
      val q =
        if (mn == 0 && mx == Int.MaxValue) "*"
        else if (mn == 1 && mx == Int.MaxValue) "+"
        else if (mn == 0 && mx == 1) "?"
        else if (mx == Int.MaxValue) s"{$mn,}"
        else if (mn == mx) s"{$mn}"
        else s"{$mn,$mx}"
      "(?:" + toJava(c, vars, startOk) + ")" + q
    case Start => if (startOk) "" else "(?!)"
    case End => "$"
  }

  /** Per-case compiled oracle (two variants, hoisted — the hybrid test
    * probes O(rows) positions per case). `lenAt` = greedy-first match
    * length at a position (None = no match or a zero-width match, which
    * the enumeration treats as no match). */
  private final class OraclePatterns(node: Node, vars: Seq[String]) {
    import java.util.regex.Pattern
    private val atStart = Pattern.compile(toJava(node, vars, startOk = true))
    private val elsewhere = Pattern.compile(toJava(node, vars, startOk = false))
    def lenAt(encoded: String, at: Int): Option[Int] = {
      val m = (if (at == 0) atStart else elsewhere).matcher(encoded)
      m.region(at, encoded.length)
      if (m.lookingAt() && m.end() > at) Some(m.end() - at) else None
    }
  }

  /** Replay the AFTER MATCH SKIP enumeration with java-regex extents:
    * (start, length) of each emitted match over the encoded row string. */
  private def oracleExtents(node: Node, encoded: String, vars: Seq[String],
                            skipPast: Boolean): Seq[(Int, Int)] = {
    import java.util.regex.Pattern
    val atStart = Pattern.compile(toJava(node, vars, startOk = true))
    val elsewhere = Pattern.compile(toJava(node, vars, startOk = false))
    val n = encoded.length
    val out = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var i = 0
    while (i < n) {
      val m = (if (i == 0) atStart else elsewhere).matcher(encoded)
      m.region(i, n)
      if (m.lookingAt() && m.end() > i) {
        out += ((i, m.end() - i))
        i += (if (skipPast) m.end() - i else 1)
      } else i += 1
    }
    out.toSeq
  }

  /** Engine-side extent replay at the matcher level (the GroupMatcher's
    * exact scan loop over matchAt — PastLastRow advances by the match
    * length, ToNextRow by one; empty matches are non-matches). */
  private def engineExtents(node: Node, masks: Array[Int], vars: Seq[String],
                            skipPast: Boolean): Seq[(Int, Int)] = {
    val n = masks.length
    val sym = (p: Int, v: String) => ((masks(p) >> vars.indexOf(v)) & 1) == 1
    val out = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var i = 0
    while (i < n) {
      PatternRegex.matchAt(node, i, n, sym) match {
        case Some(a) if a.nonEmpty =>
          out += ((i, a.size))
          i += (if (skipPast) a.size else 1)
        case _ => i += 1
      }
    }
    out.toSeq
  }

  private def genCase(seed: Int): (Node, String, Seq[String], Array[Int]) = {
    val rnd = new Random(seed)
    val nVars = 2 + rnd.nextInt(3)
    val vars = Seq("A", "B", "C", "D").take(nVars)
    val body0 = genNode(rnd, vars, depth = 3, budget = Array(1))
    // ~1/4 of cases: wrap in PERMUTE(e1, e2[, e3]) — the parser expands to
    // the lexical alternation of permutations; the oracle node is built
    // from the SAME SQL rule re-coded here (the regex match itself stays
    // the independent side). Elements are non-nullable like Rep children.
    val (body, bodyStr) =
      if (rnd.nextInt(4) == 0) {
        val k = 2 + rnd.nextInt(2)
        val elems = Seq.fill(k) {
          val e = genNode(rnd, vars, depth = 2, budget = Array(0))
          if (minLen(e) == 0) Sym(vars(rnd.nextInt(vars.size))) else e
        }
        (Alt(elems.permutations.map(p => Cat(p)).toSeq),
          "PERMUTE(" + elems.map(render).mkString(", ") + ")")
      } else (body0, "(" + render(body0) + ")")
    val anchored =
      (rnd.nextInt(5) == 0, rnd.nextInt(5) == 0) match {
        case (true, true) => Cat(Seq(Start, body, End))
        case (true, false) => Cat(Seq(Start, body))
        case (false, true) => Cat(Seq(body, End))
        case _ => body
      }
    val pattern =
      (if (hasStart(anchored)) "^" else "") +
        bodyStr +
        (if (hasEnd(anchored)) "$" else "")
    val nRows = 30 + rnd.nextInt(220)
    // per-var satisfaction probability drawn once, rows drawn independently
    val probs = vars.map(_ => 0.2 + rnd.nextDouble() * 0.5)
    val masks = Array.fill(nRows) {
      vars.indices.foldLeft(0)((m, b) =>
        if (rnd.nextDouble() < probs(b)) m | (1 << b) else m)
    }
    (anchored, pattern, vars, masks)
  }
  private def hasStart(n: Node): Boolean = n match {
    case Start => true; case Cat(ps) => ps.exists(hasStart); case _ => false
  }
  private def hasEnd(n: Node): Boolean = n match {
    case End => true; case Cat(ps) => ps.exists(hasEnd); case _ => false
  }

  /** Sweep width multiplier (GRAFT_MR_FUZZ_MUL, default 1 = 3000 seeds) —
    * same wide-sweep discipline as AuthFuzzSpec. */
  private val fuzzMul = sys.env.get("GRAFT_MR_FUZZ_MUL").map(_.toInt).getOrElse(1)

  test("matcher-level: 3000 random patterns match java.util.regex extents") {
    var nonEmptyCases = 0
    for (seed <- 0 until 3000 * fuzzMul; skipPast <- Seq(true, false)) {
      val (node, pattern, vars, masks) = genCase(seed)
      val encoded = masks.map(maskChar).mkString
      // the rendered string must parse back to an equivalent matcher
      val parsed = PatternRegex.parse(pattern)
      val eng = engineExtents(parsed, masks, vars, skipPast)
      val ora = oracleExtents(node, encoded, vars, skipPast)
      assert(eng == ora,
        s"seed=$seed skipPast=$skipPast pattern='$pattern' " +
          s"engine=${eng.take(8)} oracle=${ora.take(8)} over '${encoded.take(60)}'")
      if (eng.nonEmpty) nonEmptyCases += 1
    }
    // degenerate-sweep guard: most cases must actually match something
    assert(nonEmptyCases > 3000 * fuzzMul, s"only $nonEmptyCases non-empty cases")
  }

  test("engine-level: keyed + chunked-unkeyed extents match the regex oracle") {
    for (seed <- 1000 until (1000 + 30 * fuzzMul); skipPast <- Seq(true, false)) {
      val (node, pattern, vars, masks) = genCase(seed)
      val skip = if (skipPast) MatchRecognize.AfterMatchSkip.PastLastRow
                 else MatchRecognize.AfterMatchSkip.ToNextRow
      val defines = vars.zipWithIndex.map { case (v, b) =>
        v -> (shiftright(col("m").cast("int"), b).bitwiseAND(1) === 1)
      }.toMap

      // keyed: two groups with independent mask streams (second group's
      // masks drawn from a shifted seed, truncated to THIS seed's variable
      // alphabet — a wider mask would encode to chars outside the oracle's
      // character classes) — oracle runs per group
      val masks2 = genCase(seed + 7919)._4.map(_ & ((1 << vars.size) - 1))
      val rows = masks.zipWithIndex.map { case (m, i) => ("g1", i.toLong, m) } ++
        masks2.zipWithIndex.map { case (m, i) => ("g2", i.toLong, m) }
      val df = rows.toSeq.toDF("k", "seq", "m")
      val out = MatchRecognize.allRowsPerMatch(df, Seq("k"), Seq("seq"),
          pattern, defines, skip)
        .select("k", "seq", "match_num")
        .as[(String, Long, Long)].collect()
      for ((key, ms) <- Seq(("g1", masks), ("g2", masks2))) {
        val encoded = ms.map(maskChar).mkString
        val ora = oracleExtents(node, encoded, vars, skipPast)
        val got = out.filter(_._1 == key).groupBy(_._3).values
          .map(g => (g.map(_._2).min.toInt, g.length)).toSeq.sorted
        assert(got == ora.sorted.toSeq,
          s"keyed seed=$seed skipPast=$skipPast key=$key pattern='$pattern'")
      }

      // unkeyed with a small chunk size: bounded patterns take the
      // chunk-parallel path, unbounded the sequential scan — both must
      // agree with the oracle (an independent check on the chunk stitch)
      val df1 = masks.zipWithIndex.map { case (m, i) => (i.toLong, m) }
        .toSeq.toDF("seq", "m")
      val outU = MatchRecognize.matchedWithPos(df1, Nil, Seq("seq"), pattern,
          defines, skip, chunkRows = 16)
        .select("seq", "match_num").as[(Long, Long)].collect()
      val oraU = oracleExtents(node, masks.map(maskChar).mkString, vars, skipPast)
      val gotU = outU.groupBy(_._2).values
        .map(g => (g.map(_._1).min.toInt, g.length)).toSeq.sorted
      assert(gotU == oraU.sorted.toSeq,
        s"unkeyed seed=$seed skipPast=$skipPast pattern='$pattern'")
      // match_num must be sequential from 1 in match-start order
      val byNum = outU.groupBy(_._2).map { case (n0, g) => (n0, g.map(_._1).min) }
        .toSeq.sortBy(_._2).map(_._1)
      assert(byNum == (1L to byNum.size), s"match_num gap seed=$seed")
    }
  }

  // ---- enumerative assignment oracle (r12, verdict ask #5) ----
  // The regex oracle verifies EXTENTS but not per-row CLASSIFIER
  // (java.util.regex keeps only the last repeated-group capture). This
  // enumerator lists every variable-assignment path of a pattern anchored
  // at a position, LAZILY, in textbook backtracking preference order —
  // a quantifier prefers one more repetition, an alternation tries
  // branches left to right — so `.headOption` is the greedy-first path
  // without materializing the exponential tail. It shares no code with
  // PatternRegex.matchAt (fold over the AST vs an NFA scan), making the
  // classifier sequence independently derived.

  private def enumAssignments(node: Node, pos: Int, n: Int,
      sym: (Int, String) => Boolean): LazyList[Vector[String]] = node match {
    case Sym(v) =>
      if (pos < n && sym(pos, v)) LazyList(Vector(v)) else LazyList.empty
    case Start => // gates the MATCH start row to the partition's first row
      if (pos == 0) LazyList(Vector.empty) else LazyList.empty
    case End =>
      if (pos == n) LazyList(Vector.empty) else LazyList.empty
    case Cat(ps) =>
      // assignment length == rows consumed (anchors are zero-width)
      ps.foldLeft(LazyList(Vector.empty[String])) { (acc, p) =>
        acc.flatMap(a => enumAssignments(p, pos + a.length, n, sym).map(a ++ _))
      }
    case Alt(cs) =>
      LazyList.from(cs).flatMap(enumAssignments(_, pos, n, sym))
    case Rep(c, mn, mx) =>
      def go(p: Int, taken: Int): LazyList[Vector[String]] = {
        val more =
          if (taken < mx)
            enumAssignments(c, p, n, sym).filter(_.nonEmpty)
              .flatMap(a => go(p + a.length, taken + 1).map(a ++ _))
          else LazyList.empty
        val stop =
          if (taken >= mn) LazyList(Vector.empty[String]) else LazyList.empty
        more #::: stop
      }
      go(pos, 0)
  }

  /** Skip-loop replay with enumerative assignments: (start, classifiers)
    * of each emitted match — the classifier-sequence analogue of
    * [[oracleExtents]]. */
  private def oracleAssignments(node: Node, masks: Array[Int],
      vars: Seq[String], skipPast: Boolean): Seq[(Int, Vector[String])] = {
    val n = masks.length
    val sym = (p: Int, v: String) => ((masks(p) >> vars.indexOf(v)) & 1) == 1
    val out = scala.collection.mutable.ArrayBuffer[(Int, Vector[String])]()
    var i = 0
    while (i < n) {
      // the greedy-FIRST path only: a zero-width first path means the
      // position does not match (same rule as the regex oracle's
      // `m.end() > at` and the engine's empty-match guard) — later
      // non-empty alternatives are NOT consulted
      enumAssignments(node, i, n, sym).headOption.filter(_.nonEmpty) match {
        case Some(a) =>
          out += ((i, a))
          i += (if (skipPast) a.size else 1)
        case None => i += 1
      }
    }
    out.toSeq
  }

  test("classifier fuzz: matchAt assignments equal the enumerative oracle's greedy-first path") {
    // rows capped at 12 so a FAILING position's exhaustive backtracking
    // stays bounded (the lazy head is cheap; proving no-match is not)
    var nonEmpty = 0
    for (seed <- 4000 until (4000 + 600 * fuzzMul); skipPast <- Seq(true, false)) {
      val (node, pattern, vars, masksFull) = genCase(seed)
      val masks = masksFull.take(12)
      val sym = (p: Int, v: String) => ((masks(p) >> vars.indexOf(v)) & 1) == 1
      val parsed = PatternRegex.parse(pattern)
      // engine-side skip loop at the matcher level, keeping assignments
      val eng = {
        val out = scala.collection.mutable.ArrayBuffer[(Int, Vector[String])]()
        var i = 0
        while (i < masks.length) {
          PatternRegex.matchAt(parsed, i, masks.length, sym) match {
            case Some(a) if a.nonEmpty =>
              out += ((i, a.toVector)); i += (if (skipPast) a.size else 1)
            case _ => i += 1
          }
        }
        out.toSeq
      }
      val ora = oracleAssignments(node, masks, vars, skipPast)
      assert(eng == ora,
        s"seed=$seed skipPast=$skipPast pattern='$pattern' " +
          s"engine=${eng.take(4)} oracle=${ora.take(4)}")
      if (eng.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty > 300 * fuzzMul, s"only $nonEmpty non-empty classifier cases")
  }

  test("engine-level classifier: per-row CLASSIFIER/MATCH_NUMBER match the enumerative oracle") {
    // r13 (verdict #5): 50 seeds x 2 skip modes default (was 25), and
    // chunkRows cycles 8/16/65536 so the chunk-parallel stitch runs under
    // the per-row classifier oracle, not only the extent oracle
    for (seed <- 4700 until (4700 + 50 * fuzzMul); skipPast <- Seq(true, false)) {
      val (node, pattern, vars, masksFull) = genCase(seed)
      val masks = masksFull.take(12)
      val skip = if (skipPast) MatchRecognize.AfterMatchSkip.PastLastRow
                 else MatchRecognize.AfterMatchSkip.ToNextRow
      val defines = vars.zipWithIndex.map { case (v, b) =>
        v -> (shiftright(col("m").cast("int"), b).bitwiseAND(1) === 1)
      }.toMap
      val df = masks.zipWithIndex.map { case (m, i) => (i.toLong, m) }
        .toSeq.toDF("seq", "m")
      val chunk = Seq(8, 16, 65536)(seed % 3)
      val out = MatchRecognize.matchedWithPos(df, Nil, Seq("seq"), pattern,
          defines, skip, chunkRows = chunk)
        .select("seq", "match_num", "classifier")
        .as[(Long, Long, String)].collect().sortBy(r => (r._2, r._1))
      val ora = oracleAssignments(node, masks, vars, skipPast)
      // per-row: match m's rows are [start, start+len) classified in path order
      val expected = ora.zipWithIndex.flatMap { case ((start, assign), m) =>
        assign.zipWithIndex.map { case (v, j) =>
          (start.toLong + j, (m + 1).toLong, v)
        }
      }
      assert(out.toSeq == expected,
        s"seed=$seed skipPast=$skipPast pattern='$pattern'\n" +
          s"engine=${out.take(10).toSeq}\noracle=${expected.take(10)}")
    }
  }

  test("engine-level classifier, KEYED: per-partition oracle with varied partition sizes") {
    // r13 (verdict #5): multi-partition series under the per-row
    // classifier oracle — partition sizes vary per seed (12 / 3..11 / 2
    // rows), match numbering and the skip loop must restart per key, and
    // a start-anchored pattern must gate on each PARTITION's first row,
    // not the frame's. masks for the second/third partitions come from
    // independent seeds re-masked to this pattern's variable set.
    import MatchRecognize.AfterMatchSkip
    for (seed <- 5400 until (5400 + 50 * fuzzMul); skipPast <- Seq(true, false)) {
      val (node, pattern, vars, masksFull) = genCase(seed)
      val varMask = (1 << vars.size) - 1
      val parts: Seq[(String, Array[Int])] = Seq(
        ("k1", masksFull.take(12)),
        ("k2", genCase(seed + 7919)._4.map(_ & varMask).take(3 + seed % 9)),
        ("k3", genCase(seed + 104729)._4.map(_ & varMask).take(2)))
      val skip = if (skipPast) AfterMatchSkip.PastLastRow else AfterMatchSkip.ToNextRow
      val defines = vars.zipWithIndex.map { case (v, b) =>
        v -> (shiftright(col("m").cast("int"), b).bitwiseAND(1) === 1)
      }.toMap
      val df = parts.flatMap { case (k, ms) =>
        ms.zipWithIndex.map { case (m, i) => (k, i.toLong, m) }
      }.toDF("k", "seq", "m")
      val out = MatchRecognize.allRowsPerMatch(df, Seq("k"), Seq("seq"), pattern,
          defines, skip)
        .select("k", "seq", "match_num", "classifier")
        .as[(String, Long, Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(r => (r._3, r._2)).toSeq).toMap
      for ((k, masks) <- parts) {
        val ora = oracleAssignments(node, masks, vars, skipPast)
        val expected = ora.zipWithIndex.flatMap { case ((start, assign), m) =>
          assign.zipWithIndex.map { case (v, j) =>
            (k, start.toLong + j, (m + 1).toLong, v)
          }
        }
        assert(out.getOrElse(k, Nil) == expected,
          s"seed=$seed skipPast=$skipPast key=$k pattern='$pattern'\n" +
            s"engine=${out.getOrElse(k, Nil).take(10)}\noracle=${expected.take(10)}")
      }
    }
  }

  /** TO [FIRST] <var> skip positions depend on the engine's row→variable
    * ASSIGNMENT, which a regex extent cannot reproduce — so this is a
    * HYBRID oracle: every emitted match's extent is independently
    * regex-verified at its start, every position the scan passed over
    * between matches is proven matchless by the regex, and the resume
    * arithmetic (start + max(indexOf/lastIndexOf(v), 1)) is replayed from
    * the engine's own classifier sequence. Only the classifier choice
    * itself stays engine-trusted (covered by MatchRecognizeSpec's pinned
    * fixtures). */
  test("engine-level TO [FIRST] var: regex-checked extents, matchless gaps, skip arithmetic") {
    import MatchRecognize.AfterMatchSkip
    for (seed <- 2000 until 2020; toFirst <- Seq(false, true)) {
      val (node, pattern, vars, masks) = genCase(seed)
      val parsed = PatternRegex.parse(pattern)
      val pvars = PatternRegex.variables(parsed)
      val v = pvars.head
      val skip = if (toFirst) AfterMatchSkip.ToFirstVar(v) else AfterMatchSkip.ToVar(v)
      val defines = vars.zipWithIndex.map { case (nm, b) =>
        nm -> (shiftright(col("m").cast("int"), b).bitwiseAND(1) === 1)
      }.toMap
      val df = masks.zipWithIndex.map { case (mk, i) => (i.toLong, mk) }
        .toSeq.toDF("seq", "m")
      // chunkRows=16 drives bounded patterns through the chunk-parallel
      // path with many boundary crossings, so the stitch composition of
      // the overlap-resuming ToVar offsets is under the oracle too
      // (r11 review — the default 65536 made the stitch vacuous here)
      val out = MatchRecognize.matchedWithPos(df, Nil, Seq("seq"), pattern,
          defines, skip, chunkRows = 16)
        .select("seq", "match_num", "classifier")
        .as[(Long, Long, String)].collect()
      val encoded = masks.map(maskChar).mkString
      val oracle = new OraclePatterns(node, vars)
      val matches = out.groupBy(_._2).toSeq.sortBy(_._1).map { case (mn, rows) =>
        val sorted = rows.sortBy(_._1)
        (mn, sorted.head._1.toInt, sorted.length, sorted.map(_._3).toVector)
      }
      // match_num is sequential in scan order
      assert(matches.map(_._1) == (1L to matches.size), s"seed=$seed $skip")
      var scanFrom = 0
      for ((mn, start, len, assign) <- matches) {
        // the scan advanced one row at a time over matchless positions
        for (p <- scanFrom until start)
          assert(oracle.lenAt(encoded, p).isEmpty,
            s"seed=$seed $skip: engine skipped a matchable position $p before match $mn")
        // the emitted extent is the greedy regex extent at this start
        assert(oracle.lenAt(encoded, start).contains(len),
          s"seed=$seed $skip: extent mismatch at $start (match $mn)")
        // resume point from the ENGINE's classifier sequence
        val idx = if (toFirst) assign.indexOf(v) else assign.lastIndexOf(v)
        scanFrom = start + math.max(idx, 1)
      }
      // tail: nothing matchable remains past the last resume point
      for (p <- scanFrom until masks.length)
        assert(oracle.lenAt(encoded, p).isEmpty,
          s"seed=$seed $skip: engine missed a match at tail position $p")
    }
  }
}

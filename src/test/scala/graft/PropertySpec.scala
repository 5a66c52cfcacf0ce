package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.GridDbScalarFunctions
import graft.mr.PatternRegex

class PropertySpec extends SparkTestBase {

  /** deterministic sampling loop over scalacheck generators */
  private def forAll[A](g: Gen[A], n: Int = 60)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))
  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => f(t._1, t._2, t._3))

  // ---- glob translation vs a direct recursive matcher ----
  private def globMatch(p: String, s: String): Boolean = (p, s) match {
    case ("", "") => true
    case ("", _) => false
    case _ if p.head == '*' =>
      globMatch(p.tail, s) || (s.nonEmpty && globMatch(p, s.tail))
    case _ if s.isEmpty => false
    case _ if p.head == '?' => globMatch(p.tail, s.tail)
    case _ => p.head == s.head && globMatch(p.tail, s.tail)
  }

  private val globChar = Gen.oneOf('a', 'b', 'c', '*', '?', '.', '(')
  private val strChar = Gen.oneOf('a', 'b', 'c', '.', '(')

  test("globToRegex agrees with a reference glob matcher") {
    forAll(Gen.listOfN(6, globChar).map(_.mkString),
      Gen.listOfN(8, strChar).map(_.mkString)) { (pat: String, s: String) =>
      val viaRegex = s.matches(GridDbScalarFunctions.globToRegex(pat))
      assert(viaRegex == globMatch(pat, s), s"pattern=$pat s=$s")
    }
  }

  // ---- TQL numeric expression translation vs direct evaluation ----
  test("TQL arithmetic comparisons match Scala semantics") {
    import spark.implicits._
    val df = Seq((3.0, 7.0)).toDF("x", "y")
    val c = graft.engine.Container("t", df, graft.engine.Collection)
    forAll(Gen.chooseNum(-20.0, 20.0), Gen.chooseNum(-20.0, 20.0),
      Gen.chooseNum(1.0, 5.0)) { (a: Double, b: Double, m: Double) =>
      val expected = a * m + b > 3.0 * m - b
      val got = graft.tql.TqlCompiler.run(c,
        f"select count(*) where $a%.4f * $m%.4f + $b%.4f > x * $m%.4f - $b%.4f")
        .collect()(0).getLong(0) == 1
      assert(got == expected, s"a=$a b=$b m=$m")
    }
  }

  // ---- pattern regex: quantifier counting over uniform symbols ----
  test("Rep{n,m} matches between n and m symbols greedily") {
    forAll(Gen.chooseNum(0, 4), Gen.chooseNum(0, 4), Gen.chooseNum(0, 6)) {
      (lo0: Int, extra: Int, avail: Int) =>
      val lo = lo0
      val hi = lo0 + extra
      val node = PatternRegex.Rep(PatternRegex.Sym("A"), lo, hi)
      val res = PatternRegex.matchAt(node, 0, avail, (_, _) => true)
      if (avail >= lo) {
        assert(res.isDefined)
        assert(res.get.size == math.min(hi, avail)) // greedy
      } else assert(res.isEmpty)
    }
  }

  // ---- packSequences matches a driver-side reference next-fit fold ----
  test("packSequences equals the reference next-fit fold on random inputs") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def refPack(rows: Seq[(Long, Long)], budget: Long,
                shards: Int): Set[(Int, Long, Long, Long)] =
      rows.map { case (id, tok) =>
        (java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % shards,
          md5hex(id.toString), id, tok)
      }.groupBy(_._1).flatMap { case (shard, members) =>
        var pack = 0L; var used = 0L; var open = false
        members.sortBy(m => (m._2, m._3)).map { case (_, _, id, tok) =>
          if (open && used + tok <= budget) used += tok
          else { pack += 1; used = tok; open = true }
          (shard.toInt, id, pack, used)
        }
      }.toSet
    val gen = Gen.zip(
      Gen.chooseNum(1, 40).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(1L, 120L))),
      Gen.chooseNum(50L, 300L))
    forAll(gen, n = 6) { case (sizes: List[Long], budget: Long) =>
      val rows = sizes.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = graft.pipeline.Curation
        .packSequences(rows.toDF("id", "tok"), "id", "tok",
          budget = budget, shards = 3)
        .as[(Int, Long, Long, Long)].collect().toSet
      assert(got == refPack(rows, budget, 3), s"budget=$budget sizes=$sizes")
    }
  }

  // ---- duplicatedNgramFraction matches a naive driver computation ----
  test("duplicatedNgramFraction equals naive counting on random corpora") {
    import spark.implicits._
    val word = Gen.oneOf("a", "b", "c", "d")
    val doc = Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    forAll(Gen.chooseNum(2, 6).flatMap(n => Gen.listOfN(n, doc)), n = 6) {
      (texts: List[String]) =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      def grams(t: String): Seq[String] = {
        val w = t.split("\\s+").filter(_.nonEmpty).toSeq
        if (w.size < 2) Nil else w.sliding(2).map(_.mkString(" ")).toSeq
      }
      val docCount = rows.flatMap { case (id, t) => grams(t).distinct.map(_ -> id) }
        .groupBy(_._1).map { case (g, xs) => g -> xs.size }
      val expect = rows.flatMap { case (id, t) =>
        val g = grams(t)
        if (g.isEmpty) None
        else Some(id -> ((g.size.toLong,
          BigDecimal(g.count(docCount(_) > 1).toDouble / g.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
      }.toMap
      val got = graft.pipeline.Curation
        .duplicatedNgramFraction(rows.toDF("id", "text"), "id", "text", n = 2)
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == expect, s"texts=$texts")
    }
  }

  // ---- LIKE-escape translation matches Spark's own LIKE for plain cases ----
  test("TQL LIKE with escape behaves like standard LIKE when no escape used") {
    import spark.implicits._
    val strs = Seq("abc", "a_c", "axc", "ab", "abcd", "")
    val df = strs.toDF("s")
    val c = graft.engine.Container("t", df, graft.engine.Collection)
    forAll(Gen.listOfN(4, Gen.oneOf('a', 'b', 'c', '%', '_')).map(_.mkString)) {
      (pat: String) =>
      val viaTql = graft.tql.TqlCompiler.run(c,
        s"select count(*) where s like '$pat' escape '!'")
        .collect()(0).getLong(0)
      val viaSpark = df.filter($"s".like(pat)).count()
      assert(viaTql == viaSpark, s"pattern=$pat")
    }
  }

  // ---- sessionize vs a reference sequential fold ----
  test("sessionize equals the reference gap fold on random keyed series") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val gen = Gen.zip(
      Gen.listOfN(40, Gen.zip(Gen.oneOf("a", "b"), Gen.choose(0L, 500L))),
      Gen.choose(20L, 120L))
    forAll(gen, n = 15) { case (rows, gapSec) =>
      val distinct = rows.distinct // unique (key, sec) so ordering is total
      val df = distinct.zipWithIndex
        .map { case ((k, sec), i) => (k, sec, i.toLong) }
        .toDF("k", "sec", "event_id")
        .select($"k", timestamp_seconds(lit(1704067200L) + $"sec").as("ts"),
          $"sec", $"event_id")
      val got = graft.ts.TimeSeriesOps
        .sessionize(df, "ts", gapMs = gapSec * 1000, keys = Seq("k"),
          tieBreak = Seq("event_id"))
        .select("k", "sec", "session_id").as[(String, Long, Long)]
        .collect().toSet
      // reference: per key, sort by (sec, event_id), fold with strict > gap
      val expect = distinct.zipWithIndex
        .map { case ((k, sec), i) => (k, sec, i.toLong) }
        .groupBy(_._1).toSeq.flatMap { case (k, rs) =>
          val sorted = rs.sortBy(r => (r._2, r._3))
          var sid = 0L; var prev = Long.MinValue
          sorted.map { case (_, sec, _) =>
            if (prev == Long.MinValue || sec - prev > gapSec) sid += 1
            prev = sec
            (k, sec, sid)
          }
        }.toSet
      assert(got == expect, s"gap=$gapSec")
    }
  }
}

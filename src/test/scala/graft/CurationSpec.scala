package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Curation

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("wordNgrams: lowercase, whitespace-robust, short-doc empty") {
    val df = Seq(
      (1L, "  The quick   Brown fox "),
      (2L, "one two"),
      (3L, "solo")
    ).toDF("id", "text")
    val got = df.select($"id", Curation.wordNgrams($"text", 3).as("ng"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("the quick brown", "quick brown fox"))
    assert(got(2L).isEmpty && got(3L).isEmpty)
  }

  test("ngramOverlap flags exactly the docs sharing an n-gram with the benchmark") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),      // shares "alpha beta gamma"
      (2L, "beta gamma delta epsilon"),    // shares "beta gamma delta"? bench has "alpha beta gamma" only -> no
      (3L, "zeta eta theta iota")          // clean
    ).toDF("doc_id", "text")
    val bench = Seq("alpha beta gamma kappa").toDF("text")
    val out = Curation.ngramOverlap(docs, "doc_id", "text", bench, "text", n = 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L))
  }

  test("duplicatedNgramFraction: shared grams counted, short docs absent") {
    val docs = Seq(
      (1L, "a b c"),      // grams: "a b" (shared), "b c" -> frac 0.5
      (2L, "a b d"),      // grams: "a b" (shared), "b d" -> frac 0.5
      (3L, "x y z w"),    // grams all unique -> frac 0.0
      (4L, "solo")        // < n tokens -> absent
    ).toDF("doc_id", "text")
    val out = Curation.duplicatedNgramFraction(docs, "doc_id", "text", n = 2)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(1L -> ((2L, 0.5)), 2L -> ((2L, 0.5)), 3L -> ((3L, 0.0))))
  }

  test("packSequences: next-fit invariants, determinism, oversized doc alone") {
    val docs = (1L to 60L).map(i => (i, if (i == 7L) 500L else 20L + (i % 5) * 10L))
      .toDF("doc_id", "tok")
    val out = Curation.packSequences(docs, "doc_id", "tok", budget = 100, shards = 3)
    val rows = out.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // every doc packed exactly once
    assert(rows.map(_._2).sorted.toSeq == (1L to 60L))
    // per (shard, pack): token sum fits the budget unless it is a single
    // oversized doc; pack ids are contiguous from 1 per shard
    val tokOf = (1L to 60L).map(i => i -> (if (i == 7L) 500L else 20L + (i % 5) * 10L)).toMap
    rows.groupBy(r => (r._1, r._3)).foreach { case ((_, _), members) =>
      val total = members.map(m => tokOf(m._2)).sum
      assert(total <= 100 || members.length == 1,
        s"overfull multi-doc pack: $members")
    }
    rows.groupBy(_._1).foreach { case (_, ms) =>
      val packs = ms.map(_._3).distinct.sorted
      assert(packs.toSeq == (1L to packs.length))
    }
    // NEXT-FIT, not premature splits: a pack only closes because the next
    // doc would overflow it (first doc of pack p+1 has pack_used == its own
    // tok; pack_used is monotone within a pack, so min/max identify ends)
    rows.groupBy(_._1).foreach { case (_, ms) =>
      val byPack = ms.groupBy(_._3)
      byPack.keys.filter(p => byPack.contains(p + 1)).foreach { p =>
        val lastUsed = byPack(p).map(_._4).max
        val nextFirstTok = byPack(p + 1).map(_._4).min
        assert(lastUsed + nextFirstTok > 100,
          s"pack $p closed early: $lastUsed + $nextFirstTok <= 100")
      }
    }
    // the 500-token doc sits alone with pack_used = its own size
    val big = rows.find(_._2 == 7L).get
    assert(rows.count(r => r._1 == big._1 && r._3 == big._3) == 1 && big._4 == 500L)
    // deterministic across runs
    val again = Curation.packSequences(docs, "doc_id", "tok", budget = 100, shards = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.sortBy(_._2).toSeq == again.sortBy(_._2).toSeq)
  }

  test("chunkDocuments: overlap, short tail, short/empty docs") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5"),  // window 3 stride 2 -> [w1..w3], [w3..w5]
      (2L, "a b"),             // shorter than window -> one whole chunk
      (3L, "")                 // no tokens -> no chunks
    ).toDF("doc_id", "text")
    val got = Curation.chunkDocuments(docs, "doc_id", "text", window = 3, stride = 2)
      .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 0L, "w1 w2 w3", 3L), (1L, 1L, "w3 w4 w5", 3L),
      (2L, 0L, "a b", 2L)))
    intercept[IllegalArgumentException](
      Curation.chunkDocuments(docs, "doc_id", "text", window = 3, stride = 4))
  }

  test("bigramNll: hand-computed add-1 fixture; short docs absent") {
    // vocab {a,b,c,x} -> V=4; transitions: doc1 (a,a),(a,b); doc3 (x,x)x2
    // p(a|a)=p(b|a)=(1+1)/(2+4)=1/3 -> nll=ln 3; p(x|x)=(2+1)/(2+4)=1/2 -> ln 2
    val docs = Seq((1L, "a a b"), (2L, "c"), (3L, "x x x")).toDF("doc_id", "text")
    val out = Curation.bigramNll(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set(1L, 3L))
    assert(out(1L)._1 == 2L && math.abs(out(1L)._2 - math.log(3.0)) < 1e-6)
    assert(out(3L)._1 == 2L && math.abs(out(3L)._2 - math.log(2.0)) < 1e-6)
  }

  test("tokenBudgetSample: budgets met with overshoot, unbudgeted domains drop") {
    val docs = Seq(
      (1L, "a b c", "web"), (2L, "d e", "web"), (3L, "f g h i", "web"),
      (4L, "x y", "code"), (5L, "z", "junk")
    ).toDF("doc_id", "text", "source")
    val out = Curation.tokenBudgetSample(docs, "doc_id", "text", "source",
      budgets = Map("web" -> 4L, "code" -> 10L), defaultBudget = 0L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // junk has no budget -> dropped entirely
    assert(!out.exists(_._2 == "junk"))
    // code budget 10 > 2 available tokens -> everything ships
    assert(out.filter(_._2 == "code").map(_._1).toSeq == Seq(4L))
    // web: docs ship in (md5(id), id) order until the running total crosses
    // 4 — the crossing doc ships (next-fit overshoot), later ones drop
    val web = out.filter(_._2 == "web")
    val shipped = web.map(_._3).sum
    assert(shipped >= 4 && web.length < 3,
      s"budget 4 of 9 web tokens -> partial selection, got $shipped via ${web.toSeq}")
    // deterministic: same input, same selection
    val again = Curation.tokenBudgetSample(docs, "doc_id", "text", "source",
      budgets = Map("web" -> 4L, "code" -> 10L), defaultBudget = 0L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq == out.toSeq)
  }

  test("dsirWeights: hand-computed add-1 log-likelihood-ratio fixture") {
    // raw: doc1 "a a b", doc2 "c c", doc3 "a b" -> R=7, V=3 {a:3,b:2,c:2}
    // target = docs 1,3 -> T=5 {a:3,b:2}
    // λ(a)=ln(4/8)-ln(4/10)=ln1.25; λ(b)=ln(3/8)-ln(3/10)=ln1.25
    // λ(c)=ln(1/8)-ln(3/10)=ln(5/12)
    val raw = Seq((1L, "a a b"), (2L, "c c"), (3L, "a b")).toDF("doc_id", "text")
    val tgt = raw.filter($"doc_id" =!= 2L)
    val out = Curation.dsirWeights(raw, "doc_id", "text", tgt, "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1 == 3L && math.abs(out(1L)._2 - 3 * math.log(1.25)) < 1e-5)
    assert(out(2L)._1 == 2L && math.abs(out(2L)._2 - 2 * math.log(5.0 / 12)) < 1e-5)
    assert(out(3L)._1 == 2L && math.abs(out(3L)._2 - 2 * math.log(1.25)) < 1e-5)
    // target-like docs score above the off-target doc
    assert(out(1L)._2 > out(2L)._2)
  }

  test("hashSample: deterministic, partitions the key space, rate sane") {
    val df = (1L to 2000L).toDF("id")
    val kept = Curation.hashSample(df, "id", 3, 10).as[Long].collect().toSet
    val kept2 = Curation.hashSample(df, "id", 3, 10).as[Long].collect().toSet
    assert(kept == kept2, "sampling must be deterministic")
    assert(math.abs(kept.size / 2000.0 - 0.3) < 0.05, s"rate off: ${kept.size}")
    // complements partition: buckets [3,10) are exactly the rest
    val rest = df.filter(Curation.hashBucket($"id", 10) >= 3).as[Long].collect().toSet
    assert((kept ++ rest).size == 2000 && kept.intersect(rest).isEmpty)
  }

  test("shuffleShards: reproducible layout, full cover, epoch salt reshuffles") {
    val df = (1L to 1000L).toDF("id")
    def layout(salt: String) =
      Curation.shuffleShards(df, "id", salt, nShards = 8)
        .select("id", "shard", "pos")
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val a = layout("ep1")
    assert(a == layout("ep1"), "same salt must reproduce the exact layout")
    // every row placed exactly once; positions within a shard are 1..n dense
    assert(a.size == 1000)
    a.values.groupBy(_._1).foreach { case (shard, rows) =>
      assert(0 <= shard && shard < 8)
      assert(rows.map(_._2).toSeq.sorted == (1 to rows.size),
        s"shard $shard positions must be dense 1..n")
    }
    // all shards used and roughly balanced at n=1000
    val sizes = a.values.groupBy(_._1).view.mapValues(_.size).toMap
    assert(sizes.keySet == (0 until 8).toSet)
    assert(sizes.values.forall(s => s > 60 && s < 190), s"skewed: $sizes")
    // a different salt is a genuinely different permutation (epoch shuffle)
    val b = layout("ep2")
    val moved = a.count { case (id, place) => b(id) != place }
    assert(moved > 900, s"salt change must reshuffle, only $moved moved")
  }

  test("stratifiedSample equals the naive per-stratum top-n-by-hash") {
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 3000L).map(i => (i, s"s${i % 3}")).toDF("id", "stratum")
    val naive = df
      .withColumn("rn", row_number().over(Window.partitionBy($"stratum")
        .orderBy(md5($"id".cast("string")), $"id")))
      .filter($"rn" <= 50).select("id", "stratum")
      .as[(Long, String)].collect().toSet
    val got = Curation.stratifiedSample(df, "stratum", "id", n = 50)
      .select("id", "stratum").as[(Long, String)].collect().toSet
    assert(got == naive && got.size == 150)
    // tiny strata: n larger than the stratum keeps the whole stratum, and
    // the exactness fallback path (survivors < min(n, size)) still matches
    val small = (1L to 40L).map(i => (i, if (i <= 35) "big" else "tiny"))
      .toDF("id", "stratum")
    val gotSmall = Curation.stratifiedSample(small, "stratum", "id", n = 38,
        oversample = 1.0)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(gotSmall == Map("big" -> 35L, "tiny" -> 5L))
    // undersized prefilter (oversample < 1) forces the exactness fallback:
    // the result must STILL equal the naive form
    val gotForced = Curation.stratifiedSample(df, "stratum", "id", n = 50,
        oversample = 0.2)
      .select("id", "stratum").as[(Long, String)].collect().toSet
    assert(gotForced == naive)
  }

  test("temperatureSample: alpha=1 is proportional, alpha<1 upweights the tail") {
    // 900 'big' + 100 'small' rows; target 100
    val df = (1L to 1000L).map(i => (i, if (i <= 900) "big" else "small"))
      .toDF("id", "grp")
    // alpha=1: quota_g = ceil(target * c_g / total) -> 90 / 10
    val prop = Curation.temperatureSample(df, "grp", "id", alpha = 1.0, target = 100)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(prop == Map("big" -> 90L, "small" -> 10L))
    // alpha=0.5: shares sqrt(900)=30, sqrt(100)=10 -> 75 / 25
    val temp = Curation.temperatureSample(df, "grp", "id", alpha = 0.5, target = 100)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(temp == Map("big" -> 75L, "small" -> 25L))
    // quota never exceeds the group size
    val capped = Curation.temperatureSample(df, "grp", "id", alpha = 0.5, target = 5000)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(capped("big") <= 900L && capped("small") == 100L)
    // deterministic: same selection both runs, and it is the smallest-md5 set
    val a = Curation.temperatureSample(df, "grp", "id", alpha = 0.5, target = 100)
      .select("id").as[Long].collect().toSet
    val b = Curation.temperatureSample(df, "grp", "id", alpha = 0.5, target = 100)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    // forced exactness fallback must not change the result
    val forced = Curation.temperatureSample(df, "grp", "id", alpha = 0.5,
        target = 100, oversample = 0.2)
      .select("id").as[Long].collect().toSet
    assert(forced == a)
  }

  test("unigramNll: uniform corpus scores ln(V); rare tokens raise a doc's nll") {
    // 4 docs over a 4-token uniform vocabulary: every token appears twice in
    // 8 total -> p = 1/4 for each, so every doc's nll = ln 4
    val uni = Seq((1L, "a b"), (2L, "b a"), (3L, "c d"), (4L, "d c"))
      .toDF("doc_id", "text")
    val all = Curation.unigramNll(uni, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(all.forall(_._2 == 2L))
    val ln4 = BigDecimal(math.log(4.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(all.forall(r => math.abs(r._3 - ln4) < 1e-9))
    // a doc of rare tokens scores strictly higher than a doc of common ones
    val mixed = Seq((1L, "the the the the the the"), (2L, "zyx qwv"))
      .toDF("doc_id", "text")
    val nll = Curation.unigramNll(mixed, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(nll(2L) > nll(1L))
  }

  test("profile: one-pass counts, nulls, distincts, numeric stats") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 10.0), (2L, 20.0), (2L, null), (null, 40.0))
      .toDF("id", "v")
    val p = graft.pipeline.Profile.profile(df, Seq("id", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val id = p("id")
    assert(id.getLong(1) == 4L && id.getLong(2) == 1L && id.getLong(3) == 2L)
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 2.0)
    assert(math.abs(id.getDouble(6) - 5.0 / 3) < 1e-9)
    val v = p("v")
    assert(v.getLong(2) == 1L && v.getLong(3) == 3L)
    assert(v.getDouble(4) == 10.0 && v.getDouble(5) == 40.0)
    assert(math.abs(v.getDouble(6) - 70.0 / 3) < 1e-9)
  }

  test("profile: approxDistinct path agrees within HLL tolerance, no Expand") {
    val ev = graft.engine.Tables.read(spark, sfDir, "events")
    val cols = Seq("user_id", "value", "event_id")
    val exact = graft.pipeline.Profile.profile(ev, cols)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val approxDf = graft.pipeline.Profile.profile(ev, cols, approxDistinct = true)
    val approx = approxDf.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    cols.foreach { c =>
      val (e, a) = (exact(c).toDouble, approx(c).toDouble)
      assert(math.abs(a - e) <= math.max(2.0, 0.15 * e),
        s"approx n_distinct for $c: $a vs exact $e")
    }
    // the point of the flag: no multi-distinct Expand — rows scanned once
    // regardless of how many columns are profiled
    assert(!approxDf.queryExecution.executedPlan.toString.contains("Expand"),
      "approxDistinct profile should not plan an Expand")
  }

  test("profile: column names with dots, spaces, and quotes survive") {
    val df = Seq((1L, 2.0), (3L, 4.0)).toDF("a.b c", "it's")
    val p = graft.pipeline.Profile.profile(df, Seq("a.b c", "it's"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("a.b c").getLong(1) == 2L && p("a.b c").getDouble(4) == 1.0)
    assert(p("it's").getLong(3) == 2L && p("it's").getDouble(5) == 4.0)
  }
}

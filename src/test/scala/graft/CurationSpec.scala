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
}

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
}

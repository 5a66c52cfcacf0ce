package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.pipeline.{Curation, TextAnalysis}

/** MisraGries aggregate + TextAnalysis.heavyHitters: the sketch guarantees
  * and the two-pass operator's exactness. */
class MisraGriesSpec extends SparkTestBase {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  private def exactCounts = docs
    .select(explode(Curation.tokens(col("text"))).as("token"))
    .groupBy("token").agg(count(lit(1)).as("cnt"))
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("MG summary: lower-bound counts within N/(m+1); heavy terms present") {
    val m = 16 // small m so eviction actually happens on this vocabulary
    val row = docs.select(explode(Curation.tokens(col("text"))).as("token"))
      .agg(expr(s"graft_misra_gries(token, $m)").as("hh"), count(lit(1)).as("n"))
      .collect()(0)
    val n = row.getLong(1)
    val est = row.getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size <= m)
    val exact = exactCounts
    val err = n / (m + 1)
    est.foreach { case (t, c) =>
      val truth = exact.getOrElse(t, 0L)
      assert(c <= truth, s"$t: est $c > true $truth")
      assert(c >= truth - err, s"$t: est $c < true $truth - N/(m+1) $err")
    }
    exact.filter(_._2 > err).keys.foreach { t =>
      assert(est.contains(t), s"heavy term $t (freq ${exact(t)} > $err) missing")
    }
  }

  test("guarantee holds across partitionings (merge path)") {
    val m = 16
    for (parts <- Seq(1, 7, 32)) {
      val row = docs.repartition(parts)
        .select(explode(Curation.tokens(col("text"))).as("token"))
        .agg(expr(s"graft_misra_gries(token, $m)").as("hh"), count(lit(1)).as("n"))
        .collect()(0)
      val n = row.getLong(1)
      val est = row.getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = exactCounts
      val err = n / (m + 1)
      exact.filter(_._2 > err).keys.foreach { t =>
        assert(est.contains(t), s"parts=$parts: heavy term $t missing") }
      est.foreach { case (t, c) => assert(c <= exact.getOrElse(t, 0L), s"parts=$parts $t") }
    }
  }

  test("heavyHitters == the exact HAVING-count query, any partitioning") {
    val want = {
      val toks = docs.select(explode(Curation.tokens(col("text"))).as("token"))
      val n = toks.count()
      val thr = math.ceil(0.01 * n).toLong
      exactCounts.filter(_._2 >= thr).toSeq.sortBy(_._1)
        .map { case (t, c) => (t, c, n) }
    }
    for (parts <- Seq(1, 13)) {
      val got = TextAnalysis.heavyHitters(docs.repartition(parts), "text", 0.01, 256)
        .orderBy("token")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == want, s"parts=$parts")
    }
  }

  test("m guard: too-small m for the threshold is rejected") {
    intercept[IllegalArgumentException] {
      TextAnalysis.heavyHitters(docs, "text", minFrac = 0.001, m = 100)
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Curation

/** Curation.bloomDecontaminate vs the exact ngramOverlap operator: the
  * Bloom form must never miss a truly contaminated doc (no false negatives)
  * its extra flags must stay within the configured false-positive rate. */
class BloomDecontaminateSpec extends SparkTestBase {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private def corpus = docs.filter(col("doc_id") % 97 =!= 0)
  private def bench = docs.filter(col("doc_id") % 97 === 0)

  test("bloom flags are a superset of exact flags, per doc and per count") {
    val exact = Curation.ngramOverlap(corpus, "doc_id", "text", bench, "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Curation.bloomDecontaminate(corpus, "doc_id", "text", bench, "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every exactly-contaminated doc is bloom-flagged with at least as many grams
    exact.foreach { case (id, nShared) =>
      assert(bloom.contains(id), s"doc $id lost by bloom")
      assert(bloom(id) >= nShared, s"doc $id: bloom ${bloom(id)} < exact $nShared")
    }
  }

  test("false-positive inflation is bounded by fpp over probed grams") {
    val n = 3
    val exactFlagged = Curation.ngramOverlap(corpus, "doc_id", "text", bench, "text", n)
      .agg(sum("n_shared_ngrams")).collect()(0).getLong(0)
    val bloomFlagged = Curation.bloomDecontaminate(corpus, "doc_id", "text", bench, "text", n, fpp = 0.01)
      .agg(sum("n_flagged_ngrams")).collect()(0).getLong(0)
    val probed = corpus
      .select(explode(Curation.wordNgrams(col("text"), n)).as("ng"))
      .select(countDistinct(col("ng"))).collect()(0).getLong(0)
    val extra = bloomFlagged - exactFlagged
    // generous 5x headroom over the nominal 1% of distinct probed grams:
    // the bound is per-probe in expectation, not a tail bound
    assert(extra >= 0)
    assert(extra <= math.max(20L, (0.05 * probed).toLong),
      s"extra=$extra probed=$probed")
  }

  test("deterministic across partitionings") {
    val a = Curation.bloomDecontaminate(corpus.repartition(11), "doc_id", "text", bench, "text", 3)
      .orderBy("doc_id").collect().toSeq
    val b = Curation.bloomDecontaminate(corpus.coalesce(1), "doc_id", "text", bench.repartition(5), "text", 3)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("probe stays inside whole-stage codegen (no UDF, no join on the corpus side)") {
    val plan = Curation.bloomDecontaminate(corpus, "doc_id", "text", bench, "text", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
    // corpus side must not join the benchmark set — the filter replaced it
    assert(!plan.toLowerCase.contains("broadcasthashjoin"), plan)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.pipeline.Curation

/** TopKByScore / Curation.capPerGroupByScore: the mergeable bounded top-k
  * vs the window-function reference implementation. */
class TopKSpec extends SparkTestBase {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "lang", "source", "n_chars")

  private def windowRef(k: Int) = docs
    .withColumn("rn", row_number().over(
      Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))))
    .filter(col("rn") <= k).drop("rn")

  test("capPerGroupByScore matches the window reference exactly") {
    for (k <- Seq(1, 3, 17)) {
      val got = Curation.capPerGroupByScore(docs, "source", "n_chars", "doc_id", k)
        .orderBy("source", "doc_id").collect().toSeq
      val want = windowRef(k).orderBy("source", "doc_id").collect().toSeq
      assert(got == want, s"k=$k")
    }
  }

  test("partition-independent: partial/merge path agrees with single-partition") {
    val one = Curation.capPerGroupByScore(docs.coalesce(1), "source", "n_chars", "doc_id", 5)
      .orderBy("source", "doc_id").collect().toSeq
    val many = Curation.capPerGroupByScore(docs.repartition(13), "source", "n_chars", "doc_id", 5)
      .orderBy("source", "doc_id").collect().toSeq
    assert(one == many)
  }

  test("ties break on ascending tie id") {
    import spark.implicits._
    val df = Seq(("g", 1L, 10.0), ("g", 2L, 10.0), ("g", 3L, 10.0), ("g", 4L, 9.0))
      .toDF("g", "id", "s")
    val kept = Curation.capPerGroupByScore(df, "g", "s", "id", 2)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("NaN scores are deterministic: total order ranks NaN above all values") {
    import spark.implicits._
    val df = Seq(("g", 1L, Double.NaN), ("g", 2L, 5.0), ("g", 3L, Double.NaN), ("g", 4L, 7.0))
      .toDF("g", "id", "s")
    // k=2: both NaNs win (NaN greatest under the total order, tie by id),
    // and the answer must not depend on arrival/merge order
    for (parts <- Seq(1, 4)) {
      val kept = Curation.capPerGroupByScore(df.repartition(parts), "g", "s", "id", 2)
        .select("id").as[Long].collect().toSet
      assert(kept == Set(1L, 3L), s"parts=$parts")
    }
  }

  test("null score/tie/value rows are skipped, not collected") {
    import spark.implicits._
    val df = Seq((Some(1L), Some(1.0)), (Some(3L), None), (Some(4L), Some(2.0)))
      .toDF("id", "s").withColumn("g", lit("x"))
    val got = Curation.capPerGroupByScore(df, "g", "s", "id", 10)
      .count() // null-score row (id=3) must be dropped by the aggregate
    assert(got == 2)
  }

  test("plan: aggregate-based, no Window operator; ObjectHashAggregate chosen") {
    val plan = Curation.capPerGroupByScore(docs, "source", "n_chars", "doc_id", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
  }
}

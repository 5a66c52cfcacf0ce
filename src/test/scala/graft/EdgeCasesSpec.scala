package graft

import org.apache.spark.sql.types._
import graft.pipeline.{Curation, Dedup}

/** Degenerate-input behavior of the pipeline operators: empty corpora and
  * all-empty text must produce empty (not throwing) results — at 100 TB a
  * partition-pruned read or an over-aggressive upstream filter routinely
  * hands an operator zero rows.
  */
class EdgeCasesSpec extends SparkTestBase {
  import spark.implicits._

  private def emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType))))

  test("n-gram / LM / packing operators return empty on an empty corpus") {
    assert(Curation.duplicatedNgramFraction(emptyDocs, "doc_id", "text").count() == 0)
    assert(Curation.bigramNll(emptyDocs, "doc_id", "text").count() == 0)
    assert(Curation.unigramNll(emptyDocs, "doc_id", "text").count() == 0)
    assert(Curation.ngramOverlap(emptyDocs, "doc_id", "text",
      Seq("a b c").toDF("text"), "text").count() == 0)
    assert(Curation.packSequences(
      emptyDocs.withColumnRenamed("text", "tok_str")
        .withColumn("tok", org.apache.spark.sql.functions.lit(1L)),
      "doc_id", "tok", budget = 10).count() == 0)
  }

  test("sampling operators tolerate empty input and all-empty text") {
    assert(Curation.hashSample(emptyDocs, "doc_id", 1, 2).count() == 0)
    assert(Curation.stratifiedSample(emptyDocs, "text", "doc_id", n = 3).count() == 0)
    val blank = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    // no tokens -> no grams/transitions, but nothing throws
    assert(Curation.duplicatedNgramFraction(blank, "doc_id", "text").count() == 0)
    assert(Curation.bigramNll(blank, "doc_id", "text").count() == 0)
  }

  test("semantic dedup (nLists=1) on empty and single-row corpora") {
    val emptyEmb = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType)))))
    assert(Dedup.semanticDedup(emptyEmb, "embedding", "vec_id",
      minCos = 0.9, nLists = 1).count() == 0)
    val one = Seq((7L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(one, "embedding", "vec_id",
      minCos = 0.9, nLists = 1).as[(Long, Long)].collect()
    assert(got.toSeq == Seq((7L, 7L))) // its own keeper
  }

  test("sessionize and profile on degenerate inputs") {
    import org.apache.spark.sql.functions._
    val emptyEv = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("k", StringType),
        StructField("ts", TimestampType))))
    assert(graft.ts.TimeSeriesOps
      .sessionize(emptyEv, "ts", gapMs = 1000L, keys = Seq("k")).count() == 0)
    assert(graft.ts.TimeSeriesOps
      .sessionize(emptyEv, "ts", gapMs = 1000L).count() == 0) // unkeyed

    // all-null column: zero distincts, null numeric stats, no throw
    val nulls = Seq[(Long, Option[Double])]((1L, None), (2L, None))
      .toDF("id", "v")
    val row = graft.pipeline.Profile.profile(nulls, Seq("v")).collect()(0)
    assert(row.getLong(1) == 2L && row.getLong(2) == 2L && row.getLong(3) == 0L)
    assert(row.isNullAt(4) && row.isNullAt(5) && row.isNullAt(6))

    // single row: a session of one, exact profile stats
    val oneEv = Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("k", "ts")
    val sid = graft.ts.TimeSeriesOps
      .sessionize(oneEv, "ts", gapMs = 1000L, keys = Seq("k"))
      .select("session_id").as[Long].head()
    assert(sid == 1L)
  }
}

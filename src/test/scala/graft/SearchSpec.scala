package graft

import graft.pipeline.Search

/** Fixture-level pin for reciprocal-rank fusion (the corpus-level result
  * is oracle-checked by q_search_hybrid_rrf). */
class SearchSpec extends SparkTestBase {
  import spark.implicits._

  test("hybridTopK: fused docs outrank single-arm docs; rrf math exact") {
    // doc 1 matches the query terms AND sits nearest the query embedding;
    // doc 2 is lexical-only, doc 3 dense-only
    val docs = Seq(
      (1L, "alpha beta alpha"),
      (2L, "alpha alpha alpha beta"),
      (3L, "gamma delta epsilon zeta"),
      (4L, "unrelated words entirely here")).toDF("doc_id", "text")
    val embs = Seq(
      (0L, Array(1.0f, 0.0f)), // the query vector
      (1L, Array(0.9f, 0.1f)),
      (3L, Array(0.8f, 0.3f)),
      (4L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Search.hybridTopK(docs, "text", "doc_id",
        embs, "embedding", "vec_id",
        Seq("alpha", "beta"), queryId = 0L, k = 10, poolK = 3, kRrf = 60)
      .collect()
    val byId = got.map(r => r.getLong(0) -> r).toMap
    // doc 1: in both pools -> rrf = 1/(60+lex) + 1/(60+dense)
    val r1 = byId(1L)
    val lex1 = r1.getInt(2); val den1 = r1.getInt(3)
    assert(r1.getDouble(1) ==
      BigDecimal(1.0 / (60 + lex1) + 1.0 / (60 + den1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // fused beats every single-arm doc
    assert(got.head.getLong(0) == 1L)
    // doc 2 lexical-only (null dense rank), doc 3 dense-arm present
    assert(byId(2L).isNullAt(3))
    assert(!byId(3L).isNullAt(3))
    // doc 4 matched neither terms nor the vector direction strongly, but
    // the dense pool keeps poolK=3 -> present with the worst dense rank
    assert(byId(4L).getInt(3) == 3)
  }
}

package graft

import graft.pipeline.Similarity

/** Invariants for the exposed k-means clustering (golden-pinned at the
  * corpus level by GoldenSpec; these pin the semantics on fixtures). */
class SimilarityClusterSpec extends SparkTestBase {
  import spark.implicits._

  test("kmeansAssign: every doc assigned, separable fixture separates") {
    // two tight groups on opposite axes + k=2: Lloyd must put each group
    // in its own cluster with the group centroid, cos_center ~ 1
    val embs = Seq(
      (0L, Array(1.0f, 0.02f)), (1L, Array(0.98f, 0.0f)), (2L, Array(1.0f, -0.02f)),
      (10L, Array(0.02f, 1.0f)), (11L, Array(0.0f, 0.97f)), (12L, Array(-0.02f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kmeansAssign(embs, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.length == 6)
    val byCluster = got.groupBy(_._2)
    assert(byCluster.size == 2, s"expected 2 clusters, got $byCluster")
    // groups don't mix
    val c0 = got.filter(_._1 < 10).map(_._2).toSet
    val c1 = got.filter(_._1 >= 10).map(_._2).toSet
    assert(c0.size == 1 && c1.size == 1 && c0 != c1)
    // everyone is close to their own refined center
    got.foreach { case (id, _, cos) => assert(cos > 0.99, s"doc $id cos $cos") }
  }

  test("kmeansAssign is deterministic and AUTO-k resolves") {
    val embs = spark.range(64).selectExpr("id AS vec_id",
      "array(cast(id % 7 as float), cast(id % 11 as float), 1.0f) AS embedding")
    val a = Similarity.kmeansAssign(embs, "vec_id", "embedding", k = 4)
      .orderBy("id").collect().toSeq
    val b = Similarity.kmeansAssign(embs, "vec_id", "embedding", k = 4)
      .orderBy("id").collect().toSeq
    assert(a == b)
    // AUTO k resolves to a sane cluster count (≈sqrt(N) policy): ids
    // non-negative, strictly fewer clusters than vectors, more than one
    val auto = Similarity.kmeansAssign(embs, "vec_id", "embedding")
      .select("cluster").distinct().collect().map(_.getInt(0))
    assert(auto.forall(_ >= 0) && auto.length > 1 && auto.length < 64,
      s"AUTO-k clusters: ${auto.toSeq.sorted}")
  }
}

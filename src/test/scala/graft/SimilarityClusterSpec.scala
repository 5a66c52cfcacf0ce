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

  test("kmeans oracle stability: argmin margins dominate FP noise on the oracle corpus (r12 ADVICE)") {
    // The q_cluster_kmeans DuckDB oracle replays centroid means computed by
    // Spark's distributed AVG with DuckDB's sequential AVG; a last-ulp
    // difference in a near-tie distance could flip an assignment and fail
    // the diff non-deterministically. This pins the tested corpus: at every
    // assignment round (seeds, after Lloyd 1, after Lloyd 2) the gap
    // between best and second-best centroid distance is > 1e-9 RELATIVE —
    // ~6 orders above double-summation reassociation noise (~1e-15) — so
    // the oracle comparison is deterministic by margin, not by luck.
    import org.apache.spark.sql.functions._
    // Parameterized over the data dirs the correctness gate runs at
    // (r13 ADVICE): the driver pins sf0.01; a gate run at another SF sets
    // SPARK_GRAFT_GATE_DIRS (comma-separated) so the oracles' determinism-
    // by-margin is verified THERE before the diff is trusted.
    val gateDirs = sys.env.get("SPARK_GRAFT_GATE_DIRS")
      .map(_.split(",").toSeq).getOrElse(Seq("/root/testdata/sf0.01"))
    for (gateDir <- gateDirs) checkMargins(s"$gateDir/embeddings.parquet")
  }

  private def checkMargins(embPath: String): Unit = {
    import org.apache.spark.sql.functions._
    val embs = spark.read.parquet(embPath)
    val c0 = embs.select(col("vec_id").as("c_id"),
      expr("transform(embedding, x -> cast(x as double))").as("cv"))
    val dim = c0.select(size(col("cv"))).head.getInt(0)
    for (step <- 0 to 2) {
      val cents = Similarity.ivfCentroids(c0, dim, 8, steps = step)
      val sorted = array_sort(Similarity.distances(col("cv"), cents))
      val relMargin = (element_at(sorted, 2).getField("d") -
        element_at(sorted, 1).getField("d")) /
        greatest(element_at(sorted, 1).getField("d"), lit(1e-300))
      val m = c0.select(relMargin.as("rel")).agg(min("rel")).head.getDouble(0)
      assert(m > 1e-9,
        s"assignment round $step: min relative margin $m — oracle near-tie risk")
    }
    // the q_sim_ivf_* oracle config (nLists=16, ONE Lloyd step): corpus
    // assignment margins under seed and refined centroids, plus the PROBE
    // boundary — the gap between the 4th and 5th nearest centroid per
    // query decides the probed-list set, so a near-tie there would flip
    // the candidate pool, not just one assignment
    for (step <- 0 to 1) {
      val cents = Similarity.ivfCentroids(c0, dim, 16, steps = step)
      val sorted = array_sort(Similarity.distances(col("cv"), cents))
      val relMargin = (element_at(sorted, 2).getField("d") -
        element_at(sorted, 1).getField("d")) /
        greatest(element_at(sorted, 1).getField("d"), lit(1e-300))
      val m = c0.select(relMargin.as("rel")).agg(min("rel")).head.getDouble(0)
      assert(m > 1e-9,
        s"nLists=16 round $step: min relative margin $m — oracle near-tie risk")
      if (step == 1) {
        val probeMargin = (element_at(sorted, 5).getField("d") -
          element_at(sorted, 4).getField("d")) /
          greatest(element_at(sorted, 4).getField("d"), lit(1e-300))
        val pm = c0.filter(col("c_id") < 5)
          .select(probeMargin.as("rel")).agg(min("rel")).head.getDouble(0)
        assert(pm > 1e-9,
          s"nProbe boundary: min relative margin $pm — probed-set near-tie risk")
        // the q_sim_ivf_filtered oracle probes effProbe = overfetch(4, 16,
        // label<5) lists (r14): its probe boundary is effProbe-th vs
        // effProbe+1-th — a near-tie there flips the FILTERED candidate
        // pool (skipped when the overfetch widens to all 16 lists: the
        // "boundary" then has no 17th centroid and no effect)
        val total = embs.count()
        val kept = embs.filter(col("label") < 5).count()
        val eff = Similarity.overfetchProbe(4, 16, kept, total)
        if (eff < 16) {
          val fMargin = (element_at(sorted, eff + 1).getField("d") -
            element_at(sorted, eff).getField("d")) /
            greatest(element_at(sorted, eff).getField("d"), lit(1e-300))
          val fm = c0.filter(col("c_id") < 5)
            .select(fMargin.as("rel")).agg(min("rel")).head.getDouble(0)
          assert(fm > 1e-9,
            s"filtered probe boundary (effProbe=$eff): min relative margin $fm")
        }
      }
    }
    // the q_sim_pq_ann / q_sim_ivfpq_ann oracle config: per-subspace
    // codebook training (kCodes=16, 4 Lloyd rounds over 8-dim slices) and
    // the final encode argmin — a near-tie in ANY subspace round would
    // desync the oracle's codebooks from Spark's. The ADC pool and rerank
    // compare ROUNDED cosines (round-to-4 absorbs 1e-15 mean noise), so
    // unrounded argmins are the only FP-sensitive stages. The ivf_c1 list
    // assignment (nLists=8, 1 step) is covered by the k=8 loop above; its
    // probe boundary (4th vs 5th of 8) by the check below.
    val d8 = 8
    for (j <- 0 until 8) {
      val sub = c0.select(col("c_id"),
        expr(s"slice(cv, ${j * d8 + 1}, $d8)").as("cv"))
      for (step <- 0 to 4) {
        val cents = Similarity.ivfCentroids(sub, d8, 16, steps = step)
        val sorted = array_sort(Similarity.distances(col("cv"), cents))
        val relMargin = (element_at(sorted, 2).getField("d") -
          element_at(sorted, 1).getField("d")) /
          greatest(element_at(sorted, 1).getField("d"), lit(1e-300))
        val m = sub.select(relMargin.as("rel")).agg(min("rel")).head.getDouble(0)
        assert(m > 1e-9,
          s"pq subspace $j round $step: min relative margin $m — oracle near-tie risk")
      }
    }
    val cents8 = Similarity.ivfCentroids(c0, dim, 8, steps = 1)
    val sorted8 = array_sort(Similarity.distances(col("cv"), cents8))
    val probe8 = (element_at(sorted8, 5).getField("d") -
      element_at(sorted8, 4).getField("d")) /
      greatest(element_at(sorted8, 4).getField("d"), lit(1e-300))
    val pm8 = c0.filter(col("c_id") < 5)
      .select(probe8.as("rel")).agg(min("rel")).head.getDouble(0)
    assert(pm8 > 1e-9,
      s"ivfpq probe boundary (nLists=8): min relative margin $pm8")
  }
}

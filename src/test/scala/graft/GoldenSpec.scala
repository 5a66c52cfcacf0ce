package graft

import graft.tools.Golden

/** Pins the sf0.01 result hashes of every rows-only (no DuckDB oracle)
  * query. These surfaces are deterministic by construction — fixed seeds,
  * fused sketch kernels, reproducible tie-breaks — so a hash change IS a
  * behavior change: intended ones re-pin via `runMain graft.tools.Golden`,
  * unintended ones fail here instead of sailing through the rows-only
  * correctness check. Hash is order-insensitive and timezone-proof
  * (Golden.resultHash).
  */
class GoldenSpec extends SparkTestBase {

  private val golden = Map(
    // deterministic: OR-merged bitset + seed-fixed hashing (the fpp-bound
    // and superset semantics are BloomDecontaminateSpec's job)
    "q_decontaminate_bloom" -> "25be80cc510f997a",
    // AUTO band width resolves to 16 bits at the sf0.01 corpus size, so
    // this hash is unchanged from the retired bits=16 pinned form (r10:
    // the production AUTO plan is the only registered form)
    "q_dedup_embedding_lsh_auto" -> "e5a6c426ae27369a",
    // r14: cross-corpus incremental survivors (bounded by the full-oracle
    // q_dedup_incremental_bound / q_dedup_incremental_emb_bound companions)
    "q_dedup_incremental_embedding" -> "c5d15de7588c18b8",
    "q_dedup_incremental_minhash" -> "08eb6a0375b52496",
    "q_dedup_minhash" -> "f445327584e7bd8c",
    // q_dedup_semantic_ivf left r15: promoted to a full DuckDB oracle
    "q_dedup_simhash" -> "df17e934ac71859a",
    "q_multimodal_features" -> "cd83f6b20c274280",
    "q_pipeline_curation_v3_auto" -> "61055128fc76a684",
    "q_sim_lsh_ann" -> "2da02ad1ef9b5e98", // re-pinned r14: all-bit probing
    // same hash as q_dedup_minhash — the streaming replay reproduces the
    // batch operator's pairs exactly (the parity GoldenSpec can prove)
    "q_stream_dedup_minhash" -> "f445327584e7bd8c",
    // trained+encoded in one build; deterministic because the merge argmax
    // tie-breaks on pair text (BpeSpec proves partition-independence)
    "q_text_bpe" -> "7427a41cf8141870")

  test("golden set covers exactly the rows-only query list") {
    assert(golden.keySet == Golden.names.toSet)
    // and the registry agrees those queries really are oracle-less
    val oracleLess = graft.queries.Registry.all.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(golden.keySet == oracleLess,
      s"rows-only drift: spec=${golden.keySet}, registry=$oracleLess — " +
        "re-pin via runMain graft.tools.Golden and update Golden.names")
  }

  for (name <- Golden.names) {
    test(s"$name sf0.01 result hash is pinned") {
      val df = graft.queries.Registry.byName(name).build(spark, "/root/testdata/sf0.01")
      assert(Golden.resultHash(df) == golden(name),
        s"$name output changed — if intended, re-pin via runMain graft.tools.Golden")
    }
  }
}

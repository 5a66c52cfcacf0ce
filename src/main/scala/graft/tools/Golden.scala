package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Canonical result hashing for the rows-only (no DuckDB oracle) queries.
  *
  * Those surfaces — sketches, banded LSH joins, ANN top-k, the multimodal
  * decode stub — are deterministic by construction (fixed seeds, fused
  * kernels, reproducible ties), so their sf0.01 results can be pinned as
  * golden hashes: a regression shows up as a hash change even though DuckDB
  * cannot express the query. GoldenSpec holds the pinned values; this main
  * prints current ones (run it after an INTENDED output change and copy the
  * new hashes into the spec).
  *
  * The hash is order-insensitive (columns sorted by name, formatted rows
  * sorted) and renders timestamps as epoch micros so JVM default-timezone
  * differences cannot leak into the digest.
  */
object Golden {

  /** The CORRECTNESS no_oracle set (rows-only queries with deterministic
    * output). Keep in sync with the `Q.rowsOnly` entries in queries/. */
  val names: Seq[String] = Seq(
    // r11: q_nano_precision and q_text_fingerprint left this set — both
    // promoted to full DuckDB oracles (µs-parity nanos math; md5-variant
    // fingerprint) — and q_decontaminate_bloom gained an oracle-checked
    // superset-bound companion (q_decontaminate_bloom_superset).
    // r12: q_cluster_kmeans left — seeds/Lloyd/argmin replayed in DuckDB
    // SQL as a full oracle.
    // r13: five more left — q_sim_ivf_ann / q_sim_ivf_indexed /
    // q_sim_ivfsq_indexed (the deterministic coarse quantizer + SQ8 codec
    // unrolled as CTEs, full oracles) and q_approx_distinct /
    // q_approx_distinct_hll (exact counts + pinned error-bound flags).
    // The sketch-set surfaces that remain gained driver-checked bound
    // companions (q_dedup_minhash_bound, q_dedup_lsh_pairs_bound,
    // q_sim_lsh_ann_bound, q_dedup_simhash_oracle).
    // r13 (same session): q_sim_pq_ann / q_sim_ivfpq_ann also left —
    // codebook training, encode, ADC pool and exact rerank replayed via
    // GENERATED CTEs (PipelineQueries.pqOracle).
    // r14: q_dedup_incremental_minhash joins (xxhash64 cross-candidates;
    // bounded by the full-oracle q_dedup_incremental_bound companion).
    // r15: q_dedup_semantic_ivf PROMOTED to a full oracle (Lloyd replay at
    // 8 lists + recursive components — the q_sim_ivf_* discipline) and
    // left this list; the SRP family gained md5-seam full-value companions
    // (q_dedup_srp_md5_oracle, q_dedup_incremental_emb_md5,
    // q_sim_lsh_ann_md5) and every remaining row carries a machine-checked
    // NoOracle.Terminal tag (RegistrySpec).
    "q_text_bpe",
    "q_decontaminate_bloom",
    "q_dedup_embedding_lsh_auto", "q_dedup_incremental_embedding",
    "q_dedup_incremental_minhash",
    "q_dedup_minhash",
    "q_dedup_simhash", "q_multimodal_features",
    "q_pipeline_curation_v3_auto",
    "q_sim_lsh_ann", "q_stream_dedup_minhash")

  private def fmt(v: Any): String = v match {
    case null => "␀"
    case t: java.sql.Timestamp => s"ts:${t.getTime}"
    case d: java.sql.Date => s"d:${d.getTime}"
    case b: Array[Byte] => "b64:" + java.util.Base64.getEncoder.encodeToString(b)
    case s: Seq[_] => s.map(fmt).mkString("[", ",", "]")
    case m: Map[_, _] =>
      m.toSeq.map { case (k, x) => fmt(k) + "->" + fmt(x) }.sorted.mkString("{", ",", "}")
    case r: org.apache.spark.sql.Row => r.toSeq.map(fmt).mkString("(", ",", ")")
    case x => x.toString
  }

  def resultHash(df: DataFrame): String = {
    val cols = df.columns.sorted
    val lines = df.select(cols.map(col).toSeq: _*).collect()
      .map(_.toSeq.map(fmt).mkString("|")).sorted
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(cols.mkString(",").getBytes("UTF-8"))
    lines.foreach(l => md.update(("\n" + l).getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.engine.GraftSession.local(cores = 8)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.queries.Registry.byName(n).build(spark, sfDir)
      println(s"""    "$n" -> "${resultHash(df)}",""")
    }
    spark.stop()
  }
}

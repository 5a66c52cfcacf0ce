package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Curation, Dedup, IvfIndex, Similarity}

/** Driver-visible RECALL artifact for the no-oracle (golden-pinned) query
  * surfaces (r11 verdict ask #6): planted-ground-truth recall, precision
  * violations, and candidate volumes, emitted as one JSON line the way
  * Bench emits timings — `runMain graft.tools.Recall [outFile]` writes
  * RECALL_r{N}.json so a recall regression shows up in the round artifact
  * diff (and BenchCompare's recall table), not only in a local spec run.
  *
  * Measurements reuse the [[Planted]] corpora — the exact corpora
  * PlantedTruthSpec asserts thresholds over — so artifact numbers and spec
  * bounds can never drift apart silently.
  *
  * Surface map (17 no-oracle queries):
  *  - minhash/simhash/SRP/SemDeDup-IVF/LSH/IVF/PQ/IVF-PQ/indexed(+SQ8):
  *    planted recall + candidate volume below.
  *  - q_approx_distinct(_hll): relative-error row (recall n/a for a
  *    cardinality sketch; |est-exact|/exact is its quality number).
  *  - q_decontaminate_bloom: planted contamination recall (must be 1.0 —
  *    Bloom has no false negatives) + false-flag volume at the query fpp.
  *  - q_text_bpe / q_multimodal_features / q_pipeline_curation_v3_auto /
  *    q_stream_dedup_minhash: not recall-shaped — covered by differential
  *    (BpeSpec), structural (MultimodalSpec), component (this artifact's
  *    rows), and batch-parity (GoldenSpec shared hash) checks.
  */
object Recall {

  final case class Row(surface: String, recall: Double, falsePos: Long,
                       candidates: Long, planted: Int)

  def measure(spark: SparkSession): Seq[Row] = {
    val out = scala.collection.mutable.ArrayBuffer[Row]()

    // ---- text near-dup candidates ----
    val (docs, exactPairs, editPairs) = Planted.textCorpus(spark)
    val planted = exactPairs ++ editPairs
    def pairRow(name: String, got: Set[(Long, Long)]): Row = Row(
      name,
      recall = (got & planted).size.toDouble / planted.size,
      falsePos = (got -- planted).size.toLong,
      candidates = got.size.toLong,
      planted = planted.size)

    out += pairRow("dedup_minhash",
      Dedup.minhashCandidates(docs, "text", "doc_id")
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    out += pairRow("dedup_simhash",
      Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 6)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet)

    // incremental (batch-vs-corpus) cross candidates: put every planted
    // pair ACROSS the split — dup side (b) in the batch, original (a) in
    // the corpus — so each planted pair must surface as a cross candidate;
    // output is (batch, corpus), swapped back to (a, b) for the compare
    locally {
      val bIds = planted.map(_._2).toSeq
      val batchP = docs.filter(col("doc_id").isin(bIds: _*))
      val corpusP = docs.filter(!col("doc_id").isin(bIds: _*))
      out += pairRow("dedup_incremental_minhash",
        Dedup.crossMinhashCandidates(batchP, corpusP, "text", "doc_id")
          .select("a", "b").collect().map(r => (r.getLong(1), r.getLong(0))).toSet)
    }

    // ---- embedding near-dup candidates ----
    val (embs, embPlanted) = Planted.embCorpus(spark)
    def embPairRow(name: String, got: Set[(Long, Long)]): Row = Row(
      name,
      recall = (got & embPlanted).size.toDouble / embPlanted.size,
      falsePos = (got -- embPlanted).size.toLong,
      candidates = got.size.toLong,
      planted = embPlanted.size)

    out += embPairRow("dedup_embedding_lsh_auto",
      Dedup.embeddingCandidates(embs, "embedding", "vec_id", minCos = 0.8, bits = -1)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet)

    // incremental embedding cross candidates: planted pairs across the
    // split (dup side in the batch), same convention as the text row
    locally {
      val ebIds = embPlanted.map(_._2).toSeq
      val batchE = embs.filter(col("vec_id").isin(ebIds: _*))
      val corpusE = embs.filter(!col("vec_id").isin(ebIds: _*))
      out += embPairRow("dedup_incremental_embedding",
        Dedup.crossEmbeddingCandidates(batchE, corpusE, "embedding", "vec_id",
            minCos = 0.8)
          .select("a", "b").collect().map(r => (r.getLong(1), r.getLong(0))).toSet)
    }

    // SemDeDup IVF mode: recall = planted pairs co-clustered; precision
    // violation = a non-planted id not in its own singleton cluster
    val ivfClusters = Dedup.semanticDedup(embs, "embedding", "vec_id",
        minCos = 0.8, nLists = 8)
      .select("id", "cluster").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plantedIds = embPlanted.flatMap(p => Seq(p._1, p._2))
    out += Row("dedup_semantic_ivf",
      recall = embPlanted.count { case (a, b) => ivfClusters(a) == ivfClusters(b) }
        .toDouble / embPlanted.size,
      falsePos = ivfClusters.count { case (id, c) => !plantedIds.contains(id) && c != id }.toLong,
      candidates = ivfClusters.size.toLong,
      planted = embPlanted.size)

    // ---- ANN top-k: plant (true NN at cos ~0.99995) surfaced per query ----
    val queries = embs.filter(col("vec_id") < 20)
    // the plant convention (c_id == q_id + 10000, Planted.embCorpus) is
    // encoded HERE only; every ANN row — filtered or not — counts hits
    // through it (r14 review)
    def annRow(name: String, res: DataFrame, nQ: Int = 20): Row = {
      val rows = res.select("q_id", "c_id").collect()
      val hits = rows.count(r => r.getLong(1) == r.getLong(0) + 10000L)
      Row(name, recall = hits.toDouble / nQ, falsePos = 0L,
        candidates = rows.length.toLong, planted = nQ)
    }
    out += annRow("sim_lsh_ann",
      Similarity.lshTopK(embs, queries, "vec_id", "embedding", k = 10))
    out += annRow("sim_ivf_ann",
      Similarity.ivfTopK(embs, queries, "vec_id", "embedding", k = 10, nLists = 16))
    out += annRow("sim_pq_ann",
      Similarity.pqTopK(embs, queries, "vec_id", "embedding", k = 10))
    out += annRow("sim_ivfpq_ann",
      Similarity.ivfPqTopK(embs, queries, "vec_id", "embedding", k = 10,
        nLists = 8, nProbe = 4))
    // Filtered ANN (r13 verdict #2): labels planted so each query's true
    // plant SURVIVES the filter while ~2/3 of distractors do not — the
    // case naive post-filtering loses. Queries are label-0 bases; recall
    // counts their plants found under predicate label = 0.
    locally {
      val labeled = embs.withColumn("label", (col("vec_id") % 10000L % 3L).cast("int"))
      val fq = labeled.filter(col("vec_id") < 20 && col("label") === 0)
      val nFq = fq.count().toInt
      out += annRow("sim_ivf_filtered",
        Similarity.ivfTopKFiltered(labeled, fq, "vec_id", "embedding",
          k = 10, predicate = col("label") === 0, nLists = 16), nQ = nFq)
    }
    val rawIdx = java.nio.file.Files.createTempDirectory("graft_recall_ivf").toString
    IvfIndex.build(embs, "vec_id", "embedding", rawIdx, nLists = 16)
    out += annRow("sim_ivf_indexed",
      IvfIndex.topK(spark, rawIdx, queries, "vec_id", "embedding", k = 10))
    val sqIdx = java.nio.file.Files.createTempDirectory("graft_recall_ivfsq").toString
    IvfIndex.build(embs, "vec_id", "embedding", sqIdx, nLists = 16, codec = "sq8")
    out += annRow("sim_ivfsq_indexed",
      IvfIndex.topK(spark, sqIdx, queries, "vec_id", "embedding", k = 10))

    // ---- HLL relative error (q_approx_distinct family): quality is
    // |estimate - exact| / exact on a known-cardinality column; reported
    // as recall = 1 - rel_err so "higher is better" holds across the table
    val exactN = 100000L
    val est = spark.range(exactN * 3).select((col("id") % exactN).as("v"))
      .agg(approx_count_distinct(col("v"), 0.02).as("e"))
      .collect()(0).getLong(0)
    val relErr = math.abs(est - exactN).toDouble / exactN
    out += Row("approx_distinct_hll", recall = 1.0 - relErr, falsePos = 0L,
      candidates = est, planted = exactN.toInt)

    // ---- Bloom decontamination: plant 25 contaminated docs (they embed a
    // benchmark 13-gram); Bloom must flag ALL of them (no false negatives)
    // and false flags stay fpp-bounded
    val rnd = new scala.util.Random(47260815L)
    def sent(n: Int): String = Array.fill(n)("w" + rnd.nextInt(2000)).mkString(" ")
    val benchRows = (0 until 20).map(i => (i, sent(15)))
    val contaminated = (0 until 25).map { i =>
      (20000L + i, sent(10) + " " + benchRows(i % 20)._2 + " " + sent(10))
    }
    val clean = (0 until 300).map(i => (i.toLong, sent(40)))
    import spark.implicits._
    val corpus = (clean ++ contaminated).toDF("doc_id", "text")
    val benchDf = benchRows.toDF("q_id", "question")
    val flagged = Curation.bloomDecontaminate(corpus, "doc_id", "text",
        benchDf, "question", n = 13, fpp = 0.001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val contamIds = contaminated.map(_._1).toSet
    out += Row("decontaminate_bloom",
      recall = (flagged & contamIds).size.toDouble / contamIds.size,
      falsePos = (flagged -- contamIds).size.toLong,
      candidates = flagged.size.toLong,
      planted = contamIds.size)

    out.toSeq
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val rows = measure(spark)
    val surfaces = rows.map { r =>
      s""""${r.surface}":{"recall":${"%.4f".format(r.recall)},""" +
        s""""false_positives":${r.falsePos},"candidates":${r.candidates},""" +
        s""""planted":${r.planted}}"""
    }.mkString("{", ",", "}")
    val json = s"""{"metric":"recall","surfaces":$surfaces}"""
    println(json)
    args.headOption.foreach { f =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(f), json + "\n")
    }
    spark.stop()
  }
}

package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus keyword search for training-data curation: BM25 ranking over a
  * document table (find the docs most relevant to a probe query — e.g. for
  * targeted decontamination or domain sampling).
  *
  * Scale shape: the query-term filter is applied to the token array BEFORE
  * exploding, so the per-doc explode emits at most |hits| rows (not |doc|);
  * per-term document frequencies are a |Q|-row aggregate joined back by
  * broadcast; corpus size / average length are a single-row aggregate. The
  * only data-sized shuffle is the per-doc score sum. */
object Search {

  /** Non-empty lowercased word tokens. */
  private def cleanTokens(textCol: String) =
    filter(split(lower(col(textCol)), " "), t => length(t) > 0)

  /** BM25 top-k: (id, score) for the k highest-scoring documents against
    * `queryTerms` (lowercased exact token match), ties broken by id.
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (Robertson-Sparck Jones form,
    * as in Lucene); tf saturation k1, length normalization b. */
  def bm25(docs: DataFrame, textCol: String, idCol: String,
           queryTerms: Seq[String], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queryTerms.map(_.toLowerCase)
    val toks = cleanTokens(textCol)
    val withLen = docs.select(col(idCol).as("id"), toks.as("t"))
      .withColumn("dl", size(col("t")))
    // single-row corpus stats; broadcast into the score computation
    val stats = withLen.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    val hits = withLen
      .select(col("id"), col("dl"),
        explode(filter(col("t"), t => t.isin(terms.map(lit(_)): _*))).as("w"))
    val tf = hits.groupBy("id", "dl", "w").agg(count(lit(1)).as("tf"))
    val dfreq = hits.select("id", "w").distinct()
      .groupBy("w").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val perTerm = tf
      .join(broadcast(dfreq), "w")
      .crossJoin(broadcast(stats))
      .select(col("id"),
        (idf * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("s"))
    // round(4): the per-doc sum accumulates in shuffle order, so raw doubles
    // differ by ~1 ulp run-to-run/engine-to-engine (same discipline as the
    // var/stddev/percentile oracles)
    perTerm.groupBy("id").agg(round(sum(col("s")), 4).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** TF-IDF keyword extraction: the `k` highest-scoring terms per document
    * (tfidf = tf * ln(N/df), ties by term), the standard per-doc topic
    * signature used for domain tagging / cluster labeling in curation
    * pipelines. Output: (id, term, tfidf, rk) with tfidf rounded to
    * `roundTo` digits (ln and the tf*idf product are reproducible, but the
    * rounding keeps the contract uniform with the other scored surfaces).
    *
    * Scale shape: one explode to (doc, term) counts (shuffle on the pair),
    * document frequencies aggregated from that same counts frame (shuffle on
    * the term — NOT broadcast: the vocabulary is open at 100 TB; AQE flips
    * the join to broadcast when it is actually small), and the top-k window
    * partitions per doc — fine-grained keys, no single-task funnel. */
  def tfidfTopTerms(docs: DataFrame, textCol: String, idCol: String,
                    k: Int, roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = docs.agg(count(lit(1)).as("__n"))
    val tf = docs
      .select(col(idCol).as("id"), explode(cleanTokens(textCol)).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("__df"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .select(col("id"), col("term"),
        round(col("__tf") * log(col("__n").cast("double") / col("__df")), roundTo)
          .as("tfidf"))
    val w = Window.partitionBy(col("id")).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Hybrid lexical+dense retrieval by reciprocal-rank fusion (Cormack et
    * al. 2009): rrf(d) = Σ_arm 1/(kRrf + rank_arm(d)), a document absent
    * from an arm contributes nothing there. The lexical arm is [[bm25]]
    * against `queryTerms`; the dense arm is exact-cosine top-`poolK`
    * against the embedding of `queryId` (swap in Similarity.ivfTopK /
    * lshTopK candidates upstream for an ANN dense arm at scale — the
    * fusion only consumes (id, rank)).
    *
    * Scale shape: each arm reduces the corpus to `poolK` rows BEFORE any
    * global operator; the unpartitioned rank windows and the full-outer
    * fusion join run on 2x poolK rows, driver-trivial at any corpus size.
    * Output: (id, rrf, lex_rank, dense_rank) — ranks NULL where the doc
    * missed that arm's pool. */
  def hybridTopK(docs: DataFrame, textCol: String, idCol: String,
                 embs: DataFrame, vecCol: String, vecIdCol: String,
                 queryTerms: Seq[String], queryId: Long,
                 k: Int, poolK: Int = 50, kRrf: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GridDbScalarFunctions.register(docs.sparkSession)
    val lex = bm25(docs, textCol, idCol, queryTerms, poolK)
      .withColumn("lex_rank",
        row_number().over(Window.orderBy(col("score").desc, col("id"))))
      .select("id", "lex_rank")
    val qv = embs.filter(col(vecIdCol) === queryId)
      .select(transform(col(vecCol), _.cast("double")).as("qv"))
    val dense = embs.filter(col(vecIdCol) =!= queryId)
      .select(col(vecIdCol).as("id"),
        transform(col(vecCol), _.cast("double")).as("v"))
      .crossJoin(broadcast(qv))
      .select(col("id"),
        round(call_function("graft_cosine", col("v"), col("qv")), 4).as("cos"))
      .orderBy(col("cos").desc, col("id")).limit(poolK)
      .withColumn("dense_rank",
        row_number().over(Window.orderBy(col("cos").desc, col("id"))))
      .select("id", "dense_rank")
    lex.join(dense, Seq("id"), "full_outer")
      .select(col("id"),
        round(
          coalesce(lit(1.0) / (lit(kRrf) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("dense_rank")), lit(0.0)),
          6).as("rrf"),
        col("lex_rank"), col("dense_rank"))
      .orderBy(col("rrf").desc, col("id")).limit(k)
  }
}

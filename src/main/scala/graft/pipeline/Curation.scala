package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.engine.Parallelism.spread

/** Dataset-curation operators a large-scale training pipeline needs beyond
  * dedup/quality: benchmark decontamination and reproducible sampling.
  * (Additive surface — the reference is an IoT store with no curation ops;
  * these follow the published data-pipeline practice: n-gram overlap
  * decontamination as in the GPT-3/PaLM data papers, deterministic
  * hash-bucket sampling for reproducible subsets.)
  */
object Curation {

  /** Non-empty lowercase whitespace tokens of a text column. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Word n-grams over a PRE-SPLIT token-array column, each joined with
    * single spaces; arrays shorter than n produce an empty array.
    *
    * Operators should project [[tokens]] to a column FIRST and call this on
    * the attribute: Catalyst does no subexpression elimination inside
    * higher-order-function lambdas, so passing `tokens(text)` directly
    * re-runs the regex tokenizer once PER GRAM — measured 8.4s for a 250k
    * gram explode at sf0.1 vs 0.5s with the tokens projected. */
  def wordNgramsOfTokens(toks: Column, n: Int): Column = {
    require(n >= 1, "n-gram size must be >= 1")
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Word n-grams of a text column: lowercase, whitespace-split (empty
    * tokens dropped). Convenience form — inside exploding operators prefer
    * projecting [[tokens]] then [[wordNgramsOfTokens]] (see its scaladoc). */
  def wordNgrams(text: Column, n: Int): Column =
    wordNgramsOfTokens(tokens(text), n)

  /** Benchmark decontamination: for every training document, the number of
    * distinct word n-grams it shares with ANY benchmark document (documents
    * with no overlap are absent — filter or anti-join on the result to drop
    * contaminated docs).
    *
    * Scale shape: the benchmark side is deduplicated and broadcast (eval
    * sets are small by nature — if yours is not, drop the broadcast hint
    * and AQE plans a shuffle join); the training side explodes to one row
    * per n-gram and aggregates per doc — one shuffle on the doc id,
    * linear in corpus token count. */
  def ngramOverlap(docs: DataFrame, idCol: String, textCol: String,
                   bench: DataFrame, benchTextCol: String,
                   n: Int = 13): DataFrame = {
    val dg = docs.select(col(idCol), tokens(col(textCol)).as("__t"))
      .select(col(idCol), explode(wordNgramsOfTokens(col("__t"), n)).as("__ng"))
    val bg = bench.select(tokens(col(benchTextCol)).as("__t"))
      .select(explode(wordNgramsOfTokens(col("__t"), n)).as("__ng"))
      .distinct()
    dg.join(broadcast(bg), "__ng")
      .groupBy(idCol)
      .agg(count_distinct(col("__ng")).as("n_shared_ngrams"))
  }

  /** Bloom-filter decontamination: [[ngramOverlap]]'s fixed-memory form.
    *
    * The exact operator broadcasts the DISTINCT benchmark n-gram set — fine
    * for benchmark suites, but the broadcast grows with total benchmark
    * text. Here the benchmark side is folded into a Bloom filter over
    * xxhash64(gram) (`df.stat.bloomFilter` — a distributed tree-aggregated
    * build), whose size depends only on (expectedItems, fpp): ~1.2 MB per
    * million grams at 1% regardless of gram length. The corpus side then
    * probes the filter inside whole-stage codegen (graft_bloom_contains —
    * a reference-object call, no join, no UDF) and only PROBABLE hits reach
    * the per-doc aggregate.
    *
    * Semantics: flagged grams are a SUPERSET of the exact operator's (no
    * false negatives); extra flags are bounded by fpp per probed gram.
    * Budget fpp per DOCUMENT, not per gram: a doc probing g distinct grams
    * is falsely flagged with probability ~g*fpp, so a corpus targeting a
    * 1e-3 doc-level false-flag rate at ~100 grams/doc needs fpp ~1e-5 —
    * which still costs only ~24 bits/entry (~30 KB per 10k benchmark
    * grams).
    * Deterministic: the filter's bitset is an OR-merge (partition-order
    * independent) and hashing is seed-fixed. Output mirrors ngramOverlap:
    * (idCol, n_flagged_ngrams) for flagged docs only.
    *
    * Note: building the plan runs the benchmark-side jobs eagerly (a count
    * to size the filter, then the filter build — both over the small side). */
  def bloomDecontaminate(docs: DataFrame, idCol: String, textCol: String,
                         bench: DataFrame, benchTextCol: String,
                         n: Int = 13, fpp: Double = 0.01): DataFrame = {
    // distinct BEFORE sizing: expectedItems must be the distinct-gram
    // count, or benchmark boilerplate repetition inflates the filter by
    // the duplication factor (inserting duplicates is a no-op; sizing by
    // them is pure waste shipped to every task as the plan literal)
    val bg = bench.select(tokens(col(benchTextCol)).as("__t"))
      .select(explode(wordNgramsOfTokens(col("__t"), n)).as("__ng"))
      .select(xxhash64(col("__ng")).as("__h"))
      .distinct()
    val expected = math.max(bg.count(), 1L)
    val bloom = bg.stat.bloomFilter("__h", expected, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val dg = docs.select(col(idCol), tokens(col(textCol)).as("__t"))
      .select(col(idCol), explode(wordNgramsOfTokens(col("__t"), n)).as("__ng"))
    dg.filter(call_function("graft_bloom_contains",
        xxhash64(col("__ng")), typedLit(bos.toByteArray)))
      .groupBy(idCol)
      .agg(count_distinct(col("__ng")).as("n_flagged_ngrams"))
  }

  /** Semantic decontamination: flag corpus documents whose embedding sits
    * within `minCos` of ANY benchmark embedding — the paraphrase-robust
    * complement of [[ngramOverlap]] (lexical overlap misses reworded
    * benchmark leakage; cosine against the benchmark set catches it).
    *
    * Scale shape: the benchmark side is broadcast (benchmark suites are
    * thousands of rows, the corpus is the big side), the cosine verify is
    * the codegen'd kernel, and the per-doc aggregate takes max/count over
    * the |docs| x |bench| broadcast-join output — no shuffle of the corpus
    * beyond the final groupBy. For benchmark sets too large to broadcast,
    * band the two sides through Dedup.embeddingCandidates instead.
    * Output: (id, n_contaminated, max_cos) for flagged docs only. */
  def embeddingOverlap(docs: DataFrame, idCol: String, vecCol: String,
                       bench: DataFrame, benchVecCol: String,
                       minCos: Double, roundTo: Int = 4): DataFrame = {
    graft.functions.GridDbScalarFunctions.register(docs.sparkSession)
    val d = docs.select(col(idCol),
      transform(col(vecCol), _.cast("double")).as("__v"))
    val b = bench.select(
      transform(col(benchVecCol), _.cast("double")).as("__bv"))
    d.crossJoin(broadcast(b))
      .select(col(idCol),
        round(call_function("graft_cosine", col("__v"), col("__bv")), roundTo)
          .as("__cos"))
      .filter(col("__cos") >= minCos)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_contaminated"), max(col("__cos")).as("max_cos"))
  }

  /** Gopher-style duplicated-n-gram fraction: per document, the fraction of
    * its word n-gram occurrences whose gram appears in MORE THAN ONE
    * document of the corpus (the "duplicate n-grams" quality signal used to
    * drop boilerplate/templated text). Documents with fewer than n tokens
    * emit no n-grams and are absent from the output.
    *
    * Output: (id, n_ngrams, dup_ngram_frac). The fraction is an average of
    * exact 0/1 doubles, so it is order-independent and cross-engine exact.
    *
    * Scale shape: one explode to gram occurrences (token-linear), a
    * distinct-doc count per gram (shuffle on the gram — open vocabulary, so
    * no broadcast assumption; AQE broadcasts when it is small), the
    * gram-count join back, and one aggregate on the doc id. Same traffic
    * class as the minhash pass. */
  def duplicatedNgramFraction(docs: DataFrame, idCol: String, textCol: String,
                              n: Int = 5, roundTo: Int = 6): DataFrame = {
    val grams = docs
      .select(col(idCol).as("__id"), tokens(col(textCol)).as("__t"))
      .select(col("__id"), explode(wordNgramsOfTokens(col("__t"), n)).as("__ng"))
    val perGram = grams.groupBy("__ng")
      .agg(count_distinct(col("__id")).as("__docs"))
    grams.join(perGram, "__ng")
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        round(avg(when(col("__docs") > 1, 1.0).otherwise(0.0)), roundTo)
          .as("dup_ngram_frac"))
  }

  /** DSIR importance weighting (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw document
    * by the log-likelihood ratio of its word-unigram bag under a TARGET
    * corpus model vs the RAW corpus model —
    * `weight(doc) = Σ_w c_w(doc) · (ln p̂_t(w) - ln p̂_r(w))` with add-1
    * smoothed MLE unigram models over the raw vocabulary. Positive = more
    * target-like. The paper hashes n-gram features into a fixed bucket
    * space for constant-memory models; over a bounded vocabulary the
    * unhashed unigram model is the same estimator and stays engine-portable
    * for the oracle. The paper then Gumbel-samples ∝ weight — compose with
    * [[temperatureSample]]/[[hashSample]] or a deterministic top-k for the
    * reproducible equivalent.
    *
    * Output: (id, n_tokens, weight), weight rounded to `roundTo` (a
    * sum-of-logs, rounded for cross-engine determinism like [[bigramNll]]);
    * docs with zero tokens are absent.
    *
    * Scale shape: one token explode; both unigram models are word-keyed
    * aggregates (shuffle on the word); the per-word λ table is
    * vocabulary-sized and joins back to the token stream (AQE broadcasts it
    * when small); one final aggregate on the doc id. Linear in corpus
    * tokens — the same traffic class as [[unigramNll]]. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  target: DataFrame, targetTextCol: String,
                  roundTo: Int = 6): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"),
      explode(tokens(col(textCol))).as("__w"))
    val ttoks = target.select(explode(tokens(col(targetTextCol))).as("__w"))
    val rawCnt = toks.groupBy("__w").agg(count(lit(1)).as("__cr"))
    val tgtCnt = ttoks.groupBy("__w").agg(count(lit(1)).as("__ct"))
    val totals = rawCnt.agg(sum(col("__cr")).as("__r"), count(lit(1)).as("__v"))
      .crossJoin(ttoks.agg(count(lit(1)).as("__t")))
    val lam = rawCnt.join(tgtCnt, Seq("__w"), "left")
      .crossJoin(broadcast(totals))
      .select(col("__w"),
        (log((coalesce(col("__ct"), lit(0L)) + 1).cast("double")
            / (col("__t") + col("__v")).cast("double"))
          - log((col("__cr") + 1).cast("double")
            / (col("__r") + col("__v")).cast("double"))).as("__lam"))
    toks.join(lam, "__w")
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("__lam")), roundTo).as("weight"))
  }

  /** Token-budget mixture sampling (training-mix prep): fill a per-domain
    * TOKEN budget deterministically — the "mix 30B tokens of web with 5B of
    * code" step that precedes training. Documents are ordered within their
    * domain by (md5(id), id) — the same engine-portable order as
    * [[hashSample]]/[[stratifiedSample]], so the selected set is stable
    * across runs, engines, and cluster sizes — and taken while the running
    * token total has not yet reached the domain's budget BEFORE the
    * document (next-fit overshoot: the boundary doc that crosses the
    * budget ships, so every non-empty budget is met, like packSequences).
    * Domains without a configured budget use `defaultBudget`; <= 0 means
    * drop the domain.
    *
    * Output: (id, domain, n_tokens, run_tokens) for the selected docs.
    * Scale shape: ONE shuffle on the domain (window running sum) — group
    * sizes are domain sizes; for very hot domains pre-filter with
    * [[hashSample]] to bound the window input, same discipline as
    * stratifiedSample's quota prefilter. */
  def tokenBudgetSample(docs: DataFrame, idCol: String, textCol: String,
                        domainCol: String, budgets: Map[String, Long],
                        defaultBudget: Long = 0L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain"))
      .orderBy(md5(col("id").cast("string")), col("id"))
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (k, v)) =>
      when(col("domain") === k, lit(v)).otherwise(acc)
    }
    docs
      .select(col(idCol).as("id"), col(domainCol).as("domain"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("run_tokens", sum(col("n_tokens")).over(w))
      .filter(col("run_tokens") - col("n_tokens") < budget)
  }

  /** Token-budget sequence packing (training-batch prep): deterministically
    * assign documents to fixed-budget packs — the "fill each 8k context
    * window" step before tokenization-and-concat. Documents are sharded by
    * md5(id) (reproducible across runs/engines/cluster sizes), ordered
    * within the shard by (md5(id), id), and packed NEXT-FIT: a document
    * that no longer fits the open pack starts a new one; a document larger
    * than the budget occupies a pack alone (truncation is the trainer's
    * call). Output: (shard, id, pack_id, pack_used) with pack_id 1-based
    * per shard and pack_used the pack's token total through this document.
    *
    * Scale shape: ONE shuffle on the shard key; each shard packs
    * sequentially inside flatMapGroups (next-fit is a sequential fold by
    * nature). Memory per task is the shard's (id, tokens, hash) triples —
    * size `shards` so corpus/shards rows fit comfortably (thousands to
    * millions per shard), the same chunk discipline as the unkeyed
    * time-series ops. */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    budget: Long, shards: Int = 32): DataFrame = {
    require(budget > 0, "token budget must be positive")
    require(shards > 0, "shard count must be positive")
    // a silent cast-to-null here would DROP documents from the packing
    // (Spark renders ByteType/ShortType as "tinyint"/"smallint")
    require(Set("tinyint", "smallint", "int", "bigint")
        .contains(df.schema(idCol).dataType.simpleString),
      s"packSequences needs an integral id column; '$idCol' is ${df.schema(idCol).dataType.simpleString}")
    val spark = df.sparkSession
    import spark.implicits._
    val prep = df.select(col(idCol).cast("long").as("_1"),
        col(tokensCol).cast("long").as("_2"),
        md5(col(idCol).cast("string")).as("_3"))
      .withColumn("_4", hashBucket(col("_1"), shards).cast("int"))
      .as[(Long, Long, String, Int)]
    prep.groupByKey(_._4)
      .flatMapGroups { (shard, it) =>
        val rows = it.toArray.sortBy(r => (r._3, r._1))
        var pack = 0L
        var used = 0L
        var open = false
        rows.iterator.map { case (id, tok, _, _) =>
          if (open && used + tok <= budget) used += tok
          else { pack += 1; used = tok; open = true }
          (shard, id, pack, used)
        }
      }
      .toDF("shard", idCol, "pack_id", "pack_used")
  }

  /** Deterministic hash sampling: keep rows whose 32-bit md5-prefix of the
    * key, mod `denom`, falls below `num` (rate num/denom). Unlike
    * rand()-based sampling this is reproducible across runs, engines, and
    * cluster sizes, and the same key always lands in the same bucket — the
    * property train/validation splits and cross-run ablations need. Pure
    * codegen'd column expressions; no shuffle. */
  def hashSample(df: DataFrame, keyCol: String, num: Int, denom: Int): DataFrame = {
    require(num >= 0 && denom > 0 && num <= denom, s"bad rate $num/$denom")
    df.filter(hashBucket(col(keyCol), denom) < num)
  }

  /** The sampling bucket in [0, denom): 32-bit md5 prefix of the key's
    * string form, mod denom. */
  def hashBucket(key: Column, denom: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % denom

  /** Deterministic training-order shuffle + sharding: every row gets a
    * `shard` in [0, nShards) and a reproducible `pos` inside its shard,
    * both pure functions of (salt, key) — the pre-write step of a training
    * pipeline that must produce the SAME shard layout on every run, on any
    * cluster size, and reshuffle globally between epochs by changing the
    * salt. The hash is md5 of `salt#key` (engine-portable, so the whole
    * layout is oracle-replayable — q_pipeline_shuffle_shards), the shard is
    * the hash's top 60 bits mod nShards, and the in-shard order is
    * (hash, key), keyed-deterministic even under hash ties.
    *
    * Scale shape: ONE shuffle on `shard`; each shard sorts independently
    * (no global sort ever happens), and shard count scales with the corpus
    * — at 100 TB you run this with ~100k shards so a shard is a few
    * hundred MB and the per-shard sorts spread across every executor. */
  def shuffleShards(df: DataFrame, keyCol: String, salt: String,
                    nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    // withColumn silently REPLACES an existing column — a pre-existing
    // shard/pos (or the transient __h) would be destroyed without a trace
    // (r14 ADVICE): fail fast instead
    val clash = df.columns.toSet.intersect(Set("shard", "pos", "__h"))
    require(clash.isEmpty,
      s"shuffleShards: input already has column(s) ${clash.mkString(", ")} — " +
        "shard/pos are outputs and __h is transient; rename them first")
    val hv = conv(substring(
        md5(concat_ws("#", lit(salt), col(keyCol).cast("string")).cast("binary")),
        1, 15), 16, 10).cast("long")
    df.withColumn("__h", hv)
      .withColumn("shard", (col("__h") % nShards).cast("int"))
      .withColumn("pos", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("__h"), col(keyCol))))
      .drop("__h")
  }

  /** Unigram language-model scoring (the CCNet/CC-100 quality-filter shape:
    * score each document by its per-token negative log-likelihood under a
    * corpus LM; unusually high NLL = noise/gibberish, unusually low =
    * boilerplate). The LM here is the corpus' own unigram MLE —
    * p(w) = count(w) / total_tokens — so the operator is fully deterministic
    * and cross-engine checkable; a production pipeline would swap the
    * frequency table for one trained on a trusted corpus (the join shape is
    * identical).
    *
    * Output: (id, n_tokens, nll) where nll = avg over tokens of -ln p(w),
    * rounded to `roundTo` digits (per-doc sums accumulate in shuffle order,
    * so raw doubles differ by ~1 ulp engine-to-engine).
    *
    * Scale shape: the frequency table is vocabulary-sized and OPEN (typo
    * tokens at 100 TB make it far bigger than a broadcast) — the token→freq
    * join is a plain shuffle join on the token, which AQE converts to
    * broadcast when the vocabulary is actually small; the per-doc aggregate
    * is one more shuffle on the doc id. Token traffic is linear in corpus
    * size, same as the dedup/minhash passes. */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String,
                 roundTo: Int = 6): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"),
      explode(filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")).as("__tok"))
    val freq = toks.groupBy("__tok").agg(count(lit(1)).as("__c"))
    // single-row total; computed off the (small) frequency table, not the
    // token stream, and broadcast into the score projection
    val total = freq.agg(sum("__c").as("__t"))
    toks.join(freq, "__tok")
      .crossJoin(broadcast(total))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(-log(col("__c").cast("double") / col("__t"))), roundTo).as("nll"))
  }

  /** Overlapping token-window chunking (embedding/RAG prep: split each
    * document into `window`-token chunks advancing by `stride` tokens, the
    * step before batch-embedding a corpus). Chunks are rebuilt as
    * space-joined text; the last chunk may be shorter. Empty documents
    * produce no chunks. Output: (id, chunk_id, chunk_text, n_tokens).
    *
    * Map-only column expressions over a projected token array — no
    * shuffle, token-linear work (each token appears in at most
    * ceil(window/stride) chunks). */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
                     window: Int, stride: Int): DataFrame = {
    require(window > 0, "window must be positive")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window], got $stride")
    val base = spread(docs).select(col(idCol), tokens(col(textCol)).as("__t"))
    val sz = size(col("__t"))
    // chunks fully covering the tokens: 1 + ceil(max(sz-window, 0)/stride)
    val nChunks = lit(1) +
      greatest(floor((sz - window + stride - 1) / stride), lit(0)).cast("int")
    val chunks = when(sz > 0,
      transform(sequence(lit(0), nChunks - 1),
        i => struct(
          i.cast("long").as("chunk_id"),
          array_join(slice(col("__t"), i * stride + 1, lit(window)), " ").as("chunk_text"),
          least(lit(window), sz - i * stride).cast("long").as("n_tokens"))))
      .otherwise(array().cast("array<struct<chunk_id:bigint,chunk_text:string,n_tokens:bigint>>"))
    base.select(col(idCol), explode(chunks).as("__c"))
      .select(col(idCol), col("__c.chunk_id").as("chunk_id"),
        col("__c.chunk_text").as("chunk_text"), col("__c.n_tokens").as("n_tokens"))
  }

  /** Bigram language-model scoring with add-k smoothing — the next step up
    * from [[unigramNll]] toward the CCNet 5-gram-KenLM quality filter:
    * p(w|prev) = (c(prev,w) + k) / (c(prev,·) + k·V) under the corpus' own
    * MLE, so the operator stays deterministic and cross-engine checkable
    * (a production pipeline swaps the count tables for ones trained on a
    * trusted corpus; join shape identical). Documents with fewer than two
    * tokens have no transitions and are absent from the output.
    *
    * Output: (id, n_transitions, nll), nll = avg over transitions of
    * -ln p(w|prev), rounded to `roundTo` (per-doc sums accumulate in
    * shuffle order — same rounding discipline as unigramNll).
    *
    * Scale shape: transitions are token-linear; the bigram and context
    * count tables are open-vocabulary (shuffle joins on the pair/prev —
    * AQE broadcasts when they are small); V is a single broadcast row; one
    * final shuffle on the doc id. */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String,
                addK: Double = 1.0, roundTo: Int = 6): DataFrame = {
    require(addK > 0, "add-k smoothing constant must be positive")
    val base = docs.select(col(idCol).as("__id"), tokens(col(textCol)).as("__t"))
    val tr = base.select(col("__id"),
        explode(when(size(col("__t")) >= 2,
          transform(sequence(lit(1), size(col("__t")) - 1),
            i => struct(element_at(col("__t"), i).as("p"),
              element_at(col("__t"), i + 1).as("w"))))
          .otherwise(array().cast("array<struct<p:string,w:string>>"))).as("__tr"))
      .select(col("__id"), col("__tr.p").as("__p"), col("__tr.w").as("__w"))
    val bg = tr.groupBy("__p", "__w").agg(count(lit(1)).as("__cbg"))
    val ctx = tr.groupBy("__p").agg(count(lit(1)).as("__cp"))
    val vocab = base.select(explode(col("__t")).as("__tok"))
      .agg(count_distinct(col("__tok")).as("__v"))
    tr.join(bg, Seq("__p", "__w")).join(ctx, Seq("__p"))
      .crossJoin(broadcast(vocab))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_transitions"),
        round(avg(-log((col("__cbg") + lit(addK)) /
          (col("__cp") + lit(addK) * col("__v")))), roundTo).as("nll"))
  }

  /** Temperature-weighted group sampling (the multilingual-pretraining
    * rebalance: sample group g with probability ∝ c_g^alpha, alpha<1 upweights
    * the tail — XLM-R style). Deterministically keeps, per group, the
    * quota_g = min(c_g, ceil(target * c_g^alpha / Σ_h c_h^alpha)) rows with
    * the smallest md5(key) — reproducible across runs, engines, and cluster
    * sizes.
    *
    * Scale shape: group counts are a one-row-per-group aggregate; the quota
    * share Σ c^alpha is a window over that tiny frame (constant partition
    * key — sequential by design, one row per group); quotas broadcast-join
    * back. The top-quota_g-by-hash selection reuses the stratified-sample
    * discipline: an md5-prefix prefilter bounds the per-group window input to
    * ~oversample*quota rows, with the same exactness fallback for strata the
    * prefilter overshot. */
  def temperatureSample(df: DataFrame, groupCol: String, keyCol: String,
                        alpha: Double, target: Long,
                        oversample: Double = 4.0): DataFrame = {
    require(alpha > 0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(target > 0, "target must be positive")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__cnt"))
    // constant-but-non-foldable partition key (GroupByRange idiom): a
    // foldable pmod(lit(0), lit(1)) constant-folds away and WindowExec
    // warns `No Partition Defined` — the frame is one row per group, so a
    // single partition is by design, but it must be declared
    val wAll = Window.partitionBy(pmod(col("__cnt"), lit(1)))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val share = pow(col("__cnt").cast("double"), alpha)
    val quotas = counts.withColumn("__quota",
      least(col("__cnt"),
        ceil(lit(target.toDouble) * share / sum(share).over(wAll))))
    topByHashPerGroup(df, groupCol, keyCol, quotas, oversample)
  }

  /** Per-group smallest-md5(key) selection with a variable per-group quota
    * (`quotas`: groupCol, __cnt, __quota). The md5-prefix prefilter keeps
    * the window input ~oversample*quota rows per group; groups where the
    * prefilter overshot (survivors < min(quota, size)) fall back to their
    * full row set, so the result is EXACTLY the top-quota-by-hash. Joins on
    * the group are null-safe (`<=>`): a NULL group is a real stratum and
    * keeps its quota, matching groupBy's treatment of NULL as one group.
    *
    * Note: building this plan runs one small Spark job eagerly (the
    * overshot-group check collects the per-group survivor counts — bounded
    * by the number of groups) before the transform is returned. */
  private def topByHashPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                                quotas: DataFrame, oversample: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(col(keyCol).cast("string"))
    val h32 = conv(substring(h, 1, 8), 16, 10).cast("long")
    val cut = (least(lit(1.0), lit(oversample) * col("__quota") / col("__cnt"))
      * lit(4294967296.0)).cast("long")
    val qr = quotas.withColumnRenamed(groupCol, "__g")
    val joined = (left: DataFrame) =>
      left.join(broadcast(qr), left(groupCol) <=> qr("__g")).drop("__g")
    val pre = joined(df).filter(h32 <= cut)
    val short = pre.groupBy(col(groupCol)).agg(count(lit(1)).as("__surv"))
      .drop("__cnt", "__quota")
      .transform(joined)
      .filter(col("__surv") < least(col("__quota"), col("__cnt")))
      .select(col(groupCol)).collect().map(_.get(0))
    val input =
      if (short.isEmpty) pre
      else {
        val nonNull = short.filter(_ != null)
        val isShort = Seq(
          if (nonNull.nonEmpty) Some(col(groupCol).isin(nonNull.toIndexedSeq: _*)) else None,
          if (short.contains(null)) Some(col(groupCol).isNull) else None
        ).flatten.reduce(_ || _)
        pre.union(joined(df.filter(isShort)).filter(h32 > cut))
      }
    input
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(h, col(keyCol))))
      .filter(col("__rn") <= col("__quota"))
      .drop("__rn", "__cnt", "__quota")
  }

  /** Keep the `k` best rows of each group, ranked by `scoreCol` descending
    * with `tieCol` (a unique id) ascending — per-domain caps / per-source
    * quality retention (RefinedWeb §3 keeps the top documents per domain).
    *
    * Scale shape: built on the graft_top_k mergeable aggregate, NOT a
    * window. `row_number() OVER (PARTITION BY group ...) <= k` funnels the
    * whole group through one task — the same scale-killer stratifiedSample
    * documents — while the aggregate's partial buffers are capped at k
    * entries, so the shuffle carries at most k rows per group per map task
    * regardless of corpus size. The grouped payload is the full row struct;
    * exploding it back restores the original schema.
    *
    * Null semantics: rows whose score (or tie) is NULL — or fails the cast
    * to double/bigint — are DROPPED, even in groups smaller than k. This
    * deliberately diverges from a `row_number()` window with NULLS LAST,
    * which would retain null-scored rows when a group has spare capacity:
    * an unscorable document has no defensible rank, and "kept because the
    * domain was small" is not a quality decision. Pre-coalesce the score
    * (e.g. `coalesce(score, lit(-1e308))`) to opt in to keeping them. */
  def capPerGroupByScore(df: DataFrame, groupCol: String, scoreCol: String,
                         tieCol: String, k: Int): DataFrame = {
    require(k > 0, "cap must be positive")
    val cols = df.columns
    val kept = df
      .withColumn("__payload", struct(cols.map(col).toIndexedSeq: _*))
      .groupBy(col(groupCol))
      // Column-based call, not expr() interpolation: a score/tie column
      // named with a space or dot would otherwise fail to parse (or
      // silently resolve as a struct-field access)
      .agg(call_function("graft_top_k", col("__payload"),
        col(scoreCol).cast("double"), col(tieCol).cast("bigint"), lit(k))
        .as("__kept"))
    kept.select(explode(col("__kept")).as("__r")).select(cols.map(c => col(s"__r.$c")).toIndexedSeq: _*)
  }

  /** Deterministic stratified sampling: for each stratum, the `n` rows with
    * the smallest md5(key) — i.e. a reproducible uniform quota sample per
    * group (language, source, quality bucket), stable across runs, engines
    * and cluster sizes.
    *
    * Scale shape: a naive per-stratum `row_number() <= n` funnels every row
    * of a stratum through ONE window task — a scale-killer when a stratum is
    * most of a 100 TB corpus. Instead the md5-prefix is prefiltered to
    * ~`oversample`*n expected survivors per stratum (the cutoff comes from a
    * one-row-per-stratum count aggregate, broadcast back), and only the
    * survivors meet the window. Strata where the prefilter overshot (kept
    * fewer than min(n, size) rows — vanishingly rare at 4x oversampling, but
    * possible) fall back to their full row set, so the result is EXACTLY the
    * top-n-by-hash regardless — the prefilter is a performance device, not a
    * semantic one. */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       n: Int, oversample: Double = 4.0): DataFrame = {
    require(n > 0, "sample size must be positive")
    val quotas = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__cnt"))
      .withColumn("__quota", least(lit(n.toLong), col("__cnt")))
    topByHashPerGroup(df, stratumCol, keyCol, quotas, oversample)
  }
}

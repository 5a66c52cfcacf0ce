package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-curation operators a large-scale training pipeline needs beyond
  * dedup/quality: benchmark decontamination and reproducible sampling.
  * (Additive surface — the reference is an IoT store with no curation ops;
  * these follow the published data-pipeline practice: n-gram overlap
  * decontamination as in the GPT-3/PaLM data papers, deterministic
  * hash-bucket sampling for reproducible subsets.)
  */
object Curation {

  /** Word n-grams of a text column: lowercase, whitespace-split (empty
    * tokens dropped), each n-gram joined with single spaces. Documents
    * shorter than n words produce an empty array. */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, "n-gram size must be >= 1")
    val toks = filter(split(lower(text), "\\s+"), t => t =!= "")
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

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
    val dg = docs.select(col(idCol),
      explode(wordNgrams(col(textCol), n)).as("__ng"))
    val bg = bench.select(explode(wordNgrams(col(benchTextCol), n)).as("__ng"))
      .distinct()
    dg.join(broadcast(bg), "__ng")
      .groupBy(idCol)
      .agg(count_distinct(col("__ng")).as("n_shared_ngrams"))
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
          if (nonNull.nonEmpty) Some(col(groupCol).isin(nonNull: _*)) else None,
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

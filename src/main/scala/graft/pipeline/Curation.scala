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
    import org.apache.spark.sql.expressions.Window
    val h = md5(col(keyCol).cast("string"))
    val h32 = conv(substring(h, 1, 8), 16, 10).cast("long")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__cnt"))
    val cut = (least(lit(1.0), lit(oversample * n) / col("__cnt"))
      * lit(4294967296.0)).cast("long")
    val pre = df.join(broadcast(counts), Seq(stratumCol))
      .filter(h32 <= cut)
    // exactness guard: strata whose survivor count fell below min(n, size)
    // re-enter unfiltered (driver sees only a one-row-per-stratum aggregate)
    val short = pre.groupBy(col(stratumCol)).agg(count(lit(1)).as("__surv"))
      .join(counts, Seq(stratumCol))
      .filter(col("__surv") < least(lit(n.toLong), col("__cnt")))
      .select(col(stratumCol)).collect().map(_.get(0))
    val input =
      if (short.isEmpty) pre.drop("__cnt")
      else pre.drop("__cnt").union(
        df.filter(col(stratumCol).isin(short: _*))
          .join(broadcast(counts), Seq(stratumCol))
          .filter(h32 > cut)
          .drop("__cnt"))
    input
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(stratumCol)).orderBy(h, col(keyCol))))
      .filter(col("__rn") <= n).drop("__rn")
  }
}

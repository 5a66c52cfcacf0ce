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
}

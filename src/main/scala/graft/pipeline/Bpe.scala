package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE subword tokenizer: distributed training + codegen'd encoding
  * (Sennrich et al. 2016 §3.2 — the algorithm GPT-2/RoBERTa-style byte/char
  * BPE vocabularies are trained with).
  *
  * Training runs over the DISTINCT-WORD table, not the corpus: the corpus
  * collapses to (word, frequency) in one shuffle — bounded by vocabulary
  * size, which is millions at 100 TB while the corpus is trillions of
  * tokens — and every merge iteration is then one small aggregate over
  * that cached table. Per iteration: encode each word with the merges
  * learned so far (the same graft_bpe_encode kernel users run, so train
  * and apply can never drift), explode adjacent piece pairs weighted by
  * word frequency, take the global argmax pair. The driver holds only the
  * merge list (numMerges pairs) and the one-row argmax per iteration.
  *
  * Deterministic: the argmax tie-breaks on the pair text, so the learned
  * table is a pure function of the corpus.
  */
object Bpe {

  /** Adjacent (left, right) pairs of an array column, as 2-element arrays. */
  private def adjacentPairs(pieces: Column): Column =
    when(size(pieces) >= 2,
      zip_with(
        slice(pieces, lit(1), size(pieces) - 1),
        slice(pieces, lit(2), size(pieces) - 1),
        (a, b) => array(a, b)))
      .otherwise(array().cast("array<array<string>>"))

  private def mergesLit(merges: Seq[(String, String)]): Column =
    typedLit(merges.map(p => Seq(p._1, p._2)))

  /** Learn `numMerges` merges from the corpus. Stops early when no pair
    * reaches `minPairCount` weighted occurrences. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2L): Seq[(String, String)] = {
    require(numMerges > 0, "numMerges must be positive")
    val vocab = docs
      .select(explode(Curation.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .cache()
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var done = false
      while (!done && merges.size < numMerges) {
        val pieces = call_function("graft_bpe_encode", col("w"), mergesLit(merges.toSeq))
        val best = vocab
          .select(explode(adjacentPairs(pieces)).as("p"), col("n"))
          .groupBy("p").agg(sum("n").as("cnt"))
          .orderBy(col("cnt").desc, col("p"))
          .limit(1).collect()
        if (best.isEmpty || best(0).getLong(1) < minPairCount) done = true
        else {
          val p = best(0).getSeq[String](0)
          merges += ((p(0), p(1)))
        }
      }
      merges.toSeq
    } finally vocab.unpersist()
  }

  /** Append a `pieces` column: the text BPE-encoded with `merges`. Map-only
    * whole-stage-codegen projection — the merge table ships as a literal
    * extracted once into a kernel reference object. */
  def encode(docs: DataFrame, textCol: String,
             merges: Seq[(String, String)]): DataFrame =
    docs.withColumn("pieces",
      call_function("graft_bpe_encode", col(textCol), mergesLit(merges)))

  /** Persist a learned merge table as parquet (rank, left, right) — the
    * tokenizer artifact a training pipeline ships from the corpus job to
    * every consumer job. */
  def save(spark: org.apache.spark.sql.SparkSession,
           merges: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, rg), i) => (i, l, rg) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a merge table written by [[save]], in rank order. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(path).orderBy("rank")
      .collect().map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq

  /** Token vocabulary with stable integer ids: every token at >=`minCount`
    * occurrences, id assigned by (count DESC, token ASC) dense rank — the
    * id table an embedding layer or tokenizer ships with. One shuffle to
    * count + one tiny sort over the surviving vocabulary (already
    * count-pruned, orders of magnitude smaller than the corpus).
    *
    * The global rank window runs over the PRUNED vocab only — for a 100 TB
    * corpus that is the ~millions-row survivor table, small enough for the
    * single-task window; prune harder (higher minCount) before asking for
    * dense ids if the tail survives. */
  def vocabBuild(docs: DataFrame, textCol: String, minCount: Long = 2L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs.select(explode(Curation.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("cnt").desc, col("token"))) - 1)
  }
}

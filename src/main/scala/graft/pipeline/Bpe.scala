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
  * that table. The word pieces are maintained INCREMENTALLY (classic BPE:
  * each learned merge is applied once to the current state, not replayed
  * from scratch), with the initial code-point split coming from the same
  * graft_bpe_encode kernel users run. Per iteration: explode adjacent
  * piece pairs weighted by word frequency, take the global argmax pair,
  * fuse it in place. The driver holds only the merge list (numMerges
  * pairs) and the one-row argmax per iteration.
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

  /** One greedy left-to-right pass fusing every non-overlapping adjacent
    * (l, r) into l+r — the inductive step of BPE training, compiled
    * (functions/BpeEncode BpeMergeStep). An interpreted aggregate()-fold
    * version of this cost ~3x the full kernel replay per iteration at the
    * 5M-doc probe; the compiled pass is what makes incremental training
    * strictly cheaper than re-encoding (SCALING.md round 9). */
  private def applyMerge(pieces: Column, l: String, r: String): Column =
    call_function("graft_bpe_merge_step", pieces, lit(l), lit(r))

  /** Learn `numMerges` merges from the corpus. Stops early when no pair
    * reaches `minPairCount` weighted occurrences.
    *
    * Incremental (classic BPE): the encoded pieces of the distinct-word
    * table are MAINTAINED across iterations — each merge is one
    * single-pair pass over the current pieces, not a from-scratch replay
    * of the growing merge table, so per-iteration cost is constant in the
    * number of merges learned so far. This is semantically identical to
    * re-encoding with the kernel each round: a merge's product symbol
    * cannot be a component of a lower-rank merge (it did not exist when
    * that merge was learned), so applying merge k to the fixpoint of
    * merges 0..k-1 reproduces the greedy lowest-rank encoder's state
    * ([[trainReference]] + BpeSpec pin the equivalence differentially).
    * Every `spillEvery` iterations the state round-trips through parquet,
    * bounding plan depth and executor memory regardless of merge count.
    *
    * Still one Spark job per merge — inherently sequential. A production
    * 32k-entry vocabulary means 32k short jobs; train on a corpus sample
    * (vocabularies converge fast) rather than the full 100 TB corpus. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2L, spillEvery: Int = 16): Seq[(String, String)] = {
    require(numMerges > 0, "numMerges must be positive")
    require(spillEvery > 0, "spillEvery must be positive")
    val spark = docs.sparkSession
    val spillRoot = java.nio.file.Files.createTempDirectory("graft_bpe_train")
    // initial symbols come from the SAME kernel users encode with (empty
    // merge table = code-point split of the lowercased word) — the split
    // discipline can never drift between train and apply
    var state = docs
      .select(explode(Curation.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(call_function("graft_bpe_encode", col("w"), mergesLit(Nil)).as("pieces"), col("n"))
      .cache()
    var cached: Option[DataFrame] = Some(state)
    var lastSpill: Option[java.nio.file.Path] = None
    def deleteTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var done = false
      while (!done && merges.size < numMerges) {
        val best = state
          .select(explode(adjacentPairs(col("pieces"))).as("p"), col("n"))
          .groupBy("p").agg(sum("n").as("cnt"))
          .orderBy(col("cnt").desc, col("p"))
          .limit(1).collect()
        if (best.isEmpty || best(0).getLong(1) < minPairCount) done = true
        else {
          val p = best(0).getSeq[String](0)
          merges += ((p(0), p(1)))
          state = state.select(applyMerge(col("pieces"), p(0), p(1)).as("pieces"), col("n"))
          if (merges.size % spillEvery == 0) {
            val dir = spillRoot.resolve(s"it_${merges.size}")
            state.write.mode("overwrite").parquet(dir.toString)
            cached.foreach(_.unpersist()); cached = None
            lastSpill.foreach(deleteTree); lastSpill = Some(dir)
            state = spark.read.parquet(dir.toString)
          }
        }
      }
      merges.toSeq
    } finally {
      cached.foreach(_.unpersist())
      deleteTree(spillRoot)
    }
  }

  /** The pre-incremental trainer: re-encodes every word from scratch with
    * the full merge table each iteration (O(merges²) total work). Kept as
    * the differential oracle for [[train]] — BpeSpec asserts both learn
    * the identical merge sequence. */
  private[graft] def trainReference(docs: DataFrame, textCol: String, numMerges: Int,
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

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: quality scoring,
  * heuristic language ID, token counting, document fingerprinting. All
  * codegen'd column expressions (no UDFs). */
object TextAnalysis {

  val stopwordsEn = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  val stopwordsEs = Seq("el", "la", "de", "y", "en", "es", "que", "un")
  val stopwordsFr = Seq("le", "la", "de", "et", "en", "est", "que", "un")
  val stopwordsDe = Seq("der", "die", "das", "und", "in", "ist", "zu", "ein")

  def tokens(textCol: Column): Column = split(lower(textCol), " ")

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, w => w.isin(words.map(lit(_)): _*)))

  /** Quality metrics per document: token count, mean token length, distinct
    * token ratio, stopword ratio, alpha-char ratio. */
  def quality(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = tokens(col(textCol))
    docs.select(
      col(idCol),
      size(t).as("n_tokens"),
      (length(col(textCol)).cast("double") / size(t)).as("avg_token_len"),
      (size(array_distinct(t)).cast("double") / size(t)).as("uniq_ratio"),
      (hitCount(t, stopwordsEn).cast("double") / size(t)).as("stopword_ratio"),
      (length(regexp_replace(col(textCol), "[^a-zA-Z]", "")).cast("double")
        / length(col(textCol))).as("alpha_ratio"))
  }

  /** Heuristic language ID by stopword-hit voting (deterministic; 'und' when
    * no list scores > 0 or on ties the winner is the first max in
    * en,es,fr,de order). */
  def langId(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val scores = Seq(
      "en" -> hitCount(t, stopwordsEn), "es" -> hitCount(t, stopwordsEs),
      "fr" -> hitCount(t, stopwordsFr), "de" -> hitCount(t, stopwordsDe))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first-max-wins in en,es,fr,de order
    val ordered = scores.foldRight(lit("und")) { case ((lang, s), els) =>
      when(s === best && best > 0, lit(lang)).otherwise(els)
    }
    docs.select(col(idCol), ordered.as("pred_lang"))
  }

  /** Token statistics per group column. */
  def tokenStats(docs: DataFrame, textCol: String, groupCol: String): DataFrame =
    docs.groupBy(col(groupCol))
      .agg(
        sum(size(tokens(col(textCol)))).cast("long").as("total_tokens"),
        sum(length(col(textCol))).cast("long").as("total_chars"),
        count(lit(1)).as("n_docs"))

  /** Document fingerprint: minimum xxhash64 over word 4-gram shingles
    * (winnowing-style min-sketch; equal fingerprints => likely overlap). */
  def fingerprint(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(
      col(idCol),
      array_min(transform(Dedup.shingles(textCol, 4), s => xxhash64(s))).as("fp"),
      size(Dedup.shingles(textCol, 4)).as("n_shingles"))
}

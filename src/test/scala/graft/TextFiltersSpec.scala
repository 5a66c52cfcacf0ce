package graft

import graft.pipeline.TextAnalysis
import org.apache.spark.sql.functions.{col, md5}

/** Rule-by-rule fixtures for the Gopher quality rules and C4 line filters
  * — the registered queries run them over the synthetic corpus (which has
  * no newlines or punctuation), so realistic multi-line behavior is pinned
  * here. */
class TextFiltersSpec extends SparkTestBase {
  import spark.implicits._

  private def gopher(rows: (Long, String)*) =
    TextAnalysis.gopherQuality(rows.toDF("id", "text"), "text", "id",
        minWords = 5, maxWords = 100)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("gopherQuality: each rule fails on exactly its tailored document") {
    // 10 x 5 words + 9 'and' = 59 words, inside the [5, 100] bounds
    val clean = (1 to 10).map(i => s"the quick brown fox $i").mkString(" and ")
    val m = gopher(
      1L -> clean,
      2L -> "too short of the and", // n_words < 5? exactly 5... word-count rule
      3L -> ("a " * 200).trim, // 200 words > max 100; mean len 1 < 3
      4L -> ("the#and#of#with " * 10 + "sentences... more... and... of... the... dots..."), // symbols
      5L -> (1 to 10).map(i => s"- bullet the item and $i").mkString("\n"), // all bullets
      6L -> (1 to 10).map(i => s"the line and number $i goes on...").mkString("\n"), // all ellipsis lines
      7L -> ((1 to 40).map(_.toString).mkString(" ") + " the of and"), // numeric words -> alpha_frac low
      8L -> "lorem ipsum dolor sit amet consectetur adipiscing elit sed") // no Gopher stopwords

    assert(m(1L).getAs[Boolean]("gopher_pass"))
    assert(!m(3L).getAs[Boolean]("gopher_pass")) // word bound + mean length
    assert(m(3L).getAs[Double]("mean_word_len") == 1.0)
    assert(!m(4L).getAs[Boolean]("gopher_pass"))
    assert(m(4L).getAs[Double]("symbol_word_ratio") > 0.1)
    assert(!m(5L).getAs[Boolean]("gopher_pass"))
    assert(m(5L).getAs[Double]("bullet_line_frac") == 1.0)
    assert(!m(6L).getAs[Boolean]("gopher_pass"))
    assert(m(6L).getAs[Double]("ellipsis_line_frac") == 1.0)
    assert(!m(7L).getAs[Boolean]("gopher_pass"))
    assert(m(7L).getAs[Double]("alpha_word_frac") < 0.8)
    assert(!m(8L).getAs[Boolean]("gopher_pass"))
    assert(m(8L).getAs[Long]("stopword_hits") == 0L)
  }

  test("gopherQuality: empty and single-word docs don't divide by zero") {
    val m = gopher(1L -> "", 2L -> "word")
    assert(!m(1L).getAs[Boolean]("gopher_pass"))
    assert(m(1L).getAs[Long]("n_words") == 0L)
    assert(m(1L).getAs[Double]("mean_word_len") == 0.0)
    assert(!m(2L).getAs[Boolean]("gopher_pass"))
  }

  test("c4Filters: line keeps, short-line and javascript drops, doc drops") {
    val text = Seq(
      "This sentence survives the filter.",
      "No terminal punctuation here",
      "Too. Short.", // two words < 3
      "Uses javascript for the menu.", // boilerplate tell
      "  Another keeper, with whitespace trimmed!  ",
      "Is this kept?").mkString("\n")
    val df = Seq(
      (1L, text),
      (2L, "Contains lorem ipsum placeholder text. And a good line."),
      (3L, "A config { block } appears."),
      (4L, "")).toDF("id", "text")
    val m = TextAnalysis.c4Filters(df, "text", "id")
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(m(1L).getAs[String]("clean_text") ==
      Seq("This sentence survives the filter.",
        "Another keeper, with whitespace trimmed!",
        "Is this kept?").mkString("\n"))
    assert(m(1L).getAs[Long]("n_lines") == 6L)
    assert(m(1L).getAs[Long]("n_kept_lines") == 3L)
    assert(m(1L).getAs[Boolean]("kept"))
    // lorem ipsum: whole doc dropped even though a line qualifies
    assert(!m(2L).getAs[Boolean]("kept"))
    assert(m(2L).getAs[String]("clean_text") == "")
    assert(m(2L).getAs[Long]("n_kept_lines") == 0L)
    // '{' template tell: dropped wholesale
    assert(!m(3L).getAs[Boolean]("kept"))
    // empty doc: no lines, not kept, no crash
    assert(!m(4L).getAs[Boolean]("kept"))
    assert(m(4L).getAs[Long]("n_lines") == 0L)
  }

  test("c4Filters and gopherQuality are map-only plans (no shuffle)") {
    val df = Seq((1L, "the of and with a line.")).toDF("id", "text")
    for (plan <- Seq(
        TextAnalysis.c4Filters(df, "text", "id"),
        TextAnalysis.gopherQuality(df, "text", "id"))) {
      val physical = plan.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"expected a map-only plan, got:\n$physical")
    }
  }

  test("canonicalText: NFC composition, lowercase, whitespace collapse") {
    graft.functions.GridDbScalarFunctions.register(spark)
    val rows = Seq(
      (1L, "e\u0301clair  TIME"),        // decomposed e + combining acute
      (2L, "\u00e9clair time"),          // precomposed, already canonical
      (3L, "A\u030angstro\u0308m\t\n"), // A+ring, o+diaeresis, trailing ws
      (4L, "\u00c5ngstr\u00f6m"),
      (5L, "plain  ascii   text"),
      (6L, "plain\u00a0ascii\u2009text"))  // NBSP + thin space
    val out = rows.toDF("id", "t")
      .select(col("id"), TextAnalysis.canonicalText(col("t")).as("c"))
      .as[(Long, String)].collect().toMap
    // composed == decomposed after canonicalization
    assert(out(1L) == out(2L), s"${out(1L)} vs ${out(2L)}")
    assert(out(3L) == out(4L), s"${out(3L)} vs ${out(4L)}")
    assert(out(1L) == "\u00e9clair time")
    assert(out(3L) == "\u00e5ngstr\u00f6m")
    assert(out(5L) == "plain ascii text")
    // unicode space separators canonicalize like ASCII whitespace
    assert(out(6L) == "plain ascii text")
    // exact dedup by md5(canonicalText) now sees the encoding-variant pair
    val groups = rows.toDF("id", "t")
      .groupBy(md5(TextAnalysis.canonicalText(col("t")).cast("binary")))
      .count().filter(col("count") > 1).count()
    assert(groups == 3L)
  }

  test("graft_nfc returns the input object unchanged on already-normalized text") {
    import org.apache.spark.unsafe.types.UTF8String
    val ascii = UTF8String.fromString("already fine")
    assert(graft.functions.NfcNormalize.nfc(ascii) eq ascii)
    val composed = UTF8String.fromString("\u00e9")
    assert(graft.functions.NfcNormalize.nfc(composed) eq composed)
    val decomposed = UTF8String.fromString("e\u0301")
    assert(graft.functions.NfcNormalize.nfc(decomposed).toString == "\u00e9")
  }
}

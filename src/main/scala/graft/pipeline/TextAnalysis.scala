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

  /** Document fingerprint: minimum hash over word 4-gram shingles
    * (winnowing-style min-sketch; equal fingerprints => likely overlap).
    * Shingles are built once from a projected token column — the inline
    * form re-tokenized per shingle (no CSE in HOF lambdas) and computed
    * the shingle array twice.
    *
    * `hash`: "xxhash64" (default — codegen'd long hash, the production
    * form) or "md5" (hex-string min — engine-portable, so the WHOLE
    * pipeline tokenize -> shingle -> min-sketch is DuckDB-oracle-checkable;
    * the two forms share every stage but the hash call). */
  def fingerprint(docs: DataFrame, textCol: String, idCol: String,
                  hash: String = "xxhash64"): DataFrame = {
    val h: Column => Column = hash match {
      case "xxhash64" => s => xxhash64(s)
      case "md5" => s => md5(s.cast("binary"))
      case other => throw new IllegalArgumentException(
        s"fingerprint hash must be xxhash64 or md5, got $other")
    }
    docs.select(col(idCol), Dedup.tokens(textCol).as("__t"))
      .select(col(idCol), Dedup.shinglesOfTokens(col("__t"), 4).as("__sh"))
      .select(
        col(idCol),
        array_min(transform(col("__sh"), h)).as("fp"),
        size(col("__sh")).as("n_shingles"))
  }

  /** Canonical text form for cross-encoding dedup: Unicode NFC
    * (functions/NfcNormalize — composed vs decomposed accent sequences are
    * byte-different, so md5-exact dedup misses them), lowercase, and
    * whitespace runs collapsed to one space. The whitespace class is an
    * EXPLICIT list covering the Unicode space separators (NBSP and the
    * en/em/thin-space family are pervasive in HTML-derived corpora — the
    * exact byte-different-but-equivalent pairs this op exists to catch)
    * rather than \s, whose meaning differs between Java regex and the
    * oracle's RE2. Map-only, codegen'd end to end; requires
    * GridDbScalarFunctions registered on the session (every
    * registered-query/GraftSession path does this). DuckDB mirror:
    * `trim(regexp_replace(lower(nfc_normalize(t)), '<same class>', ' ', 'g'))`. */
  def canonicalText(textCol: Column): Column =
    trim(regexp_replace(lower(call_function("graft_nfc", textCol)),
      "[ \t\n\r\f\u000B\u0085\u00A0\u1680\u2000-\u200A\u2028\u2029\u202F\u205F\u3000]+", " "))

  /** Non-empty lowercased word tokens. */
  private def cleanTokens(textCol: Column): Column =
    filter(split(lower(textCol), " "), t => length(t) > 0)

  /** Overlapping word n-grams WITH duplicates (repetition counting needs the
    * multiplicities that [[Dedup.shingles]] deliberately drops). */
  private def gramsWithDups(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** (count, gram) of the most frequent element of `grams`, tie-broken to
    * the lexicographically smallest gram. Single-pass run-length scan over
    * the sorted array — a per-row O(G log G) column expression, so the whole
    * metric is map-only (no shuffle) regardless of corpus size. */
  private def topGram(grams: Column): Column = {
    val sorted = array_sort(grams)
    aggregate(sorted,
      struct(lit("").as("prev"), lit(0).as("run"),
        lit(0).as("best"), lit("").as("bestg")),
      (a, x) => {
        val run = when(x === a.getField("prev"), a.getField("run") + 1)
          .otherwise(lit(1))
        // strict >: among equal counts the FIRST (lex-smallest) gram wins
        val better = run > a.getField("best")
        struct(x.as("prev"), run.as("run"),
          when(better, run).otherwise(a.getField("best")).as("best"),
          when(better, x).otherwise(a.getField("bestg")).as("bestg"))
      })
  }

  /** BPE-style pre-tokenizer pattern: alpha runs, digit runs, and
    * non-alnum-non-space runs each count as one piece (the GPT-2 pre-token
    * split shape, without the RE2-incompatible lookaheads). */
  val bpeishRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"

  /** Token counts per document under both tokenization conventions a
    * training pipeline budgets with: whitespace words and BPE-ish pieces
    * ([[bpeishRe]]), plus chars-per-piece. Map-only column expressions. */
  def tokenCounts(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    val ws = size(filter(split(t, "\\s+"), x => length(x) > 0))
    val bp = regexp_count(t, lit(bpeishRe))
    docs.select(
      col(idCol),
      ws.as("n_ws_tokens"),
      bp.as("n_bpeish_tokens"),
      when(bp > 0, length(t).cast("double") / bp).otherwise(lit(0.0))
        .as("chars_per_piece"))
  }

  /** Corpus-level heavy hitters: every token whose frequency is at least
    * `minFrac` of all tokens, with its EXACT count — via the two-pass
    * sketch-then-verify pattern.
    *
    * Pass 1 aggregates a Misra-Gries summary (fixed `m` counters per
    * partial buffer — functions/MisraGries.scala) plus the total token
    * count in ONE aggregate; pass 2 exact-counts ONLY the <=m candidate
    * terms (broadcast semi-filter before the groupBy). The MG guarantee
    * makes pass 1's candidates a superset of every token with frequency
    * > N/(m+1), so with m >= 1/minFrac the result equals the exact
    * HAVING-count query while the full-cardinality shuffle never happens:
    * pass 1 shuffles m-entry buffers, pass 2 shuffles only candidate-term
    * rows. (MG counts vary with merge order; the exact re-count is what
    * makes the operator deterministic and oracle-checkable.)
    *
    * Output: (token, cnt, n_total) for qualifying tokens. */
  def heavyHitters(docs: DataFrame, textCol: String,
                   minFrac: Double = 0.01, m: Int = 256): DataFrame = {
    require(minFrac > 0 && minFrac <= 1, "minFrac in (0, 1]")
    require(m >= math.ceil(1.0 / minFrac).toInt,
      s"m=$m too small for minFrac=$minFrac: need m >= ${math.ceil(1.0 / minFrac).toInt} for the MG superset guarantee")
    val toks = docs.select(
      explode(Curation.tokens(col(textCol))).as("token"))
    val summary = toks.agg(
      expr(s"graft_misra_gries(token, $m)").as("__hh"),
      count(lit(1)).as("n_total"))
    val cands = summary.select(explode(col("__hh")).as("__c"), col("n_total"))
      .select(col("__c.term").as("token"), col("n_total"))
    toks.join(broadcast(cands), "token")
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"), first(col("n_total")).as("n_total"))
      .filter(col("cnt") >= ceil(lit(minFrac) * col("n_total")))
  }

  /** PII patterns shared by the masker and its oracle — RE2-compatible (no
    * backrefs/lookaround) so Java and DuckDB agree on every match. */
  val piiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiIpv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val piiPhoneRe = "\\+[0-9]{7,15}"

  /** PII redaction for training-data curation: masks emails, IPv4 addresses
    * and international phone numbers with typed placeholder tokens and
    * reports per-document match counts. Pure regexp column expressions —
    * map-only at any corpus size. Masking order (email, ip, phone) is fixed
    * so overlapping matches resolve identically everywhere. */
  def maskPii(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, piiEmailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, piiIpv4Re, "<IP>")
    val t3 = regexp_replace(t2, piiPhoneRe, "<PHONE>")
    docs.select(
      col(idCol),
      t3.as("masked"),
      regexp_count(t0, lit(piiEmailRe)).as("n_emails"),
      regexp_count(t1, lit(piiIpv4Re)).as("n_ips"),
      regexp_count(t2, lit(piiPhoneRe)).as("n_phones"))
  }

  /** Gopher-style repetition metrics per document (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", Table A1 repetition filters). All pure
    * column expressions — the scan is map-only at any corpus size.
    *
    *  - dup_word_frac:       (tokens - distinct tokens) / tokens
    *  - dup_5gram_frac:      (5-grams - distinct 5-grams) / 5-grams
    *  - top_2gram_char_frac: chars covered by occurrences of the most
    *                         frequent word 2-gram / chars of the normalized
    *                         (single-space-joined) token stream
    *  - dup_line_frac:       (lines - distinct lines) / lines
    *  - dup_line_char_frac:  chars in repeated line occurrences / line chars
    *    (lines = trimmed non-empty `lineSep`-separated segments)
    */
  def repetitionMetrics(docs: DataFrame, textCol: String, idCol: String,
                        lineSep: String = "\n"): DataFrame = {
    // stage the token/gram/line arrays through projections: every one is
    // consumed several times (and the grams reference the tokens inside a
    // HOF lambda, where Catalyst does no CSE) — the inline form re-ran the
    // tokenizer once per gram and the gram transform once per metric
    val staged = docs
      .select(col(idCol), col(textCol), cleanTokens(col(textCol)).as("__t"))
      .select(col(idCol), col(textCol), col("__t"),
        gramsWithDups(col("__t"), 5).as("__g5"),
        gramsWithDups(col("__t"), 2).as("__g2"),
        filter(transform(split(col(textCol), lineSep), l => trim(l)),
          l => length(l) > 0).as("__lines"))
    val toks = col("__t")
    val nTok = size(toks)
    val g5 = col("__g5")
    val top2 = topGram(col("__g2"))
    val normChars = length(concat_ws(" ", toks))
    val lines = col("__lines")
    val charSum = (c: Column) => coalesce(
      aggregate(c, lit(0L), (acc, x) => acc + length(x)), lit(0L))
    def frac(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den).otherwise(lit(0.0))
    staged.select(
      col(idCol),
      frac(nTok - size(array_distinct(toks)), nTok).as("dup_word_frac"),
      frac(size(g5) - size(array_distinct(g5)), size(g5)).as("dup_5gram_frac"),
      frac(top2.getField("best") * length(top2.getField("bestg")), normChars)
        .as("top_2gram_char_frac"),
      frac(size(lines) - size(array_distinct(lines)), size(lines))
        .as("dup_line_frac"),
      frac(charSum(lines) - charSum(array_distinct(lines)), charSum(lines))
        .as("dup_line_char_frac"))
  }

  /** The Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", Table A1) as one
    * per-document metric + verdict row. Pure codegen'd column expressions —
    * a map-only stage, no shuffle, token-linear at any corpus size.
    *
    * Metrics and the rule each feeds:
    *  - n_words ∈ [minWords, maxWords]
    *  - mean_word_len ∈ [3, 10]
    *  - symbol_word_ratio ('#' or '...' occurrences / words) <= 0.1
    *  - bullet_line_frac (lines starting with a bullet, dash, or star) <= 0.9
    *  - ellipsis_line_frac (lines ending '...') <= 0.3
    *  - alpha_word_frac (words with >= 1 alphabetic char) >= 0.8
    *  - stopword_hits (of the paper's 8-word list) >= 2
    * `gopher_pass` is the conjunction. Thresholds are the paper's; word
    * bounds are parameters because the synthetic corpus is shorter than
    * web pages. */
  def gopherQuality(docs: DataFrame, textCol: String, idCol: String,
                    minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val stopwords = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    def occurrences(hay: Column, needle: String): Column =
      ((length(hay) - length(regexp_replace(hay, java.util.regex.Pattern.quote(needle), ""))) / needle.length).cast("long")
    val staged = docs.select(
      col(idCol), col(textCol),
      filter(split(col(textCol), "\\s+"), w => length(w) > 0).as("__w"),
      filter(transform(split(col(textCol), "\n"), l => trim(l)),
        l => length(l) > 0).as("__l"))
    val w = col("__w"); val l = col("__l")
    val nWords = size(w)
    val nLines = size(l)
    def frac(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den).otherwise(lit(0.0))
    val meanLen = frac(aggregate(w, lit(0L), (acc, x) => acc + length(x)), nWords)
    val symRatio = frac(occurrences(col(textCol), "#") + occurrences(col(textCol), "..."), nWords)
    val bulletFrac = frac(size(filter(l, x =>
      x.startsWith("•") || x.startsWith("-") || x.startsWith("*"))), nLines)
    val ellipsisFrac = frac(size(filter(l, x => x.endsWith("..."))), nLines)
    val alphaFrac = frac(size(filter(w, x => x.rlike("[a-zA-Z]"))), nWords)
    val stopHits = size(filter(w, x => lower(x).isin(stopwords.map(lit(_)): _*)))
    staged.select(
      col(idCol),
      nWords.cast("long").as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(symRatio, 4).as("symbol_word_ratio"),
      round(bulletFrac, 4).as("bullet_line_frac"),
      round(ellipsisFrac, 4).as("ellipsis_line_frac"),
      round(alphaFrac, 4).as("alpha_word_frac"),
      stopHits.cast("long").as("stopword_hits"),
      (nWords.between(minWords, maxWords) &&
        meanLen.between(3.0, 10.0) &&
        symRatio <= 0.1 &&
        bulletFrac <= 0.9 &&
        ellipsisFrac <= 0.3 &&
        alphaFrac >= 0.8 &&
        stopHits >= 2).as("gopher_pass"))
  }

  /** C4-style line/document cleaning (Raffel et al. 2020, "Exploring the
    * Limits of Transfer Learning with a Unified Text-to-Text Transformer",
    * §2.2) as a map-only stage. Line rules: keep trimmed lines that end in
    * terminal punctuation (. ! ? ' "), carry >= minLineWords words, and do
    * not mention javascript (the boilerplate tell). Document rules: a page
    * containing 'lorem ipsum' or '{' is dropped wholesale (kept = false,
    * clean_text = '').
    * Output: (id, clean_text, n_lines, n_kept_lines, kept). */
  def c4Filters(docs: DataFrame, textCol: String, idCol: String,
                minLineWords: Int = 3): DataFrame = {
    val staged = docs.select(
      col(idCol), col(textCol),
      filter(transform(split(col(textCol), "\n"), l => trim(l)),
        l => length(l) > 0).as("__l"))
    val l = col("__l")
    val keptLines = filter(l, x =>
      (x.endsWith(".") || x.endsWith("!") || x.endsWith("?") ||
        x.endsWith("\"") || x.endsWith("'")) &&
      size(filter(split(x, "\\s+"), t => length(t) > 0)) >= minLineWords &&
      !lower(x).contains("javascript"))
    val docDrop = lower(col(textCol)).contains("lorem ipsum") ||
      col(textCol).contains("{")
    staged.select(
      col(idCol),
      when(docDrop, lit("")).otherwise(array_join(keptLines, "\n")).as("clean_text"),
      size(l).cast("long").as("n_lines"),
      when(docDrop, lit(0L)).otherwise(size(keptLines).cast("long")).as("n_kept_lines"),
      (!docDrop && size(keptLines) > 0).as("kept"))
  }
}

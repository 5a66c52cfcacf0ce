package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.GraftSession

/** Deterministic scale-rehearsal data generator: writes the full TESTDATA
  * star schema (same table names, columns, and statistical character as the
  * driver-generated `/root/testdata/sf*` dirs — measured from sf0.1) at an
  * arbitrary scale factor, entirely as Spark expressions over
  * `spark.range` — no driver-side loops, no RNG state: every value derives
  * from xxhash64 of the row id, so the corpus is reproducible across runs
  * and cluster sizes and the generator itself scales like any other Spark
  * job (this is how one would materialize a 100 TB rehearsal corpus too).
  *
  * Usage: runMain graft.tools.ScaleGen <outDir> [sf] [vocab]
  *   sf = 1.0 (default) means 10x the sf0.1 corpus: 6M lineitem, 1M events
  *   (15k users), 50k documents, 20k embeddings. region/nation are the
  *   fixed-size dimensions and are copied from sf0.1.
  *   vocab = uniform30 (default; the driver corpus's 30-word vocabulary) or
  *   zipf: a ~50k-term Zipf(s=1) vocabulary (rank drawn by inverse CDF,
  *   P(r) ∝ 1/r, as pure expressions) with the same exact-copy injection
  *   plus a 5%-token-mutation near-dup band. The 30-word corpus makes
  *   token-Jaccard OUTPUT-quadratic (~24% of all pairs are true dups —
  *   SCALING.md finding 3), so it can never exercise the PPJoin prefix
  *   filter; the Zipf corpus has realistic rare-token prefixes and sparse
  *   pair density, which is what a 100 TB text corpus looks like.
  *
  * NOT driver test data: the driver's sf dirs are read-only inputs for
  * correctness; this corpus exists to measure how the bench plans scale
  * (SCALING.md). Values differ from the driver's generator — plans and
  * selectivities are what must match, and the filter constants used by the
  * bench queries (dates 1996-2000, mktsegment BUILDING, value > 150) hit
  * the same selectivity bands here.
  */
object ScaleGen {

  // uniform [0, 1) from the hash of (seed tag, id columns)
  private def u(tag: String, cols: Column*): Column =
    pmod(xxhash64((lit(tag) +: cols): _*), lit(1000000000L)).cast("double") / 1e9

  // integer in [0, n) from the hash
  private def h(tag: String, n: Int, cols: Column*): Column =
    pmod(xxhash64((lit(tag) +: cols): _*), lit(n.toLong))

  private def pick(tag: String, values: Seq[String], cols: Column*): Column =
    element_at(array(values.map(lit): _*), (h(tag, values.size, cols: _*) + 1).cast("int"))

  // standard normal via Box-Muller on two hash uniforms
  private def gauss(tag: String, cols: Column*): Column =
    sqrt(lit(-2.0) * log(u(tag + "~1", cols: _*) + lit(1e-12))) *
      cos(lit(2.0 * math.Pi) * u(tag + "~2", cols: _*))

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/scaledata/sf1")
    val sf = if (args.length > 1) args(1).toDouble else 1.0
    // zipflong (r16, r15 verdict #4): the zipf vocabulary with LONG
    // documents — 20-400 tokens (~1.2 KB avg text, mixed lengths) instead
    // of 10-100 (~330 B). The persisted digest/band indexes exist for the
    // regime where corpus TEXT dwarfs the stored sketch bytes; the short
    // corpus (SCALING.md:1156, r15) could not measure that regime.
    val vocabMode = if (args.length > 2) args(2) else "uniform30"
    require(Seq("uniform30", "zipf", "zipflong").contains(vocabMode),
      s"vocab must be uniform30|zipf|zipflong, got $vocabMode")
    // "docs" generates only documents+embeddings: the text/vector probes at
    // sf100 don't need a 600M-row lineitem to exist first
    val tablesMode = if (args.length > 3) args(3) else "all"
    require(Seq("all", "docs").contains(tablesMode),
      s"tables must be all|docs, got $tablesMode")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("graft-scalegen"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rows(atSf1: Long): Long = math.max(1L, (atSf1 * sf).toLong)
    val nCust = rows(150000)
    val nSupp = rows(10000)
    val nPart = rows(200000)
    val nOrd = rows(1500000)
    val nEvents = rows(1000000)
    val nUsers = rows(15000)
    val nDocs = rows(50000)
    val nVecs = rows(20000)

    def write(df: DataFrame, name: String, parts: Int): Unit = {
      df.repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] wrote $name")
    }

    // fixed-size dimensions: copy the driver's
    if (tablesMode == "all") {
    for (t <- Seq("region", "nation"))
      write(spark.read.parquet(s"/root/testdata/sf0.1/$t.parquet"), t, 1)

    val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    write(spark.range(nCust).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      h("cn", 25, col("id")).cast("int").as("c_nationkey"),
      round(u("cb", col("id")) * 10000, 2).as("c_acctbal"),
      pick("cs", segments, col("id")).as("c_mktsegment")), "customer", 4)

    write(spark.range(nSupp).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      h("sn", 25, col("id")).cast("int").as("s_nationkey"),
      round(u("sb", col("id")) * 10000, 2).as("s_acctbal")), "supplier", 2)

    val adjs = Seq("large", "hot", "small", "cold", "bright", "dark", "smooth", "rough")
    val nouns = Seq("ring", "bolt", "gear", "cog", "pin", "rod", "cap", "nut")
    val types = Seq("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")
    write(spark.range(nPart).select(
      col("id").as("p_partkey"),
      concat_ws(" ", pick("pa", adjs, col("id")), pick("pn", nouns, col("id"))).as("p_name"),
      concat(lit("Brand#"), h("pb", 25, col("id"))).as("p_brand"),
      pick("pt", types, col("id")).as("p_type"),
      (h("ps", 50, col("id")) + 1).cast("int").as("p_size"),
      round(lit(900.0) + pmod(col("id"), lit(2000L)).cast("double") / 10, 2)
        .as("p_retailprice")), "part", 2)

    val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val orders = spark.range(nOrd).select(
      col("id").as("o_orderkey"),
      h("oc", nCust.toInt, col("id")).as("o_custkey"),
      // F/O common, P rare — the TPC-H shape
      when(h("os", 20, col("id")) < 9, "F").when(h("os", 20, col("id")) < 18, "O")
        .otherwise("P").as("o_orderstatus"),
      round(u("ot", col("id")) * 450000 + 1000, 2).as("o_totalprice"),
      date_add(lit(java.sql.Date.valueOf("1995-01-01")),
        (u("od", col("id")) * 2800).cast("int")).cast("timestamp")
        .as("o_orderdate"),
      pick("op", priorities, col("id")).as("o_orderpriority"))
    write(orders, "orders", 8)

    // lineitem: 1-7 lines per order (avg 4) -> ~4x orders rows
    val flags = Seq("R", "A", "N")
    val line = spark.range(nOrd)
      .select(col("id").as("o"), explode(sequence(lit(1),
        (h("ln", 7, col("id")) + 1).cast("int"))).as("l_linenumber"))
    write(line.select(
      col("o").as("l_orderkey"),
      h("lp", nPart.toInt, col("o"), col("l_linenumber")).as("l_partkey"),
      h("ls", nSupp.toInt, col("o"), col("l_linenumber")).as("l_suppkey"),
      col("l_linenumber"),
      (h("lq", 50, col("o"), col("l_linenumber")) + 1).cast("double").as("l_quantity"),
      round(u("le", col("o"), col("l_linenumber")) * 100000 + 900, 2).as("l_extendedprice"),
      (h("ld", 11, col("o"), col("l_linenumber")).cast("double") / 100).as("l_discount"),
      (h("lt", 9, col("o"), col("l_linenumber")).cast("double") / 100).as("l_tax"),
      pick("lr", flags, col("o"), col("l_linenumber")).as("l_returnflag"),
      pick("ll", Seq("O", "F"), col("o"), col("l_linenumber")).as("l_linestatus"),
      date_add(lit(java.sql.Date.valueOf("1995-01-01")),
        (u("lsd", col("o"), col("l_linenumber")) * 2900).cast("int")).cast("timestamp")
        .as("l_shipdate")), "lineitem", 16)

    // events: 30-day window, monotone ts with hash jitter (~26 s mean gap at
    // sf0.1 scale), uniform event types, exp-ish value (mean ~50, max ~560)
    val spanUs = 30L * 24 * 3600 * 1000000
    val types5 = Seq("view", "click", "purchase", "signup", "error")
    write(spark.range(nEvents).select(
      col("id").as("event_id"),
      timestamp_micros(lit(1704067200000000L) + // 2024-01-01 00:00:00 UTC
        ((col("id").cast("double") + u("ej", col("id"))) * (spanUs.toDouble / nEvents))
          .cast("long")).as("ts"),
      h("eu", nUsers.toInt, col("id")).as("user_id"),
      pick("et", types5, col("id")).as("event_type"),
      round(lit(-50.0) * log(lit(1.0) - u("ev", col("id"))), 2).as("value"),
      concat(lit("{\"k\": "), h("ep", 100, col("id")), lit("}")).as("props")),
      "events", 8)
    } // tablesMode == "all"

    // documents: 30-word uniform vocab + rare 'dup' token, 10-100 tokens,
    // ~0.5% of docs are exact copies of one of the first 100 (dedup fodder)
    val vocab = Seq("spark", "window", "merge", "table", "column", "vector",
      "stream", "value", "data", "small", "join", "filter", "big", "group",
      "hash", "customer", "sort", "order", "slow", "line", "part", "fast",
      "row", "the", "agg", "key", "query", "a", "scan", "batch")
    val srcId = when(h("dd", 200, col("id")) === 0 && col("id") >= 100,
      h("dpick", 100, col("id"))).otherwise(col("id"))
    val uniformDraw = (i: Column) =>
      when(pmod(xxhash64(lit("dw"), srcId, i), lit(1000L)) === 0, lit("dup"))
        .otherwise(element_at(array(vocab.map(lit): _*),
          (pmod(xxhash64(lit("dv"), srcId, i), lit(vocab.size.toLong)) + 1).cast("int")))
    // Zipf(s=1) rank over V terms by inverse CDF: rank = floor((V+1)^u)
    // gives P(r) ∝ ln((r+1)/r) ≈ 1/r — head terms ("w1", "w2") are stopword-
    // common, the tail is rare enough for PPJoin prefixes to prune on
    // Heaps' law: vocabulary grows with the corpus (V ≈ K·N^β, β≈0.5 for
    // web text). A FIXED V under a growing corpus saturates — every
    // token's document frequency rises ∝ N, so prefix-token collisions
    // grow ∝ N² regardless of how rare the prefix tokens are: a property
    // of the synthetic corpus, not of the operator. V ∝ N (β=1) keeps the
    // df distribution stationary — the optimistic end. Real text sits
    // between the two; SCALING.md records BOTH curves (fixed-V subsets =
    // pessimistic bracket, cross-sf stationary corpora = optimistic) so
    // the bracket, not one synthetic point, is the scale claim.
    val zipfV = math.max(5000.0, nDocs.toDouble)
    val zipfTerm = (tag: String, id: Column, i: Column) =>
      concat(lit("w"), floor(pow(lit(zipfV + 1), u(tag, id, i))).cast("long"))
    // near-dup band: copied docs redraw ~5% of tokens with their OWN id
    // salt, so Jaccard lands in the 0.8-0.95 band instead of exactly 1
    val zipfDraw = (i: Column) =>
      when(srcId =!= col("id") && u("dmu", col("id"), i) < 0.05,
        zipfTerm("dzm", col("id"), i))
        .otherwise(zipfTerm("dzv", srcId, i))
    val nTokens =
      if (vocabMode == "zipflong") h("dn", 381, srcId) + 20 // 20-400, ~1.2 KB avg
      else h("dn", 91, srcId) + 10 // 10-100
    val words = transform(sequence(lit(1), nTokens.cast("int")),
      if (vocabMode == "uniform30") uniformDraw else zipfDraw)
    val text = concat_ws(" ", words)
    write(spark.range(nDocs).select(
      col("id").as("doc_id"),
      text.as("text"),
      // en ~41%, the rest ~15% each — the sf0.1 language mix
      when(u("dl", col("id")) < 0.41, "en").when(u("dl", col("id")) < 0.56, "zh")
        .when(u("dl", col("id")) < 0.71, "es").when(u("dl", col("id")) < 0.86, "fr")
        .otherwise("de").as("lang"),
      concat(lit("src"), h("ds", 20, col("id"))).as("source"),
      length(text).cast("long").as("n_chars")), "documents", 4)

    // embeddings: unit-normalized 64-dim, 10 labels with a WEAK cluster
    // signal — the sf0.1 geometry has normalized per-label mean norms of
    // ~0.065 (i.e. within-cluster cosine ~0.004, near-orthogonal): per-dim
    // center scale 0.008 vs noise std 0.125 reproduces that
    val label = h("el", 10, col("id"))
    val raw = transform(sequence(lit(0), lit(63)),
      j => gauss("ec", label, j) * lit(0.008) + gauss("en", col("id"), j) * lit(0.125))
    val nrm = sqrt(aggregate(raw, lit(0.0), (acc, x) => acc + x * x))
    write(spark.range(nVecs).select(
      col("id").as("vec_id"),
      transform(raw, x => (x / nrm).cast("float")).as("embedding"),
      label.cast("int").as("label")), "embeddings", 2)

    spark.stop()
    println(s"[scalegen] done: $out at sf=$sf")
  }
}

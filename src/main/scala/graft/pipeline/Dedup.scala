package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.engine.Parallelism.spread

/** Large-scale text deduplication operators for training-data pipelines.
  *
  * All operators are pure DataFrame transforms built from codegen'd
  * `functions._` higher-order functions — no Scala UDFs — so they stay
  * inside whole-stage codegen and scale to 100 TB via ordinary shuffles:
  *   - exact:    hash-groupBy on a content digest (1 shuffle)
  *   - minhash:  shingle → k minhashes → banded LSH bucket join (candidate
  *               generation is a self-equi-join on (band, bucket-hash), so
  *               only near-duplicates ever meet in a reducer)
  *   - simhash:  64-bit sign-of-projection sketch + banded hamming join
  *   - ngramJaccard: exact n-gram Jaccard verification for candidate pairs
  */
object Dedup {

  /** Connected components over an undirected edge list, by the alternating
    * large-star / small-star algorithm (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14). Each round is two
    * ordinary shuffles (a groupBy-min and a join back), the edge set shrinks
    * toward a star per component, and convergence takes O(log^2 n) rounds —
    * no driver-side graph, no collect, so the component computation scales
    * with the cluster like any other aggregation. `localCheckpoint` after
    * each round truncates the iterative lineage (without it the plan doubles
    * per round and the optimizer, not the data, becomes the bottleneck).
    *
    * Input: any (aCol, bCol) pair list (both directions implied; self-loops
    * and duplicates tolerated). Output: (id, cluster) for every node that
    * appears in an edge, where cluster = MIN node id of its component.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25): DataFrame = {
    def checksum(e: DataFrame): (Long, BigDecimal) = {
      // decimal accumulator: a Long sum of xxhash64 values overflows under
      // ANSI arithmetic after a handful of rows
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head()
      (r.getLong(0), if (r.isNullAt(1)) BigDecimal(0) else BigDecimal(r.getDecimal(1)))
    }
    // large-star: every node sends its strictly-larger neighbors to the
    // minimum of its closed neighborhood (min(u, neighbors))
    def largeStar(e: DataFrame): DataFrame = {
      val bidir = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = bidir.groupBy("u").agg(least(col("u"), min(col("v"))).as("m"))
      // v > u >= m, so no self-loops can come out of this step
      bidir.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")).distinct()
    }
    // small-star: every node sends its smaller-or-equal neighbors (and
    // itself) to the minimum of those neighbors
    def smallStar(e: DataFrame): DataFrame = {
      val canon = e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .where(col("u") =!= col("v")).distinct()
      val mins = canon.groupBy("u").agg(min(col("v")).as("m"))
      canon.join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v")).distinct()
    }
    var edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .where(col(aCol).isNotNull && col(bCol).isNotNull && col(aCol) =!= col(bCol))
      .distinct().localCheckpoint(true)
    var prev = checksum(edges)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val cur = checksum(next)
      converged = cur == prev
      prev = cur
      edges = next
      iter += 1
    }
    // at convergence the edge set is a star per component rooted at its min:
    // (child, root) — add (root, root) so every member gets an assignment
    edges.select(col("u").as("id"), col("v").as("cluster"))
      .union(edges.select(col("v").as("id"), col("v").as("cluster")))
      .distinct()
  }

  /** Duplicate-cluster assignment for a corpus: every document labeled with
    * the MIN doc id of its duplicate component (its own id when it has no
    * duplicate edge). `pairs` is any near/exact-dup pair list — compose with
    * [[tokenJaccardPairs]], [[minhashCandidates]], [[simhashPairs]] or
    * [[exactGroups]] output. Keepers are the rows with id == cluster. */
  def clusterAssign(docs: DataFrame, idCol: String,
                    pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol)
    docs.select(col(idCol).as("id"))
      .join(cc, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
  }

  /** Exact duplicate groups by content digest (md5). */
  def exactGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keeper"))
      .filter(col("n") > 1)

  /** Exact-duplicate REMOVAL: keep the smallest id of each distinct text —
    * the keep-first companion of [[exactGroups]] (which reports only the
    * n>1 groups and so cannot express "keep one of each"; composing a
    * pipeline on its keepers empties a duplicate-free corpus — caught by
    * the q_fuzz6 chain differential). Returns the surviving rows with
    * their original schema.
    *
    * ONE scan + ONE digest shuffle since r18 (guide §2.3/§2.4): the former
    * keeper-join form scanned the corpus twice (agg leg + join leg) and
    * shuffled the full payload a second time by id; min_by carries the
    * whole min-id row through the same digest aggregate, and as a
    * DeclarativeAggregate it partial-aggregates map-side — a giant
    * duplicate group (boilerplate text at crawl scale) combines inside
    * each task instead of skewing a window or a join. Row set is
    * identical: the min-id row of every digest group (a group whose ids
    * are all NULL contributed nothing before — the keeper join never
    * matched NULL — and is filtered the same here). */
  def exactDedup(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val cols = docs.columns.toSeq
    docs.groupBy(md5(col(textCol)).as("__h"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("__keep"))
      .filter(col("__keep").isNotNull && col(s"__keep.$idCol").isNotNull)
      .select(cols.map(c => col("__keep").getField(c).as(c)): _*)
  }

  /** Word tokens, lowercased. */
  def tokens(textCol: String): Column = split(lower(col(textCol)), " ")

  /** Word n-gram shingles over a PRE-SPLIT token array (falls back to the
    * whole text when there are fewer than n tokens). Project the tokens to
    * a column first: Catalyst does no CSE inside HOF lambdas, so a raw
    * `tokens(text)` argument re-splits the text once per shingle (see
    * Curation.wordNgramsOfTokens). */
  def shinglesOfTokens(t: Column, n: Int): Column =
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n))))))
      .otherwise(array(concat_ws(" ", t)))

  /** Word n-gram shingles of `text` — convenience form; prefer projecting
    * [[tokens]] then [[shinglesOfTokens]] inside operators. */
  def shingles(textCol: String, n: Int): Column =
    shinglesOfTokens(tokens(textCol), n)

  /** k-minhash signatures per document, computed whole-signature-per-row by
    * the codegen'd `graft_minhash_sig` kernel (functions/TextSketch.scala) —
    * no shingle explode, no shuffle: the signature job is a pure map over
    * input splits, which is what survives at 100 TB. Hash values are
    * bit-identical to the earlier explode + k `min(xxhash64(h, s))`
    * formulation (DedupSpec asserts the parity).
    * Output: (id, sig: array<long>[k]). */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String,
                        shingleN: Int, k: Int): DataFrame = {
    graft.functions.GridDbScalarFunctions.register(docs.sparkSession)
    // coalesce makes the kernel input (hence `sig`) non-nullable, so join
    // constraint inference can't push an isnotnull(<kernel>) into the scan
    // filter — which would evaluate the whole sketch twice per row
    spread(docs).where(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        call_function("graft_minhash_sig",
          coalesce(lower(col(textCol)), lit("")), lit(shingleN), lit(k)).as("sig"))
  }

  /** MinHash-LSH near-duplicate candidate pairs with estimated Jaccard.
    *
    * @param k     signature length (minhashes)
    * @param bands LSH bands (rows per band = k / bands); a pair collides in
    *              some band with prob 1-(1-j^r)^b for true Jaccard j.
    * @param minEstSim keep pairs whose signature-agreement >= this
    * Output: (a, b, est_jaccard), a < b. */
  def minhashCandidates(docs: DataFrame, textCol: String, idCol: String,
                        shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                        minEstSim: Double = 0.5, corpusSize: Long = -1L): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    // the banded exchange feeds a shuffle_hash build map of
    // bands x N / partitions rows — at the session default 32 that map
    // OOMs an 8g heap near 5M docs (r10 stock-config rehearsal). Width
    // follows the exploded volume; zero-job via the optimizer's scan-byte
    // estimate (an exact count job cost ~0.2 s per benched call — r10
    // BenchCompare flagged it), or the exact row count when the caller
    // already has one.
    val nPart =
      if (corpusSize > 0)
        verifyPartitions(bands.toLong * corpusSize,
          docs.sparkSession.sessionState.conf.numShufflePartitions, 125000L)
      else widthFromBytes(docs, bands)
    // signatures are a pure per-row map now (no shuffle, no explode), so the
    // self-join can recompute them on each side — no persist to leak, and at
    // 100 TB no cache pressure; the only shuffle left is the (band, bucket)
    // candidate join itself
    val sig = minhashSignatures(docs, textCol, idCol, shingleN, k)
    minhashCandidatesOfSig(sig, k, bands, minEstSim, nPart)
  }

  /** The banded self-join over a caller-provided (id, sig) frame — the
    * hash-agnostic seam ([[simhashPairsOf]] discipline): everything
    * downstream of the signature (banding, shared-Exchange self-join,
    * agreement scoring, canonicalization) runs here, so the md5-variant
    * full-value oracles (q_dedup_minhash_md5_oracle) drive the SAME code
    * with signatures DuckDB can replay, leaving only the xxhash64 kernel
    * itself spec-covered. `nPart <= 0` uses the session default width. */
  def minhashCandidatesOfSig(sig: DataFrame, k: Int, bands: Int,
                             minEstSim: Double = 0.5,
                             nPart: Int = -1): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val width =
      if (nPart > 0) nPart
      else sig.sparkSession.sessionState.conf.numShufflePartitions
    // repartition on the join keys BELOW the leg renames: both legs then
    // share one canonically-equal Exchange subtree, so Spark plans a single
    // shuffle (ReusedExchange) and the sketch kernel runs ONCE per row, not
    // once per join side — at 100 TB that halves the corpus sketching work.
    // The shuffle_hash hint pins that invariant: without it the planner may
    // stack a BroadcastExchange on one leg (size permitting), which keeps
    // BOTH sketch subtrees live and silently doubles the sketching cost
    // (DedupSpec asserts the executed plan reuses a single exchange)
    val banded = bandedExchange(bandRows(sig, k, bands),
      width, col("band"), col("bucket"))
    val l = banded.select(col("band"), col("bucket"),
      col("id").as("a"), col("sig").as("sig_a")).hint("shuffle_hash")
    val rgt = banded.select(col("band"), col("bucket"),
      col("id").as("b"), col("sig").as("sig_b")).hint("shuffle_hash")
    // static-k agreement count: k comparisons summed inline stay in
    // whole-stage codegen (zip_with/filter HOFs are interpreted per pair)
    val agree = (0 until k)
      .map(i => (col("sig_a").getItem(i) === col("sig_b").getItem(i)).cast("int"))
      .reduce(_ + _)
    l.join(rgt, Seq("band", "bucket")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), (agree.cast("double") / k).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= minEstSim)
  }

  /** The banded CROSS join over caller-provided (id, sig) frames — the
    * hash-agnostic seam of [[crossMinhashCandidates]], same discipline as
    * [[minhashCandidatesOfSig]]. Both frames MUST carry signatures from
    * the same scheme. `nPart <= 0` uses the session default width. */
  def crossMinhashCandidatesOfSig(batchSig: DataFrame, corpusSig: DataFrame,
                                  k: Int, bands: Int,
                                  minEstSim: Double = 0.5,
                                  nPart: Int = -1): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val width =
      if (nPart > 0) nPart
      else batchSig.sparkSession.sessionState.conf.numShufflePartitions
    crossBandJoin(bandRows(batchSig, k, bands), bandRows(corpusSig, k, bands),
      k, width, minEstSim)
  }

  /** Exploded (id, sig, band, bucket) LSH rows of an (id, sig) signature
    * frame — the banded form every minhash join variant meets on: the
    * self-join ([[minhashCandidates]]), the batch-vs-corpus cross join
    * ([[crossMinhashCandidates]]), and the persisted index's stored side
    * ([[MinhashIndex]]). One bucket hash per band over that band's `r =
    * k/bands` signature members. */
  private[pipeline] def bandRows(sig: DataFrame, k: Int, bands: Int): DataFrame = {
    val r = k / bands
    val bandCols = (0 until bands).map { b =>
      xxhash64(concat_ws(",",
        (0 until r).map(i => col("sig").getItem(b * r + i).cast("string")): _*))
    }
    sig.select(col("id"), col("sig"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
  }

  /** The (band, bucket) equi-join + signature-agreement scoring shared by
    * [[crossMinhashCandidates]] (both sides sketched in-query) and
    * [[MinhashIndex.probe]] (corpus side read from the persisted index).
    * Unlike the self-join there is no `a < b` canonicalization: `a` is a
    * batch id, `b` a corpus id — different tables, both orientations
    * meaningful. Output: (a, b, est_jaccard). */
  private[pipeline] def crossBandJoin(batchRows: DataFrame, corpusRows: DataFrame,
                                      k: Int, nPart: Int,
                                      minEstSim: Double): DataFrame = {
    val l = bandedExchange(batchRows, nPart, col("band"), col("bucket"))
      .select(col("band"), col("bucket"),
        col("id").as("a"), col("sig").as("sig_a")).hint("shuffle_hash")
    val rgt = bandedExchange(corpusRows, nPart, col("band"), col("bucket"))
      .select(col("band"), col("bucket"),
        col("id").as("b"), col("sig").as("sig_b")).hint("shuffle_hash")
    val agree = (0 until k)
      .map(i => (col("sig_a").getItem(i) === col("sig_b").getItem(i)).cast("int"))
      .reduce(_ + _)
    l.join(rgt, Seq("band", "bucket"))
      .select(col("a"), col("b"), (agree.cast("double") / k).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= minEstSim)
  }

  /** Incremental EXACT dedup — the ingest-time shape of [[exactDedup]]:
    * keep the smallest id of each distinct `batch` text, then drop any
    * batch text already present in `corpus`. The corpus side reduces to
    * DISTINCT content digests before the anti-join — at 100 TB that is the
    * operating mode: the corpus is never re-shuffled at full row width per
    * ingest (and a deployment can persist the digest set once and append
    * to it, which [[MinhashIndex]] does for the near-dup analogue). The
    * anti-join broadcasts when the digest set is small and shuffles on the
    * digest otherwise — AQE's call, both correct. */
  def incrementalExactDedup(batch: DataFrame, corpus: DataFrame,
                            textCol: String, idCol: String): DataFrame = {
    val seen = corpus.select(md5(col(textCol)).as("__h")).distinct()
    exactDedup(batch, textCol, idCol)
      .withColumn("__h", md5(col(textCol)))
      .join(seen, Seq("__h"), "left_anti")
      .drop("__h")
  }

  /** MinHash-LSH near-duplicate candidates of `batch` docs AGAINST a
    * separate `corpus` — the cross form of [[minhashCandidates]] for
    * incremental ingest: only batch×corpus pairs that collide in some band
    * ever meet in a reducer; neither side is ever joined against itself.
    * Output: (a = batch id, b = corpus id, est_jaccard).
    *
    * Both sides must be sketched with the SAME (shingleN, k, bands) or the
    * bucket hashes are incomparable — [[MinhashIndex]] pins the build
    * parameters in its meta for exactly this reason. */
  def crossMinhashCandidates(batch: DataFrame, corpus: DataFrame,
                             textCol: String, idCol: String,
                             shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                             minEstSim: Double = 0.5,
                             batchSize: Long = -1L,
                             corpusSize: Long = -1L): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    // width follows the larger side's exploded band volume (the corpus,
    // in any realistic ingest) — same OOM-guard discipline as the
    // self-join; zero-job byte estimates unless the caller has counts
    val nPart =
      if (batchSize > 0 && corpusSize > 0)
        verifyPartitions(bands.toLong * math.max(batchSize, corpusSize),
          batch.sparkSession.sessionState.conf.numShufflePartitions, 125000L)
      else math.max(widthFromBytes(batch, bands), widthFromBytes(corpus, bands))
    crossBandJoin(
      bandRows(minhashSignatures(batch, textCol, idCol, shingleN, k), k, bands),
      bandRows(minhashSignatures(corpus, textCol, idCol, shingleN, k), k, bands),
      k, nPart, minEstSim)
  }

  /** Incremental NEAR-dup dedup: the `batch` rows with no cross-corpus
    * minhash candidate at `minEstSim` or above. Within-batch duplicates
    * are deliberately NOT handled here — an ingest pipeline composes this
    * after [[incrementalExactDedup]] (exact within-batch + vs corpus) or
    * a within-batch [[minhashCandidates]] pass; keeping the cross filter
    * pure lets each stage's candidate volume be bounded separately. */
  def incrementalMinhashDedup(batch: DataFrame, corpus: DataFrame,
                              textCol: String, idCol: String,
                              shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                              minEstSim: Double = 0.5,
                              batchSize: Long = -1L,
                              corpusSize: Long = -1L): DataFrame = {
    val hits = crossMinhashCandidates(batch, corpus, textCol, idCol,
        shingleN, k, bands, minEstSim, batchSize, corpusSize)
      .select(col("a").as("__dup")).distinct()
    batch.join(hits, col(idCol) === col("__dup"), "left_anti")
  }

  /** 64-bit SimHash per document: sign of per-bit weighted sums of token
    * hashes, computed whole-sketch-per-row by the codegen'd
    * `graft_simhash64` kernel (functions/TextSketch.scala) — no token
    * explode, no shuffle; bit-identical to the earlier explode + 64
    * bit-sum-aggregate formulation (DedupSpec asserts the parity). */
  def simhashDf(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.functions.GridDbScalarFunctions.register(docs.sparkSession)
    // coalesce: same non-nullability guard as minhashSignatures
    spread(docs).where(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        call_function("graft_simhash64",
          coalesce(lower(col(textCol)), lit(""))).as("sh"))
  }

  /** SimHash near-duplicate pairs within `maxHamming` bits, found via banded
    * LSH on 16-bit chunks (a pair within hamming d<=3 of 64 bits must agree
    * exactly on at least one of the 4 chunks). Output (a, b, hamming).
    *
    * Scale bound (inherent to the 64-bit sketch, unlike the SRP/minhash
    * bands whose width grows with the corpus): the pigeonhole split is
    * fixed at 4 chunks of 16 bits, so there are at most 2^16 buckets per
    * band and mean bucket size grows as N/65536 — candidate volume turns
    * quadratic once corpora pass the tens of millions of documents. The
    * chunk layout cannot widen without breaking the exact hamming<=3
    * guarantee; past that size prefer [[minhashCandidates]] /
    * [[embeddingCandidates]], whose AUTO band widths keep buckets ~O(1). */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3, corpusSize: Long = -1L): DataFrame =
    simhashPairsOf(simhashDf(docs, textCol, idCol), maxHamming, corpusSize,
      widthOf = docs)

  /** The banded pair machinery of [[simhashPairs]] over a PRE-COMPUTED
    * sketch frame `(id, sh)` — split out (r13) so the oracle companion can
    * drive the exact chunk-band/self-join/hamming path with an
    * engine-portable sketch (md5-derived bits a SQL oracle can replay)
    * while the production entry keeps the codegen'd xxhash64 kernel.
    * `widthOf` feeds the zero-job byte estimate when `corpusSize` is
    * unknown (the sketch frame's own estimate undercounts — pass the
    * source docs where available). */
  def simhashPairsOf(sh: DataFrame, maxHamming: Int,
                     corpusSize: Long = -1L,
                     widthOf: DataFrame = null): DataFrame = {
    // adaptive width, same rationale as minhashCandidates (rows are a
    // single Long sketch, so the per-partition byte budget stretches
    // further — double it)
    val nPart =
      if (corpusSize > 0)
        verifyPartitions(4L * corpusSize,
          sh.sparkSession.sessionState.conf.numShufflePartitions, 250000L)
      else widthFromBytes(Option(widthOf).getOrElse(sh), 4,
        bytesPerPartition = 64L << 20)
    val chunks = (0 until 4).map(b =>
      shiftright(col("sh"), b * 16).bitwiseAND(0xffffL))
    // shared-Exchange self-join, shuffle_hash-pinned: see minhashCandidates
    val banded = bandedExchange(
      sh.select(col("id"), col("sh"), posexplode(array(chunks: _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk"),
      nPart, col("band"), col("chunk"))
    val l = banded.select(col("band"), col("chunk"), col("id").as("a"), col("sh").as("sh_a"))
      .hint("shuffle_hash")
    val rgt = banded.select(col("band"), col("chunk"), col("id").as("b"), col("sh").as("sh_b"))
      .hint("shuffle_hash")
    l.join(rgt, Seq("band", "chunk")).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact token-set Jaccard similarity for all pairs with
    * `jaccard >= minJaccard` — candidate generation by PREFIX-FILTERED
    * inverted index (PPJoin-style), exact verification by intersection
    * count.
    *
    * A plain inverted-index self-join explodes on frequent tokens: one
    * stop-word shared by d documents emits d² candidate rows, which is
    * quadratic in corpus size regardless of the threshold. The prefix
    * filter makes the index selective WITHOUT losing pairs: order each
    * document's tokens by global document frequency (rarest first); two
    * sets with Jaccard >= t must share a token within their first
    * |T| - ceil(t*|T|) + 1 tokens of that shared order, so only those
    * prefix tokens are indexed. A length filter (|A| >= t*|B|) prunes the
    * rest. Result is IDENTICAL to the naive formulation (the DuckDB oracle
    * runs the naive SQL) but the index join touches ~t-fraction prefixes of
    * mostly-rare tokens — the difference between minutes and sub-second at
    * 5k docs, and between impossible and linear-ish at 100 TB.
    *
    * EXECUTION CONTRACT (r10 ADVICE): this method is EAGER — it
    * materializes and COUNTS the candidate set at call time to size the
    * verify stage, so "building the plan" already runs jobs. When the
    * session has a reliable checkpoint dir configured
    * (`sc.setCheckpointDir`) AND
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true`, candidates
    * checkpoint THERE and survive executor loss; the cleaner conf is part
    * of the gate because reliable checkpoint files are otherwise never
    * deleted and an expression-shaped operator has no lifecycle hook to
    * clean up after itself (r11 review: each call would leak a full
    * candidate-set copy to the checkpoint dir). Otherwise candidates fall
    * back to localCheckpoint, whose non-replicated blocks mean an
    * executor loss fails the query instead of recomputing (rerun it). */
  def tokenJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
                        minJaccard: Double,
                        targetCandidatesPerPartition: Long = 50000L): DataFrame = {
    val spark = docs.sparkSession
    // The verify stage's state is proportional to CANDIDATES, not input
    // rows, and candidates grow super-linearly on saturated vocabularies
    // (SCALING.md zipf100 doubling curve: ~4.3x per corpus doubling) — so
    // inheriting the session's shuffle-partition count sizes the verify
    // join for the wrong quantity (25.1M candidates / 32 partitions blew
    // an 8g heap at 5M docs). The operator already materializes the
    // candidate set; count it and derive the verify parallelism from it.
    // Eager localCheckpoint (not persist: Dataset.persist pins an entry
    // in the CacheManager until an explicit unpersist, which an
    // expression-shaped operator has no lifecycle hook to issue — each
    // call would leak a cached candidate set) materializes once for the
    // count AND the verify stage; the blocks free when the RDD is GC'd.
    val cand0 = tokenJaccardCandidates(docs, textCol, idCol, minJaccard)
    val cand =
      if (spark.sparkContext.getCheckpointDir.isDefined &&
          spark.sparkContext.getConf.getBoolean(
            "spark.cleaner.referenceTracking.cleanCheckpoints", false))
        cand0.checkpoint(true)
      else cand0.localCheckpoint(true)
    val nPart = verifyPartitions(cand.count(),
      spark.sessionState.conf.numShufflePartitions, targetCandidatesPerPartition)
    // exact verify: |A∩B| per candidate by a PER-ROW set intersection
    // (array_intersect over the distinct-token arrays), not a per-token
    // join. The exploded formulation shuffles Σ|A| rows per candidate —
    // 2.5B narrow rows at 25M candidates (zipf100 5M docs), whose SMJ
    // sort spills alone exceed a workstation's disk. Here the only
    // shuffled payload is each candidate's two token ARRAYS (bounded by
    // candidates x document length, ~20x less), there is no verify-side
    // sort or aggregate at all, and the token arrays come straight off
    // the document scan with no shuffle of their own. Explicit
    // fixed-width repartitions (not AQE-coalescible) pin both attach
    // joins at nPart.
    val ts = spread(docs)
      .select(col(idCol).as("id"), array_distinct(tokens(textCol)).as("tset"))
    val inter = cand.repartition(nPart, col("a"))
      .join(ts.select(col("id").as("a"), col("tset").as("ta")), "a")
      .repartition(nPart, col("b"))
      .join(ts.select(col("id").as("b"), col("tset").as("tb")), "b")
      .select(col("a"), col("b"), col("sza"), col("szb"),
        size(array_intersect(col("ta"), col("tb"))).cast("long").as("inter"))
    inter
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("sza") + col("szb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Verify-stage partition count: enough partitions that each holds about
    * `targetPerPartition` candidate pairs (floor: the session default, so
    * small corpora keep their configured parallelism; cap: 65536, past
    * which task overhead dominates any realistic executor count). Pure so
    * specs and probes can assert the sizing rule directly. */
  def verifyPartitions(nCandidates: Long, sessionDefault: Int,
                       targetPerPartition: Long = 50000L): Int = {
    require(targetPerPartition > 0, "targetPerPartition must be positive")
    val needed = nCandidates / targetPerPartition + 1
    math.min(math.max(sessionDefault.toLong, needed), 65536L).toInt
  }

  /** Exchange width from the optimizer's size estimate of `df` — ZERO
    * jobs (a parquet scan exposes its file bytes at plan time), the same
    * bytes-per-partition discipline a cluster's
    * `spark.sql.shuffle.partitions ~ input/128MB` deployment default
    * encodes. `expansion` = exploded rows fed to the exchange per input
    * row (LSH bands). Compressed-scan bytes UNDER-estimate heap rows, so
    * the per-partition budget is set conservatively low; estimate errors
    * only ever ADD partitions, which is the safe direction for an OOM
    * guard. Floored at the session default, capped at 64k. */
  private[graft] def widthFromBytes(df: DataFrame, expansion: Int,
                                    bytesPerPartition: Long = 32L << 20): Int = {
    val conf = df.sparkSession.sessionState.conf
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val default = conf.numShufflePartitions.toLong
    // a plan with no real statistics reports the defaultSizeInBytes
    // SENTINEL (Long.MaxValue unless tuned) — that is "unknown", not
    // "huge": fall back to the session default rather than exploding to
    // the cap (and clamp in BigInt space so .toLong cannot wrap)
    if (bytes >= BigInt(conf.defaultSizeInBytes)) default.toInt
    else {
      val needed = (BigInt(expansion) * bytes / bytesPerPartition + 1)
        .min(BigInt(65536L)).toLong
      math.min(math.max(default, needed), 65536L).toInt
    }
  }

  /** The banded self-joins' key exchange. The adaptive width is an OOM
    * GUARD — it matters only when it must EXPAND past the session default
    * (the exploded band volume would overflow default-width build maps,
    * r10 5M-doc rehearsal). When the derived width fits inside the default,
    * keep the width-free `repartition(keys)` form, which AQE may COALESCE:
    * r10 pinned the width unconditionally and the non-coalescible 32-task
    * exchange cost ~1.6x calib-normalized on the sf0.1 minhash bench for
    * zero scale benefit (BENCH_COMPARE_r10). Both legs still share one
    * canonically-equal Exchange subtree either way (ReusedExchange,
    * DedupSpec-asserted). */
  private def bandedExchange(df: DataFrame, nPart: Int,
                             cols: org.apache.spark.sql.Column*): DataFrame =
    if (nPart > df.sparkSession.sessionState.conf.numShufflePartitions)
      df.repartition(nPart, cols: _*)
    else df.repartition(cols: _*)

  private def tokenSet(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    spread(docs)
      .select(col(idCol).as("id"), explode(array_distinct(tokens(textCol))).as("w"))
      .distinct()

  /** The PPJoin candidate stage of [[tokenJaccardPairs]] — prefix-token
    * collision + length filter + POSITIONAL filter (Xiao et al. 2008,
    * "Efficient Similarity Joins for Near Duplicate Detection", §3.2),
    * BEFORE exact verification. Exposed so scale probes can measure the
    * candidate count directly: candidates, not wall seconds, are the
    * quantity these filters bound.
    *
    * The positional filter is what survives vocabulary saturation: when a
    * collision token sits at prefix positions (pa, pb), the overlap can be
    * at most `1 + min(sza - pa, szb - pb)`; requiring that to clear the
    * equivalent-overlap threshold α = ceil(j/(1+j)·(sza+szb)) discards the
    * bulk of common-token collisions that the rarest-first prefix alone
    * admits once every token's document frequency grows with the corpus.
    * Exactness-preserving: only pairs that cannot possibly reach Jaccard j
    * are dropped. Output (a, b, sza, szb), a < b. */
  def tokenJaccardCandidates(docs: DataFrame, textCol: String, idCol: String,
                             minJaccard: Double): DataFrame = {
    val tok = tokenSet(docs, textCol, idCol)
    val sizes = tok.groupBy("id").agg(count(lit(1)).as("sz"))
    // global document frequency orders tokens (rarest first, token as tie)
    val dfreq = tok.groupBy("w").agg(count(lit(1)).as("df"))
    val ranked = tok.join(dfreq, "w")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(col("df"), col("w"))))
      .join(sizes, "id")
    val prefix = ranked
      .filter(col("rk") <= col("sz") - ceil(col("sz") * minJaccard) + 1)
      .select(col("id"), col("w"), col("sz"), col("rk"))
    // candidates: prefix-token collision + length filter + position filter
    val alpha = ceil(lit(minJaccard / (1.0 + minJaccard)) * (col("sza") + col("szb")))
    prefix.select(col("id").as("a"), col("w"), col("sz").as("sza"), col("rk").as("pa"))
      .join(prefix.select(col("id").as("b"), col("w"), col("sz").as("szb"), col("rk").as("pb")), "w")
      .filter(col("a") < col("b") &&
        col("sza") >= ceil(col("szb") * minJaccard) &&
        col("szb") >= ceil(col("sza") * minJaccard) &&
        lit(1) + least(col("sza") - col("pa"), col("szb") - col("pb")) >= alpha)
      .select("a", "b", "sza", "szb").distinct()
  }

  /** Exact embedding-cosine near-duplicate pairs: every (a < b) with
    * `round(cosine, roundTo) >= minCos`. O(N²) self-join — the correctness
    * baseline that [[embeddingCandidates]] is measured against; use only
    * when one side fits in a broadcast. Output (a, b, cos). */
  def embeddingDupsExact(docs: DataFrame, vecCol: String, idCol: String,
                         minCos: Double, roundTo: Int = 4): DataFrame = {
    graft.functions.GridDbScalarFunctions.register(docs.sparkSession)
    val v = transform(col(vecCol), _.cast("double"))
    val d = spread(docs)
    val l = d.select(col(idCol).as("a"), v.as("va"))
    val r = d.select(col(idCol).as("b"), v.as("vb"))
    l.join(r, col("a") < col("b"))
      .select(col("a"), col("b"),
        round(call_function("graft_cosine", col("va"), col("vb")), roundTo).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** SemDeDup-style semantic near-dup pairs (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication"):
    * embeddings are coarse-clustered with the IVF centroid discipline
    * (deterministic seeds + one Lloyd step, literal centroids — assignment
    * is a shuffle-free projection) and exact cosine runs ONLY within a
    * cluster, so the pair scan costs Σ n_c² instead of N². `nLists = 1`
    * degenerates to the exact all-pairs baseline (oracle-checkable); the
    * default (`nLists <= 0` = AUTO) derives ~√N clusters from a corpus
    * count (Similarity.autoLists), so within-cluster cost stays bounded as
    * the corpus grows instead of degrading toward all-pairs at a fixed
    * list count. Pairs whose rounded cosine clears `minCos` come back as
    * (a, b, cos) with a < b; pairs split across clusters are missed by
    * construction (the SemDeDup trade-off — raise nLists for speed, lower
    * for recall). */
  def semanticPairs(docs: DataFrame, vecCol: String, idCol: String,
                    minCos: Double, nLists: Int = -1,
                    roundTo: Int = 4, corpusSize: Long = -1L): DataFrame = {
    graft.functions.GridDbScalarFunctions.register(docs.sparkSession)
    val v = transform(col(vecCol), _.cast("double"))
    val base = spread(docs).select(col(idCol).as("a"), v.as("va"))
    val lists =
      if (nLists > 0) nLists
      else Similarity.resolveLists(docs, nLists, corpusSize)
    val assigned =
      if (lists <= 1) base.withColumn("__cl", lit(0))
      else {
        val c0 = base.select(col("a").as("c_id"), col("va").as("cv"))
        val dim = Similarity.vecDim(c0, "cv")
        val cents = Similarity.ivfCentroids(c0, dim, lists)
        base.withColumn("__cl", Similarity.assignCluster(col("va"), cents))
      }
    // clustered path: repartition on the cluster key below the leg renames
    // + shuffle_hash — the same sketch-once discipline as the LSH
    // self-joins, so the centroid assignment (an O(L·dim) expression per
    // row) materializes through ONE reused Exchange instead of recomputing
    // per leg. The nLists<=1 degenerate (exact all-pairs baseline) keeps
    // the plain join: its single-valued key would collapse a pinned
    // shuffle join to one task, while a broadcast leg parallelizes the
    // documented O(N²) scan across the cluster.
    val joined =
      if (lists <= 1) {
        val r = assigned.select(col("__cl"), col("a").as("b"), col("va").as("vb"))
        assigned.join(r, Seq("__cl"))
      } else {
        val parted = assigned.repartition(col("__cl"))
        parted.hint("shuffle_hash").join(
          parted.select(col("__cl"), col("a").as("b"), col("va").as("vb"))
            .hint("shuffle_hash"),
          Seq("__cl"))
      }
    joined
      .where(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(call_function("graft_cosine", col("va"), col("vb")), roundTo).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Semantic dedup assignment: every row labeled with the MIN id of its
    * semantic component (connected components over [[semanticPairs]]);
    * keepers are rows with id == cluster. Composition of the SemDeDup pair
    * stage with the same large-star/small-star components used for lexical
    * cluster dedup — one pipeline for both dedup families. */
  def semanticDedup(docs: DataFrame, vecCol: String, idCol: String,
                    minCos: Double, nLists: Int = -1,
                    corpusSize: Long = -1L): DataFrame = {
    val pairs = semanticPairs(docs, vecCol, idCol, minCos, nLists,
      corpusSize = corpusSize)
    clusterAssign(docs, idCol, pairs, "a", "b")
  }

  /** Chunk-granular exact-substring deduplication — the shuffle-friendly
    * approximation of Lee et al. 2021 ("Deduplicating Training Data Makes
    * Language Models Better"): their EXACTSUBSTR removes duplicated
    * 50-token spans via a corpus suffix array; the distributed practice
    * (CCNet, RefinedWeb) dedups at line/paragraph granularity instead. The
    * unit here is consecutive `chunkTokens`-token chunks (this corpus has
    * no paragraph structure). Every chunk whose exact text already occurred
    * earlier in the corpus — first occurrence in (id, position) order wins,
    * globally — is dropped, and each document is reassembled from its
    * surviving chunks in order.
    *
    * Scale shape: chunking is a pure map (one explode), ranking occurrences
    * is ONE shuffle on the chunk text (identical chunks meet in one
    * reducer; group sizes are duplicate counts, not corpus size), reassembly
    * is one groupBy(id) — no suffix array, no pair join, nothing quadratic.
    * Output: (id, clean_text, n_chunks, n_kept) for every input document
    * (clean_text = "" when every chunk was dropped or the text was empty).
    */
  def exactSubstringDedup(docs: DataFrame, textCol: String, idCol: String,
                          chunkTokens: Int = 20): DataFrame =
    unitDedup(docs, idCol,
      Curation.chunkDocuments(docs, idCol, textCol,
        window = chunkTokens, stride = chunkTokens), joinSep = " ")

  /** Paragraph-granular variant of [[exactSubstringDedup]] for corpora with
    * real structure: units are `sepRegex`-separated blocks (default blank
    * lines) instead of fixed token windows — the exact formulation CCNet
    * and RefinedWeb use for line/paragraph dedup. Same first-occurrence-
    * wins semantics and plan shape; survivors rejoin with `joinSep`. */
  def paragraphDedup(docs: DataFrame, textCol: String, idCol: String,
                     sepRegex: String = "\\n{2,}",
                     joinSep: String = "\n\n"): DataFrame = {
    val units = spread(docs)
      .select(col(idCol), posexplode(
        filter(transform(split(col(textCol), sepRegex), p => trim(p)),
          p => p =!= "")))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        col("col").as("chunk_text"))
    unitDedup(docs, idCol, units, joinSep)
  }

  /** Shared engine for the unit-granular exact dedups: rank every unit's
    * occurrences corpus-wide over its TEXT (one shuffle; identical units
    * meet in one reducer), keep rank 1, reassemble per document in unit
    * order. `units` must carry (idCol, chunk_id, chunk_text). */
  private def unitDedup(docs: DataFrame, idCol: String,
                        units: DataFrame, joinSep: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("chunk_text")).orderBy(col(idCol), col("chunk_id"))
    val rebuilt = units.withColumn("__rk", row_number().over(w))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("__rk") === 1, 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("__rk") === 1,
              struct(col("chunk_id"), col("chunk_text"))))),
            c => c.getField("chunk_text")), joinSep).as("clean_text"))
    docs.select(col(idCol).as("id"))
      .join(rebuilt.withColumnRenamed(idCol, "id"), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** AUTO SRP band sizing: r bits per band targets ~64 vectors per bucket
    * (candidates ~64·N per band instead of N²/2^r with a fixed width),
    * floored at 4 bits, capped at 30 per band (2^30 buckets — past ~64·2^30
    * rows a trained coarse quantizer is the right tool). Each band hashes
    * its own independently seeded plane set, so bands·r is NOT bounded by
    * a shared 63-bit signature: the pre-r11 cap of 63/bands bits per band
    * bound 4 bands at ~2M vectors, and past it buckets — and candidate
    * volume — grew linearly with the corpus (the sf100z rehearsal measured
    * the resulting ~610-vector buckets at 20M vectors: 24B verify pairs,
    * 12x wall at 10x rows). */
  private[graft] def autoBandBits(n: Long, bands: Int): Int =
    math.min(30, math.max(4,
      math.ceil(math.log(n / 64.0) / math.log(2)).toInt)) * bands

  /** Embedding-cosine near-duplicate candidates at scale: banded
    * sign-random-projection LSH. The `bits` hyperplane signs are split into
    * `bands`; vectors agreeing on ALL bits of at least one band meet in a
    * (band, bucket) equi-join reducer and are verified with the exact
    * codegen'd cosine. Like [[minhashCandidates]], the only shuffle is the
    * bucket join — signatures are a pure per-row map, so the O(N²) cross
    * product never materializes. Recall < 1 by construction (raise `bits` /
    * lower `bands`' width for more precision, more bands for more recall).
    *
    * `bits <= 0` (the default) = AUTO: per-band width grows with the corpus
    * so buckets stay selective — with r-bit bands a band contributes
    * ~N²/2^r candidate pairs, so a FIXED width degrades quadratically as
    * the corpus grows (measured in the sf1 rehearsal: 8.5x wall time at 10x
    * rows with the old fixed 16/4). AUTO picks r = max(4, ceil(log2(N/64)))
    * (~64 vectors per bucket, candidates ~64·N per band) capped at 30.
    * Per-band recall at similarity s falls as ((1+s)/2)^r ≈ (1-θ/π)^r, so
    * when AUTO widens the bands, raise `bands` to recover recall (the
    * standard LSH b·r trade: bands cost linearly, band width exponentially).
    * Output (a, b, cos). */
  /** Exploded (id, v, band, bucket) SRP rows — the one copy of the
    * per-band seeded-plane scheme (seed = 42 + 1000003·band), shared by
    * the self-join ([[embeddingCandidates]]) and the batch-vs-corpus
    * cross join ([[crossEmbeddingCandidates]]): both sides of a cross
    * join MUST draw the same planes or their bucket spaces are
    * incomparable. */
  private def srpBandRows(df: DataFrame, vecCol: String, idCol: String,
                          r: Int, dim: Int, bands: Int): DataFrame = {
    val sig = spread(df).select(col(idCol).as("id"),
      transform(col(vecCol), _.cast("double")).as("v"))
    val bandCols = (0 until bands).map { b =>
      Similarity.signatureFused(col("v"), r, dim, seed = 42L + 1000003L * b)
    }
    sig.select(col("id"), col("v"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
  }

  def embeddingCandidates(docs: DataFrame, vecCol: String, idCol: String,
                          minCos: Double, bits: Int = -1, bands: Int = 4,
                          roundTo: Int = 4, corpusSize: Long = -1L): DataFrame = {
    graft.functions.GridDbScalarFunctions.register(docs.sparkSession)
    // count only when a row count is actually needed (AUTO bits); a
    // pinned-bits call with no corpusSize stays zero-job via the byte
    // estimate, like the text sketches (r10 self-review)
    val nDocsOpt =
      if (corpusSize > 0) Some(corpusSize)
      else if (bits <= 0) Some(math.max(docs.count(), 1L))
      else None
    val resolvedBits = if (bits > 0) bits else autoBandBits(nDocsOpt.get, bands)
    require(resolvedBits % bands == 0, "bands must divide bits")
    val r = resolvedBits / bands
    require(r <= 63, s"per-band width $r exceeds the 63-bit band bucket")
    val dim = Similarity.vecDim(docs, vecCol)
    // Each band's bucket is its OWN independently seeded r-plane signature
    // (one fused kernel call per band — same total arithmetic as a single
    // bands·r-plane call). Buckets were formerly r-bit slices of one packed
    // 63-bit signature, which capped bands·r at 63 and stopped AUTO's
    // per-band growth at ~2M vectors for 4 bands.
    // Adaptive width (rows carry the full double[] vector, so the
    // per-partition target is lower than the text sketches')
    val nPart = nDocsOpt match {
      case Some(n) => verifyPartitions(bands.toLong * n,
        docs.sparkSession.sessionState.conf.numShufflePartitions, 40000L)
      case None => widthFromBytes(docs, bands, bytesPerPartition = 16L << 20)
    }
    embeddingCandidatesOfBandRows(
      srpBandRows(docs, vecCol, idCol, r, dim, bands), minCos, roundTo, nPart)
  }

  /** The banded self-join + exact-cosine verify over caller-provided
    * (id, v, band, bucket) rows — the hash-agnostic seam of
    * [[embeddingCandidates]] ([[minhashCandidatesOfSig]] discipline, r15):
    * everything downstream of the SIGNATURE — shared-Exchange self-join,
    * shuffle_hash pin, a<b canonicalization, exact-cosine verify at
    * `minCos`, pair distinct — runs here, so the md5-variant full-value
    * oracle (q_dedup_srp_md5_oracle) drives the same code with buckets
    * DuckDB can replay, leaving only the seeded-plane kernel itself
    * spec-covered. `nPart <= 0` uses the session default width. */
  def embeddingCandidatesOfBandRows(bandRows: DataFrame, minCos: Double,
                                    roundTo: Int = 4,
                                    nPart: Int = -1): DataFrame = {
    graft.functions.GridDbScalarFunctions.register(bandRows.sparkSession)
    val width =
      if (nPart > 0) nPart
      else bandRows.sparkSession.sessionState.conf.numShufflePartitions
    // shared-Exchange self-join, shuffle_hash-pinned: see minhashCandidates
    val banded = bandedExchange(bandRows, width, col("band"), col("bucket"))
    val l = banded.select(col("band"), col("bucket"), col("id").as("a"), col("v").as("va"))
      .hint("shuffle_hash")
    val rt = banded.select(col("band"), col("bucket"), col("id").as("b"), col("v").as("vb"))
      .hint("shuffle_hash")
    l.join(rt, Seq("band", "bucket")).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(call_function("graft_cosine", col("va"), col("vb")), roundTo).as("cos"))
      .filter(col("cos") >= minCos)
      .distinct()
  }

  /** SRP-LSH near-duplicate candidates of `batch` embeddings AGAINST a
    * separate `corpus` — the cross form of [[embeddingCandidates]] for
    * incremental ingest (the embedding analogue of
    * [[crossMinhashCandidates]]): both sides are sketched with the SAME
    * seeded plane sets (the seeds are fixed, so the bucket spaces agree by
    * construction), only batch×corpus band collisions meet a reducer, and
    * every surviving pair is exact-cosine-verified at `minCos` — so the
    * result is a SUBSET of the exact cross pair set with exact scores
    * (q_dedup_incremental_emb_bound pins both). AUTO bits size off the
    * CORPUS (the side that grows). Output: (a = batch id, b = corpus id,
    * cos). */
  def crossEmbeddingCandidates(batch: DataFrame, corpus: DataFrame,
                               vecCol: String, idCol: String,
                               minCos: Double, bits: Int = -1, bands: Int = 4,
                               roundTo: Int = 4, batchSize: Long = -1L,
                               corpusSize: Long = -1L): DataFrame = {
    graft.functions.GridDbScalarFunctions.register(batch.sparkSession)
    val nCorpusOpt =
      if (corpusSize > 0) Some(corpusSize)
      else if (bits <= 0) Some(math.max(corpus.count(), 1L))
      else None
    val resolvedBits = if (bits > 0) bits else autoBandBits(nCorpusOpt.get, bands)
    require(resolvedBits % bands == 0, "bands must divide bits")
    val r = resolvedBits / bands
    require(r <= 63, s"per-band width $r exceeds the 63-bit band bucket")
    val dim = Similarity.vecDim(corpus, vecCol)
    val nPart = (nCorpusOpt, batchSize) match {
      case (Some(n), bs) => verifyPartitions(
        bands.toLong * math.max(n, math.max(bs, 1L)),
        batch.sparkSession.sessionState.conf.numShufflePartitions, 40000L)
      case _ => math.max(
        widthFromBytes(batch, bands, bytesPerPartition = 16L << 20),
        widthFromBytes(corpus, bands, bytesPerPartition = 16L << 20))
    }
    crossEmbeddingCandidatesOfBandRows(
      srpBandRows(batch, vecCol, idCol, r, dim, bands),
      srpBandRows(corpus, vecCol, idCol, r, dim, bands),
      minCos, roundTo, nPart)
  }

  /** The banded CROSS join + exact-cosine verify over caller-provided
    * (id, v, band, bucket) frames — the hash-agnostic seam of
    * [[crossEmbeddingCandidates]] (see [[embeddingCandidatesOfBandRows]]).
    * Both frames MUST carry buckets from the same signature scheme.
    * Output: (a = batch id, b = corpus id, cos) — no canonicalization,
    * both orientations meaningful. `nPart <= 0` = session default. */
  def crossEmbeddingCandidatesOfBandRows(batchRows: DataFrame,
                                         corpusRows: DataFrame,
                                         minCos: Double, roundTo: Int = 4,
                                         nPart: Int = -1): DataFrame = {
    graft.functions.GridDbScalarFunctions.register(batchRows.sparkSession)
    val width =
      if (nPart > 0) nPart
      else batchRows.sparkSession.sessionState.conf.numShufflePartitions
    val l = bandedExchange(batchRows, width, col("band"), col("bucket"))
      .select(col("band"), col("bucket"), col("id").as("a"), col("v").as("va"))
      .hint("shuffle_hash")
    val rt = bandedExchange(corpusRows, width, col("band"), col("bucket"))
      .select(col("band"), col("bucket"), col("id").as("b"), col("v").as("vb"))
      .hint("shuffle_hash")
    l.join(rt, Seq("band", "bucket"))
      .select(col("a"), col("b"),
        round(call_function("graft_cosine", col("va"), col("vb")), roundTo).as("cos"))
      .filter(col("cos") >= minCos)
      .distinct()
  }

  /** Incremental embedding dedup: the `batch` rows with no cross-corpus
    * SRP candidate at `minCos` or above — the semantic-ingest gate
    * (compose with [[incrementalExactDedup]] /
    * [[incrementalMinhashDedup]] for the text stages). */
  def incrementalEmbeddingDedup(batch: DataFrame, corpus: DataFrame,
                                vecCol: String, idCol: String,
                                minCos: Double, bits: Int = -1,
                                bands: Int = 4, batchSize: Long = -1L,
                                corpusSize: Long = -1L): DataFrame = {
    val hits = crossEmbeddingCandidates(batch, corpus, vecCol, idCol,
        minCos, bits, bands, batchSize = batchSize, corpusSize = corpusSize)
      .select(col("a").as("__dup")).distinct()
    batch.join(hits, col(idCol) === col("__dup"), "left_anti")
  }
}

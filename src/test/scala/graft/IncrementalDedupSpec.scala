package graft

import graft.pipeline.{Dedup, ExactIndex, MinhashIndex}
import org.apache.spark.sql.functions._

/** Incremental (batch-vs-corpus) dedup family + the persisted minhash band
  * index: the 100 TB ingest shape — new batches dedup against an existing
  * corpus that is never re-read, only appended to. */
class IncrementalDedupSpec extends SparkTestBase {
  import spark.implicits._

  // corpus: two settled docs
  private val corpus = Seq(
    (10L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon")
  ).toDF("doc_id", "text")

  // batch: an exact dup of corpus 10 (twice — also a within-batch dup), a
  // near dup of corpus 11 (one word changed deep in a 20-token text), a
  // unique doc, and a within-batch-only exact pair not present in the corpus
  private val batch = Seq(
    (20L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (21L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (22L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau psi"),
    (23L, "completely different words about spark catalyst optimizer plans entirely"),
    (24L, "some unique batch text that is repeated twice for the keep min id case"),
    (25L, "some unique batch text that is repeated twice for the keep min id case")
  ).toDF("doc_id", "text")

  test("incrementalExactDedup: keep-min within batch, drop texts already in corpus") {
    val out = Dedup.incrementalExactDedup(batch, corpus, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    // 20/21 dropped (text in corpus), 22/23 survive, 24 kept (min of 24/25)
    assert(out.toSeq == Seq(22L, 23L, 24L))
  }

  test("crossMinhashCandidates: exact dup at est 1.0, near dup caught, ids oriented batch->corpus") {
    val cand = Dedup.crossMinhashCandidates(batch, corpus, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cand.exists(c => c._1 == 20L && c._2 == 10L && c._3 == 1.0))
    assert(cand.exists(c => c._1 == 21L && c._2 == 10L && c._3 == 1.0))
    assert(cand.exists(c => c._1 == 22L && c._2 == 11L && c._3 >= 0.5))
    // unique docs never pair; every a is a batch id, every b a corpus id
    assert(!cand.exists(c => c._1 == 23L || c._1 == 24L || c._1 == 25L))
    assert(cand.forall(c => c._1 >= 20L && c._2 < 20L))
  }

  test("incrementalMinhashDedup: near-dups of the corpus dropped, within-batch dups kept (documented)") {
    val out = Dedup.incrementalMinhashDedup(batch, corpus, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    // 20/21/22 have corpus near-dups; 24/25 are within-batch-only dups and
    // the CROSS filter deliberately leaves them to the within-batch pass
    assert(out.toSeq == Seq(23L, 24L, 25L))
  }

  test("MinhashIndex: probe equals direct cross-candidates pair for pair; dedupBatch equals the in-query gate") {
    val path = java.nio.file.Files.createTempDirectory("graft_mh_spec").toString
    MinhashIndex.build(corpus, "text", "doc_id", path)
    val viaIndex = MinhashIndex.probe(batch, "text", "doc_id", path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = Dedup.crossMinhashCandidates(batch, corpus, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaIndex == direct)
    val gate = MinhashIndex.dedupBatch(batch, "text", "doc_id", path)
      .select("doc_id").as[Long].collect().sorted
    val inQuery = Dedup.incrementalMinhashDedup(batch, corpus, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(gate.toSeq == inQuery.toSeq)
    // the lock is released after build
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path.lock")))
  }

  test("MinhashIndex.append: the next batch dedups against appended survivors; meta count advances") {
    val path = java.nio.file.Files.createTempDirectory("graft_mh_spec2").toString
    MinhashIndex.build(corpus, "text", "doc_id", path)
    // ingest round 1: survivors appended
    val survivors = MinhashIndex.dedupBatch(batch, "text", "doc_id", path)
    val total = MinhashIndex.append(survivors, "text", "doc_id", path)
    assert(total == 2L + survivors.count())
    assert(MinhashIndex.readMeta(spark, path).nDocs == total)
    // ingest round 2: an exact copy of a round-1 SURVIVOR (not in the
    // original corpus) must now be caught by the index
    val batch2 = Seq(
      (30L, "completely different words about spark catalyst optimizer plans entirely"),
      (31L, "fresh new content unseen anywhere before in this corpus")
    ).toDF("doc_id", "text")
    val out2 = MinhashIndex.dedupBatch(batch2, "text", "doc_id", path)
      .select("doc_id").as[Long].collect().sorted
    assert(out2.toSeq == Seq(31L))
  }

  test("MinhashIndex: probe sketches with the BUILD's parameters, not the caller's defaults") {
    val path = java.nio.file.Files.createTempDirectory("graft_mh_spec3").toString
    MinhashIndex.build(corpus, "text", "doc_id", path, shingleN = 2, k = 8, bands = 2)
    val m = MinhashIndex.readMeta(spark, path)
    assert(m == MinhashIndex.Meta(2, 8, 2, 2L))
    val viaIndex = MinhashIndex.probe(batch, "text", "doc_id", path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = Dedup.crossMinhashCandidates(batch, corpus, "text", "doc_id",
        shingleN = 2, k = 8, bands = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaIndex == direct)
    // mismatched params on the direct path give a DIFFERENT bucket space —
    // the meta exists precisely because these are incomparable
    assert(viaIndex.exists(c => c._1 == 20L && c._2 == 10L && c._3 == 1.0))
  }

  test("incrementalDedupStream: later micro-batches dedup against earlier survivors") {
    import org.apache.spark.sql.streaming.Trigger
    val idxPath = java.nio.file.Files.createTempDirectory("graft_mh_stream_spec").toString
    MinhashIndex.build(corpus, "text", "doc_id", idxPath)
    // micro-batch 1: doc 40 is fresh, doc 41 dups the corpus;
    // micro-batch 2: doc 50 dups SURVIVOR 40 (not the original corpus) —
    // it must be dropped only because 40 was appended; doc 51 is fresh
    val b1 = Seq(
      (40L, "brand new content that nothing in the corpus resembles at all"),
      (41L, "the quick brown fox jumps over the lazy dog near the river bank")
    ).toDF("doc_id", "text")
    val b2 = Seq(
      (50L, "brand new content that nothing in the corpus resembles at all"),
      (51L, "another entirely fresh document with its own unique words")
    ).toDF("doc_id", "text")
    val stage = java.nio.file.Files.createTempDirectory("graft_replay_spec")
    b1.coalesce(1).write.parquet(s"$stage/f1")
    b2.coalesce(1).write.parquet(s"$stage/f2")
    // one file dir per trigger, in path order (f1 before f2)
    val part1 = new java.io.File(s"$stage/f1").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val part2 = new java.io.File(s"$stage/f2").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val in = java.nio.file.Files.createTempDirectory("graft_replay_spec_in")
    java.nio.file.Files.copy(part1.toPath, in.resolve("a_batch1.parquet"))
    val survived = scala.collection.mutable.ArrayBuffer[(Long, Seq[Long])]()
    // one checkpoint across both runs: run 2 resumes from the stored
    // offsets and processes ONLY the newly-arrived file
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_spec").toString
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1").parquet(in.toString)
      val q = graft.streaming.StreamingOps.incrementalDedupStream(
          stream, "text", "doc_id", idxPath) { (_, surv, id) =>
        val sv = surv.select("doc_id").as[Long].collect().toSeq.sorted
        survived.synchronized { survived += ((id, sv)); () }
      }.option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    runOnce() // batch 1: 40 survives, 41 dropped (corpus dup)
    java.nio.file.Files.copy(part2.toPath, in.resolve("b_batch2.parquet"))
    runOnce() // batch 2: 50 dropped (dups appended survivor 40), 51 survives
    val all = survived.flatMap(_._2).toSet
    assert(all == Set(40L, 51L),
      s"stream survivors $all — 41 must drop vs corpus, 50 vs appended 40")
    // index advanced by exactly the survivors
    assert(MinhashIndex.readMeta(spark, idxPath).nDocs == 2L + 2L)
  }

  test("incrementalDedupBatch: marker + tag-idempotent append make micro-batch replay safe") {
    import graft.streaming.StreamingOps
    val path = java.nio.file.Files.createTempDirectory("graft_mh_replay").toString
    MinhashIndex.build(corpus, "text", "doc_id", path)
    def run(): Seq[Long] =
      StreamingOps.incrementalDedupBatch(batch, "text", "doc_id", path,
          minEstSim = 0.5, batchId = 7L)
        .select("doc_id").as[Long].collect().toSeq.sorted
    val s1 = run()
    assert(s1 == Seq(23L, 24L, 25L))
    val metaAfter = MinhashIndex.readMeta(spark, path).nDocs
    // clean replay (marker present): identical survivors, no index growth
    assert(run() == s1)
    assert(MinhashIndex.readMeta(spark, path).nDocs == metaAfter)
    // crash-window replay (append committed, marker lost): the keep-min
    // rule stops self-emptying AND keeps one representative of the
    // within-batch exact pair 24/25 (a plain identity guard would let
    // them eliminate each other and lose the content entirely) — the
    // replay emits a subset that still covers every content group
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"${MinhashIndex.dataRoot(spark, path)}/applied/b7"), true)
    val s3 = run()
    assert(s3 == Seq(23L, 24L), s"crash-window replay gave $s3")
    // and the tag overwrite means the index holds the replay's survivor
    // set exactly once, not stacked copies (meta overcounts by design —
    // width-sizing only)
    val bucketDocs = spark.read.parquet(s"${MinhashIndex.dataRoot(spark, path)}/buckets")
      .filter(col("ingest") === "b7").select("id").distinct().count()
    assert(bucketDocs == 2L, s"tag partition holds $bucketDocs distinct docs")
    // marker housekeeping: the commit-horizon helper prunes dead markers
    // (batch 7 < horizon 8) and deletion is verified
    assert(MinhashIndex.pruneAppliedMarkersBelow(spark, path, 7L).isEmpty)
    val removed = MinhashIndex.pruneAppliedMarkersBelow(spark, path, 8L)
    assert(removed == Seq("b7"))
    assert(MinhashIndex.appliedMarker(spark, path, "b7").isEmpty)
  }

  test("MinhashIndex.compact: ingest partitions fold to base, probes unchanged, markers survive") {
    import graft.streaming.StreamingOps
    val path = java.nio.file.Files.createTempDirectory("graft_mh_compact").toString
    MinhashIndex.build(corpus, "text", "doc_id", path)
    // three micro-batch ingests (markers + per-batch ingest partitions)
    val b1 = Seq((40L, "brand new content that nothing in the corpus resembles at all")).toDF("doc_id", "text")
    val b2 = Seq((41L, "another entirely fresh document with its own unique words")).toDF("doc_id", "text")
    val b3 = Seq((42L, "yet another brand new and different piece of text here")).toDF("doc_id", "text")
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      StreamingOps.incrementalDedupBatch(b, "text", "doc_id", path, 0.5, i.toLong)
    }
    // an UNMARKED tag — the crash-window shape (append landed, marker
    // lost): compaction must leave it as its own partition so a replayed
    // append keeps its overwrite-idempotence
    val b99 = Seq((99L, "an unacknowledged crash window batch document text")).toDF("doc_id", "text")
    MinhashIndex.append(b99, "text", "doc_id", path, tag = "b99")
    val probeBefore = MinhashIndex.probe(batch, "text", "doc_id", path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ingestsBefore = spark.read.parquet(s"${MinhashIndex.dataRoot(spark, path)}/buckets")
      .select("ingest").distinct().count()
    assert(ingestsBefore == 5L, s"expected base + 4 ingests, got $ingestsBefore")
    MinhashIndex.compact(spark, path)
    val ingests = spark.read.parquet(s"${MinhashIndex.dataRoot(spark, path)}/buckets")
      .select("ingest").distinct().as[String].collect().toSeq.sorted
    assert(ingests == Seq("b99", "base"),
      s"marked tags fold, the unmarked one survives: $ingests")
    val probeAfter = MinhashIndex.probe(batch, "text", "doc_id", path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(probeAfter == probeBefore, "compaction must not change probe results")
    assert(MinhashIndex.readMeta(spark, path).nDocs == 6L) // 2 corpus + 4 ingested
    // markers survived the swap: replaying batch 1 reproduces its decision
    assert(MinhashIndex.appliedMarker(spark, path, "b1").isDefined)
    val replay = StreamingOps.incrementalDedupBatch(b2, "text", "doc_id", path, 0.5, 1L)
      .select("doc_id").as[Long].collect().toSeq
    assert(replay == Seq(41L))
    // the lock was released and the aside dir cleaned
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path.lock")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"${path}_old")))
  }

  test("MinhashIndex.compact: a HALF-WRITTEN marker (no _SUCCESS) does not mark its tag applied") {
    // crash during writeAppliedMarker leaves a marker dir without
    // _SUCCESS; appliedMarker treats it as absent, so compact must too —
    // folding the tag into base would let the replayed append re-create
    // the tag and transiently duplicate its rows (r14 ADVICE)
    val path = java.nio.file.Files.createTempDirectory("graft_mh_halfmark").toString
    MinhashIndex.build(corpus, "text", "doc_id", path)
    val b = Seq((50L, "one more unique document body for the half marker case")).toDF("doc_id", "text")
    MinhashIndex.append(b, "text", "doc_id", path, tag = "b50")
    MinhashIndex.writeAppliedMarker(b.select("doc_id"), path, "b50")
    // simulate the crash window: the marker dir exists but _SUCCESS is gone
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(
      s"${MinhashIndex.dataRoot(spark, path)}/applied/b50/_SUCCESS"), false))
    assert(MinhashIndex.appliedMarker(spark, path, "b50").isEmpty)
    MinhashIndex.compact(spark, path)
    val ingests = spark.read.parquet(s"${MinhashIndex.dataRoot(spark, path)}/buckets")
      .select("ingest").distinct().as[String].collect().toSeq.sorted
    assert(ingests == Seq("b50", "base"),
      s"a half-written marker must not fold its tag: $ingests")
  }

  test("crossEmbeddingCandidates + incrementalEmbeddingDedup: near vectors caught, orthogonal survive") {
    def unit(v: Array[Double]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val dim = 8
    def axis(i: Int, eps: Double = 0.0): Seq[Float] =
      unit(Array.tabulate(dim)(d => (if (d == i) 1.0 else 0.0) + eps))
    val corpusE = Seq(
      (10L, axis(0)),
      (11L, axis(1))
    ).toDF("vec_id", "embedding")
    val batchE = Seq(
      (20L, axis(0, eps = 0.01)), // near-dup of corpus 10 (cos ~1)
      (21L, axis(3))              // orthogonal to everything
    ).toDF("vec_id", "embedding")
    val cand = Dedup.crossEmbeddingCandidates(batchE, corpusE, "embedding",
        "vec_id", minCos = 0.9, bits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cand.exists(c => c._1 == 20L && c._2 == 10L && c._3 >= 0.99))
    assert(!cand.exists(c => c._1 == 21L))
    assert(cand.forall(c => c._1 >= 20L && c._2 < 20L), "orientation batch->corpus")
    val surv = Dedup.incrementalEmbeddingDedup(batchE, corpusE, "embedding",
        "vec_id", minCos = 0.9, bits = 8)
      .select("vec_id").as[Long].collect().sorted
    assert(surv.toSeq == Seq(21L))
  }

  test("ExactIndex: gate equals the direct incremental exact dedup; appended survivors gate later batches") {
    val path = java.nio.file.Files.createTempDirectory("graft_ex_spec").toString
    ExactIndex.build(corpus, "text", "doc_id", path)
    val viaIndex = ExactIndex.dedupBatch(batch, "text", "doc_id", path)
      .select("doc_id").as[Long].collect().sorted
    val direct = Dedup.incrementalExactDedup(batch, corpus, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(viaIndex.toSeq == direct.toSeq)
    assert(viaIndex.toSeq == Seq(22L, 23L, 24L))
    // advance the corpus: a later batch carrying an exact copy of a
    // round-1 SURVIVOR (never in the original corpus) must now be caught
    val survivors = batch.filter($"doc_id".isin(22L, 23L, 24L))
    val total = ExactIndex.append(survivors, "text", "doc_id", path)
    assert(total == 2L + 3L)
    assert(ExactIndex.readMeta(spark, path).nDocs == total)
    val batch2 = Seq(
      (30L, "completely different words about spark catalyst optimizer plans entirely"),
      (31L, "fresh new content unseen anywhere before in this corpus")
    ).toDF("doc_id", "text")
    val out2 = ExactIndex.dedupBatch(batch2, "text", "doc_id", path)
      .select("doc_id").as[Long].collect().sorted
    assert(out2.toSeq == Seq(31L))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path.lock")))
  }

  test("ExactIndex replay: marker + tag-idempotent append make micro-batch replay safe") {
    import graft.streaming.StreamingOps
    val path = java.nio.file.Files.createTempDirectory("graft_ex_replay").toString
    ExactIndex.build(corpus, "text", "doc_id", path)
    def run(): Seq[Long] =
      StreamingOps.incrementalExactDedupBatch(batch, "text", "doc_id", path,
          batchId = 7L)
        .select("doc_id").as[Long].collect().toSeq.sorted
    val s1 = run()
    assert(s1 == Seq(22L, 23L, 24L))
    val metaAfter = ExactIndex.readMeta(spark, path).nDocs
    // clean replay (marker present): identical survivors, no index growth
    assert(run() == s1)
    assert(ExactIndex.readMeta(spark, path).nDocs == metaAfter)
    // crash-window replay (append committed, marker lost): the keep-min
    // rule ignores identity hits against the batch's own appended
    // digests, so the replay reproduces the decision EXACTLY (the exact
    // gate keeps min representatives before probing, so unlike the
    // minhash crash window there is no subset shrinkage)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"${ExactIndex.dataRoot(spark, path)}/applied/b7"), true)
    assert(run() == s1, "crash-window replay must reproduce the survivors")
    // tag overwrite: the index holds the replay's digests exactly once
    val tagDigests = spark.read.parquet(s"${ExactIndex.dataRoot(spark, path)}/digests")
      .filter(col("ingest") === "b7").count()
    assert(tagDigests == 3L, s"tag partition holds $tagDigests digests")
    // marker housekeeping via the shared protocol
    assert(ExactIndex.pruneAppliedMarkersBelow(spark, path, 8L) == Seq("b7"))
    assert(ExactIndex.appliedMarker(spark, path, "b7").isEmpty)
  }

  test("ExactIndex meta is EXACT: equals stored digest rows through dup-heavy appends and replays (r15 verdict #8)") {
    val path = java.nio.file.Files.createTempDirectory("graft_ex_meta").toString
    def storedRows(): Long =
      spark.read.parquet(s"${ExactIndex.dataRoot(spark, path)}/digests").count()
    def metaDocs(): Long = ExactIndex.readMeta(spark, path).nDocs
    // build over a corpus WITH duplicate texts: meta counts distinct
    // stored rows, not corpus size
    val dupCorpus = Seq(
      (1L, "same text twice"), (2L, "same text twice"),
      (3L, "a second distinct document")).toDF("doc_id", "text")
    ExactIndex.build(dupCorpus, "text", "doc_id", path)
    assert(metaDocs() == 2L, "build meta must count stored rows (3 docs, 2 texts)")
    assert(metaDocs() == storedRows())
    // append with within-batch duplicates: only the distinct digests count
    val dupBatch = Seq(
      (10L, "brand new content"), (11L, "brand new content"),
      (12L, "another brand new line")).toDF("doc_id", "text")
    val total = ExactIndex.append(dupBatch, "text", "doc_id", path, tag = "t1")
    assert(total == 4L, s"2 base + 2 distinct appended, got $total")
    assert(metaDocs() == storedRows())
    // replaying the SAME tag overwrites its rows — meta must not grow
    val replayTotal = ExactIndex.append(dupBatch, "text", "doc_id", path, tag = "t1")
    assert(replayTotal == 4L, s"tag replay must not drift meta, got $replayTotal")
    assert(metaDocs() == storedRows())
    // and compact's recount agrees (nothing to fix anymore)
    ExactIndex.writeAppliedMarker(dupBatch.select($"doc_id"), path, "t1")
    ExactIndex.compact(spark, path)
    assert(metaDocs() == storedRows())
    assert(metaDocs() == 4L)
    // r17 (r16 verdict #6): appends now carry per-tag footer counts
    // forward (tagmeta) instead of footer-listing the whole tree — the
    // crash window must STAY exact: forge a tag directory written by a
    // "crashed" append that never reached its meta write; the next append
    // finds it missing from tagmeta and footer-counts it once
    Seq((100L, "orphaned by a crash")).toDF("doc_id", "text")
      .select($"doc_id".as("id"), org.apache.spark.sql.functions.md5($"text").as("h"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${ExactIndex.dataRoot(spark, path)}/digests/ingest=zzcrash")
    val total2 = ExactIndex.append(
      Seq((20L, "post-crash batch")).toDF("doc_id", "text"),
      "text", "doc_id", path, tag = "t2")
    assert(total2 == 6L, s"4 compacted + 1 orphaned + 1 new, got $total2")
    assert(metaDocs() == storedRows())
    // a CORRUPTED tagmeta (writer killed mid-overwrite: dir exists, no
    // committed parquet) must not brick the index — the next append
    // falls back to a full footer recount and self-heals (r17 review)
    val tagmeta = new java.io.File(
      s"${ExactIndex.dataRoot(spark, path)}/tagmeta")
    org.apache.commons.io.FileUtils.deleteDirectory(tagmeta)
    assert(tagmeta.mkdirs())
    val total3 = ExactIndex.append(
      Seq((30L, "post-corruption batch")).toDF("doc_id", "text"),
      "text", "doc_id", path, tag = "t3")
    assert(total3 == 7L, s"recount through corrupted tagmeta, got $total3")
    assert(metaDocs() == storedRows())
  }

  test("auto-compaction: the streaming gate's ingest partitions PLATEAU with zero manual compact calls (r15 verdict #7)") {
    import graft.streaming.StreamingOps
    def ingestDirs(root: String, dataDir: String): Int =
      Option(new java.io.File(s"$root/$dataDir").listFiles())
        .map(_.count(_.getName.startsWith("ingest="))).getOrElse(0)
    // --- exact gate, 12 micro-batches, threshold 4
    val ex = java.nio.file.Files.createTempDirectory("graft_autocompact_ex").toString
    ExactIndex.build(corpus, "text", "doc_id", ex)
    var maxDirs = 0
    val allSurvivors = scala.collection.mutable.ArrayBuffer[Long]()
    (0 until 12).foreach { b =>
      val batch = Seq(
        (100L + b * 10, s"fresh exact content for micro batch number $b"),
        (101L + b * 10, s"fresh exact content for micro batch number $b"), // in-batch dup
        (102L + b * 10, "the quick brown fox jumps over the lazy dog near the river bank") // corpus dup
      ).toDF("doc_id", "text")
      val s = StreamingOps.incrementalExactDedupBatch(batch, "text", "doc_id",
        ex, batchId = b.toLong, autoCompactTags = 4)
      allSurvivors ++= s.select("doc_id").as[Long].collect()
      maxDirs = math.max(maxDirs, ingestDirs(ExactIndex.dataRoot(spark, ex), "digests"))
    }
    // one dir per pending tag + base; the threshold bounds it
    assert(maxDirs <= 6, s"ingest dirs must plateau at ~threshold+base, saw $maxDirs")
    assert(ingestDirs(ExactIndex.dataRoot(spark, ex), "digests") <= 5)
    // parity: each batch's min-id fresh doc survives, dups never do
    assert(allSurvivors.sorted == (0 until 12).map(b => 100L + b * 10).sorted,
      s"auto-compaction changed gate decisions: ${allSurvivors.sorted}")
    assert(ExactIndex.readMeta(spark, ex).nDocs ==
      spark.read.parquet(s"${ExactIndex.dataRoot(spark, ex)}/digests").count())
    // --- minhash gate, same protocol
    val mh = java.nio.file.Files.createTempDirectory("graft_autocompact_mh").toString
    MinhashIndex.build(corpus, "text", "doc_id", mh)
    var maxDirsMh = 0
    (0 until 8).foreach { b =>
      val batch = Seq(
        (200L + b * 10, s"utterly unrelated minhash payload variant $b with distinct words ${b * 7}"))
        .toDF("doc_id", "text")
      StreamingOps.incrementalDedupBatch(batch, "text", "doc_id", mh,
        minEstSim = 0.5, batchId = b.toLong, autoCompactTags = 3)
      maxDirsMh = math.max(maxDirsMh, ingestDirs(MinhashIndex.dataRoot(spark, mh), "buckets"))
    }
    assert(maxDirsMh <= 5, s"minhash gate dirs must plateau, saw $maxDirsMh")
  }

  test("ExactIndex.compact: marked tags fold to base with min-id keepers, unmarked survive, probes unchanged") {
    import graft.streaming.StreamingOps
    val path = java.nio.file.Files.createTempDirectory("graft_ex_compact").toString
    ExactIndex.build(corpus, "text", "doc_id", path)
    val b1 = Seq((40L, "brand new content that nothing in the corpus resembles at all")).toDF("doc_id", "text")
    val b2 = Seq((41L, "another entirely fresh document with its own unique words")).toDF("doc_id", "text")
    Seq(b1, b2).zipWithIndex.foreach { case (b, i) =>
      StreamingOps.incrementalExactDedupBatch(b, "text", "doc_id", path, i.toLong)
    }
    // unmarked crash-window tag must keep its own partition
    val b99 = Seq((99L, "an unacknowledged crash window batch document text")).toDF("doc_id", "text")
    ExactIndex.append(b99, "text", "doc_id", path, tag = "b99")
    val probeBefore = ExactIndex.probe(batch, "text", "doc_id", path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    ExactIndex.compact(spark, path)
    val ingests = spark.read.parquet(s"${ExactIndex.dataRoot(spark, path)}/digests")
      .select("ingest").distinct().as[String].collect().toSeq.sorted
    assert(ingests == Seq("b99", "base"),
      s"marked tags fold, the unmarked one survives: $ingests")
    val probeAfter = ExactIndex.probe(batch, "text", "doc_id", path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probeAfter == probeBefore, "compaction must not change probe results")
    assert(ExactIndex.readMeta(spark, path).nDocs == 5L) // 2 corpus + 2 gated + b99
    // markers survived the swap: replaying batch 0 reproduces its decision
    assert(ExactIndex.appliedMarker(spark, path, "b0").isDefined)
    val replay = StreamingOps.incrementalExactDedupBatch(b1, "text", "doc_id", path, 0L)
      .select("doc_id").as[Long].collect().toSeq
    assert(replay == Seq(40L))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"${path}_old")))
  }

  test("incrementalExactDedupStream: later micro-batches dedup against earlier survivors") {
    import org.apache.spark.sql.streaming.Trigger
    val idxPath = java.nio.file.Files.createTempDirectory("graft_ex_stream").toString
    ExactIndex.build(corpus, "text", "doc_id", idxPath)
    val srcDir = java.nio.file.Files.createTempDirectory("graft_ex_src").toString
    // batch 1: one fresh doc; batch 2: an exact copy of it (new id) + one fresh
    Seq((60L, "the very first streaming document body"))
      .toDF("doc_id", "text").write.mode("append").parquet(srcDir)
    val collected = scala.collection.mutable.ArrayBuffer[Long]()
    def drain(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING").parquet(srcDir)
      val q = graft.streaming.StreamingOps
        .incrementalExactDedupStream(stream, "text", "doc_id", idxPath) {
          (_, survivors, _) =>
            collected ++= survivors.select("doc_id").as[Long].collect()
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$srcDir/_ckpt")
        .start()
      q.awaitTermination()
    }
    drain()
    assert(collected.sorted == Seq(60L))
    Seq((61L, "the very first streaming document body"),
        (62L, "a second genuinely fresh streaming document"))
      .toDF("doc_id", "text").write.mode("append").parquet(srcDir)
    drain()
    // 61 is an exact copy of survivor 60 — gated by the advanced index
    assert(collected.sorted == Seq(60L, 62L))
  }

  test("GRAFT_INDEX_STATS observes a streaming gate batch-by-batch (r17 verdict #6)") {
    import org.apache.spark.sql.streaming.Trigger
    val idxPath = java.nio.file.Files.createTempDirectory("graft_obs_stream").toString
    ExactIndex.build(corpus, "text", "doc_id", idxPath)
    val srcDir = java.nio.file.Files.createTempDirectory("graft_obs_src").toString
    def stats() = graft.engine.GraftSql.sql(spark,
      s"SELECT last_batch_tag, last_batch_rows, pending_tags FROM " +
        s"GRAFT_INDEX_STATS('$idxPath') WHERE current").collect().head
    // before any batch: no batch marker to report
    val s0 = stats()
    assert(s0.getString(0) == "" && s0.getLong(1) == -1L, s0.toString)
    def drain(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING").parquet(srcDir)
      val q = graft.streaming.StreamingOps
        .incrementalExactDedupStream(stream, "text", "doc_id", idxPath) {
          (_, _, _) => ()
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$srcDir/_ckpt")
        .start()
      q.awaitTermination()
    }
    // batch 0: two fresh docs survive -> b0 / 2 rows / 1 foldable tag
    Seq((80L, "observability stream first fresh body"),
        (81L, "observability stream second fresh body"))
      .toDF("doc_id", "text").write.mode("append").parquet(srcDir)
    drain()
    val s1 = stats()
    assert(s1.getString(0) == "b0" && s1.getLong(1) == 2L &&
      s1.getInt(2) == 1, s1.toString)
    // batch 1: one duplicate of a survivor + one fresh -> b1 / 1 row; the
    // stats view MOVES with the stream (tag advances, counts are the
    // batch's own survivors)
    Seq((82L, "observability stream first fresh body"),
        (83L, "observability stream third fresh body"))
      .toDF("doc_id", "text").write.mode("append").parquet(srcDir)
    drain()
    val s2 = stats()
    assert(s2.getString(0) == "b1" && s2.getLong(1) == 1L &&
      s2.getInt(2) == 2, s2.toString)
  }

  test("default append tags never reuse an issued tag after compact shrinks the meta count (r15 review)") {
    // build 2 docs, append 1 under a DEFAULT tag, mark it, compact (exact
    // recount can only move nDocs down or hold) — a second default append
    // must pick a FRESH tag, not overwrite the first one's rows
    val path = java.nio.file.Files.createTempDirectory("graft_ex_tagclash").toString
    ExactIndex.build(corpus, "text", "doc_id", path)
    val b1 = Seq((70L, "first default tagged append content body")).toDF("doc_id", "text")
    ExactIndex.append(b1, "text", "doc_id", path) // default tag a<N>
    val tags1 = spark.read.parquet(s"${ExactIndex.dataRoot(spark, path)}/digests")
      .select("ingest").distinct().as[String].collect().toSet
    val firstTag = (tags1 - "base").head
    // the first tag is UNMARKED, so compact leaves its partition but
    // recounts meta exactly — the old a<nDocs> scheme would now re-issue
    // a colliding tag
    ExactIndex.compact(spark, path)
    val b2 = Seq((71L, "second default tagged append content body")).toDF("doc_id", "text")
    ExactIndex.append(b2, "text", "doc_id", path)
    val root = ExactIndex.dataRoot(spark, path)
    val tags2 = spark.read.parquet(s"$root/digests")
      .select("ingest").distinct().as[String].collect().toSet
    assert(tags2.size == 3, s"expected base + two distinct tags: $tags2")
    // and the first append's digest is still gating: an exact copy of b1
    // must be dropped
    val replay = ExactIndex.dedupBatch(
      Seq((72L, "first default tagged append content body")).toDF("doc_id", "text"),
      "text", "doc_id", path)
    assert(replay.count() == 0,
      s"first default append's rows were lost (tags: $tags2, first=$firstTag)")
  }

  test("incremental family on the sf0.001 fixture: survivors + drops partition the batch") {
    val d = graft.engine.Tables.read(spark, sfDir, "documents")
    val b = d.filter($"doc_id" % 10 >= 7)
    val c = d.filter($"doc_id" % 10 < 7)
    val nBatch = b.count()
    val exact = Dedup.incrementalExactDedup(b, c, "text", "doc_id")
    assert(exact.count() <= nBatch)
    val near = Dedup.incrementalMinhashDedup(b, c, "text", "doc_id")
    val dropped = b.join(near.select("doc_id"), Seq("doc_id"), "left_anti")
    assert(near.count() + dropped.count() == nBatch)
  }
}

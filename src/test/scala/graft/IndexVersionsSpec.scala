package graft

import graft.pipeline.{ExactIndex, IndexStats, IvfIndex, MinhashIndex}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicReference}

/** Versioned index layout (r15): maintenance (compact/retrain) commits a
  * new `v=N` tree and readers pin a version at plan creation — so probes
  * racing maintenance NEVER fail and NEVER see mixed versions. This spec
  * is the r14 verdict #2 "done" criterion: probes run CONCURRENTLY with
  * compact()/retrain() in a racing thread, continuously, and every result
  * equals the quiescent answer. */
class IndexVersionsSpec extends SparkTestBase {
  import spark.implicits._

  /** Run `body` under an explicit GC age floor (r16: GC is time-floored by
    * default; the cycle-counted asserts below pin floor 0 behavior). */
  private def withGcFloor[A](ms: Long)(body: => A): A = {
    val key = "graft.index.gc.minRetainMs"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, ms.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private val corpus = Seq(
    (10L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon")
  ).toDF("doc_id", "text")
  private val batch = Seq(
    (20L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (22L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau psi"),
    (23L, "completely different words about spark catalyst optimizer plans entirely")
  ).toDF("doc_id", "text")

  /** Run `probeOnce` continuously in a racer thread while `maintain`
    * executes `rounds` times; every probe result must equal `expected`.
    * @return probes completed during the race (sanity: > 0). */
  private def race[A](expected: A, rounds: Int)(probeOnce: => A)
                     (maintain: => Unit): Int = {
    val stop = new AtomicBoolean(false)
    val failure = new AtomicReference[Throwable](null)
    val probes = new AtomicInteger(0)
    val racer = new Thread(() => {
      while (!stop.get() && failure.get() == null) {
        try {
          val got = probeOnce
          probes.incrementAndGet()
          if (got != expected)
            failure.set(new AssertionError(
              s"probe diverged during maintenance:\n got $got\n exp $expected"))
        } catch { case t: Throwable => failure.set(t) }
      }
    })
    racer.start()
    try (1 to rounds).foreach(_ => maintain)
    finally { stop.set(true); racer.join(60000) }
    if (failure.get() != null) throw failure.get()
    probes.get()
  }

  test("MinhashIndex.probe races compact(): no failures, no mixed versions, markers survive") { withGcFloor(0L) {
    val path = java.nio.file.Files.createTempDirectory("graft_vrace_mh").toString
    MinhashIndex.build(corpus, "text", "doc_id", path)
    // a few marked ingests so compact has real folding work
    Seq((40L, "brand new content that nothing in the corpus resembles at all"),
        (41L, "another entirely fresh document with its own unique words"))
      .zipWithIndex.foreach { case ((id, text), i) =>
        val b = Seq((id, text)).toDF("doc_id", "text")
        graft.streaming.StreamingOps.incrementalDedupBatch(
          b, "text", "doc_id", path, 0.5, i.toLong)
      }
    val expected = MinhashIndex.probe(batch, "text", "doc_id", path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val n = race(expected, rounds = 3) {
      MinhashIndex.probe(batch, "text", "doc_id", path)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    } { MinhashIndex.compact(spark, path) }
    assert(n > 0, "the racer must have completed probes during maintenance")
    // markers survived three version flips
    assert(MinhashIndex.appliedMarker(spark, path, "b0").isDefined)
    assert(MinhashIndex.appliedMarker(spark, path, "b1").isDefined)
    // GC keeps current + one grace version, nothing older
    val vs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("v=")).map(_.getName).sorted.toSeq
    assert(vs.size <= 2, s"GC must keep at most current+grace: $vs")
  } }

  test("ExactIndex.dedupBatch races compact(): no failures, gate stable") { withGcFloor(0L) {
    val path = java.nio.file.Files.createTempDirectory("graft_vrace_ex").toString
    ExactIndex.build(corpus, "text", "doc_id", path)
    Seq((40L, "brand new content that nothing in the corpus resembles at all"),
        (41L, "another entirely fresh document with its own unique words"))
      .zipWithIndex.foreach { case ((id, text), i) =>
        val b = Seq((id, text)).toDF("doc_id", "text")
        graft.streaming.StreamingOps.incrementalExactDedupBatch(
          b, "text", "doc_id", path, i.toLong)
      }
    val expected = ExactIndex.dedupBatch(batch, "text", "doc_id", path)
      .select("doc_id").as[Long].collect().toSeq.sorted
    val n = race(expected, rounds = 3) {
      ExactIndex.dedupBatch(batch, "text", "doc_id", path)
        .select("doc_id").as[Long].collect().toSeq.sorted
    } { ExactIndex.compact(spark, path) }
    assert(n > 0)
    val vs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("v=")).map(_.getName).sorted.toSeq
    assert(vs.size <= 2, s"GC must keep at most current+grace: $vs")
  } }

  test("IvfIndex.topK races retrain(): no failures, identical neighbors throughout") { withGcFloor(0L) {
    def unit(v: Array[Double]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val dim = 8
    val vecs = (0L until 64L).map { i =>
      (i, unit(Array.tabulate(dim)(d =>
        math.sin(i.toDouble * (d + 1) + d).abs + 0.1)))
    }.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft_vrace_ivf").toString
    IvfIndex.build(vecs, "vec_id", "embedding", path, nLists = 4)
    val queries = vecs.filter($"vec_id" < 3)
    def serve(): Seq[(Long, Long, Double, Int)] =
      IvfIndex.topK(spark, path, queries, "vec_id", "embedding", k = 5)
        .orderBy("q_id", "rk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    // the FIRST retrain legitimately changes the answer (AUTO re-lists
    // the coarse quantizer: 4 -> 16 at this corpus); every retrain after
    // that is a deterministic fixed point (same vectors, same seeds, same
    // Lloyd schedule). Race against the fixed-point answer — any
    // divergence during the race is then a version-mix or a failure.
    IvfIndex.retrain(spark, path)
    val expected = serve()
    val n = race(expected, rounds = 2)(serve()) { IvfIndex.retrain(spark, path) }
    assert(n > 0)
    val vs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("v=")).map(_.getName).sorted.toSeq
    assert(vs.size <= 2, s"GC must keep at most current+grace: $vs")
  } }

  test("legacy layout reads transparently and the first maintenance write migrates it") { withGcFloor(0L) {
    val path = java.nio.file.Files.createTempDirectory("graft_vrace_legacy").toString
    // forge a legacy (unversioned) index by moving a versioned build's
    // data trees to the root — exactly the pre-r15 on-disk shape
    MinhashIndex.build(corpus, "text", "doc_id", path)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val v1 = new org.apache.hadoop.fs.Path(s"$path/v=1")
    for (d <- Seq("buckets", "meta")) {
      fs.rename(new org.apache.hadoop.fs.Path(v1, d),
        new org.apache.hadoop.fs.Path(s"$path/$d"))
    }
    fs.delete(v1, true)
    assert(MinhashIndex.dataRoot(spark, path) == path) // legacy fallback
    val legacyProbe = MinhashIndex.probe(batch, "text", "doc_id", path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(legacyProbe.nonEmpty)
    // first maintenance write: commits v=1, leaves legacy trees as grace
    MinhashIndex.compact(spark, path)
    assert(MinhashIndex.dataRoot(spark, path) == s"$path/v=1")
    assert(new java.io.File(s"$path/buckets").exists, "legacy tree is the grace copy")
    // second maintenance write: grace window passed — legacy trees GC'd
    MinhashIndex.compact(spark, path)
    assert(!new java.io.File(s"$path/buckets").exists, "legacy tree GC'd after grace")
    val after = MinhashIndex.probe(batch, "text", "doc_id", path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(after == legacyProbe)
  } }

  test("slow probes survive DOUBLE back-to-back maintenance under the GC age floor (r15 verdict #2)") {
    // cycle-counted GC deletes v=N-2 unconditionally, so a plan pinned just
    // before two rapid maintenance commits loses its files mid-execution.
    // With the age floor, a superseded version survives until it has been
    // non-current for minRetainMs — a plan created any time while it was
    // current therefore has that long to finish. All three index families.
    withGcFloor(600000L) {
      // --- MinhashIndex: pin a probe plan, compact twice, THEN execute it
      val mh = java.nio.file.Files.createTempDirectory("graft_floor_mh").toString
      MinhashIndex.build(corpus, "text", "doc_id", mh)
      val mhExpected = MinhashIndex.probe(batch, "text", "doc_id", mh)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val mhPinned = MinhashIndex.probe(batch, "text", "doc_id", mh) // plan pins v=1
      MinhashIndex.compact(spark, mh) // v=2
      MinhashIndex.compact(spark, mh) // v=3 — cycle-counted GC would kill v=1 here
      val got = mhPinned.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == mhExpected, "pinned probe lost files or diverged across a maintenance burst")
      val mhVs = new java.io.File(mh).listFiles().filter(_.getName.startsWith("v=")).map(_.getName).sorted.toSeq
      assert(mhVs == Seq("v=1", "v=2", "v=3"), s"age floor must retain the burst's versions: $mhVs")
      // r17 (r16 verdict #5): the stats surface reports the same picture —
      // v=3 current, v=2 the grace copy, v=1 held by the age floor
      val disp = IndexStats.stats(spark, mh)
        .select("version", "retained_by").collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(disp == Map(3 -> "current", 2 -> "grace", 1 -> "floor"),
        s"stats dispositions diverged from the GC rule: $disp")
      assert(IndexStats.stats(spark, mh).select("family").head().getString(0)
        == "minhash")

      // --- ExactIndex: same shape over the digest gate's probe
      val ex = java.nio.file.Files.createTempDirectory("graft_floor_ex").toString
      ExactIndex.build(corpus, "text", "doc_id", ex)
      val exExpected = ExactIndex.probe(batch, "text", "doc_id", ex)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exPinned = ExactIndex.probe(batch, "text", "doc_id", ex)
      ExactIndex.compact(spark, ex)
      ExactIndex.compact(spark, ex)
      assert(exPinned.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == exExpected)

      // --- IvfIndex: pin a topK plan across two retrains
      def unit(v: Array[Double]): Seq[Float] = {
        val n = math.sqrt(v.map(x => x * x).sum)
        v.map(x => (x / n).toFloat).toSeq
      }
      val vecs = (0L until 48L).map { i =>
        (i, unit(Array.tabulate(6)(d => math.cos(i.toDouble * (d + 2) + d).abs + 0.1)))
      }.toDF("vec_id", "embedding")
      val ivf = java.nio.file.Files.createTempDirectory("graft_floor_ivf").toString
      IvfIndex.build(vecs, "vec_id", "embedding", ivf, nLists = 4)
      val queries = vecs.filter($"vec_id" < 2)
      val ivfExpected = IvfIndex.topK(spark, ivf, queries, "vec_id", "embedding", k = 4)
        .orderBy("q_id", "rk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
      val ivfPinned = IvfIndex.topK(spark, ivf, queries, "vec_id", "embedding", k = 4)
        .orderBy("q_id", "rk")
      IvfIndex.retrain(spark, ivf)
      IvfIndex.retrain(spark, ivf)
      val ivfGot = ivfPinned.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
      assert(ivfGot == ivfExpected, "pinned topK plan lost files or diverged across retrain burst")
    }
    // the retained-copy cap (review r16): under a huge floor, a
    // maintenance BURST still cannot hold more than maxRetained
    // superseded copies — the oldest go first
    withGcFloor(600000L) {
      val key = "graft.index.gc.maxRetained"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "2")
      try {
        val mh3 = java.nio.file.Files.createTempDirectory("graft_floor_cap").toString
        MinhashIndex.build(corpus, "text", "doc_id", mh3) // v=1
        (1 to 5).foreach(_ => MinhashIndex.compact(spark, mh3)) // v=2..6
        val vs = new java.io.File(mh3).listFiles()
          .filter(_.getName.startsWith("v=")).map(_.getName).sorted.toSeq
        // current (v=6) + grace (v=5) + at most 2 superseded
        assert(vs.size <= 4, s"cap must bound retained copies: $vs")
        assert(vs.contains("v=6") && vs.contains("v=5"), s"newest must survive: $vs")
        val expected = MinhashIndex.probe(batch, "text", "doc_id", mh3)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(expected.nonEmpty)
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    // floor 0 restores cycle-counted GC: one more maintenance drops the backlog
    withGcFloor(0L) {
      val mh2 = java.nio.file.Files.createTempDirectory("graft_floor_gc").toString
      MinhashIndex.build(corpus, "text", "doc_id", mh2)
      MinhashIndex.compact(spark, mh2)
      MinhashIndex.compact(spark, mh2)
      MinhashIndex.compact(spark, mh2)
      val vs = new java.io.File(mh2).listFiles().filter(_.getName.startsWith("v=")).map(_.getName).sorted.toSeq
      assert(vs.size <= 2, s"floor 0 must restore current+grace GC: $vs")
    }
  }
}

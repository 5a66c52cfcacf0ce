package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Bpe, Curation}

/** Bpe.train / Bpe.encode: the Sennrich merge-learning loop and the greedy
  * encoder kernel. */
class BpeSpec extends SparkTestBase {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("hand-checkable corpus learns the known merge sequence") {
    import spark.implicits._
    // pair counts: (a,a) x3 from "aaaa"; (b,b) x2 from two "bb"s
    val corpus = Seq("aaaa bb", "bb").toDF("text")
    val merges = Bpe.train(corpus, "text", numMerges = 5)
    assert(merges == Seq(("a", "a"), ("b", "b")),
      s"got $merges") // (aa,aa) reaches only count 1 < minPairCount
    val encoded = Bpe.encode(corpus, "text", merges)
      .select("pieces").as[Seq[String]].collect().toSeq
    assert(encoded == Seq(Seq("aa", "aa", "bb"), Seq("bb")))
  }

  test("round trip: pieces of every word concatenate back to the word") {
    import spark.implicits._
    val merges = Bpe.train(docs, "text", numMerges = 30)
    assert(merges.nonEmpty)
    val bad = docs
      .select(explode(Curation.tokens(col("text"))).as("w"))
      .distinct()
      .transform(Bpe.encode(_, "w", merges))
      .select(col("w"), concat_ws("", col("pieces")).as("back"))
      .filter(col("w") =!= col("back"))
      .count()
    assert(bad == 0)
  }

  test("training is deterministic and partition-independent") {
    val a = Bpe.train(docs, "text", numMerges = 12)
    val b = Bpe.train(docs.repartition(17), "text", numMerges = 12)
    assert(a == b)
  }

  test("merges strictly reduce piece counts as the table grows") {
    import spark.implicits._
    val merges = Bpe.train(docs, "text", numMerges = 24)
    def totalPieces(ms: Seq[(String, String)]): Long =
      Bpe.encode(docs, "text", ms).select(sum(size(col("pieces")))).as[Long].collect()(0)
    val none = totalPieces(Nil)
    val half = totalPieces(merges.take(merges.size / 2))
    val full = totalPieces(merges)
    assert(none > half && half > full, s"$none / $half / $full")
  }

  test("incremental trainer matches the full-re-encode reference") {
    // train() maintains pieces incrementally (a greedy resume per
    // iteration over local-checkpointed state); trainReference()
    // re-encodes from scratch with the kernel each round. Both must learn
    // the identical merge sequence — the differential proof that the
    // incremental step equals the greedy lowest-rank encoder's state
    // evolution (including cascades re-enabling lower-rank merges).
    val incremental = Bpe.train(docs, "text", numMerges = 40)
    val reference = Bpe.trainReference(docs, "text", numMerges = 40)
    assert(incremental == reference)
    assert(incremental.size > 10, "corpus must support a non-trivial table")
  }

  test("encodePieces cascades: a new fusion can re-enable a LOWER-rank merge") {
    import spark.implicits._
    // table: rank0 = (ab, c), rank1 = (a, b); state [a, b, c]. Fusing
    // rank1 produces 'ab' adjacent to 'c', re-enabling rank0 — the greedy
    // resume must reach [abc]. A single-pair pass would stop at [ab, c]
    // (the round-9 review's counterexample shape).
    graft.functions.GridDbScalarFunctions.register(spark)
    val out = spark.sql(
      """SELECT graft_bpe_encode_pieces(array('a','b','c'),
        |  array(array('ab','c'), array('a','b'))) AS p""".stripMargin)
      .as[Seq[String]].collect()(0)
    assert(out == Seq("abc"), out.toString)
    // and nullable elements (the parquet-spill widened type) are dropped
    val withNull = spark.sql(
      """SELECT graft_bpe_encode_pieces(array('a', cast(null as string), 'b'),
        |  array(array('a','b'))) AS p""".stripMargin)
      .as[Seq[String]].collect()(0)
    assert(withNull == Seq("ab"), withNull.toString)
  }

  test("save/load round-trips the merge table in rank order") {
    val merges = Bpe.train(docs, "text", numMerges = 15)
    val path = java.nio.file.Files.createTempDirectory("bpe_artifact").toString
    Bpe.save(spark, merges, path)
    assert(Bpe.load(spark, path) == merges)
  }

  test("encode is a map-only projection (no shuffle)") {
    val merges = Seq(("t", "h"), ("th", "e"))
    val plan = Bpe.encode(docs, "text", merges)
      .select("pieces").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"), plan)
  }
}

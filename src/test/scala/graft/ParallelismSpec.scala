package graft

import graft.engine.{GraftSql, Parallelism}
import graft.queries.FuzzQueries

class ParallelismSpec extends SparkTestBase {

  test("session shuffle width derives from data bytes with a core floor") {
    import graft.engine.GraftSession.shuffleWidthFor
    val mb = 1L << 20
    // driver SFs sit under the floor: width = cores, numbers unchanged
    assert(shuffleWidthFor(100 * mb, 32) == 32)
    assert(shuffleWidthFor(0L, 32) == 32)
    // rehearsal scale: one partition per 64 MB of scan bytes — the 21 GB
    // sf100z corpus lands in the 256-512 band the r11 hand-set width
    // proved out (SCALING.md Finding 1), with no env knob
    assert(shuffleWidthFor(21L << 30, 32) == (21L << 30) / (64 * mb) + 1)
    assert(shuffleWidthFor(21L << 30, 32) > 256 &&
      shuffleWidthFor(21L << 30, 32) < 512)
    // capped so a petabyte estimate cannot demand an absurd width
    assert(shuffleWidthFor(Long.MaxValue / 2, 32) == 65536)
  }

  test("spread repartitions a mid-sized input to default parallelism") {
    // stats land between the 32 MiB floor and the ceiling:
    // ~1.7M rows x (8-byte long + 20-byte string estimate) ≈ 48 MiB
    import spark.implicits._
    val mid = spark.range(1700000).select($"id", $"id".cast("string").as("s"))
    val n = Parallelism.spread(mid.toDF()).rdd.getNumPartitions
    assert(n == spark.sparkContext.defaultParallelism,
      s"expected ${spark.sparkContext.defaultParallelism} partitions, got $n")
  }

  test("spread leaves a small input untouched (below the 32 MiB floor)") {
    // round-8 bench finding: repartitioning a sub-floor input costs more
    // (exchange + extra AQE stage) than the single-task kernel it spreads
    // — measured losing up to sf1 documents, winning 2.4x at sf10
    val docs = graft.engine.Tables.read(spark, sfDir, "documents")
    assert(Parallelism.spread(docs) eq docs)
  }

  test("spread leaves a large-stats input untouched") {
    // a crossJoin's stats are the PRODUCT of the sides — far past the
    // threshold without materializing anything
    val d = graft.engine.Tables.read(spark, sfDir, "documents")
    val big = d.crossJoin(d.select(d.col("doc_id").as("other_id")))
    assert(Parallelism.spread(big) eq big)
  }

  test("spread passes streaming inputs through untouched") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val df = MemoryStream[String].toDF()
    assert(Parallelism.spread(df) eq df)
  }

  test("GraftSql.rewrite is idempotent over the fuzz corpus and hinted forms") {
    val texts = (0 until 200).map(FuzzQueries.genSql) ++ Seq(
      "SELECT /*+ INDEX_JOIN(nation) */ * FROM t",
      "SELECT /*+ NO_INDEX_JOIN(a) LEADING(a b) */ 1",
      "SELECT /*+ BROADCAST(d) SHUFFLE_HASH(f) */ * FROM f JOIN d ON f.k = d.k",
      "SELECT EXTRACT(YEAR, TIMESTAMP '2024-03-05 00:00:00')",
      "SELECT TIMESTAMP_ADD(DAY, ts, 3) FROM events",
      "SELECT TIMESTAMPDIFF(HOUR, a, b) FROM t")
    texts.foreach { t =>
      val once = GraftSql.rewrite(t)
      assert(GraftSql.rewrite(once) == once,
        s"rewrite not idempotent for:\n$t\nfirst:\n$once\nsecond:\n${GraftSql.rewrite(once)}")
    }
  }
}

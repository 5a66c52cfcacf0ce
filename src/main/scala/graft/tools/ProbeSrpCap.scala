package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.GraftSession
import graft.pipeline.Dedup

/** A/B evidence for the r11 63-bit SRP cap removal (SCALING.md finding 3):
  * the old packed-signature sizing froze 4-band width at 15 bits/band, so
  * past ~2M vectors buckets — and verify-pair volume — grew linearly with
  * the corpus. This probe synthesizes N unit-free gaussian vectors (pure
  * hash expressions, no driver data), plants near-duplicates, and runs
  * embeddingCandidates twice at the same N:
  *   - AUTO (per-band seeded planes, r = ceil(log2(N/64)))
  *   - bits=60 (the old cap's 15 bits/band)
  * reporting wall, candidate-pair volume (pre-threshold survivors are not
  * observable from outside, so the reported count is verified cos>=minCos
  * pairs; the WALL captures the verify-volume difference), and planted
  * recall. At 8M vectors AUTO picks r=17: expect ~4x fewer bucket pairs
  * than the capped form (244-vector vs 61-vector mean buckets).
  *
  * Usage: runMain graft.tools.ProbeSrpCap [nVecs] [dim] [nPlants]
  */
object ProbeSrpCap {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 8000000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val nPlants = if (args.length > 2) args(2).toInt else 1000
    val offset = 1000000000L
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "128").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("graft-probe-srpcap"),
      shufflePartitions = parts).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)

    // unit-free gaussian vectors from xxhash64 Box-Muller (ScaleGen's
    // recipe): value depends only on (id, position) — reproducible, no RNG
    def u(tag: String, c1: org.apache.spark.sql.Column, c2: org.apache.spark.sql.Column) =
      pmod(xxhash64(lit(tag), c1, c2), lit(1000000000L)).cast("double") / 1e9
    val base = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dim)), i =>
        sqrt(lit(-2.0) * log(u("g1", col("id"), i) + lit(1e-12))) *
          cos(lit(2.0 * math.Pi) * u("g2", col("id"), i))).as("embedding"))
    val plants = base.filter(col("vec_id") < nPlants)
      .select((col("vec_id") + offset).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x * (lit(1.0) + lit(0.01) * sin(col("vec_id") * (i + lit(1)))))
          .as("embedding"))
    // materialize once so both arms pay identical input cost
    val corpus = base.union(plants).localCheckpoint(true)
    val total = corpus.count()

    for ((bits, tag) <- Seq(-1 -> "AUTO (per-band, uncapped)",
                            60 -> "old 63-bit cap (15/band)")) {
      val t0 = System.nanoTime()
      val cands = Dedup.embeddingCandidates(corpus, "embedding", "vec_id",
        minCos = 0.9, bits = bits, corpusSize = total).cache()
      val found = cands.filter(col("a") < nPlants && col("b") === col("a") + offset).count()
      val pairs = cands.count()
      cands.unpersist()
      println(f"[srpcap] $tag%-28s N=$total ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
        f"recall=${found.toDouble / nPlants}%.4f  verified-pairs=$pairs")
    }
    spark.stop()
  }
}

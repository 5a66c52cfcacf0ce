package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.{GraftSession, Tables}
import graft.pipeline.Dedup

/** Times the SCALE-PATH variants of the rehearsal's two quadratic-by-pin
  * queries (SCALING.md): the registry forms pin their hyperparameters for
  * golden/oracle stability (the retired bits=16 LSH pin;
  * the retired curation-v3 SemDeDup pin: nLists=1 = the exact all-pairs
  * oracle baseline), so at sf1 those measure the pinned small-SF config,
  * not what a production pipeline would run. This probe runs the same
  * operators with their AUTO sizing (band width ~log2(N), nLists ~sqrt(N))
  * on the same corpus. Usage: runMain graft.tools.ScaleProbe [sfDir] [mode]
  * mode=zipf probes ONLY the text-dedup growth curve (tokenJaccard +
  * minhash) on a ScaleGen zipf-vocabulary corpus — the open-vocabulary
  * measurement where the PPJoin prefix filter, not output density, bounds
  * the candidate set (SCALING.md finding 3 follow-up). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scaledata/sf1")
    val mode = if (args.length > 1) args(1) else "full"
    // beyond ~2.5M docs the local 32-partition default is the binding
    // constraint (per-partition join/aggregate state OOMs an 8g heap);
    // scale probes set partitions with the data, as a cluster deployment
    // would (SPARK_GRAFT_SHUFFLE_PARTITIONS + SPARK_DRIVER_MEM)
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("graft-scaleprobe"),
      shufflePartitions = parts)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    if (mode == "zipf") {
      import org.apache.spark.sql.functions.col
      val d = Tables.read(spark, dir, "documents")
      val total = d.count()
      // doubling curve: sub-quadratic pair growth (ratio << 4x per doubling)
      // is the pass condition — the prefix filter prunes, the output is
      // sparse, and neither happens on the 30-word corpus. Each point runs
      // twice (one JIT/codegen warm pass, the second is the reading), and
      // the PRE-VERIFY candidate count is reported alongside wall time —
      // candidates, not seconds, are the actual scale variable.
      val points = if (args.length > 2) Seq(args(2).toLong)
        else Seq(total / 4, total / 2, total)
      for (n <- points) {
        val sub = d.filter(col("doc_id") < n)
        time(s"tokenJaccard cands n=$n") {
          Dedup.tokenJaccardCandidates(sub, "text", "doc_id", 0.8).count()
        }
        (1 to 2).foreach { i =>
          time(s"tokenJaccard 0.8 n=$n #$i") {
            Dedup.tokenJaccardPairs(sub, "text", "doc_id", 0.8).count()
          }
        }
        (1 to 2).foreach { i =>
          time(s"minhash cands n=$n #$i") {
            Dedup.minhashCandidates(sub, "text", "doc_id").count()
          }
        }
      }
      spark.stop()
      return
    }

    val e = Tables.read(spark, dir, "embeddings")
    // warm the scan
    e.count()
    time("embedding_lsh AUTO bits") {
      Dedup.embeddingCandidates(e, "embedding", "vec_id", minCos = 0.45).count()
    }
    time("embedding_lsh bits=16 (pin)") {
      Dedup.embeddingCandidates(e, "embedding", "vec_id", minCos = 0.45, bits = 16).count()
    }
    time("semanticDedup AUTO nLists") {
      Dedup.semanticDedup(e, "embedding", "vec_id", minCos = 0.45).count()
    }

    // token-Jaccard at 0.8 on the 30-word-vocab corpus is OUTPUT-quadratic
    // (~24% of all pairs clear the threshold), so the full sf1 run is
    // pointless; the subset curve shows the quadratic directly
    import org.apache.spark.sql.functions.col
    val d = Tables.read(spark, dir, "documents")
    d.count()
    for (n <- Seq(2500, 5000, 10000)) {
      time(s"tokenJaccard 0.8 n=$n") {
        Dedup.tokenJaccardPairs(d.filter(col("doc_id") < n), "text", "doc_id", 0.8).count()
      }
    }

    // round-6 additions: both token-linear by design — ratios near the
    // data ratio are the pass condition
    time("exactSubstringDedup k=20") {
      Dedup.exactSubstringDedup(d, "text", "doc_id", chunkTokens = 20).count()
    }
    time("dsirWeights src0 target") {
      graft.pipeline.Curation.dsirWeights(d, "doc_id", "text",
        d.filter(col("source") === "src0"), "text").count()
    }
    spark.stop()
  }
}

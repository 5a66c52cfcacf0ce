package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{GraftSession, Tables}
import graft.pipeline.Dedup

/** Planted-ground-truth recall AT SCALE: PlantedTruthSpec proves the
  * dedup operators find buried structure on spec-sized corpora; this
  * probe buries the structure in the multi-million-row zipf corpora and
  * measures the PRODUCTION (AUTO-sized) paths end-to-end — the question
  * a 100 TB deployment actually asks: what recall does the scale-safe
  * band sizing retain as N grows?
  *
  * Text plants: a sentinel token PREPENDED to a copy of each of nPlants
  * docs (shingle Jaccard n/(n+1) ~ 0.99). Vector plants: deterministic
  * ~1% per-element perturbation (cos ~ 0.998).
  * Usage: runMain graft.tools.ProbePlantedScale <sfDir> [nPlants]
  */
object ProbePlantedScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scaledata/zipf100")
    val nPlants = if (args.length > 1) args(1).toInt else 1000
    val offset = 1000000000L
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("graft-probe-planted"),
      shufflePartitions = parts).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)

    def time(name: String)(f: => (Long, Long)): Unit = {
      val t0 = System.nanoTime()
      val (found, total) = f
      println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
        f"recall=${found.toDouble / nPlants}%.4f  candidates=$total")
    }

    val docs = Tables.read(spark, dir, "documents").select("doc_id", "text")
    val textPlants = docs.filter(col("doc_id") < nPlants)
      .select((col("doc_id") + offset).as("doc_id"),
        concat(lit("zzqxplantsentinel "), col("text")).as("text"))
    val textCorpus = docs.union(textPlants)
    textCorpus.count()
    time(s"minhash plants@${nPlants} in 5M") {
      val cands = Dedup.minhashCandidates(textCorpus, "text", "doc_id").cache()
      val found = cands.filter(col("a") < nPlants && col("b") === col("a") + offset).count()
      val total = cands.count()
      cands.unpersist()
      (found, total)
    }

    val vecs = Tables.read(spark, dir, "embeddings").select("vec_id", "embedding")
    // deterministic ~1% perturbation; sin() of (id, position) is a pure
    // function, so the plant set is reproducible
    val vecPlants = vecs.filter(col("vec_id") < nPlants)
      .select((col("vec_id") + offset).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x * (lit(1.0) + lit(0.01) * sin(col("vec_id") * (i + lit(1)))))
          .as("embedding"))
    val vecCorpus = vecs.union(vecPlants)
    vecCorpus.count()
    time(s"srp-lsh AUTO plants@${nPlants} in 2M") {
      val cands = Dedup.embeddingCandidates(vecCorpus, "embedding", "vec_id",
        minCos = 0.9).cache()
      val found = cands.filter(col("a") < nPlants && col("b") === col("a") + offset).count()
      val total = cands.count()
      cands.unpersist()
      (found, total)
    }
    spark.stop()
  }
}

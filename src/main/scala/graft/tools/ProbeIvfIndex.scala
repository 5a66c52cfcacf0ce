package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{IvfIndex, Similarity}

/** Scale probe for the persisted IVF index: build cost, indexed-query cost
  * vs brute force, and the pruning ratio (files read vs total).
  * Usage: runMain graft.tools.ProbeIvfIndex <sfDir> */
object ProbeIvfIndex {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scaledata/sf10")
    val spark = graft.engine.GraftSession.configure(
      SparkSession.builder().master("local[32]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.GraftSession.prepare(spark)
    val e = graft.engine.Tables.read(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 20)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_probe").toString
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("ivf index build (AUTO lists)") { IvfIndex.build(e, "vec_id", "embedding", path); e.count() }
    // warm then measure the indexed query twice
    time("indexed topK warm")(IvfIndex.topK(spark, path, q, "vec_id", "embedding", k = 10).count())
    time("indexed topK")(IvfIndex.topK(spark, path, q, "vec_id", "embedding", k = 10).count())
    time("brute-force topK")(Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 10).count())
    val root = graft.pipeline.IvfIndex.dataRoot(spark, path)
    val total = spark.read.parquet(s"$root/vectors").inputFiles.length
    val cents = spark.read.parquet(s"$root/centroids").count()
    println(s"[probe] lists=$cents totalFiles=$total")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.GraftSession
import graft.pipeline.{IvfIndex, Similarity}

/** Scale probe for the r14 filtered-ANN serve (SCALING.md evidence):
  * build a label-attributed IVF index over the zipf100 embeddings
  * (2M × 64d, 10 labels) and time, against the same index,
  *   - the unfiltered serve (baseline),
  *   - the filtered serve at ~50% selectivity (label < 5 — the
  *     overfetch path: probe widens 4 → 8, pruning kept),
  *   - the filtered serve at ~0.15% selectivity (the brute-guard path:
  *     all lists scanned once under the predicate),
  * plus the in-memory kernel on the brute subset for reference. Golden-
  * only ops are checked at 500-row scale; every new op gets a zipf probe
  * before its behavior at 100 TB is trusted (r11 lesson).
  *
  * Usage: runMain graft.tools.ProbeFilteredAnn [embDir] [indexDir]
  */
object ProbeFilteredAnn {
  def main(args: Array[String]): Unit = {
    val embDir = args.lift(0).getOrElse("scaledata/zipf100/embeddings.parquet")
    val idxDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_probe_fann").toString)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64").toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(embDir)
    val n = e.count()
    def time[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[fann] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    if (!new java.io.File(s"${graft.pipeline.IvfIndex.dataRoot(spark, idxDir)}/centroids").exists)
      time(s"build index ($n vecs, attr label)") {
        IvfIndex.build(e, "vec_id", "embedding", idxDir, corpusSize = n,
          attrCols = Seq("label"))
      }
    val queries = e.filter(col("vec_id") < 50)
    def run(tag: String, dir: String,
            pred: Option[org.apache.spark.sql.Column]): Unit = {
      // 2 timed runs: first includes the predicate's selectivity counts
      for (i <- 1 to 2)
        time(s"$tag run$i") {
          IvfIndex.topK(spark, dir, queries, "vec_id", "embedding",
            k = 10, predicate = pred).count()
        }
    }
    run("unfiltered", idxDir, None)
    run("filtered s~0.5 (label<5)", idxDir, Some(col("label") < 5))
    run("filtered s~0.0015 (brute guard)", idxDir,
      Some(col("label") === 3 && col("vec_id") % 67 === 3))
    time("kernel brute on same subset") {
      Similarity.bruteForceTopK(
        e.filter(col("label") === 3 && col("vec_id") % 67 === 3), queries,
        "vec_id", "embedding", k = 10).count()
    }

    // ---- r15 A/B (r14 verdict #8): attr-partitioned lists — the vectors
    // tree co-bucketed by (cluster, label) so a label predicate prunes
    // DIRECTORIES instead of opening every probed list's file ----
    val partDir = args.lift(2).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_probe_fann_part").toString)
    if (!new java.io.File(s"${IvfIndex.dataRoot(spark, partDir)}/centroids").exists)
      time(s"build attr-partitioned index ($n vecs)") {
        IvfIndex.build(e, "vec_id", "embedding", partDir, corpusSize = n,
          attrCols = Seq("label"), attrPartitionBy = Seq("label"))
      }
    run("PART unfiltered", partDir, None)
    run("PART filtered s~0.5 (label<5)", partDir, Some(col("label") < 5))
    run("PART filtered s~0.0015 (brute guard)", partDir,
      Some(col("label") === 3 && col("vec_id") % 67 === 3))
    spark.stop()
  }
}

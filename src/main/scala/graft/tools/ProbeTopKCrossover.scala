package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Measures the window-vs-capped rank crossover for topKPerQuery
  * (Similarity.CappedRankThreshold): times bruteForceTopK's two rank forms
  * at the benched sf0.1 shape (~30k candidates) and at synthetic ~3M / ~12M
  * candidate shapes. Usage: runMain graft.tools.ProbeTopKCrossover [sfDir] */
object ProbeTopKCrossover {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GridDbScalarFunctions.register(spark)

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def bench(label: String, reps: Int)(f: => Long): Unit = {
      val ts = (1 to reps).map(_ => time(f)).sorted
      println(f"$label%-42s median=${ts(ts.size / 2)}%7.3f s")
    }

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = e.count()
    // sf0.1 benched shape: 5 queries x corpus
    for (qn <- Seq(50L, 150L, 300L)) {
      val q = e.filter(col("vec_id") < qn)
      bench(s"capped  n=$n q=$qn (cand=${n * qn})", 7) {
        Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 10).count()
      }
      bench(s"window  n=$n q=$qn (cand=${n * qn})", 7) {
        Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 10,
          corpusSize = 1L, queryCount = 1L).count() // hint 1 -> window path
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.GraftSession
import graft.pipeline.Similarity

/** A/B the fused graft_pq_adc kernel against the interpreted
  * aggregate(zip_with(..element_at..)) fold it replaced, over identical
  * encoded frames at zipf100 scale (2M corpus × 5 queries = 10M per-pair
  * ADC evaluations, rerank disabled so the rank stage is the only other
  * cost). Also asserts the two scores agree bit-for-bit on a sample. */
object ProbePqAdc {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scaledata/zipf100")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("graft-probe-pqadc"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 5)
    println(s"[probe] corpus rows=${e.count()}")

    val (m, kCodes) = (8, 16)
    // shared plan prefix: train/encode once per run; timing isolates the
    // per-pair ip formulation (same join, same rank)
    def run(label: String, fused: Boolean, iters: Int): Unit =
      (1 to iters).foreach { i =>
        time(s"$label #$i") {
          val df = Similarity.pqTopK(e, q, "vec_id", "embedding", k = 10,
            m = m, kCodes = kCodes, rerank = 0, trainFraction = 0.01,
            useFusedAdc = fused)
          df.count()
        }
      }
    run("ADC fused kernel", fused = true, iters = 2)
    // 2nd arg "skipHof" measures fused-only (the PRE-staging-fix encode
    // made even one leg at 2M outrun a 19-minute budget; post-fix both
    // legs run ~40 s there, so defaults A/B everywhere)
    if (!(args.length > 1 && args(1) == "skipHof")) {
      run("ADC interpreted HOF", fused = false, iters = 2)
      val a = Similarity.pqTopK(e, q, "vec_id", "embedding", k = 10,
        m = m, kCodes = kCodes, rerank = 0, trainFraction = 0.01,
        useFusedAdc = false).collect().map(_.toSeq).toSet
      val b = Similarity.pqTopK(e, q, "vec_id", "embedding", k = 10,
        m = m, kCodes = kCodes, rerank = 0, trainFraction = 0.01,
        useFusedAdc = true).collect().map(_.toSeq).toSet
      println(s"[probe] bit-parity of the two forms: ${a == b} (${a.size} rows)")
    }
    spark.stop()
  }
}

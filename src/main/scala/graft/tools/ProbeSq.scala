package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.GraftSession
import graft.pipeline.{Quantize, Similarity}

/** SQ8 scale probe over the zipf embeddings (2M × 64 float at zipf100):
  * measures the two claims that matter at 100 TB —
  *  1. STORAGE: parquet size of the int8 code column vs the raw float
  *     vectors (the reason to quantize at all);
  *  2. SERVING: wall for top-k over decode-from-codes vs over raw floats,
  *     train included once (decode adds 2 flops/element to a scan that the
  *     smaller files make cheaper to read).
  * Also differentially re-checks recall@10 vs exact brute force at this
  * scale (the spec pins it at 500 vectors; drift with corpus size would
  * mean a stats/clamp bug, not quantization noise).
  */
object ProbeSq {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scaledata/zipf100")
    val out = if (args.length > 1) args(1) else "/tmp/probe_sq"
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("graft-probe-sq"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def dirSize(p: String): Long = graft.engine.TableStats.treeSize(p)

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    println(s"[probe] corpus rows=$n")

    val stats = time("sqTrain (per-dim min/max)") {
      Quantize.sqTrain(e, "embedding")
    }

    val codesPath = s"$out/codes.parquet"
    val rawPath = s"$out/raw.parquet"
    time("encode + write codes parquet") {
      e.select(col("vec_id"),
          Quantize.sqEncode(col("embedding"), stats).as("codes"))
        .write.mode("overwrite").parquet(codesPath)
    }
    time("write raw parquet (baseline)") {
      e.write.mode("overwrite").parquet(rawPath)
    }
    val (szC, szR) = (dirSize(codesPath), dirSize(rawPath))
    println(f"[probe] codes ${szC / 1e6}%.1f MB vs raw ${szR / 1e6}%.1f MB -> ${szR.toDouble / szC}%.2fx smaller")

    val q = e.filter(col("vec_id") < 5)
    (1 to 2).foreach { i =>
      time(s"top-k raw floats #$i") {
        Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 10,
          corpusSize = n, queryCount = 5L).count()
      }
    }
    val codes = spark.read.parquet(codesPath)
    val qd = q.select(col("vec_id").as("q_id"),
      transform(col("embedding"), _.cast("double")).as("qv"))
    (1 to 2).foreach { i =>
      time(s"top-k interpreted decode #$i") {
        val dec = codes.select(col("vec_id").as("c_id"),
          Quantize.sqDecode(col("codes"), stats).as("cv"))
        val scored = dec.join(broadcast(qd), col("q_id") =!= col("c_id"))
          .select(col("q_id"), col("c_id"),
            round(Similarity.cosine(col("qv"), col("cv")), 4).as("cos"))
        Similarity.topKPerQuery(scored, 10, n * 5L).count()
      }
    }
    (1 to 2).foreach { i =>
      time(s"top-k fused sq_cosine #$i") {
        val scored = codes.select(col("vec_id").as("c_id"), col("codes"))
          .join(broadcast(qd), col("q_id") =!= col("c_id"))
          .select(col("q_id"), col("c_id"),
            round(Quantize.sqCosine(col("qv"), col("codes"), stats), 4).as("cos"))
        Similarity.topKPerQuery(scored, 10, n * 5L).count()
      }
    }

    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 10)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq = Quantize.sqTopK(e, q, "vec_id", "embedding", k = 10)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"[probe] recall@10 vs exact: ${(sq & exact).size.toDouble / exact.size}%.3f")

    // persisted IVF: raw vs sq8 codec — index size, serving wall, and the
    // sq8 index's recall against the raw index's results
    import graft.pipeline.IvfIndex
    val rawIdx = s"$out/ivf_raw"
    val sqIdx = s"$out/ivf_sq"
    time("IvfIndex.build raw") {
      IvfIndex.build(e, "vec_id", "embedding", rawIdx, corpusSize = n)
    }
    time("IvfIndex.build sq8") {
      IvfIndex.build(e, "vec_id", "embedding", sqIdx, corpusSize = n, codec = "sq8")
    }
    val (vR, vS) = (dirSize(s"${graft.pipeline.IvfIndex.dataRoot(spark, rawIdx)}/vectors"),
      dirSize(s"${graft.pipeline.IvfIndex.dataRoot(spark, sqIdx)}/vectors"))
    println(f"[probe] index lists sq8 ${vS / 1e6}%.1f MB vs raw ${vR / 1e6}%.1f MB -> ${vR.toDouble / vS}%.2fx smaller")
    var rawTop: Set[(Long, Long)] = null
    (1 to 2).foreach { i =>
      time(s"indexed serve raw #$i") {
        rawTop = IvfIndex.topK(spark, rawIdx, q, "vec_id", "embedding", k = 10)
          .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
    }
    var sqTop: Set[(Long, Long)] = null
    (1 to 2).foreach { i =>
      time(s"indexed serve sq8 #$i") {
        sqTop = IvfIndex.topK(spark, sqIdx, q, "vec_id", "embedding", k = 10)
          .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
    }
    println(f"[probe] sq8-index recall vs raw index: ${(sqTop & rawTop).size.toDouble / rawTop.size}%.3f")
    spark.stop()
  }
}

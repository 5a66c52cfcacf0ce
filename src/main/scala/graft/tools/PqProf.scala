package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Ad-hoc PQ diagnostics: reconstruction error + recall vs brute force on
  * the test embeddings, across (m, kCodes, steps). */
object PqProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val e = graft.engine.Tables.read(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 3)
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet

    for (m <- Seq(8, 16); k <- Seq(16, 32); st <- Seq(1, 4);
         rr <- Seq(0, 20, 50)) {
      val pq = Similarity.pqTopK(e, q, "vec_id", "embedding", k = 5,
          m = m, kCodes = k, steps = st, rerank = rr)
      val got = pq.select("q_id", "c_id").as[(Long, Long)].collect().toSet
      val recall = (bf intersect got).size.toDouble / bf.size
      println(f"m=$m%2d k=$k%2d steps=$st rerank=$rr%2d recall=$recall%.3f")
    }
    spark.stop()
  }
}

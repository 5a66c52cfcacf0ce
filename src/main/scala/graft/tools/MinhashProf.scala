package graft.tools
import org.apache.spark.sql.functions._
object MinhashProf {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.local()
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $name%-22s ${(System.nanoTime()-t0)/1e9}%.3f s  rows=$n")
    }
    // warm
    graft.pipeline.Dedup.minhashSignatures(docs, "text", "doc_id", 3, 16).count()
    time("tokens+explode")(docs.select(explode(split(lower(col("text")), " "))).count())
    time("shingles+explode")(docs.select(explode(graft.pipeline.Dedup.shingles("text", 3))).count())
    time("sig (16 min-aggs)")(graft.pipeline.Dedup.minhashSignatures(docs, "text", "doc_id", 3, 16).count())
    time("full candidates")(graft.pipeline.Dedup.minhashCandidates(docs, "text", "doc_id").count())
    time("full candidates 2")(graft.pipeline.Dedup.minhashCandidates(docs, "text", "doc_id").count())
    spark.stop()
  }
}

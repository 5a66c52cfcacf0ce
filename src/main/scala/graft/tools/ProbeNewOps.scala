package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{GraftSession, Tables}
import graft.pipeline.{Bpe, Curation, TextAnalysis}

/** Scale probes for the round-8 second-session operators, run on ScaleGen
  * zipf corpora (50k terms, realistic token distribution) at sf1 -> sf10:
  * per-source top-k cap (graft_top_k aggregate), Misra-Gries heavy
  * hitters, Bloom decontamination, BPE train + encode. Results land in
  * SCALING.md. Usage: runMain graft.tools.ProbeNewOps <sfDir>
  */
object ProbeNewOps {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scaledata/zipf1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("graft-probe-newops"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val d = Tables.read(spark, dir, "documents")
    d.count() // warm the scan

    (1 to 2).foreach { i =>
      time(s"capPerSource k=7 #$i") {
        Curation.capPerGroupByScore(d, "source", "n_chars", "doc_id", 7).count()
      }
    }
    (1 to 2).foreach { i =>
      time(s"heavyHitters 1% m=256 #$i") {
        TextAnalysis.heavyHitters(d, "text", 0.01, 256).count()
      }
    }
    (1 to 2).foreach { i =>
      time(s"bloomDecontaminate n=3 #$i") {
        Curation.bloomDecontaminate(
          d.filter(col("doc_id") % 97 =!= 0), "doc_id", "text",
          d.filter(col("doc_id") % 97 === 0), "text", n = 3, fpp = 1e-5).count()
      }
    }
    var merges: Seq[(String, String)] = Nil
    time("bpe train 40 merges") {
      merges = Bpe.train(d, "text", numMerges = 40)
      merges.size.toLong
    }
    (1 to 2).foreach { i =>
      time(s"bpe encode #$i") {
        Bpe.encode(d, "text", merges).select(sum(size(col("pieces"))))
          .collect()(0).getLong(0)
      }
    }
    spark.stop()
  }
}

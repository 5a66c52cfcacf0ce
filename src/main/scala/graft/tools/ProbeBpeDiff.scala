package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.{GraftSession, Tables}
import graft.pipeline.Bpe

/** One-off differential probe: the round-9 incremental trainer vs the
  * full-re-encode reference at the same corpus and merge count — the
  * wall-clock complement to BpeSpec's sequence-equality test.
  * Usage: runMain graft.tools.ProbeBpeDiff <sfDir> [numMerges] */
object ProbeBpeDiff {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scaledata/zipf10")
    val merges = if (args.length > 1) args(1).toInt else 40
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("graft-probe-bpediff"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)
    val d = Tables.read(spark, dir, "documents")
    d.count()
    def time(name: String)(f: => Seq[(String, String)]): Seq[(String, String)] = {
      val t0 = System.nanoTime()
      val res = f
      println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  merges=${res.size}")
      res
    }
    val inc = time(s"bpe train incremental x$merges") { Bpe.train(d, "text", merges) }
    val ref = time(s"bpe train reference   x$merges") { Bpe.trainReference(d, "text", merges) }
    println(s"[probe] sequences equal: ${inc == ref}")
    spark.stop()
  }
}

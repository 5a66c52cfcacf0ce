package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{GraftSession, Tables}
import graft.pipeline.{Dedup, ExactIndex, MinhashIndex}

/** Scale probe for the incremental dedup family (r14): batch = doc_id%10
  * >= 7, corpus = the rest. Times the exact anti-join gate, the direct
  * cross band join, and the persisted-index build/probe/append cycle at
  * the given SF; run at two SFs, the wall ratios land in SCALING.md.
  * Usage: runMain graft.tools.ProbeIncremental <sfDir> [ops] [reps]
  *   ops in {all, exact, minhash} (r16: the long-doc crossover reruns
  *   measure one family per invocation), reps = timings per op (default 2).
  */
object ProbeIncremental {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ops = if (args.length > 1) args(1) else "all"
    require(Seq("all", "exact", "minhash").contains(ops),
      s"ops must be all|exact|minhash, got $ops")
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("graft-probe-incr"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val d = Tables.read(spark, dir, "documents")
    val batch = d.filter(col("doc_id") % 10 >= 7)
    val corpus = d.filter(col("doc_id") % 10 < 7)
    val avgChars = d.agg(avg(length(col("text")))).head().getDouble(0)
    println(f"[probe] $dir: batch=${batch.count()} corpus=${corpus.count()} avg_chars=$avgChars%.0f")

    if (ops == "all" || ops == "exact") {
      (1 to reps).foreach { i =>
        time(s"incrementalExactDedup #$i") {
          Dedup.incrementalExactDedup(batch, corpus, "text", "doc_id").count()
        }
      }
    }
    if (ops == "all" || ops == "minhash") {
      (1 to reps).foreach { i =>
        time(s"crossMinhashCandidates #$i") {
          Dedup.crossMinhashCandidates(batch, corpus, "text", "doc_id").count()
        }
      }
      (1 to reps).foreach { i =>
        time(s"incrementalMinhashDedup #$i") {
          Dedup.incrementalMinhashDedup(batch, corpus, "text", "doc_id").count()
        }
      }
      val idx = java.nio.file.Files.createTempDirectory("graft_mh_probe").toString
      time("MinhashIndex.build (corpus)") {
        MinhashIndex.build(corpus, "text", "doc_id", idx); 0L
      }
      (1 to reps).foreach { i =>
        time(s"MinhashIndex.probe #$i") {
          MinhashIndex.probe(batch, "text", "doc_id", idx).count()
        }
      }
      time("dedupBatch + append cycle") {
        val surv = MinhashIndex.dedupBatch(batch, "text", "doc_id", idx)
          .localCheckpoint()
        MinhashIndex.append(surv, "text", "doc_id", idx)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idx))
    }

    if (ops == "all" || ops == "exact") {
      // exact-digest index (r15): the probe must beat the direct gate's
      // per-ingest corpus re-digest once the corpus dwarfs the batch
      val exIdx = java.nio.file.Files.createTempDirectory("graft_ex_probe").toString
      time("ExactIndex.build (corpus)") {
        ExactIndex.build(corpus, "text", "doc_id", exIdx); 0L
      }
      (1 to reps).foreach { i =>
        time(s"ExactIndex.dedupBatch #$i") {
          ExactIndex.dedupBatch(batch, "text", "doc_id", exIdx).count()
        }
      }
      time("ExactIndex gate + append cycle") {
        val surv = ExactIndex.dedupBatch(batch, "text", "doc_id", exIdx)
          .localCheckpoint()
        ExactIndex.append(surv, "text", "doc_id", exIdx)
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(exIdx))
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Append-cost flatness probe for the per-tag ExactIndex meta (r17, r16
  * verdict #6): the r16 append footer-counted the WHOLE digest tree, so
  * the k-th append listed and footer-read k+1 tag directories — O(k)
  * per append, O(n²) for an n-append ingest run between compactions.
  * With tagmeta the k-th append footer-reads ONE directory (its own tag)
  * and sums the rest from the stored counts. This probe runs `n` small
  * appends against a built index WITHOUT compaction and prints each
  * wall, then the first-quartile vs last-quartile means — flat means the
  * per-append cost no longer grows with the tag count.
  *
  * Usage: runMain graft.tools.ProbeTagMeta <sfDir> [nAppends] [batchRows]
  */
object ProbeTagMeta {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args.lift(1).map(_.toInt).getOrElse(60)
    val batchRows = args.lift(2).map(_.toInt).getOrElse(500)
    val spark = graft.engine.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.engine.Tables.read(spark, sfDir, "documents")
      .select("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_tagmeta_probe")
      .toString + "/ix"
    graft.pipeline.ExactIndex.build(
      d.filter(col("doc_id") % 2 === 0), "text", "doc_id", path)
    val walls = (0 until n).map { i =>
      // disjoint fresh texts per batch so every append stores batchRows
      val batch = spark.range(batchRows)
        .select((col("id") + 10000000L + i.toLong * batchRows).as("doc_id"),
          concat(lit(s"probe batch $i row "), col("id")).as("text"))
      val t0 = System.nanoTime()
      graft.pipeline.ExactIndex.append(batch, "text", "doc_id", path,
        batchSize = batchRows, tag = f"p$i%04d")
      (System.nanoTime() - t0) / 1e9
    }
    walls.zipWithIndex.foreach { case (w, i) =>
      println(f"[tagmeta] append $i%3d: $w%6.3f s")
    }
    val q = n / 4
    val first = walls.take(q).sum / q
    val last = walls.takeRight(q).sum / q
    println(f"[tagmeta] first-quartile mean $first%.3f s, " +
      f"last-quartile mean $last%.3f s, ratio ${last / first}%.2f " +
      f"(tags at end: ${n + 1})")
    println(s"""{"metric":"tagmeta_append","n":$n,"batch_rows":$batchRows,""" +
      f""""first_q_mean_s":$first%.3f,"last_q_mean_s":$last%.3f,""" +
      f""""ratio":${last / first}%.2f}""")
    spark.stop()
  }
}

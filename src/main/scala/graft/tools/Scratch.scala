package graft.tools

import graft.engine.{GraftSession, Tables}
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** Ad-hoc profiling scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(16)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.read(spark, dir, "documents")
    println("docs=" + docs.count())
    val sig = Dedup.minhashSignatures(docs, "text", "doc_id", 3, 16)
    val t0 = System.nanoTime(); sig.count()
    println(f"sig time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    val bandCols = (0 until 4).map { b =>
      xxhash64(concat_ws(",", (0 until 4).map(i => col("sig").getItem(b * 4 + i).cast("string")): _*))
    }
    val banded = sig.select(col("id"), posexplode(array(bandCols: _*)))
    val t1 = System.nanoTime()
    val cand = banded.groupBy("pos", "col").count().filter(col("count") > 1)
      .agg(sum(col("count") * (col("count") - 1) / 2)).collect()(0)
    println(f"cand pairs=$cand time=${(System.nanoTime() - t1) / 1e9}%.2fs")
    spark.stop()
  }
}

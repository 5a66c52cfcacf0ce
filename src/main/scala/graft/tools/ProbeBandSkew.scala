package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import graft.engine.{GraftSession, TableStats}

/** Skew probe for the banded minhash/LSH joins at rehearsal SFs (r19,
  * VERDICT #5 / guide §2.5): runs the two banded dedup bench queries and
  * reports, per stage, the max/median task duration and shuffle-read
  * ratios — the stage-level evidence the skew verdict needs — plus the
  * direct (band, bucket) key distribution of the minhash corpus sketch
  * (top bucket's share of exploded rows). A max/median beyond ~5-10x
  * marks a salting candidate; below that the zipf corpus is NOT skewing
  * the band keys and the joins are left alone.
  * Usage: runMain graft.tools.ProbeBandSkew [sfDir]
  */
object ProbeBandSkew {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scaledata/sf10z")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = GraftSession.shuffleWidthFor(
        TableStats.treeSize(dir), cpus.toInt)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-stage task metrics, keyed by stageId
    val tasks = new java.util.concurrent.ConcurrentHashMap[
      Int, scala.collection.mutable.ArrayBuffer[(Long, Long)]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) {
          val buf = tasks.computeIfAbsent(e.stageId,
            _ => scala.collection.mutable.ArrayBuffer[(Long, Long)]())
          buf.synchronized {
            buf += ((e.taskInfo.duration,
              e.taskMetrics.shuffleReadMetrics.totalBytesRead))
            ()
          }
        }
    })

    for (name <- Seq("q_dedup_minhash", "q_dedup_embedding_lsh_auto")) {
      val q = graft.queries.Registry.byName(name)
      q.build(spark, dir).count() // warm
      tasks.clear()
      q.build(spark, dir).count()
      Thread.sleep(2000) // listener drain
      println(s"== $name ==")
      import scala.jdk.CollectionConverters._
      tasks.asScala.toSeq.sortBy(_._1).foreach { case (sid, buf) =>
        val ds = buf.map(_._1).sorted
        val rs = buf.map(_._2).sorted
        if (ds.length > 1 && ds.max > 500) { // only stages with real work
          val dMed = math.max(ds(ds.length / 2), 1L)
          val rMed = math.max(rs(rs.length / 2), 1L)
          println(f"stage=$sid%4d tasks=${ds.length}%4d " +
            f"durMax/med=${ds.max.toDouble / dMed}%5.1f (max=${ds.max}%6d ms) " +
            f"readMax/med=${rs.max.toDouble / rMed}%5.1f (max=${rs.max / 1e6}%8.2f MB)")
        }
      }
    }

    // direct band-key distribution of the corpus sketch under zipf
    // (mirror of Dedup.bandRows — that helper is package-private)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (k, bands) = (16, 4)
    val r0 = k / bands
    val bandCols = (0 until bands).map { b =>
      xxhash64(concat_ws(",",
        (0 until r0).map(i => col("sig").getItem(b * r0 + i).cast("string")): _*))
    }
    val rows = graft.pipeline.Dedup
      .minhashSignatures(docs, "text", "doc_id", 3, k)
      .select(col("id"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val total = rows.count()
    val top = rows.groupBy("band", "bucket").count()
      .orderBy(desc("count")).limit(10).collect()
    println(s"== band-key distribution (minhash sketch, $total exploded rows) ==")
    top.foreach(r => println(
      f"band=${r.getInt(0)}%2d bucket=${r.getLong(1)}%20d n=${r.getLong(2)}%8d " +
        f"share=${r.getLong(2) * 100.0 / total}%6.3f%%"))
    spark.stop()
  }
}

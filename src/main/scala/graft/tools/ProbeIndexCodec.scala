package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{GraftSession, TableStats}
import graft.pipeline.{IvfIndex, MinhashIndex}

/** Parquet-codec A/B for the PERSISTED INDEX TREES (r19, guide §6):
  * build an IVF index and a MinHash bucket index from the same corpus
  * under each codec (spark.sql.parquet.compression.codec is a runtime SQL
  * conf, so one JVM alternates fairly), then report build wall, tree bytes
  * on disk, and warm serve wall. The decision metric for 100 TB is
  * bytes-on-disk at no serve regression.
  * Usage: runMain graft.tools.ProbeIndexCodec [sfDir] [iters]
  */
object ProbeIndexCodec {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scaledata/sf10z")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = GraftSession.shuffleWidthFor(
        TableStats.treeSize(dir), cpus.toInt)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val queries = embs.filter(col("vec_id") < 5)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    for (codec <- Seq("snappy", "zstd", "snappy")) {
      spark.conf.set("spark.sql.parquet.compression.codec", codec)
      val ivfPath = java.nio.file.Files.createTempDirectory(s"probe_ivf_$codec").toString
      val (_, tBuildIvf) = timed {
        IvfIndex.build(embs, "vec_id", "embedding", ivfPath, nLists = 16)
      }
      val ivfBytes = TableStats.treeSize(ivfPath)
      // warm serves
      IvfIndex.topK(spark, ivfPath, queries, "vec_id", "embedding", k = 10).count()
      val serves = (1 to iters).map { _ =>
        timed(IvfIndex.topK(spark, ivfPath, queries,
          "vec_id", "embedding", k = 10).count())._2
      }.sorted
      println(f"PROBE ivf     codec=$codec%-6s build=$tBuildIvf%6.2f s " +
        f"bytes=${ivfBytes / 1e6}%8.1f MB serveMedian=${serves(serves.length / 2)}%.3f " +
        f"serveMin=${serves.head}%.3f")

      val mhPath = java.nio.file.Files.createTempDirectory(s"probe_mh_$codec").toString
      val (_, tBuildMh) = timed {
        MinhashIndex.build(docs, "text", "doc_id", mhPath)
      }
      val mhBytes = TableStats.treeSize(mhPath)
      val batch = docs.filter(col("doc_id") % 97 === 0)
      MinhashIndex.probe(batch, "text", "doc_id", mhPath, 0.8).count()
      val probes = (1 to iters).map { _ =>
        timed(MinhashIndex.probe(batch, "text", "doc_id", mhPath, 0.8).count())._2
      }.sorted
      println(f"PROBE minhash codec=$codec%-6s build=$tBuildMh%6.2f s " +
        f"bytes=${mhBytes / 1e6}%8.1f MB serveMedian=${probes(probes.length / 2)}%.3f " +
        f"serveMin=${probes.head}%.3f")
      // clean as we go — index trees at rehearsal SFs fill /tmp fast
      def rm(p: String): Unit = {
        def loop(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles).getOrElse(Array()).foreach(loop)
          f.delete(); ()
        }
        loop(new java.io.File(p))
      }
      rm(ivfPath); rm(mhPath)
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{GraftSession, Tables}
import graft.pipeline.IvfIndex

/** Planted-recall decay of [[IvfIndex.append]] under frozen centroids
  * (r10 judge ask #3): build the index on a 1M-vector base, append
  * 10% / 50% / 100% more post-build, and measure whether a planted
  * near-duplicate APPENDED after the build is still found next to its
  * in-build original (k=10, nProbe=4, plants at cos ~0.998 — the same
  * planting discipline as ProbePlantedScale).
  *
  * Two append regimes, because they answer different questions:
  *  - SAME-distribution appends: new vectors drawn from the corpus the
  *    centroids were trained on. Frozen assignment stays near-optimal,
  *    so recall should hold flat — this bounds the NORMAL serving cost
  *    of not retraining.
  *  - SHIFTED appends (every element displaced by a constant): the
  *    centroids have never seen the appended region, so all shifted
  *    vectors pile into a few border lists. Recall of planted pairs
  *    INSIDE the shifted region is the decay the retrainThreshold
  *    exists to bound; the retrained index restores it.
  *
  * Usage: runMain graft.tools.ProbeIvfAppend [sfDir] [nPlants]
  */
object ProbeIvfAppend {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scaledata/zipf100")
    val nPlants = if (args.length > 1) args(1).toInt else 1000
    val mode = if (args.length > 2) args(2) else "all"
    val offset = 1000000000L
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("graft-probe-ivfappend"),
      shufflePartitions = 64).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.prepare(spark)

    def perturb(src: DataFrame): DataFrame = src
      .select((col("vec_id") + offset).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x * (lit(1.0) + lit(0.01) * sin(col("vec_id") * (i + lit(1)))))
          .as("embedding"))

    def recallOf(path: String, queries: DataFrame): Double = {
      val got = IvfIndex.topK(spark, path, queries, "vec_id", "embedding",
        k = 10, nProbe = 4)
      got.filter(col("q_id") >= offset && col("c_id") === col("q_id") - offset)
        .select("q_id").distinct().count().toDouble / nPlants
    }

    val vecs = Tables.read(spark, dir, "embeddings").select("vec_id", "embedding")
    val base = vecs.filter(col("vec_id") < 1000000)
    val originals = base.filter(col("vec_id") < nPlants)

    for (f <- Seq(0.0, 0.1, 0.5, 1.0) if mode != "shifted") {
      val path = java.nio.file.Files.createTempDirectory(s"graft_ivf_decay_$f").toString
      val nApp = (f * 1000000).toLong
      val appended = vecs
        .filter(col("vec_id") >= 1000000 && col("vec_id") < 1000000 + nApp)
      val t0 = System.nanoTime()
      if (f == 0.0) {
        IvfIndex.build(base.union(perturb(originals)), "vec_id", "embedding", path)
      } else {
        IvfIndex.build(base, "vec_id", "embedding", path)
        // plants ride in WITH the appended batch: frozen-centroid
        // assignment is exactly what is being measured
        IvfIndex.append(appended.union(perturb(originals)), "vec_id", "embedding", path)
      }
      val tq = System.nanoTime()
      val r = recallOf(path, perturb(originals))
      println(f"[probe] same-dist appendedFraction=${IvfIndex.appendedFraction(spark, path)}%.2f " +
        f"recall=$r%.4f needsRetrain=${IvfIndex.needsRetrain(spark, path)} " +
        f"buildWall=${(tq - t0) / 1e9}%.1f s queryWall=${(System.nanoTime() - tq) / 1e9}%.1f s")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }

    // shifted regime: the appended half lives in a region the centroids
    // never saw; planted pairs are INSIDE that region
    for (retrain <- Seq(false, true) if mode != "same") {
      val path = java.nio.file.Files.createTempDirectory("graft_ivf_decay_shift").toString
      val shifted = vecs
        .filter(col("vec_id") >= 1000000 && col("vec_id") < 1500000)
        .select(col("vec_id"), transform(col("embedding"), x => x + lit(2.0)).as("embedding"))
      val shiftedOriginals = shifted.filter(col("vec_id") < 1000000 + nPlants)
      val t0 = System.nanoTime()
      IvfIndex.build(base, "vec_id", "embedding", path)
      IvfIndex.append(shifted.union(perturb(shiftedOriginals)), "vec_id", "embedding", path,
        autoRetrain = retrain)
      val tq = System.nanoTime()
      val r = recallOf(path, perturb(shiftedOriginals))
      println(f"[probe] SHIFTED appendedFraction=${IvfIndex.appendedFraction(spark, path)}%.2f " +
        f"retrained=$retrain recall=$r%.4f " +
        f"buildWall=${(tq - t0) / 1e9}%.1f s queryWall=${(System.nanoTime() - tq) / 1e9}%.1f s")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
    spark.stop()
  }
}

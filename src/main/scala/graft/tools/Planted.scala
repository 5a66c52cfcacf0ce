package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Seed-pinned planted-ground-truth corpora, shared by PlantedTruthSpec
  * (assertions) and the Recall artifact tool (driver-visible numbers).
  * Single source of truth: a corpus edit here changes both the spec's
  * thresholds' meaning and the RECALL artifact, never one without the
  * other.
  *
  * All generation is tiny and driver-side with fixed scala.util.Random
  * seeds, so every measurement downstream is a deterministic draw.
  */
object Planted {

  val nPlants = 50

  def unitVec(rnd: scala.util.Random, dim: Int): Array[Double] = {
    val v = Array.fill(dim)(rnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  def perturb(rnd: scala.util.Random, v: Array[Double], sigma: Double): Array[Double] = {
    val w = v.map(x => x + sigma * rnd.nextGaussian())
    val n = math.sqrt(w.map(x => x * x).sum)
    w.map(_ / n)
  }

  /** Text corpus: 300 base docs (60 tokens from a 2000-word vocab — random
    * pairs share ~1.8 tokens, so non-planted shingle-Jaccard ~0), 25 exact
    * dups + 25 one-token-edit dups (shingle-Jaccard ~0.90).
    * Returns (docs df, exact pairs, edit pairs). */
  def textCorpus(spark: SparkSession): (DataFrame, Set[(Long, Long)], Set[(Long, Long)]) = {
    val rnd = new scala.util.Random(20260814L)
    def doc(): Array[String] = Array.fill(60)("w" + rnd.nextInt(2000))
    val base = (0 until 300).map(i => (i.toLong, doc()))
    val exactDups = (0 until 25).map { i =>
      (10000L + i, base(i)._2.clone())
    }
    val editDups = (25 until nPlants).map { i =>
      val t = base(i)._2.clone()
      t(17) = "w" + (2000 + rnd.nextInt(1000)) // out-of-vocab replacement
      (10000L + i, t)
    }
    val rows = (base ++ exactDups ++ editDups).map { case (id, t) => (id, t.mkString(" ")) }
    import spark.implicits._
    val df = rows.toDF("doc_id", "text")
    val exactPairs = (0 until 25).map(i => (i.toLong, 10000L + i)).toSet
    val editPairs = (25 until nPlants).map(i => (i.toLong, 10000L + i)).toSet
    (df, exactPairs, editPairs)
  }

  /** Embedding corpus: 400 random unit vectors (dim 64, random-pair cosine
    * sigma ~0.125) + 50 planted near-copies at cos ~0.99995 (noise sigma
    * 0.01) — each query's true nearest neighbor is its plant. */
  def embCorpus(spark: SparkSession): (DataFrame, Set[(Long, Long)]) = {
    val rnd = new scala.util.Random(99260814L)
    val base = (0 until 400).map(i => (i.toLong, unitVec(rnd, 64)))
    val plants = (0 until nPlants).map(i => (10000L + i, perturb(rnd, base(i)._2, 0.01)))
    import spark.implicits._
    val df = (base ++ plants).map { case (id, v) => (id, v.map(_.toFloat).toSeq) }
      .toDF("vec_id", "embedding")
    (df, (0 until nPlants).map(i => (i.toLong, 10000L + i)).toSet)
  }

  /** Clustered corpus: 8 well-separated planted clusters of 50 points each
    * (sigma 0.1 around unit centers). Returns (df, id -> planted label). */
  def clusterCorpus(spark: SparkSession): (DataFrame, Map[Long, Int]) = {
    val rnd = new scala.util.Random(31260814L)
    val centers = (0 until 8).map(_ => unitVec(rnd, 64))
    val points = (0 until 400).map { i =>
      val g = i % 8
      (i.toLong, g, perturb(rnd, centers(g), 0.1))
    }
    import spark.implicits._
    val df = points.map { case (id, _, v) => (id, v.map(_.toFloat).toSeq) }
      .toDF("vec_id", "embedding")
    (df, points.map { case (id, g, _) => id -> g }.toMap)
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Past the sf100z broadcast cliff, q5/q3's big joins run as SortMergeJoin
  * (AQE's default: preferSortMergeJoin=true). A ShuffledHashJoin skips the
  * two 600M-row sorts at the cost of a hash map per partition — with the
  * derived width keeping partitions ~64 MB, the map fits, so SHJ should
  * win wall on paper. Measured A/B (same binaries, same width, alternating
  * iterations so cache drift cancels). Usage:
  *   runMain graft.tools.ProbeShj [sfDir] [itersPerSide]
  */
object ProbeShj {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/scaledata/sf100z")
    val iters = args.lift(1).map(_.toInt).getOrElse(4)
    val width = graft.engine.GraftSession.shuffleWidthFor(
      graft.engine.TableStats.treeSize(sfDir), 32)
    val spark = graft.engine.GraftSession.configure(
      SparkSession.builder().master("local[32]"), shufflePartitions = width)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.GraftSession.prepare(spark)
    println(s"PROBE width=$width")
    val q5 = graft.queries.Registry.byName("q5_join_region")
    val q3 = graft.queries.Registry.byName("q3_join_agg_topk")
    q5.build(spark, sfDir); q3.build(spark, sfDir) // registration untimed

    def run(q: graft.queries.Q, prefSmj: Boolean): Double = {
      spark.conf.set("spark.sql.join.preferSortMergeJoin", prefSmj.toString)
      val t0 = System.nanoTime()
      val df = q.build(spark, sfDir)
      df.collect()
      val dt = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      def n(s: String) = s.r.findAllIn(plan).size
      println(f"PROBE ${q.name}%-18s prefSMJ=$prefSmj%-5s wall=$dt%6.2f s " +
        f"SMJ=${n("SortMergeJoin")} SHJ=${n("ShuffledHashJoin")} BHJ=${n("BroadcastHashJoin")}")
      dt
    }
    // alternate sides so page-cache/thermal drift hits both equally
    for (q <- Seq(q5, q3)) {
      val (smj, shj) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
      for (_ <- 1 to iters) { smj += run(q, prefSmj = true); shj += run(q, prefSmj = false) }
      def mn(xs: Seq[Double]) = xs.min
      println(f"PROBE ${q.name} mins: SMJ=${mn(smj.result())}%.2f s SHJ=${mn(shj.result())}%.2f s")
    }
    spark.stop()
  }
}

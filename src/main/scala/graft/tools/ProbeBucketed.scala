package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.GraftSession

/** A/B probe for bucketed-by-join-key persistence of the headline joins
  * (r14 verdict #5): q5/q3 re-shuffle both big sides on every run —
  * lineitem and orders meet on the orderkey, and at sf100z that is a
  * 600M × 150M shuffle per query. A cluster reading 100 TB wants the
  * measured option of persisting both tables BUCKETED on the join key so
  * the join's Exchanges disappear (Spark bucketed scan reports the hash
  * distribution the join needs).
  *
  * Measures, at the given SF dir:
  *  - the one-time bucketed-write cost of lineitem + orders (the
  *    amortization denominator),
  *  - the q3-core join+agg (orderkey join, BUILDING/date filters) over
  *    plain parquet vs bucketed tables, 2 timed runs each,
  *  - the Exchange count in both physical plans (the mechanism claim),
  *  - result parity.
  * The customer joins keep shuffling either way (orders can be bucketed
  * on ONE key; the orderkey join is the big one).
  *
  * Usage: runMain graft.tools.ProbeBucketed [sfDir] [nBuckets]
  */
object ProbeBucketed {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/repo/scaledata/sf100z")
    val nBuckets = args.lift(1).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val wh = java.nio.file.Files.createTempDirectory("graft_bucketed_wh").toString
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.warehouse.dir", wh)
        .config("spark.driver.memory", "24g"),
      shufflePartitions =
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "256").toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[bucketed] $tag%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString
        .linesIterator.count(l => l.contains("Exchange hashpartitioning"))

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    println(s"[bucketed] $dir lineitem=${li.count()} orders=${ord.count()} buckets=$nBuckets")

    // one-time bucketed persistence, sorted within buckets so the join
    // can be a zero-exchange sort-merge over pre-sorted buckets
    time("write lineitem bucketed(l_orderkey)") {
      li.write.mode("overwrite")
        .bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
        .format("parquet").saveAsTable("li_b")
    }
    time("write orders bucketed(o_orderkey)") {
      ord.write.mode("overwrite")
        .bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
        .format("parquet").saveAsTable("ord_b")
    }

    // the q3 core: the orderkey join + filters + per-order agg (the
    // customer leg joins on a DIFFERENT key and shuffles either way —
    // kept out so the A/B isolates what bucketing can actually change)
    def q3core(l: org.apache.spark.sql.DataFrame,
               o: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      l.filter(col("l_shipdate") > lit(java.sql.Timestamp.valueOf("1999-03-15 00:00:00")))
        .join(o.filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1999-03-15 00:00:00"))),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        // cents-rounded: the two plans sum doubles in different partition
        // orders, and an unrounded revenue would flip near-tie ranks
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)

    val plain = q3core(li, ord)
    val bucketed = q3core(spark.table("li_b"), spark.table("ord_b"))

    var plainRows: Array[org.apache.spark.sql.Row] = null
    var bucketRows: Array[org.apache.spark.sql.Row] = null
    for (i <- 1 to 2)
      time(s"q3-core plain parquet run$i") { plainRows = plain.collect() }
    for (i <- 1 to 2)
      time(s"q3-core bucketed run$i") { bucketRows = bucketed.collect() }
    println(s"[bucketed] plain exchanges=${exchanges(plain)} " +
      s"bucketed exchanges=${exchanges(bucketed)}")
    require(plainRows.map(_.toString).toSeq == bucketRows.map(_.toString).toSeq,
      "bucketed plan changed the answer")
    println("[bucketed] parity OK")
    spark.stop()
    // the bucketed copies are ~full-table size — never leave them behind
    // (three stale warehouses filled the disk during the r15 session)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(wh))
  }
}

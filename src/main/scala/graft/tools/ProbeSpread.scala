package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.GraftSession
import graft.queries.Registry

/** One-off diagnostic: split per-iteration wall into plan-build vs execute
  * for a named query. Not part of the driver contract. */
object ProbeSpread {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = Registry.byName(name)
    (1 to 6).foreach { i =>
      val t0 = System.nanoTime()
      val df = q.build(spark, dir)
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      Console.err.println(f"[probe] iter $i build=${(t1 - t0) / 1e9}%.3f exec=${(t2 - t1) / 1e9}%.3f")
    }
    spark.stop()
  }
}

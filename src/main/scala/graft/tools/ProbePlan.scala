package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.GraftSession
import graft.queries.Registry

/** One-off diagnostic: print the formatted + codegen explain of a named
  * registered query. Not part of the driver contract. */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "formatted"
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[8]"), shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.assertScaleSafe(Seq(Registry.byName(name)), dir)
    Registry.byName(name).build(spark, dir).explain(mode)
    spark.stop()
  }
}

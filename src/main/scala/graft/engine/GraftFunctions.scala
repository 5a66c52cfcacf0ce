package graft.engine

import org.apache.spark.sql.SparkSession

/** SQL-name registry for GridDB-dialect functions that Spark lacks or names
  * differently. Populated incrementally (see graft.functions.*). Idempotent.
  */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    graft.functions.GridDbScalarFunctions.register(spark)
    GraftTableFunctions.register(spark)
  }
}

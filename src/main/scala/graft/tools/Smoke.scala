package graft.tools

import graft.engine.{GraftSession, Tables}

/** Quick local smoke: schemas + nanosecond timestamp handling. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
    ev.printSchema()
    ev.show(3, truncate = false)
    Tables.registerAll(spark, dir)
    spark.sql("select count(*) n, min(ts) lo, max(ts) hi from events").show(truncate = false)
    spark.sql("select l_returnflag, round(sum(l_quantity),2) s from lineitem group by 1 order by 1").show()
    spark.stop()
  }
}

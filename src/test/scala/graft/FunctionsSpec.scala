package graft

class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def q1[T](sql: String): T =
    spark.sql(sql).collect()(0).getAs[T](0)

  test("time functions: to_epoch_ms / to_timestamp_ms roundtrip") {
    assert(q1[Long]("SELECT to_epoch_ms(TIMESTAMP '2024-01-01 00:00:00')") == 1704067200000L)
    assert(q1[java.sql.Timestamp]("SELECT to_timestamp_ms(1704067200123)").getTime == 1704067200123L)
    assert(q1[String]("SELECT strftime('%Y-%m-%d %H:%M', TIMESTAMP '2024-03-05 07:08:09')")
      == "2024-03-05 07:08")
    assert(q1[java.sql.Timestamp]("SELECT timestamp_trunc('HOUR', TIMESTAMP '2024-03-05 07:08:09')")
      .toString.startsWith("2024-03-05 07:00:00"))
  }

  test("string functions: hex_to_dec, glob, quote") {
    assert(q1[Long]("SELECT hex_to_dec('ff')") == 255L)
    assert(q1[Long]("SELECT hex_to_dec('1A2B')") == 6699L)
    assert(q1[Boolean]("SELECT glob('a*c?', 'abbcd')"))
    assert(!q1[Boolean]("SELECT glob('a*c?', 'abc')"))
    assert(q1[String]("SELECT quote(\"o'hara\")") == "'o''hara'")
  }

  test("aggregate compat: total, stddev0, variance0, group_concat, median") {
    Seq(1.0, 2.0, 4.0).toDF("v").createOrReplaceTempView("fv")
    assert(q1[Double]("SELECT total(v) FROM fv") == 7.0)
    assert(q1[Double]("SELECT total(v) FROM fv WHERE v > 100") == 0.0)
    assert(q1[Double]("SELECT stddev0(v) FROM fv WHERE v = 1.0") == 0.0)
    assert(q1[Double]("SELECT variance0(v) FROM fv WHERE v = 1.0") == 0.0)
    assert(math.abs(q1[Double]("SELECT variance0(v) FROM fv") - 2.333333333) < 1e-6)
    assert(q1[Double]("SELECT griddb_median(v) FROM fv") == 2.0)
    Seq("b", "a", "c").toDF("s").createOrReplaceTempView("fs")
    assert(q1[String]("SELECT group_concat(s) FROM fs") == "a,b,c")
    assert(q1[String]("SELECT group_concat(s, '|') FROM fs") == "a|b|c")
  }

  test("glob/strftime pattern translators") {
    import graft.functions.GridDbScalarFunctions._
    assert(globToRegex("a*b?") == "^\\Qa\\E(?s:.*)\\Qb\\E(?s:.)$")
    assert(strftimeToJava("%Y-%m-%dT%H") == "yyyy-MM-dd'T'HH")
  }

  test("printf/unicode/zeroblob/make_timestamp variants") {
    assert(q1[String]("SELECT printf('%s-%03d', 'x', 7)") == "x-007")
    assert(q1[Int]("SELECT unicode('Abc')") == 65)
    assert(q1[Array[Byte]]("SELECT zeroblob(3)").toSeq == Seq[Byte](0, 0, 0))
    assert(q1[java.sql.Timestamp](
      "SELECT griddb_make_timestamp(2024, 1, 15, 12, 30, 45)").toString
      == "2024-01-15 12:30:45.0")
    assert(q1[java.sql.Timestamp](
      "SELECT make_timestamp_ms(2024, 1, 15, 12, 30, 45, 250)").toString
      == "2024-01-15 12:30:45.25")
    assert(q1[java.sql.Timestamp](
      "SELECT make_timestamp_us(2024, 1, 15, 12, 30, 45, 123456)").toString
      == "2024-01-15 12:30:45.123456")
  }

  test("mergeable HLL rollup estimates distinct users within 3%") {
    import org.apache.spark.sql.functions._
    val ev = graft.engine.Tables.events(spark, sfDir)
    val exact = ev.select("user_id").distinct().count()
    val est = ev
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    assert(math.abs(est - exact).toDouble / exact <= 0.03,
      s"HLL estimate $est vs exact $exact")
  }
}

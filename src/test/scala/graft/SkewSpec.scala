package graft

import org.apache.spark.sql.functions._
import graft.engine.Skew

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedAgg equals plain agg on skewed keys") {
    // 90% of rows share one key
    val df = ((1 to 9000).map(i => ("hot", i.toDouble)) ++
      (1 to 1000).map(i => (s"k${i % 7}", i.toDouble))).toDF("k", "v")
      .repartition(8)
    val salted = Skew.saltedAgg(df, Seq("k"), salts = 16,
      partials = Seq(sum($"v").as("s"), count(lit(1)).as("c")),
      merges = Seq(sum($"s").as("total"), sum($"c").as("n")))
    val plain = df.groupBy("k").agg(sum($"v").as("total"), count(lit(1)).as("n"))
    val a = salted.orderBy("k").collect().map(r => (r.getString(0), math.round(r.getDouble(1)), r.getLong(2)))
    val b = plain.orderBy("k").collect().map(r => (r.getString(0), math.round(r.getDouble(1)), r.getLong(2)))
    assert(a.toSeq == b.toSeq)
  }

  test("saltedJoin equals plain join") {
    val left = ((1 to 5000).map(_ => (1, "hot")) ++ (1 to 100).map(i => (i % 20 + 2, "cold")))
      .toDF("id", "tag").repartition(8)
    val right = (1 to 25).map(i => (i, s"name$i")).toDF("id", "name")
    val salted = Skew.saltedJoin(left, right, "id", salts = 8)
    val plain = left.join(right, "id")
    assert(salted.count() == plain.count())
    val a = salted.groupBy("id").count().orderBy("id").as[(Int, Long)].collect()
    val b = plain.groupBy("id").count().orderBy("id").as[(Int, Long)].collect()
    assert(a.toSeq == b.toSeq)
  }
}

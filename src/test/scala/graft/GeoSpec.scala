package graft

import graft.geometry.Geo
import org.apache.spark.sql.functions._

class GeoSpec extends SparkTestBase {
  import spark.implicits._

  test("WKT construction and MBR extraction") {
    val df = Seq(
      ("POINT(3.5 -2)", 1),
      ("LINESTRING(0 0, 10 5, 4 8)", 2),
      ("POLYGON((1 1, 4 1, 4 6, 1 6, 1 1))", 3)
    ).toDF("wkt", "id")
    val m = df.select($"id", Geo.stMbr($"wkt").as("m")).orderBy("id")
      .select("m.minx", "m.miny", "m.maxx", "m.maxy")
      .as[(Double, Double, Double, Double)].collect()
    assert(m(0) == ((3.5, -2.0, 3.5, -2.0)))
    assert(m(1) == ((0.0, 0.0, 10.0, 8.0)))
    assert(m(2) == ((1.0, 1.0, 4.0, 6.0)))
  }

  test("stPoint builds WKT; stGeomFromText validates") {
    val df = Seq((3, 4)).toDF("x", "y")
    assert(df.select(Geo.stPoint($"x", $"y")).as[String].head() == "POINT(3 4)")
    val v = Seq("POINT(1 2)", "NONSENSE", "polygon((0 0,1 0,1 1,0 0))")
      .toDF("w").select(Geo.stGeomFromText($"w")).as[Option[String]].collect()
    assert(v(0).contains("POINT(1 2)") && v(1).isEmpty && v(2).isDefined)
  }

  test("MBR intersection predicate") {
    val rect = Geo.stMakeRect(lit(0), lit(0), lit(10), lit(10))
    val geoms = Seq(
      ("POINT(5 5)", true),
      ("POINT(11 5)", false),
      ("LINESTRING(9 9, 20 20)", true),
      ("POLYGON((12 12, 15 12, 15 15, 12 12))", false)
    ).toDF("wkt", "expected")
    val got = geoms.select($"expected",
      Geo.stMbrIntersects(Geo.stMbr($"wkt"), rect).as("got")).collect()
    got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1), r.toString))
  }

  test("srid") {
    val df = Seq("POINT(1 2)").toDF("w")
    assert(df.select(Geo.stGetSrid($"w")).as[Int].head() == 0)
  }
}

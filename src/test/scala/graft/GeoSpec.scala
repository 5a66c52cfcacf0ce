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

  test("TQL generators: EMPTY form, MULTIPOINT re-tag, SRID carry") {
    val one = Seq(1).toDF("i")
    def ev(c: org.apache.spark.sql.Column): String =
      one.select(c.as("r")).as[String].head()
    assert(ev(Geo.genEmpty("LINESTRING", lit("empty"))) == "LINESTRING(EMPTY)")
    // POINT from a single-point MULTIPOINT; srid stamped and readable back
    val p = ev(Geo.genReTag("POINT", "MULTIPOINT", lit("MULTIPOINT(1 2)"), lit(4326), 1, 1))
    assert(p == "POINT(1 2;4326)")
    assert(one.select(Geo.stGetSrid(lit(p))).as[Int].head() == 4326)
    assert(one.select(Geo.stGetSrid(lit("POINT(1 2)"))).as[Int].head() == 0)
    // LINESTRING from >= 2 points; an existing ;srid is replaced
    assert(ev(Geo.genReTag("LINESTRING", "MULTIPOINT",
      lit("MULTIPOINT(0 0, 3 4;7)"), lit(9), 2)) == "LINESTRING(0 0, 3 4;9)")
    // MBR extraction ignores the srid suffix (4326 is not a coordinate)
    val m = one.select(Geo.stMbr(lit("POINT(5 5;4326)")).as("m"))
      .select("m.minx", "m.maxy").as[(Double, Double)].head()
    assert(m == ((5.0, 5.0)))
    // wrong cardinality / wrong source type -> reference's error
    intercept[Exception] {
      ev(Geo.genReTag("POINT", "MULTIPOINT", lit("MULTIPOINT(1 2, 3 4)"), lit(0), 1, 1))
    }
    intercept[Exception] {
      ev(Geo.genReTag("POLYGON", "POLYGON", lit("POINT(1 2)"), lit(0)))
    }
    // nulls propagate
    assert(one.select(Geo.genReTag("POINT", "MULTIPOINT",
      lit(null).cast("string"), lit(1), 1, 1)).head().isNullAt(0))
  }

  test("srid") {
    val df = Seq("POINT(1 2)").toDF("w")
    assert(df.select(Geo.stGetSrid($"w")).as[Int].head() == 0)
  }

  // ==== 3D surface ====

  test("3D constructors round-trip through stMbr3d; 2D input nulls") {
    val one = Seq(1).toDF("x")
    val box = one.select(Geo.stMakeBoxWkt(lit(1.0), lit(2.0), lit(3.0),
      lit(4.0), lit(6.0), lit(8.0)).as("w"))
    val w = box.as[String].head()
    assert(w.startsWith("POLYHEDRALSURFACE(((") && w.count(_ == ',') >= 24)
    val m = box.select(Geo.stMbr3d($"w")).as[Seq[Double]].head()
    assert(m == Seq(1.0, 2.0, 3.0, 4.0, 6.0, 8.0))

    val ls = one.select(Geo.stLineString(
      array(array(lit(0.0), lit(0.0), lit(0.0)), array(lit(3.0), lit(4.0), lit(5.0)))))
      .as[String].head()
    assert(ls == "LINESTRING(0.0 0.0 0.0, 3.0 4.0 5.0)")

    // 2D WKT has no 3D MBR (the reference QSF test requires a 3D box)
    val null2d = one.select(Geo.stMbr3d(lit("POINT(1 2)"))).as[Option[Seq[Double]]].head()
    assert(null2d.isEmpty)
  }

  test("3D MBR overlap predicate") {
    def mbr(v: Double*) = array(v.map(lit): _*)
    val cases = Seq(
      // overlap on all axes
      (Seq(0.0, 0.0, 0.0, 2.0, 2.0, 2.0), Seq(1.0, 1.0, 1.0, 3.0, 3.0, 3.0), true),
      // z-disjoint
      (Seq(0.0, 0.0, 0.0, 2.0, 2.0, 2.0), Seq(1.0, 1.0, 3.0, 3.0, 3.0, 4.0), false),
      // touching faces count (closed intervals)
      (Seq(0.0, 0.0, 0.0, 1.0, 1.0, 1.0), Seq(1.0, 0.0, 0.0, 2.0, 1.0, 1.0), true))
    cases.foreach { case (a, b, expect) =>
      val got = Seq(1).toDF("x")
        .select(Geo.stMbrIntersects3d(mbr(a: _*), mbr(b: _*))).as[Boolean].head()
      assert(got == expect, s"$a vs $b")
    }
  }

  test("QSF sphere vs box matches reference PV3 semantics") {
    graft.functions.GridDbScalarFunctions.register(spark)
    def box(v: Double*) = array(v.map(lit): _*)
    val sphere = Geo.stMakeSphere(lit(0.0), lit(0.0), lit(0.0), lit(1.0))
    def hit(b: Seq[Double]): Boolean = Seq(1).toDF("x")
      .select(Geo.stQsfMbrIntersectsMbr(sphere, box(b: _*))).as[Boolean].head()
    assert(!hit(Seq(2.0, 0.0, 0.0, 3.0, 1.0, 1.0)))   // min distance 2 > r
    assert(hit(Seq(0.5, 0.5, 0.5, 1.5, 1.5, 1.5)))    // corner inside ball
    assert(hit(Seq(-2.0, -2.0, -2.0, 2.0, 2.0, 2.0))) // ball strictly inside box (anchor)
    assert(hit(Seq(-0.1, -0.1, -0.1, 0.1, 0.1, 0.1))) // box strictly inside ball
    assert(!hit(Seq(1.0, -1.0, -1.0, 2.0, 1.0, 1.0))) // tangent: open inside, no witness
  }

  test("QSF plane/cylinder/cone vs box") {
    graft.functions.GridDbScalarFunctions.register(spark)
    def box(v: Double*) = array(v.map(lit): _*)
    def one = Seq(1).toDF("x")
    def ask(qsf: org.apache.spark.sql.Column, b: Seq[Double]): Boolean =
      one.select(Geo.stQsfMbrIntersectsMbr(qsf, box(b: _*))).as[Boolean].head()

    val planeZ = Geo.stMakePlane(lit(0.0), lit(0.0), lit(0.0),
      lit(0.0), lit(0.0), lit(1.0))
    assert(!ask(planeZ, Seq(-1.0, -1.0, 1.0, 1.0, 1.0, 2.0)))  // box fully above
    assert(ask(planeZ, Seq(-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)))  // crosses plane
    assert(ask(planeZ, Seq(-1.0, -1.0, -2.0, 1.0, 1.0, -1.0))) // fully below = inside half-space

    val cylZ = Geo.stMakeCylinder(lit(0.0), lit(0.0), lit(0.0),
      lit(0.0), lit(0.0), lit(1.0), lit(1.0))
    assert(!ask(cylZ, Seq(2.0, 2.0, 0.0, 3.0, 3.0, 1.0)))      // axis distance > r
    assert(ask(cylZ, Seq(0.2, 0.2, 0.2, 0.5, 0.5, 0.5)))       // inside cylinder
    assert(ask(cylZ, Seq(-3.0, -0.5, -1.0, 3.0, 0.5, 1.0)))    // crosses through (edge witness)

    val cone45 = Geo.stMakeCone(lit(0.0), lit(0.0), lit(0.0),
      lit(0.0), lit(0.0), lit(1.0), lit(45.0))
    assert(ask(cone45, Seq(-0.5, -0.5, 1.0, 0.5, 0.5, 2.0)))   // around the axis
    assert(!ask(cone45, Seq(2.0, 2.0, 0.1, 3.0, 3.0, 0.2)))    // far outside the cone

    // general QSF with the sphere's coefficients agrees with ST_MAKESPHERE
    // (away from the anchor-only case)
    val qsfSphere = Geo.stMakeQsf(Seq(
      lit(1.0), lit(0.0), lit(0.0), lit(0.0), lit(1.0), lit(0.0),
      lit(0.0), lit(0.0), lit(1.0), lit(0.0), lit(0.0), lit(0.0), lit(-1.0)))
    assert(ask(qsfSphere, Seq(0.5, 0.5, 0.5, 1.5, 1.5, 1.5)))
    assert(!ask(qsfSphere, Seq(2.0, 0.0, 0.0, 3.0, 1.0, 1.0)))
  }

  test("TQL surface: ST_MAKESPHERE + ST_MAKEBOX + ST_QSFMBRINTERSECTS") {
    graft.functions.GridDbScalarFunctions.register(spark)
    val df = Seq((1, 0.0), (2, 5.0)).toDF("id", "off")
    val c = graft.engine.Container("boxes", df, graft.engine.Collection)
    val out = graft.tql.TqlCompiler.run(c,
      "select * where ST_QSFMBRINTERSECTS(ST_MAKESPHERE(0, 0, 0, 1), " +
        "ST_MAKEBOX(off, 0, 0, off + 0.5, 0.5, 0.5))")
    assert(out.select("id").as[Int].collect().toSeq == Seq(1))
  }
}

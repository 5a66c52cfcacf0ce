package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.engine.{Collection, Container}
import graft.geometry.Geo
import graft.tql.TqlCompiler

/** Geometry differential fuzz: random WKT geometries and query rectangles
  * run through the TQL text path (`st_mbrintersects(geom, st_makerect...)`
  * parsed and lowered by TqlCompiler — the code we own) must select the
  * same rows as the directly-constructed Geo column API. Exercises the
  * TQL parser over negative/decimal number literals, nested geometry
  * calls, and ST_GEOMFROMTEXT indirection — the last TQL family without a
  * generated net (hand-written q_geo_* queries cover each form once). */
class GeoFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private def coll(df: org.apache.spark.sql.DataFrame) =
    Container("t", df, Collection)

  private def fmt(d: Double): String = f"$d%.2f"

  private def randGeom(r: Random): String = r.nextInt(3) match {
    case 0 =>
      s"POINT(${fmt(r.nextDouble() * 100 - 50)} ${fmt(r.nextDouble() * 100 - 50)})"
    case 1 =>
      val pts = (0 until r.nextInt(3) + 2)
        .map(_ => s"${fmt(r.nextDouble() * 100 - 50)} ${fmt(r.nextDouble() * 100 - 50)}")
      s"LINESTRING(${pts.mkString(", ")})"
    case _ =>
      val cx = r.nextDouble() * 80 - 40; val cy = r.nextDouble() * 80 - 40
      val w = r.nextDouble() * 20 + 1; val h = r.nextDouble() * 20 + 1
      val ring = Seq((cx, cy), (cx + w, cy), (cx + w, cy + h), (cx, cy + h), (cx, cy))
        .map { case (x, y) => s"${fmt(x)} ${fmt(y)}" }
      s"POLYGON((${ring.mkString(", ")}))"
  }

  test("TQL st_mbrintersects == direct Geo API over 60 random (corpus, rect) draws") {
    val failures = Seq.newBuilder[String]
    for (trial <- 0 until 12) {
      val r = new Random(7100 + trial)
      val geoms = (0 until 120).map(i => (i.toLong, randGeom(r)))
      val df = geoms.toDF("id", "geom")
      val c = coll(df)
      for (_ <- 0 until 5) {
        val x1 = r.nextDouble() * 100 - 50; val y1 = r.nextDouble() * 100 - 50
        val x2 = x1 + r.nextDouble() * 40; val y2 = y1 + r.nextDouble() * 40
        // half the draws route the rect through ST_GEOMFROMTEXT of its
        // polygon WKT instead of ST_MAKERECT — different parse path,
        // identical MBR
        val viaWkt = r.nextBoolean()
        val rectTql =
          if (viaWkt)
            s"st_geomfromtext('POLYGON((${fmt(x1)} ${fmt(y1)}, ${fmt(x2)} ${fmt(y1)}, " +
              s"${fmt(x2)} ${fmt(y2)}, ${fmt(x1)} ${fmt(y2)}, ${fmt(x1)} ${fmt(y1)}))')"
          else s"st_makerect(${fmt(x1)}, ${fmt(y1)}, ${fmt(x2)}, ${fmt(y2)})"
        val tql = s"select * where st_mbrintersects(geom, $rectTql) order by id"
        try {
          val got = TqlCompiler.run(c, tql).select("id").as[Long].collect().toSeq
          val rect = Geo.stMakeRect(
            lit(fmt(x1).toDouble), lit(fmt(y1).toDouble),
            lit(fmt(x2).toDouble), lit(fmt(y2).toDouble))
          val want = df.filter(Geo.stMbrIntersects(Geo.stMbr(col("geom")), rect))
            .orderBy("id").select("id").as[Long].collect().toSeq
          if (got != want)
            failures += s"trial $trial rect ($x1,$y1,$x2,$y2) viaWkt=$viaWkt: got ${got.size}, want ${want.size}\n$tql"
        } catch {
          case e: Exception => failures += s"trial $trial FAILED: ${e.getMessage.take(150)}\n$tql"
        }
      }
    }
    val fs = failures.result()
    assert(fs.isEmpty, fs.take(3).mkString("\n---\n"))
  }
}

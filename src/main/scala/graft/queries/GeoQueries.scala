package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.geometry.Geo

/** Geometry queries: WKT geometries derived from part attributes, filtered
  * by MBR / quadratic-surface intersection (the reference's R-tree search
  * shapes, QueryProcessor::searchGeometry
  * /root/reference/server/query_processor.h:59-67; PV3 box test
  * /root/reference/server/tr-cpp/TrPv3.cpp). Oracles = the equivalent
  * numeric range / clamped-distance predicates, which the MBR and sphere
  * forms reduce to exactly on data in generic position (fractional
  * coordinates, so no tangency or boundary-coincidence ties). */
object GeoQueries {

  val qs: Seq[Q] = Seq(
    Q.df("q_geo_mbr_filter",
      duck = """SELECT p_partkey,
        |  'POINT(' || CAST(p_size AS VARCHAR) || ' ' || CAST(p_retailprice AS VARCHAR) || ')' AS wkt
        |FROM part
        |WHERE p_size BETWEEN 10 AND 30 AND p_retailprice BETWEEN 500 AND 1200
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      val part = Tables.read(s, dir, "part")
      val rect = Geo.stMakeRect(lit(10.0), lit(500.0), lit(30.0), lit(1200.0))
      part
        .select(col("p_partkey"),
          Geo.stPoint(col("p_size"), col("p_retailprice")).as("wkt"))
        .filter(Geo.stMbrIntersects(Geo.stMbr(col("wkt")), rect))
        .orderBy("p_partkey")
    },

    // 3D boxes (ST_MAKEBOX -> POLYHEDRALSURFACE WKT -> 3D MBR) against a
    // constant query box — interval-overlap arithmetic in the oracle
    Q.df("q_geo_3d_mbr",
      duck = """SELECT p_partkey,
        |  CAST(p_size AS DOUBLE) AS minx, p_retailprice/100 AS miny,
        |  (p_partkey % 23) * 0.7 AS minz
        |FROM part
        |WHERE p_size <= 25.0 AND 12.0 <= p_size + 4.5
        |  AND p_retailprice/100 <= 14.0 AND 10.0 <= p_retailprice/100 + 1.5
        |  AND (p_partkey % 23) * 0.7 <= 12.0 AND 5.0 <= (p_partkey % 23) * 0.7 + 2.1
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      val part = Tables.read(s, dir, "part")
      val x0 = col("p_size").cast("double")
      val y0 = col("p_retailprice") / 100
      val z0 = pmod(col("p_partkey"), lit(23)) * 0.7
      val boxWkt = Geo.stMakeBoxWkt(x0, y0, z0, x0 + 4.5, y0 + 1.5, z0 + 2.1)
      val queryBox = array(Seq(12.0, 10.0, 5.0, 25.0, 14.0, 12.0).map(lit): _*)
      part
        .withColumn("mbr", Geo.stMbr3d(boxWkt))
        .filter(Geo.stMbrIntersects3d(col("mbr"), queryBox))
        .select(col("p_partkey"),
          element_at(col("mbr"), 1).as("minx"),
          element_at(col("mbr"), 2).as("miny"),
          element_at(col("mbr"), 3).as("minz"))
        .orderBy("p_partkey")
    },

    // ST_QSFMBRINTERSECTS: sphere vs per-row 3D boxes. On fractional data
    // the PV3 witness scan equals the clamped-distance test (open ball), so
    // DuckDB can oracle it exactly
    Q.df("q_geo_qsf_sphere",
      duck = """WITH b AS (SELECT p_partkey,
        |  CAST(p_size AS DOUBLE) AS x0, CAST(p_size AS DOUBLE) + 4.5 AS x1,
        |  p_retailprice/100 AS y0, p_retailprice/100 + 1.5 AS y1,
        |  (p_partkey % 23) * 0.7 AS z0, (p_partkey % 23) * 0.7 + 2.1 AS z1
        |FROM part)
        |SELECT p_partkey FROM b
        |WHERE power(17.3 - greatest(x0, least(17.3, x1)), 2)
        |    + power(12.6 - greatest(y0, least(12.6, y1)), 2)
        |    + power(7.9 - greatest(z0, least(7.9, z1)), 2) < 5.3 * 5.3
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      val part = Tables.read(s, dir, "part")
      val x0 = col("p_size").cast("double")
      val y0 = col("p_retailprice") / 100
      val z0 = pmod(col("p_partkey"), lit(23)) * 0.7
      val boxWkt = Geo.stMakeBoxWkt(x0, y0, z0, x0 + 4.5, y0 + 1.5, z0 + 2.1)
      val sphere = Geo.stMakeSphere(lit(17.3), lit(12.6), lit(7.9), lit(5.3))
      part
        .filter(Geo.stQsfMbrIntersects(sphere, boxWkt))
        .select("p_partkey")
        .orderBy("p_partkey")
    },

    // ---- Collection spatial client API (Collection.java:107 query(column,
    //      geometry, INTERSECT) and :161 query(column, intersection,
    //      disjoint)) driven through the GraftCatalog wrappers over a real
    //      container; oracle = the closed-boundary range predicates the
    //      point-in-rect MBR tests reduce to (a point at x=20 intersects
    //      BOTH rects, so the disjoint form excludes it) ----
    Q.df("q_api_geometry_query",
      duck = """SELECT op, p_partkey FROM (
        |  SELECT 'intersect' AS op, p_partkey FROM part
        |    WHERE p_size BETWEEN 10 AND 30 AND p_retailprice BETWEEN 500 AND 1200
        |  UNION ALL
        |  SELECT 'with_disjoint', p_partkey FROM part
        |    WHERE p_size BETWEEN 10 AND 30 AND p_retailprice BETWEEN 500 AND 1200
        |      AND NOT (p_size BETWEEN 20 AND 30 AND p_retailprice BETWEEN 500 AND 1200)
        |) t ORDER BY op, p_partkey""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types._
      val cat = graft.engine.GraftCatalog.forSession(s)
      if (cat.exists("q_geo_api_tab")) cat.dropContainer("q_geo_api_tab")
      cat.createCollection("q_geo_api_tab", StructType(Seq(
        StructField("p_partkey", LongType, nullable = false),
        StructField("wkt", StringType))), keyColumns = Seq("p_partkey"))
      cat.put("q_geo_api_tab", Tables.read(s, dir, "part")
        .select(col("p_partkey"),
          Geo.stPoint(col("p_size"), col("p_retailprice")).as("wkt")))
      val rect = "POLYGON((10 500, 30 500, 30 1200, 10 1200, 10 500))"
      val disjointRect = "POLYGON((20 500, 30 500, 30 1200, 20 1200, 20 500))"
      cat.geometryQuery("q_geo_api_tab", "wkt", rect)
        .select(lit("intersect").as("op"), col("p_partkey"))
        .unionByName(
          cat.geometryQuery("q_geo_api_tab", "wkt", rect, disjointRect)
            .select(lit("with_disjoint").as("op"), col("p_partkey")))
        .orderBy("op", "p_partkey")
    }
  )
}

package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.geometry.Geo

/** Geometry queries: WKT points derived from part attributes, filtered by
  * MBR intersection with a constant rectangle (the reference's R-tree search
  * shape, QueryProcessor::searchGeometry
  * /root/reference/server/query_processor.h:59-67). Oracle = the equivalent
  * numeric range predicate. */
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
    }
  )
}

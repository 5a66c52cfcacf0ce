package graft.geometry

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geometry support: WKT construction + MBR (minimum bounding rectangle)
  * predicates — the subset of GridDB's GIS surface its query engine actually
  * uses for filtering (R-tree searches are MBR-driven:
  * /root/reference/server/rtree_map.cpp, TQL functions
  * /root/reference/server/function_map.cpp:52-105, ST_MBRINTERSECTS et al).
  *
  * Geometries are carried as WKT strings (the reference's wire format is
  * WKT too, /root/reference/server/wkt.cpp); predicates operate on the MBR
  * struct derived from all coordinates in the text. 2D; SRID fixed 0 like
  * the reference default. Pure codegen'd expressions — usable in joins and
  * pushed filters at scale.
  */
object Geo {

  private val numRe = "-?[0-9]+(?:\\.[0-9]+)?(?:[eE][+-]?[0-9]+)?"

  /** All numeric tokens of a WKT string as doubles (x1,y1,x2,y2,...). */
  private def coords(wkt: Column): Column =
    transform(regexp_extract_all(wkt, lit(numRe), lit(0)), _.cast("double"))

  /** POINT(x y) constructor. */
  def stPoint(x: Column, y: Column): Column =
    concat(lit("POINT("), x.cast("string"), lit(" "), y.cast("string"), lit(")"))

  /** MBR struct (minx, miny, maxx, maxy) of any 2D WKT geometry. */
  def stMbr(wkt: Column): Column = {
    val cs = coords(wkt)
    val xs = filter(cs, (_, i) => i % 2 === 0)
    val ys = filter(cs, (_, i) => i % 2 === 1)
    struct(
      array_min(xs).as("minx"), array_min(ys).as("miny"),
      array_max(xs).as("maxx"), array_max(ys).as("maxy"))
  }

  /** ST_MAKERECT: rectangle MBR from two corners. */
  def stMakeRect(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    struct(
      least(x1, x2).as("minx"), least(y1, y2).as("miny"),
      greatest(x1, x2).as("maxx"), greatest(y1, y2).as("maxy"))

  /** ST_MBRINTERSECTS over two MBR structs. */
  def stMbrIntersects(a: Column, b: Column): Column =
    a.getField("minx") <= b.getField("maxx") &&
      b.getField("minx") <= a.getField("maxx") &&
      a.getField("miny") <= b.getField("maxy") &&
      b.getField("miny") <= a.getField("maxy")

  /** ST_GEOMFROMTEXT: validate-and-normalize (keeps WKT; null on junk). */
  def stGeomFromText(wkt: Column): Column =
    when(upper(trim(wkt)).rlike(
      "^(POINT|LINESTRING|POLYGON|POLYHEDRALSURFACE)\\s*\\(.*\\)$"), trim(wkt))
      .otherwise(lit(null))

  /** ST_GETSRID — GridDB CE default SRID is 0. */
  def stGetSrid(wkt: Column): Column = when(wkt.isNotNull, lit(0)).otherwise(lit(null))

  /** ST_MAKERECT as WKT (keeps the TQL geometry surface string-uniform). */
  def stMakeRectWkt(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    concat(lit("POLYGON(("),
      x1.cast("string"), lit(" "), y1.cast("string"), lit(", "),
      x2.cast("string"), lit(" "), y1.cast("string"), lit(", "),
      x2.cast("string"), lit(" "), y2.cast("string"), lit(", "),
      x1.cast("string"), lit(" "), y2.cast("string"), lit(", "),
      x1.cast("string"), lit(" "), y1.cast("string"), lit("))"))

  /** MBR-intersection over two WKT strings. */
  def stMbrIntersectsWkt(a: Column, b: Column): Column =
    stMbrIntersects(stMbr(a), stMbr(b))
}

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

  /** Drop the GridDB-WKT `;srid` suffix (grammar `gisarg ::= gisexpr
    * SEMICOLON INTEGER`, /root/reference/server/wkt.cpp:131-132) so
    * coordinate extraction never reads the SRID as a coordinate. */
  private def stripSrid(wkt: Column): Column =
    regexp_replace(wkt, ";-?\\d+\\)\\s*$", ")")

  /** All numeric tokens of a WKT string as doubles (x1,y1,x2,y2,...). */
  private def coords(wkt: Column): Column =
    transform(regexp_extract_all(stripSrid(wkt), lit(numRe), lit(0)), _.cast("double"))

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

  /** ST_GEOMFROMTEXT: validate-and-normalize (keeps WKT; null on junk).
    * Accepted types mirror the reference's WKT parser
    * (/root/reference/server/gis_geomfromtext.h): POINT, LINESTRING,
    * POLYGON, POLYHEDRALSURFACE, MULTIPOINT, MULTIPOLYGON,
    * QUADRATICSURFACE. */
  def stGeomFromText(wkt: Column): Column =
    when(upper(trim(wkt)).rlike(
      "^(POINT|LINESTRING|POLYGON|POLYHEDRALSURFACE|MULTIPOINT|MULTIPOLYGON|QUADRATICSURFACE)\\s*\\(.*\\)$"), trim(wkt))
      .otherwise(lit(null))

  /** ST_GETSRID — the `;srid` suffix when the geometry carries one
    * (written by the TQL generators, [[genReTag]]), else the GridDB CE
    * default 0. */
  def stGetSrid(wkt: Column): Column =
    when(wkt.isNull, lit(null))
      .otherwise {
        val s = regexp_extract(wkt, ";(-?\\d+)\\)\\s*$", 1)
        when(s === "", lit(0)).otherwise(s.cast("int"))
      }

  // ==== TQL geometry generators (gis_generator.h:42-391) ====================
  // Two forms per type tag: TAG('EMPTY') builds the empty geometry
  // (wkt.cpp grammar rule 1: `geom ::= GISFUNC LP EMPTY RP`), and
  // TAG(geom, srid) re-tags an existing geometry with a new SRID — for the
  // sequence types converting a MULTIPOINT's point list into the target
  // type (PointGenerator:67-88 single point, LineStringGenerator /
  // LinearRingGenerator:228-249 >= 2 points, PolygonGenerator:288,
  // PolyhedronGenerator:334, QuadraticSurfaceGenerator:379). The SRID rides
  // as the reference's own `;srid` in-paren suffix, so re-tagged geometries
  // stay plain WKT strings for every other operator.

  /** `TAG('EMPTY')` generator form; a non-EMPTY string argument is the
    * reference's "WKT argument is invalid" error. */
  def genEmpty(tag: String, arg: Column): Column =
    when(arg.isNull, lit(null).cast("string"))
      .when(upper(trim(arg)) === "EMPTY", lit(s"$tag(EMPTY)"))
      .otherwise(raise_error(lit("WKT argument is invalid")))

  /** `TAG(geom, srid)` generator form: accepts a `srcTag` geometry whose
    * top-level element count is within [minPts, maxPts], rewrites the type
    * tag, and stamps the new `;srid`. Wrong source type or cardinality is
    * the reference's "WKT argument is invalid" error; null inputs are
    * null. */
  def genReTag(dstTag: String, srcTag: String, wkt: Column, srid: Column,
               minPts: Int = 0, maxPts: Int = Int.MaxValue): Column = {
    val noSrid = stripSrid(trim(wkt))
    val inner = regexp_extract(noSrid, "(?s)^[A-Za-z]+\\s*\\((.*)\\)\\s*$", 1)
    val isSrc = upper(noSrid).rlike(s"^$srcTag\\s*\\(")
    val nPts = when(upper(trim(inner)) === "EMPTY" || trim(inner) === "", lit(0))
      .otherwise(size(split(inner, ",")))
    when(wkt.isNull || srid.isNull, lit(null).cast("string"))
      .when(isSrc && nPts >= minPts && nPts <= maxPts,
        concat(lit(dstTag + "("), inner,
          lit(";"), srid.cast("int").cast("string"), lit(")")))
      .otherwise(raise_error(lit("WKT argument is invalid")))
  }

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

  // ==== 3D surface ==========================================================
  // Reference: 3D geometry model /root/reference/server/gis_geometry.h
  // (dimension_ = 3), box construction FunctorMakebox
  // /root/reference/server/function_gis.h:151, QSF constructors :332-527,
  // R-tree MBR filtering /root/reference/server/rtree_map.cpp.

  /** WKT coordinate tuples as array<array<double>> (one inner array per
    * point; the comma structure of the text gives the point arity). */
  def wktPoints(wkt: Column): Column =
    filter(
      transform(split(stripSrid(wkt), ","),
        chunk => transform(regexp_extract_all(chunk, lit(numRe), lit(0)), _.cast("double"))),
      p => size(p) > 0)

  /** Build `TAG(x y z, ...)` WKT from array<array<double>> points. */
  private def wktOf(tag: String, open: String, close: String, pts: Column): Column =
    concat(lit(tag + open),
      array_join(transform(pts,
        p => array_join(transform(p, _.cast("string")), " ")), ", "),
      lit(close))

  /** LINESTRING constructor from coordinate tuples. */
  def stLineString(pts: Column): Column = wktOf("LINESTRING", "(", ")", pts)

  /** POLYGON constructor (single outer ring) from coordinate tuples. */
  def stPolygon(ring: Column): Column = wktOf("POLYGON", "((", "))", ring)

  /** POLYHEDRALSURFACE constructor from an array of rings (each an
    * array<array<double>> of 3D points). */
  def stPolyhedralSurface(rings: Column): Column =
    concat(lit("POLYHEDRALSURFACE("),
      array_join(transform(rings, r =>
        concat(lit("(("),
          array_join(transform(r,
            p => array_join(transform(p, _.cast("string")), " ")), ", "),
          lit("))"))), ", "),
      lit(")"))

  /** ST_MAKEBOX(x1,y1,z1,x2,y2,z2): the axis box as a 6-face
    * POLYHEDRALSURFACE (reference FunctorMakebox,
    * /root/reference/server/function_gis.h:151-325). */
  def stMakeBoxWkt(x1: Column, y1: Column, z1: Column,
                   x2: Column, y2: Column, z2: Column): Column = {
    val (xa, ya, za) = (least(x1, x2), least(y1, y2), least(z1, z2))
    val (xb, yb, zb) = (greatest(x1, x2), greatest(y1, y2), greatest(z1, z2))
    def pt(x: Column, y: Column, z: Column): Column = array(x, y, z)
    def face(ps: Column*): Column = array(ps: _*)
    stPolyhedralSurface(array(
      face(pt(xa, ya, za), pt(xb, ya, za), pt(xb, yb, za), pt(xa, yb, za), pt(xa, ya, za)),
      face(pt(xa, ya, zb), pt(xb, ya, zb), pt(xb, yb, zb), pt(xa, yb, zb), pt(xa, ya, zb)),
      face(pt(xa, ya, za), pt(xb, ya, za), pt(xb, ya, zb), pt(xa, ya, zb), pt(xa, ya, za)),
      face(pt(xa, yb, za), pt(xb, yb, za), pt(xb, yb, zb), pt(xa, yb, zb), pt(xa, yb, za)),
      face(pt(xa, ya, za), pt(xa, yb, za), pt(xa, yb, zb), pt(xa, ya, zb), pt(xa, ya, za)),
      face(pt(xb, ya, za), pt(xb, yb, za), pt(xb, yb, zb), pt(xb, ya, zb), pt(xb, ya, za))))
  }

  /** 3D MBR of a WKT geometry as array<double>(6) =
    * (minx, miny, minz, maxx, maxy, maxz); null unless every coordinate
    * tuple is 3D (the reference's QSF test requires a 3D argument,
    * /root/reference/server/function_gis.h:645-648). */
  def stMbr3d(wkt: Column): Column = {
    val pts = wktPoints(wkt)
    def coord(i: Int) = transform(pts, p => element_at(p, i))
    when(size(pts) > 0 && forall(pts, p => size(p) === 3),
      array(
        array_min(coord(1)), array_min(coord(2)), array_min(coord(3)),
        array_max(coord(1)), array_max(coord(2)), array_max(coord(3))))
      .otherwise(lit(null))
  }

  /** 3D MBR overlap (closed intervals on all three axes). */
  def stMbrIntersects3d(a: Column, b: Column): Column = {
    def ov(lo: Int, hi: Int) =
      element_at(a, lo) <= element_at(b, hi) && element_at(b, lo) <= element_at(a, hi)
    ov(1, 4) && ov(2, 5) && ov(3, 6)
  }

  // ---- quadratic surfaces --------------------------------------------------
  // Key encoding: array<double>(18) = A row-major (9), b (3), c, p (3),
  // negative, typeCode — consumed by QsfMbrIntersects (see QsfBox).

  private def key(tpe: Double, A: Seq[Column], b: Seq[Column], c: Column,
                  p: Seq[Column]): Column =
    array((A ++ b ++ Seq(c) ++ p ++ Seq(lit(0.0), lit(tpe))).map(_.cast("double")): _*)

  private val zero3 = Seq(lit(0.0), lit(0.0), lit(0.0))

  /** ST_MAKEQSF(A1..A9, b1..b3, c): general quadratic surface
    * (reference FunctorMakeqsf, function_gis.h:332). */
  def stMakeQsf(a: Seq[Column]): Column = {
    require(a.size == 13, "ST_MAKEQSF takes 13 numeric arguments")
    key(0.0, a.take(9), a.slice(9, 12), a(12), zero3)
  }

  /** ST_MAKEPLANE(px,py,pz, nx,ny,nz): half-space through p with normal n —
    * Q(q) = nᵀ(q - p) (reference TrPv3Key_plane, TrPv3.cpp:145). */
  def stMakePlane(px: Column, py: Column, pz: Column,
                  nx: Column, ny: Column, nz: Column): Column =
    key(2.0,
      Seq.fill(9)(lit(0.0)),
      Seq(nx / 2, ny / 2, nz / 2),
      -(px * nx + py * ny + pz * nz),
      Seq(px, py, pz))

  /** ST_MAKESPHERE(cx,cy,cz, r): Q(q) = |q-c|² - r²
    * (reference TrPv3Key_sphere, TrPv3.cpp:158; anchor c + r·x̂). */
  def stMakeSphere(cx: Column, cy: Column, cz: Column, r: Column): Column =
    key(3.0,
      Seq(lit(1.0), lit(0.0), lit(0.0),
        lit(0.0), lit(1.0), lit(0.0),
        lit(0.0), lit(0.0), lit(1.0)),
      Seq(-cx, -cy, -cz),
      cx * cx + cy * cy + cz * cz - r * r,
      Seq(cx + r, cy, cz))

  /** ST_MAKECYLINDER(px,py,pz, ax,ay,az, r): infinite cylinder around the
    * axis through p with direction a (reference TrPv3Key_cylinder,
    * TrPv3.cpp:174); null on a zero axis. */
  def stMakeCylinder(px: Column, py: Column, pz: Column,
                     ax: Column, ay: Column, az: Column, r: Column): Column = {
    val pp = sqrt(ax * ax + ay * ay + az * az)
    val (nx, ny, nz) = (ax / pp, ay / pp, az / pp)
    val np = px * nx + py * ny + pz * nz
    val k = key(4.0,
      Seq(lit(1.0) - nx * nx, -nx * ny, -nx * nz,
        -ny * nx, lit(1.0) - ny * ny, -ny * nz,
        -nz * nx, -nz * ny, lit(1.0) - nz * nz),
      Seq(np * nx - px, np * ny - py, np * nz - pz),
      px * px + py * py + pz * pz - np * np - r * r,
      zero3)
    when(pp >= 1e-8, k).otherwise(lit(null))
  }

  /** ST_MAKECONE(px,py,pz, ax,ay,az, deg): infinite double cone with apex
    * p, axis a, half-angle deg (reference TrPv3Key_cone, TrPv3.cpp:197);
    * null on a zero axis. */
  def stMakeCone(px: Column, py: Column, pz: Column,
                 ax: Column, ay: Column, az: Column, deg: Column): Column = {
    val a2 = cos(radians(deg)) * cos(radians(deg))
    val pp = sqrt(ax * ax + ay * ay + az * az)
    val (nx, ny, nz) = (ax / pp, ay / pp, az / pp)
    val np = px * nx + py * ny + pz * nz
    val k = key(1.0,
      Seq(a2 - nx * nx, -nx * ny, -nx * nz,
        -ny * nx, a2 - ny * ny, -ny * nz,
        -nz * nx, -nz * ny, a2 - nz * nz),
      Seq(np * nx - a2 * px, np * ny - a2 * py, np * nz - a2 * pz),
      a2 * (px * px + py * py + pz * pz) - np * np,
      Seq(px, py, pz))
    when(pp >= 1e-8, k).otherwise(lit(null))
  }

  /** ST_QSFMBRINTERSECTS(qsf, wkt): does the quadratic surface's inside
    * region touch the 3D MBR of `wkt`? */
  def stQsfMbrIntersects(qsf: Column, wkt: Column): Column =
    stQsfMbrIntersectsMbr(qsf, stMbr3d(wkt))

  /** Same over an already-computed array<double>(6) MBR (the custom
    * expression is reached through the function registry, the repo's
    * uniform seam for codegen'd kernels). */
  def stQsfMbrIntersectsMbr(qsf: Column, mbr: Column): Column =
    call_function("st_qsfmbrintersects", qsf, mbr)
}

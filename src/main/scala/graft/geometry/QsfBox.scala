package graft.geometry

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType}

/** Quadratic-surface vs 3D-box intersection — a faithful port of the
  * reference's PV3 test (/root/reference/server/tr-cpp/TrPv3.cpp:282-511,
  * invoked by ST_QSFMBRINTERSECTS via QuadraticSurface::
  * isBoundingRectIntersects, /root/reference/server/gis_quadraticsurface.h:
  * 233-245).
  *
  * A QSF key is the quadratic form Q(p) = c + 2·bᵀp + pᵀAp; the surface's
  * "inside" is Q < 0 (or Q > 0 when negated). The test reports intersection
  * when the box [p0, p0+p1] contains a witness point with Q inside:
  * the 8 corners, the stationary point of Q on each of the 12 edges and 6
  * faces (only when strictly interior to the edge/face), or the key's
  * stored anchor point `p` strictly inside the box. The box is first
  * normalized to the unit cube (TrPv3Key_conv) exactly as the reference
  * does, preserving its EPSI = 1e-8 degeneracy cutoffs.
  *
  * Key encoding (18 doubles): A row-major (9), b (3), c, p (3), negative,
  * typeCode (0=NONE, 1=CONE, 2=PLANE, 3=SPHERE, 4=CYLINDER — matches
  * TrPv3Key_type ordinals the tests care about; only PLANE changes control
  * flow).
  */
object QsfBox {

  private final val Epsi = 1.0e-8

  /** TrPv3Test2 for a single (non-AND/OR) key. `key` length 18, `box`
    * length 6 (minx, miny, minz, maxx, maxy, maxz). */
  def intersects(key: ArrayData, box: ArrayData): Boolean = {
    val k = new Array[Double](18)
    var i = 0
    while (i < 18) { k(i) = key.getDouble(i); i += 1 }
    val b = new Array[Double](6)
    i = 0
    while (i < 6) { b(i) = box.getDouble(i); i += 1 }
    test(k, b)
  }

  /** The full corner/edge/face/anchor scan (TrPv3Test). */
  def test(key: Array[Double], box: Array[Double]): Boolean = {
    // box origin/extent (TrPv3Box)
    val o = Array(box(0), box(1), box(2))
    val e = Array(box(3) - box(0), box(4) - box(1), box(5) - box(2))

    // --- TrPv3Key_conv: normalize the form to the unit cube ---
    val a = Array.ofDim[Double](3, 3)
    val bb = new Array[Double](3)
    var c = key(12)
    val p = new Array[Double](3)
    val neg = key(16) != 0.0
    var i = 0
    while (i < 3) {
      bb(i) = e(i) * key(9 + i)
      c += 2 * o(i) * key(9 + i)
      var j = 0
      while (j < 3) {
        val aij = key(3 * i + j)
        a(i)(j) = e(i) * aij * e(j)
        bb(i) += e(i) * aij * o(j)
        c += o(i) * aij * o(j)
        j += 1
      }
      p(i) = if (e(i) < Epsi) 0.0 else (key(13 + i) - o(i)) / e(i)
      i += 1
    }

    def eval(u: Array[Double]): Double = {
      var y = c
      var i = 0
      while (i < 3) {
        y += 2 * bb(i) * u(i)
        var j = 0
        while (j < 3) { y += u(i) * a(i)(j) * u(j); j += 1 }
        i += 1
      }
      y
    }
    def inside(v: Double): Boolean = if (neg) v > 0.0 else v < 0.0

    // corners (_c0test x8)
    val u = new Array[Double](3)
    var m = 0
    while (m < 8) {
      u(0) = m & 1; u(1) = (m >> 1) & 1; u(2) = (m >> 2) & 1
      if (inside(eval(u))) return true
      m += 1
    }
    // PLANE: corners decide sign-crossing entirely (reference returns -1
    // at TrPv3.cpp:450 before the edge/face/anchor tests)
    if (key(17) == 2.0) return false
    if (e(0) < Epsi && e(1) < Epsi && e(1) < Epsi) return false // (sic) ref line 453

    // edge stationary points (_c1test x12): fix two coords, solve the third
    var varIdx = 0
    while (varIdx < 3) {
      val o1 = (varIdx + 1) % 3
      val o2 = (varIdx + 2) % 3
      var f = 0
      while (f < 4) {
        u(o1) = f & 1; u(o2) = (f >> 1) & 1; u(varIdx) = 0
        val a1 = a(varIdx)(varIdx)
        val b1 = -bb(varIdx) - a(varIdx)(o1) * u(o1) - a(varIdx)(o2) * u(o2)
        if (math.abs(a1) >= Epsi) {
          val x = b1 / a1
          if (x > 0.0 && x < 1.0) {
            u(varIdx) = x
            if (inside(eval(u))) return true
          }
        }
        f += 1
      }
      varIdx += 1
    }
    if ((e(0) < Epsi && e(1) < Epsi) || (e(1) < Epsi && e(2) < Epsi) ||
        (e(2) < Epsi && e(0) < Epsi)) return false

    // face stationary points (_c2test x6): fix one coord, solve the 2x2
    var fix = 0
    while (fix < 3) {
      val o1 = if (fix == 0) 1 else 0
      val o2 = if (fix == 2) 1 else 2
      var side = 0
      while (side < 2) {
        u(fix) = side
        val a2 = Array(
          Array(a(o1)(o1), a(o1)(o2)),
          Array(a(o2)(o1), a(o2)(o2)))
        val b2 = Array(
          -bb(o1) - a(o1)(fix) * u(fix),
          -bb(o2) - a(o2)(fix) * u(fix))
        val det = a2(0)(0) * a2(1)(1) - a2(0)(1) * a2(1)(0)
        if (math.abs(det) >= Epsi) {
          val x0 = (b2(0) * a2(1)(1) - a2(0)(1) * b2(1)) / det
          val x1 = (a2(0)(0) * b2(1) - b2(0) * a2(1)(0)) / det
          if (x0 > 0.0 && x0 < 1.0 && x1 > 0.0 && x1 < 1.0) {
            u(o1) = x0; u(o2) = x1
            if (inside(eval(u))) return true
          }
        }
        side += 1
      }
      fix += 1
    }
    if (e(0) < Epsi || e(1) < Epsi || e(2) < Epsi) return false

    // anchor point strictly inside the box (_c3test)
    p(0) > 0.0 && p(0) < 1.0 && p(1) > 0.0 && p(1) < 1.0 &&
      p(2) > 0.0 && p(2) < 1.0
  }

}

/** ST_QSFMBRINTERSECTS(qsfKey, boxMbr) — boolean Catalyst expression over
  * the 18-double key and the 6-double 3D MBR. Null-safe (either side null
  * -> null, like the reference functor); non-3D MBRs arrive as null from
  * Geo.stMbr3d. Codegen emits a single static call per row. */
case class QsfMbrIntersects(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"st_qsfmbrintersects expects (array<double>, array<double>), got (${l.sql}, ${r.sql})")
  }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "st_qsfmbrintersects"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val k = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (k.numElements() != 18 || b.numElements() != 6) null
    else java.lang.Boolean.valueOf(QsfBox.intersects(k, b))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      s"""
         |if ($l.numElements() != 18 || $r.numElements() != 6) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.geometry.QsfBox.intersects($l, $r);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

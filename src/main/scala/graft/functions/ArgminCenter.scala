package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Nearest-centroid assignment in one codegen'd pass — the coarse-quantizer
  * member of the per-row kernel family (graft_minhash_sig, graft_srp_sig):
  * the argmin over all `centers.length` squared-L2 distances of one vector
  * computed in a single fused loop nest. The previous formulation
  * (`array_min(transform(<literal centroid structs>, ...)).getField("cid")`)
  * evaluates interpreted HOF lambdas per centroid per row — O(N·L·dim)
  * with per-element lambda overhead, the dominant cost of SemDeDup/IVF
  * assignment at AUTO ~sqrt(N) list counts (SCALING.md). The centroid
  * matrix is carried as a codegen reference object, not literals, so the
  * generated source stays small at any list count.
  *
  * Exact-parity contract with the old expression (golden hashes depend on
  * it): distances accumulate left-to-right in double precision, strict `<`
  * keeps the first (lowest-cid) winner on ties, and an all-NaN distance row
  * assigns centroid 0 — the same row `array_min`'s lexicographic struct
  * ordering selects. Null if the input vector is null or its length
  * differs from the centroid dimension. */
case class ArgminCenter(child: Expression, centers: Array[Array[Double]])
    extends UnaryExpression {

  require(centers.nonEmpty, "graft_argmin_center needs at least one center")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_argmin_center expects array<double>, got ${t.sql}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_argmin_center"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != centers(0).length) return null
    var best = Double.PositiveInfinity
    var bestIdx = -1
    var i = 0
    while (i < centers.length) {
      val c = centers(i)
      var d = 0.0
      var j = 0
      while (j < n) { val t = a.getDouble(j) - c(j); d += t * t; j += 1 }
      if (d < best) { best = d; bestIdx = i }
      i += 1
    }
    java.lang.Integer.valueOf(if (bestIdx < 0) 0 else bestIdx)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cRef = ctx.addReferenceObj("argminCenters", centers, "double[][]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      val c = ctx.freshName("c")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $cRef[0].length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestIdx = -1;
         |  for (int $i = 0; $i < $cRef.length; $i++) {
         |    final double[] $c = $cRef[$i];
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      final double $t = $a.getDouble($j) - $c[$j];
         |      $d += $t * $t;
         |    }
         |    if ($d < $best) { $best = $d; $bestIdx = $i; }
         |  }
         |  ${ev.value} = $bestIdx < 0 ? 0 : $bestIdx;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

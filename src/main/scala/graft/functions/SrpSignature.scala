package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Whole sign-random-projection signature in one codegen'd pass — the SRP
  * member of the per-row sketch-kernel family (graft_minhash_sig,
  * graft_simhash64): all `planes.length` hyperplane dot-signs of one vector
  * computed in a single fused loop nest, instead of one expression tree
  * (array literal + dot + compare + shift) per bit. The hyperplanes are
  * carried as a codegen reference object, not literals, so the generated
  * source stays small at any bit count. Null if the input is null or its
  * length differs from the plane dimension. */
case class SrpSignature(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 63, "1..63 hyperplanes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_srp_sig expects array<double>, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_srp_sig"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != planes(0).length) return null
    var sig = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += a.getDouble(j) * p(j); j += 1 }
      if (dot >= 0) sig |= (1L << i)
      i += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pRef = ctx.addReferenceObj("srpPlanes", planes, "double[][]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val sig = ctx.freshName("sig")
      val p = ctx.freshName("p")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $pRef[0].length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sig = 0L;
         |  for (int $i = 0; $i < $pRef.length; $i++) {
         |    final double[] $p = $pRef[$i];
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $dot += $a.getDouble($j) * $p[$j];
         |    }
         |    if ($dot >= 0) $sig |= (1L << $i);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

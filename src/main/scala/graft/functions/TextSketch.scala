package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row text-sketch kernels for the dedup pipeline.
  *
  * The exploded formulations (shingle explode -> groupBy -> k min-aggregates,
  * token explode -> 64 bit-sum aggregates) shuffle every shingle/token of
  * every document; at 100 TB that shuffle dominates the job. These kernels
  * compute the complete MinHash signature / SimHash per ROW in one fused
  * loop — no explode, no shuffle, embarrassingly parallel over input splits.
  *
  * Bit-compatibility: hashes reproduce Spark's `xxhash64` exactly
  * (seed 42, `XXH64.hashUTF8String` for strings, `hashLong`/`hashInt`
  * chaining for multi-arg calls), so the sketches are identical to the
  * values the exploded pipeline produced; DedupSpec asserts the parity.
  *
  * Reference semantics modeled: shingle/minhash dedup as used by
  * large-scale corpus curation (beyond-reference pipeline surface;
  * SURVEY.md "Beyond-reference").
  */
object TextSketchKernel {
  private final val Seed = 42L

  /** k-member minhash signature over word `shingleN`-gram shingles of
    * (already-lowercased) `text`. Tokenization matches Spark's
    * `split(text, " ")` (limit -1: trailing empty strings kept); a document
    * with fewer than `shingleN` tokens contributes the whole text as its
    * single shingle — both exactly as `Dedup.shingles` computed.
    * Member `s` of the signature is
    * `min over shingles of xxhash64(xxhash64(shingle), s)`. */
  def minhashSig(text: UTF8String, shingleN: Int, k: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val nTok = toks.length
    if (nTok >= shingleN) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j <= nTok - shingleN) {
        sb.setLength(0)
        var t = 0
        while (t < shingleN) {
          if (t > 0) sb.append(' ')
          sb.append(toks(j + t))
          t += 1
        }
        updateMins(mins, k, UTF8String.fromString(sb.toString))
        j += 1
      }
    } else {
      // split-on-space then join-with-space is the identity, so the single
      // shingle concat_ws(" ", tokens) is the input text itself
      updateMins(mins, k, text)
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  private def updateMins(mins: Array[Long], k: Int, shingle: UTF8String): Unit = {
    val h = XXH64.hashUTF8String(shingle, Seed)
    // xxhash64(h, s) folds children left-to-right from seed 42:
    // hashInt(s, hashLong(h, 42))
    val base = XXH64.hashLong(h, Seed)
    var s = 0
    while (s < k) {
      val hs = XXH64.hashInt(s, base)
      if (hs < mins(s)) mins(s) = hs
      s += 1
    }
  }

  /** 64-bit SimHash of (already-lowercased) `text`: bit i is set iff the
    * count of tokens whose `xxhash64` has bit i set is >= the count of those
    * that don't. Token multiplicity counts (no distinct), matching the
    * exploded formulation. */
  def simhash64(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val counts = new Array[Int](64)
    var j = 0
    while (j < toks.length) {
      val h = XXH64.hashUTF8String(UTF8String.fromString(toks(j)), Seed)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) >= 0) out |= (1L << i)
      i += 1
    }
    out
  }
}

/** `graft_minhash_sig(text, shingleN, k)` — whole-signature minhash as one
  * codegen'd call per row (see [[TextSketchKernel.minhashSig]]). */
case class MinhashSignature(child: Expression, shingleN: Int, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig expects a string input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(t: Any): Any =
    TextSketchKernel.minhashSig(t.asInstanceOf[UTF8String], shingleN, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextSketchKernel.minhashSig($c, $shingleN, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_simhash64(text)` — 64-bit SimHash as one codegen'd call per row
  * (see [[TextSketchKernel.simhash64]]). */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 expects a string input, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(t: Any): Any =
    TextSketchKernel.simhash64(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketchKernel.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

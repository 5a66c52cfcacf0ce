package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Learned BPE merge table + the greedy encoder (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" §3.2).
  *
  * Encoding a word: start from its character symbols, repeatedly find the
  * adjacent pair with the LOWEST merge rank and fuse every occurrence
  * left-to-right, until no learned pair applies — the standard greedy
  * loop. Text is whitespace-split first; words encode independently and
  * their pieces concatenate (no cross-word merges), so
  * `concat(pieces of word) == word` always holds.
  *
  * A plain JVM object (not expression logic) so the codegen'd caller is a
  * single virtual call on a reference object — the merge loop runs as
  * compiled Scala inside the WholeStageCodegen stage.
  */
final class BpeTable(val merges: Array[(String, String)]) extends Serializable {
  @transient private lazy val rank: Map[(String, String), Int] =
    merges.iterator.zipWithIndex.map { case (p, i) => p -> i }.toMap

  /** Encode one word into its BPE pieces. */
  def encodeWord(word: String): Seq[String] = {
    if (word.isEmpty) return Nil
    // split by CODE POINT, not UTF-16 unit: per-char splitting tears
    // supplementary-plane symbols (emoji, CJK extensions) into unpaired
    // surrogates that UTF8String renders as '?', breaking the
    // concat(pieces) == word invariant on wild text
    var syms: Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out.result()
    }
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (a, b) = merges(bestRank)
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  /** Encode whitespace-separated text: per-word pieces, concatenated.
    * Lowercasing is locale-independent (ROOT) to match the
    * `lower()`-based training tokenizer — default-locale lowercasing
    * would drift on e.g. tr_TR JVMs (I -> dotless ı). */
  def encode(text: UTF8String): ArrayData = {
    val words = text.toString.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val out = mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) encodeWord(words(i)).foreach(p => out += UTF8String.fromString(p))
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** `graft_bpe_encode(text, mergesLiteral)`: BPE-encode a text column with a
  * learned merge table. The table arrives as a foldable
  * array<array<string>> literal (pairs in rank order), extracted ONCE at
  * plan time into a [[BpeTable]] reference object — the literal never
  * reaches codegen, so generated source stays small at any merge count
  * (same discipline as graft_argmin_center's centroid matrix). */
case class BpeEncode(child: Expression, table: BpeTable) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_encode expects string, got ${t.sql}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bpe_encode"

  override def nullSafeEval(input: Any): Any =
    table.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
      s"${ev.value} = $ref.encode($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One BPE merge applied to a piece array: greedy left-to-right fuse of
  * every non-overlapping adjacent (left, right) into left+right — the
  * inductive training step. A plain JVM object (same discipline as
  * [[BpeTable]]) so the codegen'd caller is one virtual call; the
  * interpreted higher-order-function fold this replaced cost ~3x the FULL
  * 40-merge kernel replay per iteration at the 5M-doc scale probe
  * (SCALING.md round 9). */
final class BpeMergePair(l: String, r: String) extends Serializable {
  private val lU = UTF8String.fromString(l)
  private val rU = UTF8String.fromString(r)
  private val fused = UTF8String.fromString(l + r)

  def apply(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      if (i < n - 1 && lU.equals(arr.getUTF8String(i)) &&
          rU.equals(arr.getUTF8String(i + 1))) {
        out += fused; i += 2
      } else { out += arr.getUTF8String(i); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }
}

/** `graft_bpe_merge_step(pieces, left, right)`: apply ONE merge to an
  * array<string> of pieces (left/right arrive as string literals,
  * extracted at plan time). The compiled form of classic BPE training's
  * per-iteration state update — Bpe.train composes numMerges of these, one
  * per learned merge. */
case class BpeMergeStep(child: Expression, pair: BpeMergePair) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_merge_step expects array<string>, got ${t.sql}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bpe_merge_step"

  override def nullSafeEval(input: Any): Any =
    pair(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("bpeMerge", pair, classOf[BpeMergePair].getName)
      s"${ev.value} = $ref.apply($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

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

  /** The greedy lowest-rank loop from an arbitrary symbol sequence. */
  private def greedy(syms0: Vector[String]): Vector[String] = {
    var syms = syms0
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

  /** Encode one word into its BPE pieces. */
  def encodeWord(word: String): Seq[String] = {
    if (word.isEmpty) return Nil
    // split by CODE POINT, not UTF-16 unit: per-char splitting tears
    // supplementary-plane symbols (emoji, CJK extensions) into unpaired
    // surrogates that UTF8String renders as '?', breaking the
    // concat(pieces) == word invariant on wild text
    val syms = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out.result()
    }
    greedy(syms)
  }

  /** Resume the greedy loop from an already-partially-merged piece array —
    * incremental training's state update. Correctness does not depend on
    * the state's provenance: from scratch, the lowest-rank-first loop
    * never chooses rank k while any lower rank applies anywhere, so with
    * table 0..k it first replays exactly the table-0..k-1 fusion sequence
    * (reaching that table's fixpoint) and only then continues — which is
    * precisely this call on the maintained state. A single-pair pass is
    * NOT sufficient here: fusing the new merge can create a symbol string
    * equal to a LOWER-rank merge's component and re-enable it (round-9
    * review counterexample), so the full greedy loop must run. */
  def encodePieces(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val in = Vector.newBuilder[String]
    var i = 0
    while (i < n) {
      // null elements never come from this family's kernels, but the
      // training state round-trips through parquet, which widens the
      // element nullability — drop nulls rather than NPE on a widened type
      if (!arr.isNullAt(i)) in += arr.getUTF8String(i).toString
      i += 1
    }
    new GenericArrayData(
      greedy(in.result()).map(s => UTF8String.fromString(s)).toArray[Any])
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

/** `graft_bpe_encode_pieces(pieces, mergesLiteral)`: resume the greedy
  * lowest-rank loop from a piece array — incremental training's compiled
  * state update (see [[BpeTable.encodePieces]] for why the FULL loop, not
  * a single-pair pass, is required). Accepts nullable-element arrays
  * because the training state round-trips through parquet (which widens
  * element nullability); null elements are dropped, never emitted. */
case class BpeEncodePieces(child: Expression, table: BpeTable) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_encode_pieces expects array<string>, got ${t.sql}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bpe_encode_pieces"

  override def nullSafeEval(input: Any): Any =
    table.encodePieces(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
      s"${ev.value} = $ref.encodePieces($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary over a string column, `m` counters.
  *
  * Classic streaming heavy hitters (Misra & Gries 1982) with the mergeable
  * reduction of Agarwal et al., "Mergeable Summaries" (PODS 2012):
  * partials merge by pointwise count addition followed by subtracting the
  * (m+1)-th largest count — the summary keeps the MG guarantee through any
  * merge tree, which is exactly what a Spark partial/final aggregation is.
  *
  * Guarantees (N = total items fed in): every reported count `est`
  * satisfies `true - N/(m+1) <= est <= true`, and every item with true
  * frequency > N/(m+1) is present in the summary. Counts are lower
  * bounds and CAN vary with merge order (the guarantee does not) — so
  * consumers that need deterministic output re-count the candidates
  * exactly (see TextAnalysis.heavyHitters), the standard two-pass
  * heavy-hitter pattern.
  *
  * Scale shape: fixed m-entry buffers regardless of cardinality — the
  * whole point vs an exact groupBy whose shuffle carries every distinct
  * term of a 100 TB corpus.
  *
  * Output: array<struct<term string, count_lb bigint>> ordered
  * (count_lb DESC, term ASC).
  */
case class MisraGries(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(m > 0, "graft_misra_gries: counter budget must be positive")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType), StructField("count_lb", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String].toString
      buf.get(t) match {
        case Some(c) => buf.update(t, c + 1)
        case None if buf.size < m => buf.update(t, 1L)
        case None => // full miss: decrement every counter, drop zeros
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > m) {
      // subtract the (m+1)-th largest count, keep strictly positive
      val cut = a.values.toArray.sortBy(-_).apply(m)
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - cut)
      a.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  // length-prefixed UTF-8, not writeUTF: writeUTF caps entries at 64 KB
  // and a pathological unbroken "word" in wild data must degrade to a big
  // counter key, not a task failure
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

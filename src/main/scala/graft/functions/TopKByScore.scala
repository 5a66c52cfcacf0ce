package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable bounded top-k aggregate: collects the `k` input values with the
  * highest `score`, ties broken by ascending `tie` (callers pass a unique id
  * so the result is deterministic and oracle-comparable). Output is an array
  * of the values ordered (score DESC, tie ASC).
  *
  * This is the scale-safe form of "keep the best k rows per group"
  * (per-domain caps, per-source quality retention — RefinedWeb §3 keeps
  * top documents per domain): a window `row_number() <= k` shuffles EVERY
  * row of a group through one task, whereas this aggregate's partial
  * buffers are capped at k entries — the shuffle carries at most
  * k * groups * mapTasks rows no matter how large the corpus. At 100 TB
  * with per-source groups the difference is the whole job.
  *
  * Buffer: a min-heap keyed (score ASC, tie DESC) so the head is always the
  * weakest entry — O(log k) insert/evict. Values are copied on insert
  * (Spark reuses row objects) and serialized for shuffle through an
  * UnsafeProjection over (score, tie, value).
  */
case class TopKByScore(
    child: Expression,
    score: Expression,
    tie: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long, Any)]]
  with TernaryLike[Expression] {

  require(k > 0, "graft_top_k: k must be positive")

  override def first: Expression = child
  override def second: Expression = score
  override def third: Expression = tie

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k"

  // head of the queue = the entry to EVICT first: lowest score, then
  // highest tie (a later id loses the tie). Comparisons use
  // java.lang.Double.compare — a TOTAL order where NaN ranks above every
  // value — so NaN scores behave deterministically across partitionings
  // and match Spark/DuckDB ORDER BY ... DESC (NaN first); IEEE `>` would
  // admit NaN while filling but never let it win an eviction, making the
  // result merge-order dependent (found in review).
  private val evictionOrder: Ordering[(Double, Long, Any)] =
    new Ordering[(Double, Long, Any)] {
      override def compare(x: (Double, Long, Any), y: (Double, Long, Any)): Int = {
        val c = java.lang.Double.compare(y._1, x._1) // smaller score = evict sooner
        if (c != 0) c else java.lang.Long.compare(x._2, y._2) // larger tie loses
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long, Any)] =
    mutable.PriorityQueue.empty(evictionOrder)

  private def copyValue(v: Any): Any = v match {
    case r: InternalRow => r.copy()
    case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
    case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
    case s: org.apache.spark.unsafe.types.UTF8String => s.copy()
    case other => other
  }

  private def insert(buf: mutable.PriorityQueue[(Double, Long, Any)],
                     s: Double, t: Long, v: Any, copied: Boolean): Unit = {
    if (buf.size < k) {
      buf.enqueue((s, t, if (copied) v else copyValue(v)))
    } else {
      val worst = buf.head
      // keep iff (s, t) beats the worst under the same total order:
      // higher score (NaN greatest), or equal score and smaller tie
      val c = java.lang.Double.compare(s, worst._1)
      if (c > 0 || (c == 0 && t < worst._2)) {
        buf.dequeue()
        buf.enqueue((s, t, if (copied) v else copyValue(v)))
      }
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long, Any)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long, Any)] = {
    val sv = score.eval(input)
    val tv = tie.eval(input)
    val cv = child.eval(input)
    if (sv != null && tv != null && cv != null)
      insert(buf, sv.asInstanceOf[Double], tv.asInstanceOf[Long], cv, copied = false)
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Double, Long, Any)],
                     b: mutable.PriorityQueue[(Double, Long, Any)]): mutable.PriorityQueue[(Double, Long, Any)] = {
    b.foreach { case (s, t, v) => insert(a, s, t, v, copied = true) }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long, Any)]): Any = {
    // same total order as eviction: score DESC (NaN first), tie ASC
    val sorted = buf.toArray.sorted(new Ordering[(Double, Long, Any)] {
      override def compare(x: (Double, Long, Any), y: (Double, Long, Any)): Int = {
        val c = java.lang.Double.compare(y._1, x._1)
        if (c != 0) c else java.lang.Long.compare(x._2, y._2)
      }
    })
    new GenericArrayData(sorted.map(_._3))
  }

  private lazy val entryType =
    StructType(Seq(StructField("s", DoubleType), StructField("t", LongType),
      StructField("v", child.dataType)))
  @transient private lazy val proj = UnsafeProjection.create(entryType)

  override def serialize(buf: mutable.PriorityQueue[(Double, Long, Any)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, t, v) =>
      val row = proj.apply(InternalRow(s, t, v))
      out.writeInt(row.getSizeInBytes)
      row.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long, Any)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val size = in.readInt()
      val rowBytes = new Array[Byte](size)
      in.readFully(rowBytes)
      val row = new UnsafeRow(3)
      row.pointTo(rowBytes, size)
      val v = copyValue(row.get(2, child.dataType))
      buf.enqueue((row.getDouble(0), row.getLong(1), v))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKByScore =
    copy(child = newFirst, score = newSecond, tie = newThird)
}

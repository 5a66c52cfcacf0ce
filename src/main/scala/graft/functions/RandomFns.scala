package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** RANDOM() — a fresh full-range int64 per row (reference:
  * /root/reference/server/sql_expression_numeric.h:89 Random,
  * sqlite3_randomness via VdbeUtils::generateRandom,
  * /root/reference/server/sql_utils_vdbe.cpp:762). Like Spark's own Rand,
  * the stream is seeded per (plan seed, partition) so rows are independent
  * across the cluster and a fixed `seed` reproduces the stream per
  * partition — the deterministic-rerun property the reference's global
  * CSPRNG does not give, and the reason the oracle pipeline still excludes
  * these (nondeterministic vs DuckDB by nature; spec-covered instead). */
case class GraftRandom(seed: Long) extends LeafExpression
    with Nondeterministic with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "random"

  @transient private var rng: java.util.Random = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new java.util.Random(seed ^ (partitionIndex.toLong * 0x9e3779b97f4a7c15L))

  override protected def evalInternal(input: InternalRow): Any = rng.nextLong()
}

/** RANDOMBLOB(n) — max(n, 1) random bytes; a NULL size means 1 byte, same
  * as the reference (RandomBlob defaultSize,
  * /root/reference/server/sql_expression_string.cpp:280-298). */
case class GraftRandomBlob(child: Expression, seed: Long) extends UnaryExpression
    with Nondeterministic with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "randomblob"

  @transient private var rng: java.util.Random = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new java.util.Random(seed ^ (partitionIndex.toLong * 0x9e3779b97f4a7c15L))

  override protected def evalInternal(input: InternalRow): Any = {
    val requested = child.eval(input) match {
      case null => 1L
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
      case s: java.lang.Short => s.longValue()
      case b: java.lang.Byte => b.longValue()
      case other => throw new IllegalArgumentException(
        s"randomblob size must be integral, got $other")
    }
    val n = math.max(requested, 1L)
    require(n <= (1L << 26), s"randomblob size $n exceeds the 64 MiB guard")
    val bytes = new Array[Byte](n.toInt)
    rng.nextBytes(bytes)
    bytes
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

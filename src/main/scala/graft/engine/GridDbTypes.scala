package graft.engine

import org.apache.spark.sql.types._

/** GridDB column-type mapping (SURVEY.md §1.2).
  *
  * Reference type ids: /root/reference/server/data_store_common.h:136-165
  * (NoSQL) and /root/reference/server/sql_tuple.h:76-93 (SQL tuples); fixed
  * sizes at data_store_common.h:193-216.
  */
object GridDbTypes {

  /** GridDB type name -> Spark DataType. NANO_TIMESTAMP maps to LongType
    * (lossless epoch nanos; Spark timestamps are µs — see Tables.events). */
  val toSpark: Map[String, DataType] = Map(
    "STRING" -> StringType,        // id 0
    "BOOL" -> BooleanType,         // id 1
    "BYTE" -> ByteType,            // id 2
    "SHORT" -> ShortType,          // id 3
    "INTEGER" -> IntegerType,      // id 4
    "LONG" -> LongType,            // id 5
    "FLOAT" -> FloatType,          // id 6
    "DOUBLE" -> DoubleType,        // id 7
    "TIMESTAMP" -> TimestampType,  // id 8 (ms in GridDB; µs in Spark)
    "MICRO_TIMESTAMP" -> TimestampType, // id 21
    "NANO_TIMESTAMP" -> LongType,  // id 22 — epoch nanos, lossless
    "GEOMETRY" -> StringType,      // id 9 — WKT (graft.geometry ops)
    "BLOB" -> BinaryType,          // id 10
    "NUMERIC" -> DecimalType(38, 18))

  /** *_ARRAY variants (ids 12-20; NoSQL API only). */
  def arrayType(elem: String): DataType =
    ArrayType(toSpark.getOrElse(elem,
      throw new IllegalArgumentException(s"unknown GridDB type $elem")))

  /** Spark DataType -> GridDB type name (inverse, for #columns metadata). */
  def fromSpark(dt: DataType): String = dt match {
    case StringType => "STRING"
    case BooleanType => "BOOL"
    case ByteType => "BYTE"
    case ShortType => "SHORT"
    case IntegerType => "INTEGER"
    case LongType => "LONG"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case BinaryType => "BLOB"
    case _: DecimalType => "NUMERIC"
    case ArrayType(e, _) => fromSpark(e) + "_ARRAY"
    case other => other.simpleString.toUpperCase
  }
}

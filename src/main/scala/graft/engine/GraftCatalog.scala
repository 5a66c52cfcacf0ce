package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Container catalog: GridDB's DDL/DML surface mapped onto Spark.
  *
  * Reference surface: CREATE/DROP TABLE (rules 15-41
  * /root/reference/server/sql_internal_parser.cpp:849-875), TimeSeries DDL
  * (`USING TIMESERIES`, rule 40), partitioned tables (rules 29-31),
  * Container.put/get/remove (java_client/.../Container.java:437,557,671),
  * metadata tables #tables/#columns (/root/reference/server/meta_type.h:89-115).
  *
  * Semantics: `put` is INSERT-OR-REPLACE by row key (GridDB upserts on PK);
  * implemented as union + keep-latest-per-key — the MERGE pattern that scales
  * as one shuffle on the key. Data lives in temp views (tests) — the same
  * API drives partitioned parquet layouts via `PartitionedTables`.
  */
final class GraftCatalog(spark: SparkSession) {

  private val containers = scala.collection.mutable.LinkedHashMap[String, Container]()

  def createCollection(name: String, schema: StructType,
                       keyColumns: Seq[String] = Nil): Container = {
    val df = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    register(Container(name, df, Collection, keyColumns, None))
  }

  def createTimeSeries(name: String, schema: StructType,
                       timeColumn: String): Container = {
    require(schema.fieldNames.contains(timeColumn), s"missing $timeColumn")
    val df = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    register(Container(name, df, TimeSeries, Seq(timeColumn), Some(timeColumn)))
  }

  def register(c: Container): Container = {
    containers(c.name) = c
    c.df.createOrReplaceTempView(c.name)
    c
  }

  def get(name: String): Container =
    containers.getOrElse(name,
      throw new NoSuchElementException(s"container $name does not exist"))

  def exists(name: String): Boolean = containers.contains(name)

  def dropContainer(name: String): Unit = {
    containers.remove(name)
    spark.catalog.dropTempView(name)
  }

  /** INSERT OR REPLACE by row key (PUT semantics). Rows with keys already
    * present replace the stored rows; unkeyed containers append. */
  def put(name: String, rows: DataFrame): Container = {
    val c = get(name)
    val merged =
      if (c.keyColumns.isEmpty) c.df.unionByName(rows)
      else {
        val tagged = c.df.withColumn("__gen", lit(0))
          .unionByName(rows.withColumn("__gen", lit(1)))
        val w = Window.partitionBy(c.keyColumns.map(col): _*)
          .orderBy(col("__gen").desc)
        tagged.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__gen", "__rn")
      }
    // materialize so repeated puts don't stack lineage unboundedly
    val mat = spark.createDataFrame(merged.collectAsList(), merged.schema)
    register(c.copy(df = mat))
  }

  /** Point/row-key lookup (GET semantics). */
  def getRows(name: String, keyValues: Seq[Any]): DataFrame = {
    val c = get(name)
    require(c.keyColumns.nonEmpty, s"$name has no row key")
    val cond = c.keyColumns.zip(keyValues)
      .map { case (k, v) => col(k) === lit(v) }.reduce(_ && _)
    c.df.filter(cond)
  }

  /** Batch point lookup — GridStore.multiGet
    * (/root/reference/java_client/.../GridStore.java:2174): one filter over
    * the key set (an IN-predicate scan, not N point reads). */
  def multiGet(name: String, keys: Seq[Any]): DataFrame = {
    val c = get(name)
    require(c.keyColumns.size == 1, s"$name needs a single-column row key")
    c.df.filter(col(c.keyColumns.head).isin(keys: _*))
  }

  /** RowKeyPredicate range scan (java_client/.../RowKeyPredicate.java):
    * inclusive start, exclusive finish, either optional. */
  def keyRange(name: String, from: Option[Any], until: Option[Any]): DataFrame = {
    val c = get(name)
    require(c.keyColumns.size == 1, s"$name needs a single-column row key")
    val k = col(c.keyColumns.head)
    val conds = from.map(k >= lit(_)).toSeq ++ until.map(k < lit(_)).toSeq
    conds.foldLeft(c.df)((d, cond) => d.filter(cond))
  }

  /** DELETE by key (REMOVE semantics). */
  def remove(name: String, keyValues: Seq[Any]): Container = {
    val c = get(name)
    require(c.keyColumns.nonEmpty, s"$name has no row key")
    val cond = c.keyColumns.zip(keyValues)
      .map { case (k, v) => col(k) === lit(v) }.reduce(_ && _)
    val remaining = c.df.filter(!cond)
    val mat = spark.createDataFrame(remaining.collectAsList(), remaining.schema)
    register(c.copy(df = mat))
  }

  /** SQL UPDATE ... SET ... WHERE (DMLProcessor semantics,
    * /root/reference/server/sql_processor_dml.h:39): assignments applied to
    * matching rows, others untouched. */
  def update(name: String, assignments: Map[String, org.apache.spark.sql.Column],
             where: org.apache.spark.sql.Column): Container = {
    val c = get(name)
    val updated = assignments.foldLeft(c.df) { case (d, (colName, v)) =>
      d.withColumn(colName, when(where, v).otherwise(col(colName)))
    }
    val mat = spark.createDataFrame(updated.collectAsList(), updated.schema)
    register(c.copy(df = mat))
  }

  /** SQL DELETE ... WHERE. */
  def deleteWhere(name: String, where: org.apache.spark.sql.Column): Container = {
    val c = get(name)
    val remaining = c.df.filter(!coalesce(where, lit(false)))
    val mat = spark.createDataFrame(remaining.collectAsList(), remaining.schema)
    register(c.copy(df = mat))
  }

  /** CREATE [OR REPLACE] VIEW name AS <sql> (grammar rule 74). */
  def createView(name: String, sql: String): Unit =
    spark.sql(sql).createOrReplaceTempView(name)

  /** Metadata table `#tables` (meta_type.h TYPE_CONTAINER). */
  def metaTables: DataFrame = {
    import spark.implicits._
    containers.values.toSeq.map { c =>
      (c.name,
        c.kind match { case TimeSeries => "TIMESERIES"; case Collection => "COLLECTION" },
        c.keyColumns.mkString(","), c.timeColumn.orNull)
    }.toDF("TABLE_NAME", "TABLE_TYPE", "ROW_KEY", "TIME_COLUMN")
  }

  /** Metadata table `#columns` (meta_type.h TYPE_COLUMN). */
  def metaColumns: DataFrame = {
    import spark.implicits._
    containers.values.toSeq.flatMap { c =>
      c.df.schema.fields.zipWithIndex.map { case (f, i) =>
        (c.name, i, f.name, GridDbTypes.fromSpark(f.dataType), f.nullable,
          c.keyColumns.contains(f.name))
      }
    }.toDF("TABLE_NAME", "ORDINAL", "COLUMN_NAME", "TYPE_NAME", "NULLABLE", "KEY")
  }

  def listContainers: Seq[String] = containers.keys.toSeq
}

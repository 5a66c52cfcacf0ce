package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GridDB partitioned tables (SQL-level sharding) on a partitioned Parquet
  * layout.
  *
  * Reference: TablePartitionType {HASH, RANGE(INTERVAL), RANGE_HASH}
  * (/root/reference/server/sql_parser.h:300-303; grammar rules 29-31
  * /root/reference/server/sql_internal_parser.cpp:863-865):
  *   PARTITION BY HASH col PARTITIONS n
  *   PARTITION BY RANGE(col) EVERY(n, unit)
  *   PARTITION BY RANGE(col) EVERY(...) SUBPARTITION BY HASH col PARTITIONS n
  *
  * Spark mapping: a derived partition column + `write.partitionBy` —
  * partition pruning (incl. dynamic) then replaces the reference's
  * subcontainer pruning (`reducePartitionedTarget`,
  * /root/reference/server/sql_compiler.cpp:1744). TTL/`DROP PARTITION FOR`
  * maps to deleting partition directories older than the watermark.
  */
object PartitionedTables {

  sealed trait Partitioning { def columns: Seq[String] }
  /** HASH partitioning: `__p = pmod(hash(col), n)`. */
  final case class Hash(col: String, n: Int) extends Partitioning {
    def columns: Seq[String] = Seq("__p")
  }
  /** INTERVAL (RANGE) partitioning on a timestamp column: `__itv` = bucket
    * start epoch-ms. */
  final case class Interval(col: String, everyMs: Long) extends Partitioning {
    def columns: Seq[String] = Seq("__itv")
  }
  /** INTERVAL-HASH composite. */
  final case class IntervalHash(tsCol: String, everyMs: Long, hashCol: String, n: Int)
      extends Partitioning {
    def columns: Seq[String] = Seq("__itv", "__p")
  }

  /** Add the derived partition column(s). */
  def withPartitionColumns(df: DataFrame, p: Partitioning): DataFrame = p match {
    case Hash(c, n) => df.withColumn("__p", pmod(hash(col(c)), lit(n)))
    case Interval(c, e) =>
      df.withColumn("__itv", (floor(unix_millis(col(c)) / lit(e)) * lit(e)).cast("long"))
    case IntervalHash(tc, e, hc, n) =>
      df.withColumn("__itv", (floor(unix_millis(col(tc)) / lit(e)) * lit(e)).cast("long"))
        .withColumn("__p", pmod(hash(col(hc)), lit(n)))
  }

  /** Write as a partitioned parquet table. */
  def write(df: DataFrame, path: String, p: Partitioning,
            mode: String = "overwrite"): Unit =
    withPartitionColumns(df, p).write
      .partitionBy(p.columns: _*).mode(mode).parquet(path)

  /** Read the partitioned layout. `mergeSchema` (footer union across files)
    * makes ALTER TABLE ADD COLUMN free: partitions written before the ALTER
    * surface NULL for the new column. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Predicate helper: interval-pruning filter for a time range — pushes to
    * the partition column so Spark prunes directories, plus the exact bounds
    * on the data column. */
  def timeRangeFilter(df: DataFrame, tsCol: String, everyMs: Long,
                      fromMs: Long, untilMs: Long): DataFrame = {
    val lowBucket = math.floorDiv(fromMs, everyMs) * everyMs
    df.filter(col("__itv") >= lowBucket && col("__itv") < untilMs &&
      unix_millis(col(tsCol)) >= fromMs && unix_millis(col(tsCol)) < untilMs)
  }

  /** Write as a bucketed + sorted catalog table: joins/aggregations on the
    * bucket key become exchange-free (co-located), the Spark analogue of the
    * reference pinning scan tasks to the data-owning node
    * (/root/reference/server/sql_execution.cpp:1296). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, mode: String = "overwrite"): Unit = {
    val spark = df.sparkSession
    if (mode == "overwrite") {
      // overwrite means overwrite: an orphaned warehouse directory (a
      // killed run wrote files, but the in-memory catalog entry died with
      // its session) would otherwise fail saveAsTable with
      // LOCATION_ALREADY_EXISTS
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write.mode(mode)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Watermark for declarative TTL on an interval layout: partitions
    * [b0, b0+every) are erasable once their END plus the TTL has passed
    * (`erasableTime = endTime + duration`, checkExpirableInterval
    * /root/reference/server/nosql_command.cpp:4193) — i.e. every bucket
    * strictly below `floor((now-ttl)/every)*every`. Feed the result to
    * [[dropPartitionsBefore]]; [[GraftCatalog.expireNow]] applies the same
    * arithmetic to catalog containers. */
  def ttlWatermark(nowMs: Long, ttlMs: Long, everyMs: Long): Long =
    Math.floorDiv(nowMs - ttlMs, everyMs) * everyMs

  /** TTL / ALTER TABLE ... DROP PARTITION FOR: delete interval partitions
    * entirely before the watermark (epoch ms). Returns dropped bucket ids. */
  def dropPartitionsBefore(spark: SparkSession, path: String,
                           watermarkMs: Long): Seq[Long] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(base)) return Nil
    val dropped = fs.listStatus(base).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val name = st.getPath.getName
        if (name.startsWith("__itv=")) {
          val bucket = name.stripPrefix("__itv=").toLong
          if (bucket < watermarkMs) { fs.delete(st.getPath, true); Some(bucket) }
          else None
        } else None
      }
    dropped.sorted
  }
}

package graft.engine

import org.apache.spark.sql.SparkSession

/** Driver-side table statistics from parquet FOOTER metadata — the
  * zero-Spark-job row count a catalog would serve from its stats store.
  *
  * The reference engine's planner consumes index/container row counts at
  * compile time (resolveIndexStats /root/reference/server/sql_execution.cpp:3182,
  * TABLE_ROW_COUNT hint /root/reference/server/sql_compiler.h:34-66); Spark's
  * analogue for a parquet-backed table is the footers' `getRecordCount` sum —
  * exact, file-metadata-only, no executor involvement. Registered queries use
  * this to hand operators an exact `corpusSize` so the operators' adaptive
  * exchange sizing (Dedup.widthFromBytes) and AUTO hyper-parameters
  * (embeddingCandidates band bits) never pay a count JOB or a per-call
  * optimizer pass (r10 BenchCompare flagged both).
  *
  * Counts are cached per path for the JVM's lifetime: test/bench fixtures are
  * immutable, and a production deployment would invalidate through its
  * catalog. Mutable tables must not use this cache.
  */
object TableStats {

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Recursive on-disk byte size of a local file/directory tree — the
    * size a storage bill sees. Local-FS only (probes and specs measuring
    * written parquet); not cached. */
  def treeSize(path: String): Long = {
    val f = new java.io.File(path)
    if (!f.exists) 0L
    else if (f.isFile) f.length
    else f.listFiles.map(x => treeSize(x.getPath)).sum
  }

  /** Exact row count of the parquet file/directory at `path` from footer
    * metadata only; cached per-path. Recurses into partition directories. */
  def parquetRowCount(spark: SparkSession, path: String): Long =
    cache.computeIfAbsent(path, p => {
      val conf = spark.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(p)
      val fs = root.getFileSystem(conf)
      def files(s: org.apache.hadoop.fs.FileStatus): Seq[org.apache.hadoop.fs.Path] =
        if (s.isDirectory) fs.listStatus(s.getPath).toSeq.flatMap(files)
        else if (s.getPath.getName.endsWith(".parquet")) Seq(s.getPath)
        else Nil
      files(fs.getFileStatus(root)).map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
    })

  /** Test hook: drop cached counts (e.g. after rewriting a fixture). */
  private[graft] def invalidate(): Unit = cache.clear()
}

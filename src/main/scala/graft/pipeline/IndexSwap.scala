package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Rename-aside swap of a freshly-built index tree over a live one — the
  * other half of the persisted-index write protocol next to
  * [[WriterLock]], kept in ONE place for both index families (r14 review:
  * the IvfIndex retrain and MinhashIndex compact copies had begun to
  * diverge).
  *
  * Never delete-first: a crash between delete and rename would destroy
  * the only copy. Crash windows leave either the old tree still serving
  * at `path`, or the old tree intact at `<path>_old` with the rebuild at
  * `path` / `tmp` — always recoverable by a rename.
  *
  * This is a MAINTENANCE operation with respect to readers: an in-flight
  * probe plan holds file paths under `path` that the rename invalidates
  * mid-execution — callers must quiesce probes (or rebuild reader plans
  * on failure); the retryTransient reader guard covers plan CREATION,
  * not a plan already executing. */
private[pipeline] object IndexSwap {

  def swapInPlace(spark: SparkSession, path: String, tmp: String,
                  what: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(conf)
    val old = new org.apache.hadoop.fs.Path(s"${path}_old")
    fs.delete(old, true)
    require(fs.rename(dst, old),
      s"$what swap failed: could not move $path aside")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)) {
      fs.rename(old, dst) // restore the previous tree before failing
      throw new IllegalStateException(
        s"$what swap failed: could not rename $tmp over $path")
    }
    fs.delete(old, true)
    ()
  }
}

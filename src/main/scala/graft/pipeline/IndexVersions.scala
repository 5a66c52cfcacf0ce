package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Versioned index layout (r15, r14 verdict #2) — replaces the
  * rename-aside IndexSwap (removed r15) whose reader contract ("quiesce probes
  * around compaction/retrain") a serving cluster cannot honor.
  *
  * Layout: the index data trees live under `<path>/v=N/...`; a version is
  * VISIBLE once `<path>/v=N/_COMMITTED` exists (one atomic file create —
  * no rename-overwrite semantics, so the flip works on any filesystem
  * where file creation is atomically visible, object stores included).
  *
  * Reader contract: resolve [[currentRoot]] ONCE at plan creation (every
  * probe/topK entry does) — the returned tree's files are immutable, so an
  * in-flight plan is never invalidated by a concurrent maintenance write.
  * Maintenance (compact/retrain/rebuild) stages the new tree at v=N+1,
  * commits it, and GARBAGE-COLLECTS only versions ≤ N-1 — the version a
  * plan can still be reading (N) survives exactly one more maintenance
  * cycle (the GRACE version). A plan pinned TWO maintenance cycles ago can
  * lose files — re-create reader plans at least once per maintenance
  * interval (a non-contract in practice: plans are per-query).
  *
  * Legacy layout (data trees directly under `path`, pre-r15) is read
  * transparently: [[currentRoot]] falls back to `path` when no committed
  * version exists; the first versioned maintenance write leaves the legacy
  * trees in place as the grace "version" and the second removes them.
  *
  * Writers are serialized by [[WriterLock]] as before; this object owns
  * only version resolution, commit, and GC.
  */
private[pipeline] object IndexVersions {

  private val V = "^v=(\\d+)$".r

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** (version, committed?) pairs of every `v=N` dir under `path`. */
  private def versions(spark: SparkSession,
                       path: String): Seq[(Int, Boolean)] = {
    val (fs, p) = fsOf(spark, path)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.flatMap { st =>
      st.getPath.getName match {
        case V(n) if st.isDirectory =>
          Some((n.toInt, fs.exists(
            new org.apache.hadoop.fs.Path(st.getPath, "_COMMITTED"))))
        case _ => None
      }
    }
  }

  /** The data root a READER should use right now: the highest committed
    * version, or `path` itself for a legacy (unversioned) index. Resolve
    * once per plan. */
  def currentRoot(spark: SparkSession, path: String): String =
    versions(spark, path).filter(_._2).map(_._1).maxOption
      .map(n => s"$path/v=$n").getOrElse(path)

  /** The data root a WRITER that mutates IN PLACE (append) should use:
    * same resolution — appends land inside the current version (additive
    * partitions; safe under serving). Call under the writer lock. */
  def writeRoot(spark: SparkSession, path: String): String =
    currentRoot(spark, path)

  /** Staging root for a full REPLACEMENT tree (build/compact/retrain):
    * `<path>/v=N+1`, invisible to readers until [[commit]]. Also clears
    * any stale uncommitted staging dir left by a crashed writer (safe: we
    * hold the writer lock, and uncommitted dirs are invisible). Call under
    * the writer lock. */
  def stage(spark: SparkSession, path: String): String = {
    val vs = versions(spark, path)
    val (fs, _) = fsOf(spark, path)
    vs.filterNot(_._2).foreach { case (n, _) =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/v=$n"), true)
    }
    val next = vs.filter(_._2).map(_._1).maxOption.getOrElse(0) + 1
    s"$path/v=$next"
  }

  /** Make the staged version visible (atomic `_COMMITTED` create) and GC
    * everything older than the grace version: committed versions ≤ N-2
    * always; the legacy root trees (`legacyDirs` under `path`) once the
    * grace window has passed them (N ≥ 2). Call under the writer lock. */
  def commit(spark: SparkSession, path: String, stagedRoot: String,
             legacyDirs: Seq[String]): Unit = {
    val (fs, _) = fsOf(spark, path)
    val n = stagedRoot.substring(stagedRoot.lastIndexOf("v=") + 2).toInt
    val ok = fs.createNewFile(
      new org.apache.hadoop.fs.Path(s"$stagedRoot/_COMMITTED"))
    require(ok, s"could not commit index version $n at $path")
    versions(spark, path).filter { case (m, committed) => committed && m <= n - 2 }
      .foreach { case (m, _) =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/v=$m"), true)
      }
    if (n >= 2) legacyDirs.foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$d"), true)
      ()
    }
  }
}

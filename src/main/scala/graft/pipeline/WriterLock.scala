package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Writer mutex for a persisted index at `path`: an atomically-created
  * `<path>.lock` file serializes writers (build/append/retrain) against
  * each other (r10 ADVICE: an append's read-meta/write-meta could
  * interleave with a concurrent rebuild's swap and lose appended counts,
  * or write meta into a swapped-out tree). Reads take no lock — probe
  * paths retry through rename windows instead. Waits up to `waitMs` for a
  * competing writer, then fails rather than proceeding unserialized; a
  * crashed writer's stale lock is the operator's to delete (the lock file
  * records owner/time for that call).
  *
  * Atomicity of acquire (r11 review): local/file paths use NIO
  * `Files.createFile` (O_EXCL) because Hadoop's ChecksumFileSystem
  * implements `create(f, overwrite=false)` as a NON-atomic
  * exists-then-create; HDFS-like filesystems keep
  * `create(overwrite=false)`, which IS atomic there. Object stores
  * without atomic create-if-absent (S3 before conditional writes) cannot
  * honor a file mutex — coordinate writers externally on such storage.
  *
  * Shared by [[IvfIndex]] and [[MinhashIndex]] (factored in r14 so the
  * two persisted-index families keep ONE copy of the acquire semantics).
  */
private[pipeline] object WriterLock {

  def withLock[A](spark: SparkSession, path: String,
                  waitMs: Long = 600000L)(body: => A): A = {
    val conf = spark.sparkContext.hadoopConfiguration
    val lock = new org.apache.hadoop.fs.Path(s"$path.lock")
    val fs = lock.getFileSystem(conf)
    val owner =
      s"${java.lang.management.ManagementFactory.getRuntimeMXBean.getName} ${System.currentTimeMillis()}"
    // "local" is decided by the filesystem the path RESOLVES to (r14
    // ADVICE): a scheme-less path under a non-file fs.defaultFS must take
    // the Hadoop branch — deciding off the raw URI scheme would acquire
    // via local NIO but release via the default filesystem
    val local = fs.getScheme == "file"
    // if the owner-write fails after create succeeded (disk full), delete
    // the just-created lock before rethrowing — otherwise every retry
    // fails FileAlreadyExists against the caller's own stale lock (r14
    // ADVICE)
    def tryAcquire(): Unit =
      if (local) {
        val nio = java.nio.file.Paths.get(
          if (lock.toUri.getScheme == null) lock.toString else lock.toUri.getPath)
        java.nio.file.Files.createFile(nio) // atomic O_EXCL
        try { java.nio.file.Files.write(nio, owner.getBytes("UTF-8")); () }
        catch { case e: Throwable =>
          java.nio.file.Files.deleteIfExists(nio); throw e }
      } else {
        val out = fs.create(lock, false)
        try { out.write(owner.getBytes("UTF-8")); out.close() }
        catch { case e: Throwable => fs.delete(lock, false); throw e }
      }
    val deadline = System.currentTimeMillis() + waitMs
    var acquired = false
    while (!acquired) {
      try { tryAcquire(); acquired = true }
      catch {
        case _: java.io.IOException if System.currentTimeMillis() < deadline =>
          Thread.sleep(200)
        case e: java.io.IOException =>
          throw new IllegalStateException(
            s"index writer lock at $path.lock not acquired within ${waitMs}ms " +
              "(concurrent writer, or a stale lock from a crashed one)", e)
      }
    }
    try body finally fs.delete(lock, false)
  }
}

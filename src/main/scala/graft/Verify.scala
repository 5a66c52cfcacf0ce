package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Hardened after round 7, where the driver's wall budget expired mid-run
  * and only the ~50 queries that happened to iterate first (Map hash
  * order) were dumped — the correctness file silently shrank to a third:
  *  - oracle_sql.json is written FIRST (it's cheap and the compare needs
  *    it no matter how many query dumps complete);
  *  - queries run in REGISTRY order — oracle-checked queries before
  *    rows-only goldens within each group — so a truncated run still
  *    covers the strongest checks;
  *  - a small thread pool overlaps independent queries (Spark schedules
  *    concurrent jobs fine; local[N] has the cores) — wall drops ~3x;
  *  - each query runs under a watchdog: past the per-query timeout its
  *    job group is cancelled and the run moves on, so one hung plan can
  *    no longer sink every query scheduled after it. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names (local iteration aid;
    // the driver always runs the full set)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val workers = sys.env.getOrElse("SPARK_GRAFT_VERIFY_WORKERS",
      math.max(2, cpus.toInt / 4).toString).toInt
    val perQuerySec = sys.env.getOrElse("SPARK_GRAFT_VERIFY_TIMEOUT", "300").toInt
    val spark = graft.engine.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.GraftSession.prepare(spark)
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // manifest of every registered name, written for FULL runs only: a
    // REUSED outDir can hold dump dirs from retired queries of an older
    // build, silently counted as extra rows-only checks (observed with the
    // verify-skill's example path across rounds), and a rows-only query
    // that never dumped was invisible to the compare (it is in no oracle
    // map) — the checker restricts itself to the manifest AND reports
    // manifest names with no dump as failures. Subset runs (the local
    // `only` iteration aid) skip the manifest so their undumped queries
    // don't read as missing.
    if (only.isEmpty)
      Files.writeString(Paths.get(s"$outDir/names.json"),
        graft.queries.Registry.all.map(qq => q(qq.name)).mkString("[", ",", "]"))

    // registry order, oracle-checked first: the strongest checks dump
    // earliest if the driver's wall budget expires mid-run
    val selected = graft.queries.Registry.all
      .filter(qq => only.forall(_.contains(qq.name)))
    val ordered = selected.filter(_.oracle.nonEmpty) ++
      selected.filter(_.oracle.isEmpty)

    val pool = Executors.newFixedThreadPool(workers)
    val done = new AtomicInteger(0)
    ordered.foreach { qq =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val group = s"verify-${qq.name}"
          // cancel the whole group on timeout: DDL/catalog queries issue
          // several jobs, not one
          spark.sparkContext.setJobGroup(group, qq.name, interruptOnCancel = true)
          val watchdog = Executors.newSingleThreadScheduledExecutor()
          val kill = watchdog.schedule(new Runnable {
            def run(): Unit = {
              System.err.println(s"[verify] ${qq.name} TIMED OUT after ${perQuerySec}s — cancelling")
              spark.sparkContext.cancelJobGroup(group)
            }
          }, perQuerySec.toLong, TimeUnit.SECONDS)
          try qq.build(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/${qq.name}")
          catch { case e: Throwable =>
            System.err.println(s"[verify] ${qq.name} failed: ${e.getMessage}")
          } finally {
            kill.cancel(false); watchdog.shutdown()
            spark.sparkContext.clearJobGroup()
            val n = done.incrementAndGet()
            if (n % 25 == 0)
              System.err.println(s"[verify] $n/${ordered.size} done")
          }
        }
      })
    }
    pool.shutdown()
    pool.awaitTermination(4, TimeUnit.HOURS)
    spark.stop()
  }
}

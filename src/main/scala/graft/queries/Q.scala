package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.{GraftSession, Tables}

/** One registered query: a Spark builder + (optionally) an equivalent DuckDB
  * oracle SQL over the same parquet tables. `bench = true` marks headline
  * queries timed by graft.Bench.
  *
  * `maxSf` (r13 verdict #5) caps the scale factor the entry's SPARK build
  * is designed for: exact-O(N²) baselines and bound companions that
  * recompute exact pair sets exist to CHECK the scalable kernels at the
  * driver SF — they are not scale paths, and a scale sweep (or an
  * operator cargo-culting the registry) must not pull one into an sf100z
  * run. Registry.assertScaleSafe enforces it wherever a dir's SF is
  * parseable (graft.Bench; probe tools). Infinity = scale-safe. */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    bench: Boolean = false,
    maxSf: Double = Double.PositiveInfinity)

object Q {
  /** A query whose Spark side is plain SQL over the registered TESTDATA
    * views. When `duck` is None the same text is used as the oracle
    * (ANSI-shared dialect). */
  def sql(name: String, sparkSql: String, duck: String = null,
          bench: Boolean = false): Q =
    Q(name,
      (s, dir) => { GraftSession.prepare(s); Tables.registerAll(s, dir); s.sql(sparkSql) },
      Some(Option(duck).getOrElse(sparkSql)), bench)

  /** A DataFrame-API query with a DuckDB oracle. */
  def df(name: String, duck: String, bench: Boolean = false,
         maxSf: Double = Double.PositiveInfinity)
        (build: (SparkSession, String) => DataFrame): Q =
    Q(name, (s, dir) => { GraftSession.prepare(s); build(s, dir) }, Some(duck),
      bench, maxSf)

  /** A query with no SQL-expressible oracle (driver records rows-only). */
  def rowsOnly(name: String, bench: Boolean = false)
              (build: (SparkSession, String) => DataFrame): Q =
    Q(name, (s, dir) => { GraftSession.prepare(s); build(s, dir) }, None, bench)
}

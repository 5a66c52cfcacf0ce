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
    maxSf: Double = Double.PositiveInfinity,
    noOracle: Option[NoOracle] = None)

/** Why a registered query has NO DuckDB oracle (r14 verdict #7): every
  * rows-only row must say, machine-checkably, whether it can ever promote
  * to a full-value oracle and what checks it in the meantime —
  * RegistrySpec gates that the tag exists and that every named companion
  * is a registered full-oracle row, so "no_oracle" in the driver report
  * is always a DOCUMENTED state, never an oversight. */
sealed trait NoOracle {
  /** Why no engine-portable oracle can exist for the registered form. */
  def reason: String
  /** Registered FULL-oracle rows that check this row's guarantees (bound
    * companions, md5-seam variants, parity rows). RegistrySpec asserts
    * each name resolves to a query WITH an oracle. */
  def companions: Seq[String]
}
object NoOracle {
  /** Can NEVER promote to a full-value oracle — the registered form's
    * VALUES depend on something no SQL engine can replay (xxhash64
    * sketches, JVM image codecs, hash-dependent Bloom false positives). */
  final case class Terminal(reason: String,
                            companions: Seq[String]) extends NoOracle
  /** Could promote in principle (the computation is deterministic data
    * math) but hasn't yet — the named companions check its guarantees in
    * the meantime. A Bound row is a standing TODO; a Terminal row is not. */
  final case class Bound(reason: String,
                         companions: Seq[String]) extends NoOracle
}

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

  /** A query with no SQL-expressible oracle (driver records rows-only).
    * The `oracle` tag is REQUIRED: a rows-only row must declare whether it
    * is Terminal (can never promote) or Bound (which full-oracle rows
    * check its guarantees) — RegistrySpec enforces the companions exist. */
  def rowsOnly(name: String, oracle: NoOracle, bench: Boolean = false)
              (build: (SparkSession, String) => DataFrame): Q =
    Q(name, (s, dir) => { GraftSession.prepare(s); build(s, dir) }, None, bench,
      noOracle = Some(oracle))
}

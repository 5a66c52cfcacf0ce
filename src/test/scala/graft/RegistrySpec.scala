package graft

import graft.queries.Registry
import graft.tools.Golden

/** Registry growth discipline: every registered query must be VERIFIED —
  * either it carries a DuckDB oracle (the driver's Verify pipeline
  * hash-checks it every round) or it is golden-pinned (GoldenSpec holds its
  * sf0.01 result hash). A query registered with neither would sail through
  * CI unchecked; this spec makes that a build-time failure instead.
  */
class RegistrySpec extends SparkTestBase {

  test("query names are unique (no silent shadowing in byName)") {
    val dup = Registry.all.groupBy(_.name).filter(_._2.size > 1).keys
    assert(dup.isEmpty, s"duplicate query names: ${dup.mkString(", ")}")
  }

  test("every registered query is verified: oracle-checked or golden-pinned") {
    val unverified = Registry.all
      .filter(q => q.oracle.isEmpty && !Golden.names.contains(q.name))
      .map(_.name)
    assert(unverified.isEmpty,
      s"queries with neither a DuckDB oracle nor a golden pin: " +
        s"${unverified.mkString(", ")} — add an oracle or pin via runMain graft.tools.Golden")
  }

  test("golden list refers only to registered queries") {
    val ghost = Golden.names.filterNot(Registry.byName.contains)
    assert(ghost.isEmpty, s"golden pins for unregistered queries: ${ghost.mkString(", ")}")
  }

  test("SparkEntry mirrors the registry exactly (driver contract)") {
    assert(SparkEntry.queries.keySet == Registry.all.map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet ==
      Registry.all.filter(_.oracle.nonEmpty).map(_.name).toSet)
  }
}

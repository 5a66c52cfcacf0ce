package graft

import graft.engine.{GraftCatalog, GraftSql}

/** Auth DDL (grammar rules 78-90, sql_processor_ddl.cpp:218,554):
  * CREATE/DROP USER|ROLE|DATABASE, SET PASSWORD, GRANT/REVOKE ALL|SELECT.
  * The catalog carries the reference's semantics — duplicate/missing
  * errors, password digests (never plaintext), privilege checks, #users /
  * #database_privileges metadata; wire-level authentication enforcement
  * stays with the cluster platform (COVERAGE.md divergence table). */
class AuthDdlSpec extends SparkTestBase {

  private def cat = GraftCatalog.forSession(spark)

  test("user lifecycle: create, authenticate, set password, drop") {
    GraftSql.sql(spark, "CREATE USER alice IDENTIFIED BY 's3cret'")
    assert(cat.authenticate("alice", "s3cret"))
    assert(!cat.authenticate("alice", "wrong"))
    GraftSql.sql(spark, "SET PASSWORD FOR alice = 'n3w'")
    assert(cat.authenticate("alice", "n3w"))
    assert(!cat.authenticate("alice", "s3cret"))
    // duplicate create is the reference's error, not an upsert
    intercept[IllegalArgumentException](
      GraftSql.sql(spark, "CREATE USER alice"))
    // password-less user exists but cannot authenticate
    GraftSql.sql(spark, "CREATE USER bob")
    assert(!cat.authenticate("bob", ""))
    val meta = cat.metaUsers.orderBy("USER_NAME").collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2))).toSeq
    assert(meta.contains(("alice", false, true)))
    assert(meta.contains(("bob", false, false)))
    GraftSql.sql(spark, "DROP USER alice")
    GraftSql.sql(spark, "DROP USER bob")
    intercept[IllegalArgumentException](GraftSql.sql(spark, "DROP USER alice"))
  }

  test("grants: ALL covers writes, SELECT reads only; revoke + cascade on drop") {
    GraftSql.sql(spark, "CREATE USER carol")
    GraftSql.sql(spark, "GRANT SELECT ON lineitem TO carol")
    GraftSql.sql(spark, "GRANT ALL ON orders TO carol")
    assert(cat.checkPrivilege("carol", "lineitem", write = false))
    assert(!cat.checkPrivilege("carol", "lineitem", write = true))
    assert(cat.checkPrivilege("carol", "orders", write = true))
    assert(!cat.checkPrivilege("carol", "part", write = false))
    val privs = cat.metaPrivileges.collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(privs(("lineitem", "carol", "SELECT")))
    assert(privs(("orders", "carol", "ALL")))
    GraftSql.sql(spark, "REVOKE SELECT ON lineitem FROM carol")
    assert(!cat.checkPrivilege("carol", "lineitem", write = false))
    intercept[NoSuchElementException](
      GraftSql.sql(spark, "REVOKE SELECT ON lineitem FROM carol"))
    // grant to a missing user errors (reference: user must exist)
    intercept[IllegalArgumentException](
      GraftSql.sql(spark, "GRANT ALL ON lineitem TO nobody"))
    GraftSql.sql(spark, "DROP USER carol")
    assert(cat.metaPrivileges.where("USER_NAME = 'carol'").count() == 0)
  }

  test("roles and databases round-trip with reference error semantics") {
    GraftSql.sql(spark, "CREATE ROLE analyst")
    // a role is not a user: no password, and DROP USER does not see it
    intercept[IllegalArgumentException](
      GraftSql.sql(spark, "SET PASSWORD FOR analyst = 'x'"))
    intercept[IllegalArgumentException](GraftSql.sql(spark, "DROP USER analyst"))
    // roles are grantable principals
    GraftSql.sql(spark, "GRANT SELECT ON lineitem TO analyst")
    assert(cat.checkPrivilege("analyst", "lineitem", write = false))
    GraftSql.sql(spark, "DROP ROLE analyst")

    GraftSql.sql(spark, "CREATE DATABASE tsdb")
    assert(cat.metaDatabases.collect().map(_.getString(1)).toSet
      == Set("public", "tsdb"))
    intercept[IllegalArgumentException](GraftSql.sql(spark, "CREATE DATABASE tsdb"))
    GraftSql.sql(spark, "DROP DATABASE tsdb")
    intercept[IllegalArgumentException](GraftSql.sql(spark, "DROP DATABASE public"))
  }

  test("auth DDL flows through the injected session parser (spark.sql)") {
    spark.sql("CREATE USER dave IDENTIFIED BY 'pw'")
    assert(cat.authenticate("dave", "pw"))
    spark.sql("DROP USER dave")
  }
}

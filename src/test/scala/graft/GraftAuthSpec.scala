package graft

import graft.engine.{GraftAuth, GraftCatalog}

/** Unit coverage of the enforcement gates (JdbcSpec covers the wire round
  * trip): verb spellings, comment stripping, case handling, CTE
  * shadowing, and plan-level write detection. Uses its own protected name
  * so concurrent suites are untouched. */
class GraftAuthSpec extends SparkTestBase {

  private def withAuth(f: GraftCatalog => Unit): Unit = {
    val cat = GraftCatalog.forSession(spark)
    if (cat.metaUsers.collect().exists(_.getString(0) == "unit_u")) cat.dropUser("unit_u")
    cat.createUser("unit_u", Some("pw"))
    GraftAuth.install(cat, Set("Auth_Unit_Tab"))
    spark.conf.set(GraftAuth.UserKey, "unit_u")
    spark.conf.set(GraftAuth.PasswordKey, "pw")
    try f(cat)
    finally {
      GraftAuth.uninstall()
      cat.dropUser("unit_u")
      spark.conf.unset(GraftAuth.UserKey)
      spark.conf.unset(GraftAuth.PasswordKey)
    }
  }

  private def denied(sql: String, phrase: String): Unit =
    withClue(s"statement should be denied: $sql\n") {
      val e = intercept[SecurityException](spark.sql(sql))
      assert(e.getMessage.contains(phrase), s"expected '$phrase' in: ${e.getMessage}")
    }

  test("write-gate spellings, comments, case; grants looked up under install case") {
    withAuth { cat =>
      cat.grant("SELECT", "Auth_Unit_Tab", "unit_u")
      // reads flow under ANY identifier case (Spark identifiers are
      // case-insensitive; the grant is found under the install spelling)
      spark.sql("CREATE OR REPLACE TEMPORARY VIEW auth_unit_tab AS SELECT 1 AS x")
      assert(spark.sql("SELECT * FROM AUTH_UNIT_TAB").count() == 1)
      assert(spark.sql("SELECT * FROM auth_unit_tab").count() == 1)
      // writes are refused in every spelling with only SELECT
      denied("INSERT INTO auth_unit_tab VALUES (1)", "privilege")
      denied("INSERT INTO Auth_Unit_Tab VALUES (1)", "privilege")
      denied("INSERT OVERWRITE TABLE auth_unit_tab SELECT 1", "privilege")
      denied("insert into `auth_unit_tab` values (1)", "privilege")
      denied("/* c1 */ -- c2\n INSERT INTO auth_unit_tab VALUES (1)", "privilege")
      denied("WITH q AS (SELECT 2 AS x) INSERT INTO auth_unit_tab SELECT * FROM q", "privilege")
      denied("UPDATE auth_unit_tab SET x = 2", "privilege")
      denied("DELETE FROM auth_unit_tab WHERE x = 1", "privilege")
      denied("REPLACE INTO auth_unit_tab VALUES (1)", "privilege")
      // r9 ADVICE bypass spellings: the gate's targets now derive from
      // GraftDdl's OWN routing regexes, so every spelling the dialect
      // executes is gated — double-quoted names and the OR-clause forms
      denied("INSERT INTO \"auth_unit_tab\" VALUES (1)", "privilege")
      denied("UPDATE \"auth_unit_tab\" SET x = 2", "privilege")
      denied("DELETE FROM \"auth_unit_tab\"", "privilege")
      denied("INSERT OR REPLACE INTO auth_unit_tab VALUES (1)", "privilege")
      denied("INSERT OR IGNORE INTO auth_unit_tab VALUES (1)", "privilege")
      // multipart spelling of the same container
      denied("INSERT INTO db1.auth_unit_tab VALUES (1)", "privilege")
      denied("INSERT INTO `db1`.`auth_unit_tab` VALUES (1)", "privilege")
    }
  }

  test("name-only DROP INDEX/TRIGGER resolve their protected table via the catalog; view-name takeover is a write") {
    withAuth { cat =>
      cat.grant("ALL", "Auth_Unit_Tab", "unit_u")
      spark.sql("CREATE TABLE auth_unit_tab (x INTEGER)")
      spark.sql("CREATE INDEX fz_ix_noon ON auth_unit_tab (x)")
      spark.sql("CREATE TRIGGER fz_trg_noon ON auth_unit_tab FOR PUT TYPE REST URI 'http://localhost/x'")
      cat.revoke("ALL", "Auth_Unit_Tab", "unit_u")
      cat.grant("SELECT", "Auth_Unit_Tab", "unit_u")
      // the statement names only the index/trigger — the gate must find
      // the owning table in the catalog (r10 self-review bypass)
      denied("DROP INDEX fz_ix_noon", "privilege")
      denied("DROP TRIGGER fz_trg_noon", "privilege")
      // defining or dropping a VIEW under the protected NAME is a write
      denied("CREATE VIEW auth_unit_tab AS SELECT 1 AS x", "privilege")
      denied("DROP VIEW auth_unit_tab", "privilege")
      cat.revoke("SELECT", "Auth_Unit_Tab", "unit_u")
      cat.grant("ALL", "Auth_Unit_Tab", "unit_u")
      spark.sql("DROP TRIGGER fz_trg_noon")
      spark.sql("DROP INDEX fz_ix_noon")
      spark.sql("DROP TABLE auth_unit_tab")
    }
  }

  test("protected storage paths: runSQLOnFiles, path-option aliases, OVERWRITE DIRECTORY") {
    val dir = java.nio.file.Files.createTempDirectory("graft_auth_path").toFile
    val dataPath = s"${dir.getAbsolutePath}/prot_data"
    spark.range(3).toDF("x").write.mode("overwrite").parquet(dataPath)
    val cat = GraftCatalog.forSession(spark)
    if (cat.metaUsers.collect().exists(_.getString(0) == "unit_u")) cat.dropUser("unit_u")
    cat.createUser("unit_u", Some("pw"))
    GraftAuth.install(cat, Set("Auth_Unit_Tab"),
      protectedPaths = Map(dataPath -> "Auth_Unit_Tab"))
    spark.conf.set(GraftAuth.UserKey, "unit_u")
    spark.conf.set(GraftAuth.PasswordKey, "pw")
    try {
      // r10 ADVICE bypass #1: read the backing files directly via
      // runSQLOnFiles — must demand SELECT on the owning table
      denied(s"SELECT * FROM parquet.`$dataPath`", "privilege")
      // normalization: trailing slash, /../ round trip, file: scheme
      denied(s"SELECT * FROM parquet.`$dataPath/`", "privilege")
      denied(s"SELECT * FROM parquet.`${dir.getAbsolutePath}/../${dir.getName}/prot_data`", "privilege")
      denied(s"SELECT * FROM parquet.`file:$dataPath`", "privilege")
      // one file UNDER the protected directory
      val part = new java.io.File(dataPath).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
      denied(s"SELECT * FROM parquet.`$part`", "privilege")
      // a PARENT directory sweep that would include the protected data
      denied(s"SELECT * FROM parquet.`${dir.getAbsolutePath}`", "privilege")
      // r10 ADVICE bypass #2: register an unprotected alias over the path
      denied(s"CREATE OR REPLACE TEMPORARY VIEW open_alias USING parquet OPTIONS (path '$dataPath')", "privilege")
      denied(s"CREATE TABLE open_alias2 USING parquet OPTIONS ('path' '$dataPath')", "privilege")
      denied(s"CREATE TABLE open_alias3 USING parquet LOCATION '$dataPath'", "privilege")
      // r11 review: quoted-key spellings of the path option are the same
      // registration primitive
      denied(s"""CREATE TABLE open_alias4 USING parquet OPTIONS ("path" '$dataPath')""", "privilege")
      denied(s"CREATE TABLE open_alias5 USING parquet OPTIONS (`path` '$dataPath')", "privilege")
      // r11 review: a GLOB that would expand onto the protected directory
      // is gated by its literal prefix
      denied(s"SELECT * FROM parquet.`${dataPath.dropRight(4)}*`", "privilege")
      denied(s"SELECT * FROM parquet.`${dir.getAbsolutePath}/*`", "privilege")
      // writing INTO the protected storage is a WRITE even with SELECT
      cat.grant("SELECT", "Auth_Unit_Tab", "unit_u")
      denied(s"INSERT OVERWRITE DIRECTORY '$dataPath' USING parquet SELECT 9", "privilege")
      denied(s"INSERT INTO parquet.`$dataPath` SELECT 9", "privilege")
      // with SELECT granted, the read spellings flow
      assert(spark.sql(s"SELECT * FROM parquet.`$dataPath`").count() == 3)
      assert(spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW open_alias USING parquet OPTIONS (path '$dataPath')").collect() != null)
      // r11 review (alias-write escalation): the registered alias is the
      // protected table's storage — INSERT through it demands WRITE, which
      // a SELECT grant does not cover
      denied("INSERT INTO open_alias SELECT 9", "privilege")
      denied("INSERT OVERWRITE TABLE open_alias SELECT 9", "privilege")
      // reads through the alias flow under the grant...
      assert(spark.sql("SELECT * FROM open_alias").count() == 3)
      // ...and a REVOKE cuts them off (the alias ledger re-gates reads)
      cat.revoke("SELECT", "Auth_Unit_Tab", "unit_u")
      denied("SELECT * FROM open_alias", "privilege")
      cat.grant("SELECT", "Auth_Unit_Tab", "unit_u")
      // re-registering the alias over UNPROTECTED storage releases it
      val openPath = s"${dir.getAbsolutePath}/open_data"
      spark.range(2).toDF("y").write.mode("overwrite").parquet(openPath)
      spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW open_alias USING parquet OPTIONS (path '$openPath')")
      cat.revoke("SELECT", "Auth_Unit_Tab", "unit_u")
      assert(spark.sql("SELECT * FROM open_alias").count() == 2)
      cat.grant("SELECT", "Auth_Unit_Tab", "unit_u")
      spark.catalog.dropTempView("open_alias")
      // unlisted paths stay open (no false positives), globs included
      assert(spark.sql(s"SELECT * FROM parquet.`$openPath`").count() == 2)
      assert(spark.sql(s"SELECT * FROM parquet.`${openPath.dropRight(4)}*`").count() == 2)
      // r11 ADVICE (ledger staleness): a CREATE naming the alias that
      // FAILS at execution must NOT clear the gate — the name still
      // resolves to protected storage, so writes through it stay writes
      // (parse-time ledger removal re-opened the SELECT-to-write
      // escalation; entries now evict only on verified re-resolution)
      spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW open_alias USING parquet OPTIONS (path '$dataPath')")
      intercept[Exception](spark.sql("CREATE TABLE open_alias (!!bogus)"))
      denied("INSERT INTO open_alias SELECT 9", "privilege")
      cat.revoke("SELECT", "Auth_Unit_Tab", "unit_u")
      denied("SELECT * FROM open_alias", "privilege")
      cat.grant("SELECT", "Auth_Unit_Tab", "unit_u")
      // while a CREATE that genuinely re-points the name (the dialect
      // CREATE TABLE replaces the temp view with a fresh container at
      // parse time) releases it on the next verified hit
      spark.sql("CREATE TABLE open_alias (x INTEGER)")
      spark.sql("INSERT INTO open_alias VALUES (9)") // new container, not protected storage
      spark.sql("DROP TABLE open_alias")
      // r11 ADVICE (CTE-prefixed directory overwrite): WITH ... INSERT
      // OVERWRITE DIRECTORY does not lead with INSERT — still a write
      denied(s"WITH q AS (SELECT 9 AS x) INSERT OVERWRITE DIRECTORY '$dataPath' USING parquet SELECT * FROM q", "privilege")
      // r11 ADVICE (CTAS injection): CREATE TABLE ... LOCATION '<prot>'
      // AS SELECT physically writes protected storage at registration —
      // demands write, which the SELECT grant does not cover
      denied(s"CREATE TABLE ctas_inject USING parquet LOCATION '$dataPath/sub' AS SELECT 9 AS x", "privilege")
      denied(s"CREATE TABLE ctas_inject2 USING parquet OPTIONS (path '$dataPath/sub2') AS SELECT 9 AS x", "privilege")
      // remote-URI normalization: //-collapse + case-insensitive scheme
      assert(graft.engine.GraftAuth.normalizePath("s3a://b//secret/")
        == graft.engine.GraftAuth.normalizePath("S3A://b/secret"))
      // r12 review: CTAS with whitespace between nesting parens is still
      // a CTAS — `AS ( (SELECT ...))` writes the protected directory
      denied(s"CREATE TABLE ctas_inject3 USING parquet LOCATION '$dataPath/sub3' AS ( (SELECT 9 AS x) )", "privilege")
      // r12 review: the OVERWRITE DIRECTORY phrase inside a string
      // LITERAL is data — a pure read must not demand write
      assert(spark.sql(
        s"""SELECT * FROM parquet.`$dataPath` WHERE 'a' != 'OVERWRITE DIRECTORY "$dataPath"'""")
        .count() == 3)
      // r13 ADVICE (literal mask replaces single-quote parity): a
      // backslash-escaped quote before the phrase must not flip the scan —
      // still a pure read
      assert(spark.sql(
        s"""SELECT * FROM parquet.`$dataPath` WHERE 'it\\'s' != 'OVERWRITE DIRECTORY "$dataPath"'""")
        .count() == 3)
      // ...and a DOUBLE-quoted literal holding a lone apostrophe must not
      // silence the gate for a REAL directory overwrite later in the text
      denied(s"""WITH q AS (SELECT "don't" AS x) INSERT OVERWRITE DIRECTORY '$dataPath' USING parquet SELECT * FROM q""", "privilege")
      // r13 ADVICE (path-option scan scoped to before AS): a data predicate
      // on a column named `path` in a view body is data — a SELECT-only
      // user registering a view over UNPROTECTED data must not be denied
      spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW pred_view AS SELECT * FROM (SELECT '$dataPath' AS path) t WHERE path = '$dataPath'")
      assert(spark.sql("SELECT * FROM pred_view").count() == 1)
      spark.catalog.dropTempView("pred_view")
      // ...while a fake AS-SELECT inside an OPTIONS string literal must not
      // truncate the scan before the real protected path option
      denied(s"CREATE TABLE ctas_trunc USING parquet OPTIONS (comment 'AS SELECT', path '$dataPath/sub4') AS SELECT 9 AS x", "privilege")
      // r13 review: an in-literal `path` hit must not SWALLOW the real
      // option that follows (non-overlapping regex scan resumed past it)
      denied(s"CREATE TABLE swal USING parquet OPTIONS (comment 'ends with path', path '$dataPath/sub5') AS SELECT 9 AS x", "privilege")
      // r13 review: an apostrophe inside a BACKTICKED identifier must not
      // open a bogus literal that masks the real path option...
      denied(s"CREATE TABLE `a'b` USING parquet LOCATION '$dataPath/sub6' AS SELECT 9 AS x", "privilege")
      // ...and an AS SELECT inside a backticked name must not truncate the
      // option scan before the real clause
      denied(s"CREATE TABLE `t AS SELECT z` USING parquet OPTIONS (path '$dataPath/sub7') AS SELECT 9 AS x", "privilege")
      // r13 review: comment DELIMITERS inside string literals are data —
      // the old regex stripper erased everything between them, including
      // the real protected path option
      denied(s"CREATE TABLE cmt USING parquet OPTIONS (comment '/*', path '$dataPath/sub8', z '*/') AS SELECT 9 AS x", "privilege")
      // r13 review (2nd pass): a RAW string's backslash is data, not an
      // escape — r'\' must not swallow its closing quote and desync the
      // mask over the real path option
      denied(s"CREATE TABLE rawb USING parquet OPTIONS (comment r'\\', path '$dataPath/sub9') AS SELECT 9 AS x", "privilege")
      // ...same lexing for EVERY literal under legacy
      // spark.sql.parser.escapedStringLiterals=true
      spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
      try denied(s"CREATE TABLE escb USING parquet OPTIONS (comment '\\', path '$dataPath/sub10') AS SELECT 9 AS x", "privilege")
      finally spark.conf.unset("spark.sql.parser.escapedStringLiterals")
      // r13 review (2nd pass): bracketed comments NEST (Spark 3.0+) — a
      // commented-out overwrite inside a nested comment is dead text and
      // must not false-demand write on a pure read
      assert(spark.sql(s"/* /* */ INSERT OVERWRITE DIRECTORY '$dataPath' */ SELECT 1 AS one").count() == 1)
      // r12 review: a DB-QUALIFIED alias over protected storage gates
      // writes even though the bare ledger key does not resolve in the
      // current database (resolution failure must fail CLOSED, not evict)
      // (CREATE DATABASE over the wire is admin-gated auth DDL; the
      // in-process catalog API is the deliberately ungated layer)
      spark.sessionState.catalog.createDatabase(
        org.apache.spark.sql.catalyst.catalog.CatalogDatabase("auth_db2", "",
          java.nio.file.Files.createTempDirectory("graft_auth_db2").toUri, Map.empty),
        ignoreIfExists = true)
      spark.sql(s"CREATE TABLE auth_db2.dbq_alias USING parquet OPTIONS (path '$dataPath')")
      denied("INSERT INTO auth_db2.dbq_alias SELECT 9", "privilege")
      spark.sql("DROP TABLE auth_db2.dbq_alias")
      spark.sessionState.catalog.dropDatabase("auth_db2",
        ignoreIfNotExists = true, cascade = true)
      // r12 review: a temp view BRIEFLY shadowing a protected alias must
      // not release the gate once the shadow is dropped (eviction was
      // permanent while resolution is transient)
      spark.sql(s"CREATE TABLE pers_alias USING parquet OPTIONS (path '$dataPath')")
      spark.sql("CREATE TEMPORARY VIEW pers_alias AS SELECT 1 AS z")
      assert(spark.sql("SELECT * FROM pers_alias").count() == 1) // the shadow, ungated
      spark.catalog.dropTempView("pers_alias")
      denied("INSERT INTO pers_alias SELECT 9", "privilege") // protected again
      // cleanup via the ungated in-process API (a wire DROP of a
      // still-protected alias correctly demands write)
      spark.sessionState.catalog.dropTable(
        org.apache.spark.sql.catalyst.TableIdentifier("pers_alias"),
        ignoreIfNotExists = true, purge = false)
    } finally {
      GraftAuth.uninstall()
      cat.dropUser("unit_u")
      spark.conf.unset(GraftAuth.UserKey)
      spark.conf.unset(GraftAuth.PasswordKey)
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
  }

  test("explicit-catalog auth DDL stays on the caller's catalog under enforcement (r10 ADVICE)") {
    withAuth { authorityCat =>
      val mine = new GraftCatalog(spark)
      // enforcement is installed (withAuth) with authorityCat as authority;
      // an in-process caller managing users in its OWN catalog must not
      // leak the write into the authority
      graft.engine.GraftDdl.run(spark, mine, "CREATE USER side_u IDENTIFIED BY 'x'")
      assert(mine.metaUsers.collect().exists(_.getString(0) == "side_u"))
      assert(!authorityCat.metaUsers.collect().exists(_.getString(0) == "side_u"))
      // while the session-default catalog route still redirects to the
      // authority (the wire behavior that r10 introduced)
      graft.engine.GraftDdl.run(spark, GraftCatalog.forSession(spark),
        "CREATE USER wire_u IDENTIFIED BY 'x'")
      assert(authorityCat.metaUsers.collect().exists(_.getString(0) == "wire_u"))
      authorityCat.dropUser("wire_u")
    }
  }

  test("CTE shadowing, subquery detection, credentials") {
    withAuth { cat =>
      // a CTE of the protected name shadows it: no grant needed
      assert(spark.sql(
        "WITH auth_unit_tab AS (SELECT 1 AS x) SELECT * FROM auth_unit_tab").count() == 1)
      // r9 ADVICE: shadowing is per-SCOPE (CTESubstitution), not a global
      // name set — the defining CTE's own body still reads the REAL table
      denied("WITH auth_unit_tab AS (SELECT * FROM auth_unit_tab) " +
        "SELECT * FROM auth_unit_tab", "privilege")
      // ... and a shadowing CTE buried in an unrelated derived-table scope
      // does not un-gate a top-level read of the real table
      denied("SELECT * FROM auth_unit_tab CROSS JOIN " +
        "(WITH auth_unit_tab AS (SELECT 1 AS y) SELECT * FROM auth_unit_tab) t",
        "privilege")
      // a reference inside a subquery expression IS gated
      spark.sql("CREATE OR REPLACE TEMPORARY VIEW auth_unit_tab AS SELECT 1 AS x")
      denied("SELECT (SELECT MAX(x) FROM auth_unit_tab) AS m", "privilege")
      cat.grant("SELECT", "Auth_Unit_Tab", "unit_u")
      assert(spark.sql("SELECT (SELECT MAX(x) FROM auth_unit_tab) AS m").count() == 1)
      // wrong password: refused before privilege is even consulted
      spark.conf.set(GraftAuth.PasswordKey, "bad")
      denied("SELECT * FROM auth_unit_tab", "authentication failed")
    }
  }
}

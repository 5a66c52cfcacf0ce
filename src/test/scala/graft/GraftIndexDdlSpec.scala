package graft

import org.apache.spark.sql.functions._

/** SQL index lifecycle (r16 verdict #2): CREATE/ALTER/DROP for the three
  * persisted index families drive the SAME kernels as the Scala API —
  * this spec proves each verb's observable effect (served rows, stats
  * movement, on-disk tree) and the grammar diagnostics. */
class GraftIndexDdlSpec extends SparkTestBase {

  private def sql(text: String) = graft.engine.GraftSql.sql(spark, text)

  private def tempPath(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/ix"

  /** Names register DURABLY now (r17 verdict #1) — clear leftovers from a
    * previously crashed run before re-creating a fixed-name index. */
  private def dropIfExists(kind: String, names: String*): Unit =
    names.foreach(n => sql(s"DROP $kind INDEX IF EXISTS $n"))

  test("ANN index: CREATE builds the IVF tree, serves by name, RETRAIN + DROP") {
    val e = graft.engine.Tables.read(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 400)
    e.createOrReplaceTempView("ddl_embs")
    dropIfExists("ANN", "ddl_ann")
    val p = tempPath("graft_ddl_ann")
    sql("CREATE ANN INDEX ddl_ann ON ddl_embs(vec_id, embedding) " +
      s"OPTIONS(lists 8, attrs 'label', path '$p')")
    // served rows by NAME must equal the Scala path over the same tree
    val expect = graft.pipeline.IvfIndex.topK(spark, p,
        e.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5)
      .orderBy("q_id", "rk").collect().toSeq
    val got = sql("SELECT * FROM GRAFT_ANN_TOPK('ddl_ann', " +
        "'SELECT * FROM ddl_embs WHERE vec_id < 3', 'vec_id', " +
        "'embedding', 5) ORDER BY q_id, rk").collect().toSeq
    assert(got == expect, "DDL-named serve diverged from the Scala path")
    // APPEND moves the appended fraction; RETRAIN folds it back to zero
    spark.conf.set("graft.index.gc.minRetainMs", "0")
    try {
      sql("ALTER INDEX ddl_ann APPEND FROM (SELECT * FROM " +
        "(SELECT vec_id + 100000 AS vec_id, embedding, label FROM ddl_embs))")
      assert(graft.pipeline.IvfIndex.appendedFraction(spark, p) > 0.4)
      sql("ALTER INDEX ddl_ann RETRAIN")
      assert(graft.pipeline.IvfIndex.appendedFraction(spark, p) == 0.0)
      // stats over the NAME: current version visible, family ann
      val st = sql("SELECT retained_by, family FROM GRAFT_INDEX_STATS(" +
          "'ddl_ann') WHERE current").collect()
      assert(st.length == 1 && st.head.getString(0) == "current" &&
        st.head.getString(1) == "ann")
    } finally spark.conf.unset("graft.index.gc.minRetainMs")
    // COMPACT is a dedup verb — diagnostic names the right one
    val eCompact = intercept[IllegalArgumentException](
      sql("ALTER INDEX ddl_ann COMPACT"))
    assert(eCompact.getMessage.contains("RETRAIN"), eCompact.getMessage)
    // family-checked TVF use: the ANN name is not a dedup gate
    val eKind = intercept[Exception](
      sql("SELECT * FROM GRAFT_DEDUP_GATE('ddl_ann', 'ddl_embs', 't', " +
        "'id', 'exact')").collect())
    assert(eKind.getMessage.contains("ann index"), eKind.getMessage)
    // DROP deletes the tree and unbinds the name
    sql("DROP ANN INDEX ddl_ann")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
    assert(graft.engine.GraftIndexRegistry.get(spark, "ddl_ann").isEmpty)
    // wrong-verb DROP on a fresh dedup index is refused
    sql("DROP ANN INDEX IF EXISTS ddl_ann") // idempotent after drop
  }

  test("DEDUP indexes: exact and minhash gates by name, APPEND + COMPACT, stats") {
    val d = graft.engine.Tables.read(spark, sfDir, "documents")
    d.createOrReplaceTempView("ddl_docs")
    dropIfExists("DEDUP", "ddl_ex", "ddl_mh")
    val pEx = tempPath("graft_ddl_ex")
    sql("CREATE DEDUP INDEX ddl_ex ON ddl_docs(doc_id, text) " +
      s"OPTIONS(kind 'exact', path '$pEx')")
    val pMh = tempPath("graft_ddl_mh")
    sql("CREATE DEDUP INDEX ddl_mh ON ddl_docs(doc_id, text) " +
      s"OPTIONS(kind 'minhash', shingle 3, minhashk 16, bands 4, path '$pMh')")
    // the exact gate by NAME: a RE-KEYED copy of the indexed corpus is
    // all duplicates (same ids would replay-survive by the keep-min
    // contract — the id spaces must be disjoint)
    val gated = sql("SELECT * FROM GRAFT_DEDUP_GATE('ddl_ex', " +
      "'SELECT doc_id + 5000000 AS doc_id, text FROM ddl_docs', " +
      "'text', 'doc_id', 'exact')").count()
    assert(gated == 0L, s"re-keyed indexed corpus should fully dedup, got $gated")
    // a disjoint batch survives, appends, then dedups on the second pass
    // ('' doubles the quote inside the SQL-literal argument)
    val batch = "SELECT doc_id + 1000000 AS doc_id, " +
      "concat(text, ' v2') AS text FROM ddl_docs WHERE doc_id % 50 = 0"
    val batchLit = "'" + batch.replace("'", "''") + "'"
    val survivors = sql(s"SELECT * FROM GRAFT_DEDUP_GATE('ddl_ex', $batchLit" +
      ", 'text', 'doc_id', 'exact')").count()
    assert(survivors > 0)
    sql(s"ALTER INDEX ddl_ex APPEND FROM ($batch)")
    // the SAME ids would replay-survive (keep-min contract); a FRESH id
    // space carrying the appended texts must gate out completely
    val batch2Lit = "'" + ("SELECT doc_id + 2000000 AS doc_id, " +
      "concat(text, ' v2') AS text FROM ddl_docs WHERE doc_id % 50 = 0")
      .replace("'", "''") + "'"
    val regated = sql(s"SELECT * FROM GRAFT_DEDUP_GATE('ddl_ex', $batch2Lit" +
      ", 'text', 'doc_id', 'exact')").count()
    assert(regated == 0L, "appended texts must gate out under fresh ids")
    // the appended tag shows in stats; COMPACT folds it away
    def pending(name: String): Int =
      sql(s"SELECT pending_tags FROM GRAFT_INDEX_STATS('$name') " +
        "WHERE current").collect().head.getInt(0)
    assert(pending("ddl_ex") == 1, "append should leave one foldable tag")
    spark.conf.set("graft.index.gc.minRetainMs", "0")
    try sql("ALTER INDEX ddl_ex COMPACT")
    finally spark.conf.unset("graft.index.gc.minRetainMs")
    assert(pending("ddl_ex") == 0, "compact should fold the tag")
    // minhash family check + the minhash gate BY NAME: a re-keyed copy
    // of the indexed corpus sketches identically (est 1.0 >= 0.5) and
    // gates out completely
    val st = sql("SELECT family FROM GRAFT_INDEX_STATS('ddl_mh') " +
      "WHERE current").collect()
    assert(st.head.getString(0) == "minhash")
    val mhGated = sql("SELECT * FROM GRAFT_DEDUP_GATE('ddl_mh', " +
      "'SELECT doc_id + 5000000 AS doc_id, text FROM ddl_docs', " +
      "'text', 'doc_id', 'minhash', 0.5)").count()
    assert(mhGated == 0L, s"re-keyed corpus should gate out, got $mhGated")
    val eVerb = intercept[IllegalArgumentException](sql("DROP ANN INDEX ddl_ex"))
    assert(eVerb.getMessage.contains("DROP DEDUP INDEX"), eVerb.getMessage)
    sql("DROP DEDUP INDEX ddl_ex")
    sql("DROP DEDUP INDEX ddl_mh")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(pEx)))
  }

  test("index DDL is gated on protected storage paths (r17 review)") {
    dropIfExists("DEDUP", "gated_ix")
    val cat = graft.engine.GraftCatalog.forSession(spark)
    Seq("ixpath_u").foreach(u =>
      if (cat.metaUsers.collect().exists(_.getString(0) == u)) cat.dropUser(u))
    cat.createUser("ixpath_u", Some("pw"))
    val prot = java.nio.file.Files.createTempDirectory("graft_prot_ix").toString
    graft.engine.GraftAuth.install(cat, Set("prot_tab_ix"),
      protectedPaths = Map(prot -> "prot_tab_ix"))
    graft.engine.Tables.read(spark, sfDir, "documents")
      .filter(col("doc_id") < 50).select("doc_id", "text")
      .createOrReplaceTempView("ddl_gate_docs")
    try {
      // no credentials: CREATE into the protected directory is refused
      // BEFORE any byte is written
      val e1 = intercept[SecurityException](
        sql("CREATE DEDUP INDEX gated_ix ON ddl_gate_docs(doc_id, text) " +
          s"OPTIONS(kind 'exact', path '$prot/ix')"))
      assert(e1.getMessage.contains("authentication failed"), e1.getMessage)
      assert(graft.engine.GraftIndexRegistry.get(spark, "gated_ix").isEmpty)
      // SELECT grant covers attach (alias registration) but not build
      cat.grant("SELECT", "prot_tab_ix", "ixpath_u")
      spark.conf.set("graft.auth.user", "ixpath_u")
      spark.conf.set("graft.auth.password", "pw")
      val e2 = intercept[SecurityException](
        sql("CREATE DEDUP INDEX gated_ix ON ddl_gate_docs(doc_id, text) " +
          s"OPTIONS(kind 'exact', path '$prot/ix')"))
      assert(e2.getMessage.contains("privilege"), e2.getMessage)
      // ALL grant lets the build through; DROP (a recursive delete of the
      // protected directory) demands write too — revoke and try
      cat.grant("ALL", "prot_tab_ix", "ixpath_u")
      sql("CREATE DEDUP INDEX gated_ix ON ddl_gate_docs(doc_id, text) " +
        s"OPTIONS(kind 'exact', path '$prot/ix')")
      cat.revoke("ALL", "prot_tab_ix", "ixpath_u")
      val e3 = intercept[SecurityException](sql("DROP DEDUP INDEX gated_ix"))
      assert(e3.getMessage.contains("privilege"), e3.getMessage)
      cat.grant("ALL", "prot_tab_ix", "ixpath_u")
      sql("DROP DEDUP INDEX gated_ix")
    } finally {
      spark.conf.unset("graft.auth.user")
      spark.conf.unset("graft.auth.password")
      graft.engine.GraftAuth.uninstall()
      cat.dropUser("ixpath_u")
    }
  }

  test("DROP INDEX serializes against a live writer's lease (r17 review)") {
    val d = graft.engine.Tables.read(spark, sfDir, "documents")
      .filter(col("doc_id") < 100).select("doc_id", "text")
    d.createOrReplaceTempView("ddl_drop_docs")
    dropIfExists("DEDUP", "ddl_drop")
    val p = tempPath("graft_ddl_droplock")
    sql("CREATE DEDUP INDEX ddl_drop ON ddl_drop_docs(doc_id, text) " +
      s"OPTIONS(kind 'exact', path '$p')")
    // a "writer" holds the lock with a slow body; the DROP must wait for
    // the release instead of deleting the tree (and the live lock file)
    // out from under it
    val writerInBody = new java.util.concurrent.CountDownLatch(1)
    val writerDone = new java.util.concurrent.atomic.AtomicLong(0L)
    val writer = new Thread(() => {
      graft.pipeline.WriterLock.withLock(spark, p) {
        writerInBody.countDown()
        Thread.sleep(1200)
        writerDone.set(System.nanoTime())
      }
    })
    writer.start()
    assert(writerInBody.await(10, java.util.concurrent.TimeUnit.SECONDS))
    sql("DROP DEDUP INDEX ddl_drop") // must block on the lease
    val dropDone = System.nanoTime()
    writer.join(10000)
    assert(writerDone.get() != 0L && dropDone > writerDone.get(),
      "DROP deleted the tree while a writer held a live lease")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$p.lock")),
      "the drop's own lock release must clean the lock file")
  }

  test("SHOW GRAFT INDEXES lists the session's registered names") {
    val d = graft.engine.Tables.read(spark, sfDir, "documents")
      .filter(col("doc_id") < 100).select("doc_id", "text")
    d.createOrReplaceTempView("ddl_show_docs")
    dropIfExists("DEDUP", "ddl_show_ix")
    val p = tempPath("graft_ddl_show")
    sql("CREATE DEDUP INDEX ddl_show_ix ON ddl_show_docs(doc_id, text) " +
      s"OPTIONS(kind 'exact', path '$p')")
    try {
      val rows = sql("SHOW GRAFT INDEXES").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getBoolean(6)))
      assert(rows.exists { case (n, f, path, temp) =>
        n == "ddl_show_ix" && f == "exact" && path == p && !temp
      }, rows.mkString(", "))
      // the listing flows through the session front door too
      assert(spark.sql("SHOW GRAFT INDEXES").columns.toSeq ==
        Seq("index", "family", "path", "table", "id_col", "val_col",
          "temporary"))
    } finally sql("DROP DEDUP INDEX ddl_show_ix")
  }

  test("attach binds an existing tree; grammar and option diagnostics") {
    val d = graft.engine.Tables.read(spark, sfDir, "documents")
      .filter(col("doc_id") < 200)
    dropIfExists("DEDUP", "ddl_att")
    val p = tempPath("graft_ddl_attach")
    graft.pipeline.ExactIndex.build(
      d.select("doc_id", "text"), "text", "doc_id", p)
    d.createOrReplaceTempView("ddl_docs_small")
    // attach adopts the durable artifact without rebuilding
    sql("CREATE DEDUP INDEX ddl_att ON ddl_docs_small(doc_id, text) " +
      s"OPTIONS(kind 'exact', path '$p', attach true)")
    val gated = sql("SELECT * FROM GRAFT_DEDUP_GATE('ddl_att', " +
      "'SELECT doc_id + 5000000 AS doc_id, text FROM ddl_docs_small', " +
      "'text', 'doc_id', 'exact')").count()
    assert(gated == 0L)
    sql("DROP DEDUP INDEX ddl_att")
    // attach to an empty dir names the missing family
    val eAtt = intercept[IllegalArgumentException](
      sql("CREATE ANN INDEX ddl_bad ON ddl_docs_small(doc_id, text) " +
        s"OPTIONS(path '${tempPath("graft_ddl_none")}', attach true)"))
    assert(eAtt.getMessage.contains("no ann index found"), eAtt.getMessage)
    // unknown option / bad kind / unregistered ALTER name
    val eOpt = intercept[IllegalArgumentException](
      sql("CREATE ANN INDEX ddl_bad ON ddl_docs_small(doc_id, text) " +
        "OPTIONS(wibble 3)"))
    assert(eOpt.getMessage.contains("unknown option"), eOpt.getMessage)
    val eKind = intercept[IllegalArgumentException](
      sql("CREATE DEDUP INDEX ddl_bad ON ddl_docs_small(doc_id, text) " +
        "OPTIONS(kind 'fuzzy')"))
    assert(eKind.getMessage.contains("unknown dedup index kind"), eKind.getMessage)
    val eAlter = intercept[IllegalArgumentException](
      sql("ALTER INDEX ddl_missing COMPACT"))
    assert(eAlter.getMessage.contains("not registered"), eAlter.getMessage)
    // attach accepts ONLY true/false (r17 ADVICE: attach '1' silently
    // fell through to a full BUILD over the tree the user meant to adopt)
    val eAtt1 = intercept[IllegalArgumentException](
      sql("CREATE DEDUP INDEX ddl_bad ON ddl_docs_small(doc_id, text) " +
        s"OPTIONS(kind 'exact', path '$p', attach '1')"))
    assert(eAtt1.getMessage.contains("attach must be true or false"),
      eAtt1.getMessage)
  }

  test("index names are DURABLE across sessions; TEMPORARY shadows; OR REPLACE rebinds (r17 verdict #1)") {
    val d = graft.engine.Tables.read(spark, sfDir, "documents")
      .filter(col("doc_id") < 200).select("doc_id", "text")
    d.createOrReplaceTempView("ddl_dur_docs")
    dropIfExists("DEDUP", "ddl_dur")
    val p = tempPath("graft_ddl_dur")
    sql("CREATE DEDUP INDEX ddl_dur ON ddl_dur_docs(doc_id, text) " +
      s"OPTIONS(kind 'exact', path '$p')")
    // a FRESH session (fresh state, no temp views, same warehouse — the
    // Thrift per-connection shape) resolves the name through the durable
    // catalog and serves the gate by name
    val s2 = spark.newSession()
    d.createOrReplaceTempView("ddl_dur_docs") // temp view lives in `spark` only
    graft.engine.Tables.read(s2, sfDir, "documents")
      .filter(col("doc_id") < 200).select("doc_id", "text")
      .createOrReplaceTempView("ddl_dur_docs2")
    val gated = graft.engine.GraftSql.sql(s2,
      "SELECT * FROM GRAFT_DEDUP_GATE('ddl_dur', " +
        "'SELECT doc_id + 5000000 AS doc_id, text FROM ddl_dur_docs2', " +
        "'text', 'doc_id', 'exact')").count()
    assert(gated == 0L, "the durable name must serve from a fresh session")
    assert(graft.engine.GraftSql.sql(s2, "SHOW GRAFT INDEXES").collect()
      .exists(r => r.getString(0) == "ddl_dur" && !r.getBoolean(6)))
    // TEMPORARY shadows the durable name in ITS session only
    val pTmp = tempPath("graft_ddl_dur_tmp")
    graft.pipeline.ExactIndex.build(d.limit(10), "text", "doc_id", pTmp)
    sql("CREATE TEMPORARY DEDUP INDEX ddl_dur ON ddl_dur_docs(doc_id, " +
      s"text) OPTIONS(kind 'exact', path '$pTmp', attach true)")
    assert(graft.engine.GraftIndexRegistry.get(spark, "ddl_dur")
      .exists(_.path == pTmp), "temporary must shadow durable")
    assert(graft.engine.GraftIndexRegistry.get(s2, "ddl_dur")
      .exists(_.path == p), "the shadow must not leak to other sessions")
    // DROP removes the shadow first (temp-view discipline), then the
    // durable entry on the second drop
    sql("DROP DEDUP INDEX ddl_dur")
    assert(graft.engine.GraftIndexRegistry.get(spark, "ddl_dur")
      .exists(_.path == p), "first DROP should only peel the shadow")
    // OR REPLACE rebinds the durable name to a new tree without touching
    // the old one on disk
    val p2 = tempPath("graft_ddl_dur2")
    graft.pipeline.ExactIndex.build(d.limit(20), "text", "doc_id", p2)
    sql("CREATE OR REPLACE DEDUP INDEX ddl_dur ON ddl_dur_docs(doc_id, " +
      s"text) OPTIONS(kind 'exact', path '$p2', attach true)")
    assert(graft.engine.GraftIndexRegistry.get(s2, "ddl_dur")
      .exists(_.path == p2), "OR REPLACE must rebind for every session")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(p)),
      "rebinding must not delete the previously bound tree")
    // grammar guard: OR REPLACE + IF NOT EXISTS is contradictory
    val eCombo = intercept[IllegalArgumentException](
      sql("CREATE OR REPLACE DEDUP INDEX IF NOT EXISTS ddl_dur ON " +
        s"ddl_dur_docs(doc_id, text) OPTIONS(kind 'exact', path '$p2')"))
    assert(eCombo.getMessage.contains("OR REPLACE"), eCombo.getMessage)
    sql("DROP DEDUP INDEX ddl_dur")
    assert(graft.engine.GraftIndexRegistry.get(s2, "ddl_dur").isEmpty)
  }

  test("ALTER INDEX APPEND TAG is idempotent under replay (r17 verdict #2)") {
    val e = graft.engine.Tables.read(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 300)
    e.createOrReplaceTempView("ddl_tag_embs")
    dropIfExists("ANN", "ddl_tag_ann")
    val p = tempPath("graft_ddl_tag")
    sql("CREATE ANN INDEX ddl_tag_ann ON ddl_tag_embs(vec_id, embedding) " +
      s"OPTIONS(lists 8, path '$p')")
    val append = "ALTER INDEX ddl_tag_ann APPEND FROM (SELECT vec_id + " +
      "100000 AS vec_id, embedding FROM ddl_tag_embs WHERE vec_id < 50) " +
      "TAG 'retry_batch_1'"
    sql(append)
    val frac1 = graft.pipeline.IvfIndex.appendedFraction(spark, p)
    val served1 = sql("SELECT * FROM GRAFT_ANN_TOPK('ddl_tag_ann', " +
      "'SELECT * FROM ddl_tag_embs WHERE vec_id < 3', 'vec_id', " +
      "'embedding', 5) ORDER BY q_id, rk").collect().toSeq
    // the RETRY: same statement, same tag — must not double-insert
    sql(append)
    assert(graft.pipeline.IvfIndex.appendedFraction(spark, p) == frac1,
      "a replayed tagged APPEND must not move the appended count")
    val served2 = sql("SELECT * FROM GRAFT_ANN_TOPK('ddl_tag_ann', " +
      "'SELECT * FROM ddl_tag_embs WHERE vec_id < 3', 'vec_id', " +
      "'embedding', 5) ORDER BY q_id, rk").collect().toSeq
    assert(served2 == served1,
      "a replayed tagged APPEND must not change served top-k rows")
    // a DIFFERENT tag appends for real
    sql("ALTER INDEX ddl_tag_ann APPEND FROM (SELECT vec_id + 200000 AS " +
      "vec_id, embedding FROM ddl_tag_embs WHERE vec_id < 50) TAG 'b2'")
    assert(graft.pipeline.IvfIndex.appendedFraction(spark, p) > frac1)
    // the exact family replays by overwriting its ingest=<tag> partition
    val docs = graft.engine.Tables.read(spark, sfDir, "documents")
      .filter(col("doc_id") < 100).select("doc_id", "text")
    docs.createOrReplaceTempView("ddl_tag_docs")
    dropIfExists("DEDUP", "ddl_tag_ex")
    val pEx = tempPath("graft_ddl_tag_ex")
    sql("CREATE DEDUP INDEX ddl_tag_ex ON ddl_tag_docs(doc_id, text) " +
      s"OPTIONS(kind 'exact', path '$pEx')")
    val exAppend = "ALTER INDEX ddl_tag_ex APPEND FROM (SELECT doc_id + " +
      "1000000 AS doc_id, concat(text, ' v2') AS text FROM ddl_tag_docs) " +
      "TAG 'exb1'"
    sql(exAppend); sql(exAppend) // replay overwrites, not duplicates
    val n = graft.pipeline.ExactIndex.readMeta(spark, pEx).nDocs
    val expect = docs.count() +
      docs.select("text").distinct().count() // base + v2 batch
    assert(n == expect, s"replayed exact APPEND duplicated rows: $n vs $expect")
    sql("DROP ANN INDEX ddl_tag_ann")
    sql("DROP DEDUP INDEX ddl_tag_ex")
  }

  test("quoted and backticked identifiers in index DDL (r17 verdict #4)") {
    val d = graft.engine.Tables.read(spark, sfDir, "documents")
      .filter(col("doc_id") < 100).select("doc_id", "text")
    d.createOrReplaceTempView("ddl_quoted_docs")
    // the INDEX name carries a space and a dot (registry-side, no Spark
    // identifier restriction); table/column identifiers are exercised in
    // both quoting styles over an ordinary view name
    dropIfExists("DEDUP", "\"ddl quoted.ix\"")
    val p = tempPath("graft_ddl_quot")
    sql("CREATE DEDUP INDEX \"ddl quoted.ix\" ON `ddl_quoted_docs`" +
      s"(\"doc_id\", `text`) OPTIONS(kind 'exact', path '$p')")
    assert(graft.engine.GraftIndexRegistry.get(spark, "ddl quoted.ix")
      .exists(_.family == "exact"))
    val gated = sql("SELECT * FROM GRAFT_DEDUP_GATE('ddl quoted.ix', " +
      "'SELECT doc_id + 5000000 AS doc_id, text FROM ddl_quoted_docs', " +
      "'text', 'doc_id', 'exact')").count()
    assert(gated == 0L)
    sql("ALTER INDEX `ddl quoted.ix` COMPACT")
    sql("DROP DEDUP INDEX \"ddl quoted.ix\"")
    assert(graft.engine.GraftIndexRegistry.get(spark, "ddl quoted.ix").isEmpty)
  }

  test("a bare unregistered TVF index name fails by NAME (r17 ADVICE)") {
    val e = intercept[Exception](
      sql("SELECT * FROM GRAFT_INDEX_STATS('no_such_ix_name')").collect())
    assert(e.getMessage.contains("is not registered"), e.getMessage)
  }
}

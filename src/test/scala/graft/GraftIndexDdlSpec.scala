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

  test("ANN index: CREATE builds the IVF tree, serves by name, RETRAIN + DROP") {
    val e = graft.engine.Tables.read(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 400)
    e.createOrReplaceTempView("ddl_embs")
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
    // minhash family check + drop both
    val st = sql("SELECT family FROM GRAFT_INDEX_STATS('ddl_mh') " +
      "WHERE current").collect()
    assert(st.head.getString(0) == "minhash")
    val eVerb = intercept[IllegalArgumentException](sql("DROP ANN INDEX ddl_ex"))
    assert(eVerb.getMessage.contains("DROP DEDUP INDEX"), eVerb.getMessage)
    sql("DROP DEDUP INDEX ddl_ex")
    sql("DROP DEDUP INDEX ddl_mh")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(pEx)))
  }

  test("attach binds an existing tree; grammar and option diagnostics") {
    val d = graft.engine.Tables.read(spark, sfDir, "documents")
      .filter(col("doc_id") < 200)
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
  }
}

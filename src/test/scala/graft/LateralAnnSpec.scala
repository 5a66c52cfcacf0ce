package graft

import org.apache.spark.sql.functions._

/** Correlated (LATERAL) GRAFT_ANN_TOPK (r17 verdict #3): the query
  * id/vector come from the outer row; the analyzer rewrite lowers the
  * lateral join onto the SAME batched probe kernel, so results are
  * pinned row-for-row to the Scala path. */
class LateralAnnSpec extends SparkTestBase {

  private def sql(text: String) = graft.engine.GraftSql.sql(spark, text)

  private lazy val (embsDf, indexPath) = {
    val e = graft.engine.Tables.read(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 400)
    e.createOrReplaceTempView("lat_embs")
    val p = java.nio.file.Files.createTempDirectory("graft_lat")
      .toString + "/ix"
    graft.pipeline.IvfIndex.build(e, "vec_id", "embedding", p, nLists = 8,
      attrCols = Seq("label"))
    (e, p)
  }

  test("lateral ANN top-k matches the batched Scala path row-for-row") {
    val got = sql(
      s"SELECT o.vec_id AS q_id, t.c_id, t.cos, t.rk " +
        s"FROM (SELECT * FROM lat_embs WHERE vec_id < 3) o, " +
        s"LATERAL GRAFT_ANN_TOPK('$indexPath', o.vec_id, o.embedding, 5) t " +
        "ORDER BY q_id, rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    val expect = graft.pipeline.IvfIndex.topK(spark, indexPath,
        embsDf.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5)
      .orderBy("q_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    assert(got == expect, "lateral serve diverged from the batched kernel")
  }

  test("lateral form carries outer columns, predicates, and a named index") {
    // TEMPORARY: the name dies with the session and DROP is not needed
    // (DROP would delete the shared tree the other tests serve from)
    graft.engine.GraftSql.sql(spark,
      "CREATE OR REPLACE TEMPORARY ANN INDEX lat_named_ix ON lat_embs(" +
        s"vec_id, embedding) OPTIONS(path '$indexPath', attach true)")
    // outer columns ride along; the quoted predicate reaches the pruned
    // index scan exactly like the batch form's predicate argument
    val rows = sql(
      "SELECT o.vec_id, o.label AS q_label, t.c_id, t.cos, t.rk " +
        "FROM (SELECT * FROM lat_embs WHERE vec_id < 3) o, " +
        "LATERAL GRAFT_ANN_TOPK('lat_named_ix', o.vec_id, o.embedding, 5, " +
        "'label < 5') t ORDER BY o.vec_id, t.rk").collect()
    val expect = graft.pipeline.IvfIndex.topK(spark, indexPath,
        embsDf.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5,
        predicate = Some(col("label") < 5))
      .orderBy("q_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    assert(rows.map(r => (r.getLong(0), r.getLong(2), r.getDouble(3),
      r.getInt(4))).toSeq == expect)
    // the outer label is the OUTER ROW's label for every fanned-out row
    val labels = embsDf.filter(col("vec_id") < 3)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.forall(r => r.getInt(1) == labels(r.getLong(0))))
  }

  test("duplicate outer ids probe once and fan back out per outer row") {
    val dup = sql(
      s"SELECT o.vec_id, t.rk FROM (SELECT * FROM lat_embs WHERE " +
        "vec_id < 2 UNION ALL SELECT * FROM lat_embs WHERE vec_id < 2) o, " +
        s"LATERAL GRAFT_ANN_TOPK('$indexPath', o.vec_id, o.embedding, 3) t")
      .collect()
    // 2 distinct ids x 2 copies x k=3
    assert(dup.length == 12, s"expected 12 fanned rows, got ${dup.length}")
  }

  test("diagnostics: non-inner lateral and wrong arity name the problem") {
    val eOuter = intercept[Exception](sql(
      s"SELECT * FROM lat_embs o LEFT JOIN LATERAL GRAFT_ANN_TOPK(" +
        s"'$indexPath', o.vec_id, o.embedding, 3) t ON true").collect())
    assert(eOuter.getMessage.contains("INNER lateral") ||
      eOuter.getMessage.contains("lateral ON condition"), eOuter.getMessage)
    val eArity = intercept[Exception](sql(
      s"SELECT * FROM lat_embs o, LATERAL GRAFT_ANN_TOPK('$indexPath', " +
        "o.vec_id, o.embedding) t").collect())
    assert(eArity.getMessage.contains("4-6 arguments"), eArity.getMessage)
    // a correlated column in a function that does not support it still
    // fails with the literal-argument diagnostic
    val eOther = intercept[Exception](sql(
      "SELECT * FROM lat_embs o, LATERAL GRAFT_SEARCH_BM25('lat_embs', " +
        "'text', o.vec_id, 'spark', 3) t").collect())
    assert(eOther.getMessage.contains("string literal"), eOther.getMessage)
  }
}

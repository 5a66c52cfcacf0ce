package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._

/** GRAFT table functions, registered as GENUINE Catalyst table functions
  * (r16 verdict #1 — replaces the whole-statement text router GraftTvf of
  * r16): because resolution happens in the analyzer through the session's
  * TableFunctionRegistry, the forms compose like any other relation —
  * projections, joins, CTEs, subqueries, CREATE VIEW over them — from
  * every front door including JDBC/Thrift. Each function lowers onto the
  * SAME oracle-checked kernel the Scala API uses, by returning that
  * kernel DataFrame's logical plan; there is no second implementation to
  * audit (q_sql_* rows pin hash-identical results against the Scala
  * path).
  *
  * The reference's NewSQL grammar has no table-valued functions
  * (/root/reference/server/sql_internal_parser.cpp rules 112-161 define
  * FROM over tables/joins only), so this surface is ours to design; its
  * JDBC-first posture (server/sql_service.cpp:774) is the parity bar the
  * wire tests hold it to.
  *
  * Functions (string arguments are SQL string literals; table arguments
  * take a table/view name or a full SELECT, parsed through the session's
  * own front door; `index` arguments take a registered index name from
  * [[GraftIndexRegistry]] or a filesystem path):
  *
  * {{{
  * GRAFT_ANN_TOPK(index, queries, idCol, vecCol, k [, nProbe] [, 'pred'])
  * GRAFT_DEDUP_GATE(index, batch, textCol, idCol, 'exact'|'minhash'
  *                  [, minEstSim])
  * GRAFT_SEARCH_BM25(docs, textCol, idCol, 'terms ws-separated', k
  *                   [, k1, b])
  * GRAFT_HYBRID_RRF(docs, textCol, idCol, embs, vecCol, vecIdCol,
  *                  'terms', queryId, k [, poolK, kRrf])
  * GRAFT_DECONTAMINATE(docs, idCol, textCol, bench, benchTextCol [, n])
  * GRAFT_INDEX_STATS(index)
  * }}}
  */
object GraftTableFunctions {

  type Builder = Seq[Expression] => LogicalPlan

  // ---- literal-argument extraction -----------------------------------
  // TVF arguments arrive as parsed expressions; the GRAFT forms take
  // literals ONLY — except GRAFT_ANN_TOPK's correlated form (r17 verdict
  // #3), where the query id/vector arrive as OuterReferences from a
  // LATERAL join and route to [[GraftLateralAnnTopk]]. A bare identifier
  // never reaches the builder — the analyzer refuses to resolve a table
  // function whose arguments hold unresolved attributes
  // (UNRESOLVED_COLUMN), so `graft_index_stats(ix)` must be spelled
  // `graft_index_stats('ix')`. For every OTHER function a correlated
  // column still fails with the diagnostic below instead of silently
  // reading the column name as the argument value.

  private def strOpt(e: Expression): Option[String] = e match {
    case Literal(v, StringType) if v != null => Some(v.toString)
    case _ => None
  }

  private def numOpt(e: Expression): Option[Double] = e match {
    case Literal(v, t) if v != null => t match {
      case ByteType => Some(v.asInstanceOf[Byte].toDouble)
      case ShortType => Some(v.asInstanceOf[Short].toDouble)
      case IntegerType => Some(v.asInstanceOf[Int].toDouble)
      case LongType => Some(v.asInstanceOf[Long].toDouble)
      case FloatType => Some(v.asInstanceOf[Float].toDouble)
      case DoubleType => Some(v.asInstanceOf[Double].toDouble)
      case _: DecimalType =>
        Some(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble)
      case _ => None
    }
    case _ => None
  }

  private def str(args: Seq[Expression], i: Int, fn: String,
                  what: String): String =
    strOpt(args(i)).getOrElse(fail(fn,
      s"$what (argument ${i + 1}) must be a string literal " +
        "(correlated/LATERAL column arguments are not supported), got: " +
        args(i).sql))

  private def num(args: Seq[Expression], i: Int, fn: String,
                  what: String): Double =
    numOpt(args(i)).getOrElse(fail(fn,
      s"$what (argument ${i + 1}) must be a numeric literal, got: ${args(i).sql}"))

  private[engine] val usage = Map(
    "graft_ann_topk" ->
      ("GRAFT_ANN_TOPK(index, queries, 'idCol', 'vecCol', k [, nProbe] " +
        "[, 'predicate']) — index: a registered index name or path; " +
        "queries: a table/view name or a full SELECT. Correlated form " +
        "(in a LATERAL join): GRAFT_ANN_TOPK(index, qIdExpr, qVecExpr, " +
        "k [, nProbe] [, 'predicate'])"),
    "graft_dedup_gate" ->
      ("GRAFT_DEDUP_GATE(index, batch, 'textCol', 'idCol', " +
        "'exact'|'minhash' [, minEstSim])"),
    "graft_search_bm25" ->
      ("GRAFT_SEARCH_BM25(docs, 'textCol', 'idCol', 'terms " +
        "(whitespace-separated)', k [, k1, b])"),
    "graft_hybrid_rrf" ->
      ("GRAFT_HYBRID_RRF(docs, 'textCol', 'idCol', embs, 'vecCol', " +
        "'vecIdCol', 'terms', queryId, k [, poolK, kRrf])"),
    "graft_decontaminate" ->
      ("GRAFT_DECONTAMINATE(docs, 'idCol', 'textCol', bench, " +
        "'benchTextCol' [, ngramN])"),
    "graft_index_stats" -> "GRAFT_INDEX_STATS(index)")

  private def fail(fn: String, why: String): Nothing =
    throw new IllegalArgumentException(
      s"$why. Usage: ${usage(fn.toLowerCase)}")

  private def arity(fn: String, args: Seq[Expression], lo: Int,
                    hi: Int): Unit =
    if (args.size < lo || args.size > hi)
      fail(fn, s"${fn.toUpperCase} takes $lo-$hi arguments, got ${args.size}")

  /** A table/view name resolves via the catalog; anything else is parsed
    * as a query through the session's SQL front door (dialect included).
    * The read-auth gate runs on the resolved frame's plan here because
    * TVF lowering happens at ANALYSIS time — after GraftSqlParser's
    * parse-time gate already ran on the OUTER statement, which could not
    * see through the argument string (r17: the registry path must not
    * become a read-gate bypass). */
  private[engine] def inputFrame(spark: SparkSession, s: String): DataFrame = {
    // a bare (possibly dotted) name, or a backticked multipart name —
    // spark.table parses backticks natively; anything else is a query
    val namePart = """(?:[A-Za-z_]\w*|`(?:[^`]|``)+`)"""
    val df =
      if (s.matches("(?i)[A-Za-z_][\\w.]*") ||
          s.matches(s"$namePart(?:\\.$namePart)*"))
        spark.table(s)
      else spark.sql(s)
    GraftAuth.check(spark, df.queryExecution.logical)
    df
  }

  /** True when the expression carries a correlated (LATERAL) column. */
  private def correlated(e: Expression): Boolean =
    e.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.OuterReference])

  private def annTopK(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_ann_topk"
    // correlated (LATERAL) form (r17 verdict #3): the 2nd/3rd arguments
    // are OUTER-ROW expressions, not literals — return the placeholder
    // the injected ResolveGraftLateralAnnTopk rule rewrites into the
    // batched probe join
    if (args.length >= 3 && (correlated(args(1)) || correlated(args(2))))
      return annTopKLateral(args)
    arity(fn, args, 5, 7)
    val spark = SparkSession.active
    val path = GraftIndexRegistry.resolvePath(spark, str(args, 0, fn, "index"),
      wantFamily = Some("ann"))
    val idCol = str(args, 2, fn, "id column")
    val vecCol = str(args, 3, fn, "vector column")
    val k = num(args, 4, fn, "k").toInt
    // optional tail: a numeric literal is nProbe, a string the predicate
    val tail = args.drop(5)
    if (tail.exists(a => numOpt(a).isEmpty && strOpt(a).isEmpty) ||
        tail.count(a => numOpt(a).isDefined) > 1 ||
        tail.count(a => numOpt(a).isEmpty && strOpt(a).isDefined) > 1)
      fail(fn, "optional arguments are [nProbe][, 'predicate'] — one of each")
    val nProbe = tail.flatMap(numOpt).headOption.map(_.toInt).getOrElse(4)
    val predicate =
      tail.filter(a => numOpt(a).isEmpty).flatMap(strOpt).headOption.map(expr)
    val queries = inputFrame(spark, str(args, 1, fn, "queries"))
    graft.pipeline.IvfIndex.topK(spark, path, queries, idCol, vecCol, k,
      nProbe = nProbe, predicate = predicate).queryExecution.logical
  }

  /** The correlated form: GRAFT_ANN_TOPK(index, qIdExpr, qVecExpr, k
    * [, nProbe] [, 'predicate']) inside a LATERAL join. Scalar arguments
    * validate here; the index path resolves (auth-gated) here; the
    * enclosing LateralJoin rewrites in [[ResolveGraftLateralAnnTopk]]. */
  private def annTopKLateral(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_ann_topk"
    if (args.size < 4 || args.size > 6)
      fail(fn, "the correlated form takes 4-6 arguments " +
        "(index, qIdExpr, qVecExpr, k [, nProbe] [, 'predicate']), got " +
        args.size.toString)
    val spark = SparkSession.active
    val path = GraftIndexRegistry.resolvePath(spark, str(args, 0, fn, "index"),
      wantFamily = Some("ann"))
    if (!correlated(args(1)) || !correlated(args(2)))
      fail(fn, "the correlated form needs BOTH the query id (argument 2) " +
        "and the query vector (argument 3) from the outer row")
    val k = num(args, 3, fn, "k").toInt
    val tail = args.drop(4)
    if (tail.exists(a => numOpt(a).isEmpty && strOpt(a).isEmpty) ||
        tail.count(a => numOpt(a).isDefined) > 1 ||
        tail.count(a => numOpt(a).isEmpty && strOpt(a).isDefined) > 1)
      fail(fn, "optional arguments are [nProbe][, 'predicate'] — one of each")
    val nProbe = tail.flatMap(numOpt).headOption.map(_.toInt).getOrElse(4)
    val predicate =
      tail.filter(a => numOpt(a).isEmpty).flatMap(strOpt).headOption
    GraftLateralAnnTopk(path, args(1), args(2), k, nProbe, predicate)
  }

  private def dedupGate(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_dedup_gate"
    arity(fn, args, 5, 6)
    val spark = SparkSession.active
    val textCol = str(args, 2, fn, "text column")
    val idCol = str(args, 3, fn, "id column")
    // validate the kind BEFORE resolving the batch frame, so a typo'd
    // kind reports itself instead of a table-resolution error
    val kind = str(args, 4, fn, "gate kind").toLowerCase
    if (kind != "exact" && kind != "minhash")
      fail(fn, s"unknown dedup gate kind '$kind' (exact|minhash)")
    val path = GraftIndexRegistry.resolvePath(spark, str(args, 0, fn, "index"),
      wantFamily = Some(kind))
    val batch = inputFrame(spark, str(args, 1, fn, "batch"))
    val out = kind match {
      case "exact" =>
        if (args.size == 6) fail(fn, "the exact gate takes no minEstSim")
        graft.pipeline.ExactIndex.dedupBatch(batch, textCol, idCol, path)
      case "minhash" =>
        val minEstSim =
          if (args.size == 6) num(args, 5, fn, "minEstSim") else 0.5
        graft.pipeline.MinhashIndex.dedupBatch(batch, textCol, idCol, path,
          minEstSim)
    }
    out.queryExecution.logical
  }

  private def searchBm25(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_search_bm25"
    arity(fn, args, 5, 7)
    val spark = SparkSession.active
    // scalar arguments validate BEFORE table resolution, so a bad term
    // list / arity reports itself rather than a table-resolution error
    val textCol = str(args, 1, fn, "text column")
    val idCol = str(args, 2, fn, "id column")
    val terms = str(args, 3, fn, "terms").split("\\s+").toSeq.filter(_.nonEmpty)
    if (terms.isEmpty) fail(fn, "terms must contain at least one term")
    val k = num(args, 4, fn, "k").toInt
    val k1 = if (args.size >= 6) num(args, 5, fn, "k1") else 1.2
    val b = if (args.size >= 7) num(args, 6, fn, "b") else 0.75
    val docs = inputFrame(spark, str(args, 0, fn, "docs"))
    graft.pipeline.Search.bm25(docs, textCol, idCol, terms, k, k1, b)
      .queryExecution.logical
  }

  private def hybridRrf(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_hybrid_rrf"
    arity(fn, args, 9, 11)
    val spark = SparkSession.active
    val textCol = str(args, 1, fn, "text column")
    val idCol = str(args, 2, fn, "id column")
    val vecCol = str(args, 4, fn, "vector column")
    val vecIdCol = str(args, 5, fn, "vector id column")
    val terms = str(args, 6, fn, "terms").split("\\s+").toSeq.filter(_.nonEmpty)
    if (terms.isEmpty) fail(fn, "terms must contain at least one term")
    val queryId = num(args, 7, fn, "queryId").toLong
    val k = num(args, 8, fn, "k").toInt
    val poolK = if (args.size >= 10) num(args, 9, fn, "poolK").toInt else 50
    val kRrf = if (args.size >= 11) num(args, 10, fn, "kRrf").toInt else 60
    val docs = inputFrame(spark, str(args, 0, fn, "docs"))
    val embs = inputFrame(spark, str(args, 3, fn, "embeddings"))
    graft.pipeline.Search.hybridTopK(docs, textCol, idCol, embs, vecCol,
      vecIdCol, terms, queryId, k, poolK, kRrf).queryExecution.logical
  }

  private def decontaminate(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_decontaminate"
    arity(fn, args, 5, 6)
    val spark = SparkSession.active
    val idCol = str(args, 1, fn, "id column")
    val textCol = str(args, 2, fn, "text column")
    val benchTextCol = str(args, 4, fn, "bench text column")
    val n = if (args.size >= 6) num(args, 5, fn, "ngramN").toInt else 13
    val docs = inputFrame(spark, str(args, 0, fn, "docs"))
    val bench = inputFrame(spark, str(args, 3, fn, "bench"))
    graft.pipeline.Curation.ngramOverlap(docs, idCol, textCol, bench,
      benchTextCol, n).queryExecution.logical
  }

  private def indexStats(args: Seq[Expression]): LogicalPlan = {
    val fn = "graft_index_stats"
    arity(fn, args, 1, 1)
    val spark = SparkSession.active
    val path = GraftIndexRegistry.resolvePath(spark, str(args, 0, fn, "index"),
      wantFamily = None)
    graft.pipeline.IndexStats.stats(spark, path).queryExecution.logical
  }

  /** (identifier, info, builder) descriptors — injected per-session by
    * [[GraftExtensions]] and registered imperatively by
    * [[GraftFunctions.registerAll]] for externally-created sessions. */
  def descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = {
    def d(name: String, b: Builder) = (
      FunctionIdentifier(name),
      new ExpressionInfo(getClass.getName.stripSuffix("$"), name),
      b)
    Seq(
      d("graft_ann_topk", annTopK),
      d("graft_dedup_gate", dedupGate),
      d("graft_search_bm25", searchBm25),
      d("graft_hybrid_rrf", hybridRrf),
      d("graft_decontaminate", decontaminate),
      d("graft_index_stats", indexStats))
  }

  // once-per-session guard (r18): operators call registerAll on every
  // query build — unguarded, each build re-registered all six TVFs and
  // logged six "replaced a previously registered function" WARNs (sync
  // stderr I/O per build; a bench run emits ~900 of them). Same weak-key +
  // sentinel-probe discipline as GridDbScalarFunctions.register.
  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Register into an existing session's table-function registry, once per
    * session (re-registration replaces the same builder, so the guard is
    * purely a cost/log-noise fix; the sentinel probe self-repairs if the
    * registry was cleared out from under us). */
  def register(spark: SparkSession): Unit = registered.synchronized {
    val reg = spark.sessionState.tableFunctionRegistry
    val fresh = registered.add(spark)
    // sentinel probes EVERY descriptor (r19 ADVICE: head-only missed a
    // non-head TVF dropped from the registry while the head survived)
    if (fresh || descriptors.exists(d => !reg.functionExists(d._1))) {
      descriptors.foreach { case (id, info, b) =>
        reg.registerFunction(id, info, b)
      }
    }
  }
}

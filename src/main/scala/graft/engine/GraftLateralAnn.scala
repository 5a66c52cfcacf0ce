package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, OuterReference}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LateralJoin, LeafNode, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.expr

/** LATERAL (correlated) form of GRAFT_ANN_TOPK (r17 verdict #3): the
  * query id/vector come from the OUTER row instead of a quoted table
  * argument —
  *
  * {{{
  * SELECT e.*, t.c_id, t.cos, t.rk
  * FROM embs e, LATERAL GRAFT_ANN_TOPK('ix', e.vec_id, e.embedding, 5) t
  * }}}
  *
  * The kernel is already batched, so the surface is a REWRITE, not a new
  * execution path: the TVF builder (which receives the correlated
  * columns as resolved [[OuterReference]]s) returns the
  * [[GraftLateralAnnTopk]] placeholder leaf, and
  * [[ResolveGraftLateralAnnTopk]] — in the analyzer's main resolution
  * batch — replaces the enclosing `LateralJoin` with an ordinary inner
  * join of the outer plan against `IvfIndex.topK` probed over the outer
  * plan's DISTINCT (id, vector) projection, joined back on
  * `q_id = <outer id expr>`. Per-outer-row semantics fall out of the
  * equi-join; Catalyst then plans the join like any other (broadcast or
  * shuffle under AQE), and the probe keeps every scale property the
  * batched serve already proved (pruned index scan, counted broadcast
  * gate, k-capped rank).
  *
  * The outer id expression must IDENTIFY the vector (duplicate outer
  * ids probe once and fan back out through the join — two outer rows
  * sharing an id but carrying different vectors would probe only one of
  * them).
  *
  * The reference's NewSQL grammar has neither table-valued functions nor
  * LATERAL (/root/reference/server/sql_internal_parser.cpp rules
  * 112-161: FROM over tables/joins only) — this surface is ours to
  * design; the rewrite-to-join shape is how Spark itself lowers lateral
  * generators.
  */
final case class GraftLateralAnnTopk(
    path: String, qId: Expression, qVec: Expression, k: Int,
    nProbe: Int, predicate: Option[String]) extends LeafNode {
  override def output: Seq[Attribute] = Nil
  // stays unresolved so CheckAnalysis refuses the plan loudly if the
  // session lacks the rewrite rule (a session built WITHOUT
  // GraftExtensions that registered the TVFs imperatively)
  override lazy val resolved: Boolean = false
}

class ResolveGraftLateralAnnTopk(spark: SparkSession)
    extends Rule[LogicalPlan] {

  /** Peel SubqueryAlias layers down to the placeholder, remembering them
    * so the rewritten probe keeps the user's alias (`... t`). */
  private def unwrap(plan: LogicalPlan)
      : Option[(Seq[SubqueryAlias], GraftLateralAnnTopk)] = plan match {
    case a: SubqueryAlias =>
      unwrap(a.child).map { case (as, ph) => (a +: as, ph) }
    case ph: GraftLateralAnnTopk => Some((Nil, ph))
    case _ => None
  }

  private def strip(e: Expression): Expression =
    e.transform { case OuterReference(a) => a }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j: LateralJoin if j.left.resolved &&
        unwrap(j.right.plan).isDefined =>
      val (aliases, ph) = unwrap(j.right.plan).get
      if (j.joinType != Inner)
        throw new IllegalArgumentException(
          "correlated GRAFT_ANN_TOPK supports INNER lateral joins only " +
            s"(got ${j.joinType}); an outer row with no neighbors under " +
            "the predicate simply produces no output rows")
      if (j.condition.isDefined)
        throw new IllegalArgumentException(
          "correlated GRAFT_ANN_TOPK takes no lateral ON condition — " +
            "filter the joined result instead")
      val qId = strip(ph.qId)
      val qVec = strip(ph.qVec)
      // the batched kernel probes the DISTINCT outer (id, vector) pairs
      // once; the equi-join below fans results back out per outer row
      val queries = org.apache.spark.sql.graft.GraftSqlBridge.ofRows(spark,
        org.apache.spark.sql.catalyst.plans.logical.Project(
          Seq(org.apache.spark.sql.catalyst.expressions.Alias(qId, "q_id")(),
            org.apache.spark.sql.catalyst.expressions.Alias(qVec, "qv")()),
          j.left))
        .dropDuplicates("q_id")
      val probe = graft.pipeline.IvfIndex.topK(spark, ph.path, queries,
        "q_id", "qv", ph.k, nProbe = ph.nProbe,
        predicate = ph.predicate.map(expr))
      // the ANALYZED plan: its output attrs are final, so the join
      // condition's q_id reference cannot drift under re-analysis
      val probePlan = probe.queryExecution.analyzed
      val probeQid = probePlan.output
        .find(_.name == "q_id").getOrElse(throw new IllegalStateException(
          "ANN probe plan lost its q_id column"))
      val right = aliases.foldRight(probePlan)((a, p) =>
        SubqueryAlias(a.identifier, p))
      Join(j.left, right, Inner, Some(EqualTo(qId, probeQid)), JoinHint.NONE)
  }
}

package graft.engine

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Count
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag

/** Standard-compliant ROLLUP/CUBE on EMPTY input.
  *
  * SQL:2011 (and DuckDB/Postgres, and the reference's SQLite-derived
  * aggregation): a grouping-set query whose sets include the global set
  * `()` returns the grand-total row even when the (filtered) input is
  * empty — `()` aggregates like a plain global aggregate, which yields one
  * row of COUNT=0 / SUM=NULL. Spark lowers grouping sets to
  * Aggregate-over-Expand keyed by `spark_grouping_id`, and a keyed
  * aggregate over zero rows yields zero groups — so Spark silently drops
  * the grand-total row. Found by the v3 grammar fuzzer (seed 2: ROLLUP
  * under a contradiction predicate; DuckDB 1 row, Spark 0).
  *
  * Fix, applied once post-analysis: rewrite
  * {{{ Aggregate(gid-keyed, aggs, Expand(projections, out, child)) }}}
  * to
  * {{{ Union(original,
  *           Project(aggs',
  *             Filter(__cnt == 0,
  *               Aggregate(Nil, aggs' :+ count(1) as __cnt, child)))) }}}
  * where aggs' is aggs with every Expand-output attribute substituted by
  * the GLOBAL grouping set's projection expressions (typed null literals
  * for the group columns, the all-ones literal for the grouping id — so
  * GROUPING()/GROUPING_ID() fold to their grand-total values). The guard
  * `HAVING count(*) = 0` keeps the extra leg empty whenever the input is
  * non-empty, so results only change in exactly the dropped-row case.
  *
  * Scale note: the guard leg is one extra global aggregate over the same
  * child — map-side partials to a single row, reading only the columns the
  * aggregates touch. No shuffle is added to the main leg, whose plan is
  * byte-identical to stock Spark.
  *
  * The rewrite only fires when a projection row nulls EVERY grouping
  * position (the global set) — explicit GROUPING SETS((a),(b)) without
  * `()` keeps Spark's (and the standard's) zero-row behavior.
  */
object RollupEmptyGlobalRow extends Rule[LogicalPlan] {

  private val GroupingIdName = "spark_grouping_id"
  private[engine] val GuardName = "__graft_rollup_cnt"

  /** Idempotence marker on the already-rewritten Aggregate (the Union's
    * first leg). Tags are preserved by makeCopy/withNewChildren/clone, so
    * the marker survives plan copies that break object identity — e.g.
    * another extension rule rewriting inside the leg, or CTE/view inlining
    * cloning the subtree — where the previous IdentityHashMap-based
    * tracking would re-match and stack a duplicate grand-total leg. */
  private val RewrittenTag = TreeNodeTag[Boolean]("graft.rollupEmptyGlobalRow")

  /** The guard leg duplicates expand.child as a second, independently
    * evaluated scan. If the subtree is non-deterministic (rand()/uuid()
    * in a filter or projection) the guard's count could disagree with the
    * main leg — a spurious grand-total row next to real groups, or a
    * missing one. Keep stock Spark behavior for those queries. */
  private def childSafe(child: LogicalPlan): Boolean =
    !child.isStreaming &&
      !child.exists(p => p.expressions.exists(e => !e.deterministic))

  def apply(plan: LogicalPlan): LogicalPlan = {
    if (!plan.resolved) return plan
    plan.transformUp {
      case agg @ Aggregate(_, _, expand: Expand, _)
          if agg.resolved && agg.getTagValue(RewrittenTag).isEmpty &&
            expand.output.exists(_.name == GroupingIdName) &&
            childSafe(expand.child) =>
        globalProjection(agg, expand) match {
          case Some(globalRow) => rewrite(agg, expand, globalRow)
          case None => agg
        }
    }
  }

  /** The projection row of the global grouping set `()`: the row that
    * nulls EVERY grouping attribute the Aggregate keys on (gid excluded).
    * The grouping positions come from agg.groupingExpressions — the
    * authoritative source — NOT from which positions vary across rows:
    * under a partial rollup (`GROUP BY a, ROLLUP(b)`) the plain keys are
    * identical in every projection row, yet no set is global, and a
    * variance-based check misclassifies the coarsest partial set as `()`
    * (found in review: it rewired `a` into an ungrouped aggregate leg —
    * MISSING_GROUP_BY on every partial-rollup query). A single-set
    * GROUPING SETS (()) has one projection row and legitimately
    * qualifies. */
  private def globalProjection(agg: Aggregate, expand: Expand): Option[Seq[Expression]] = {
    val gidIds = expand.output.filter(_.name == GroupingIdName).map(_.exprId).toSet
    val groupIds = agg.groupingExpressions
      .collect { case a: Attribute => a.exprId }.toSet -- gidIds
    val groupPositions = expand.output.zipWithIndex
      .collect { case (a, i) if groupIds.contains(a.exprId) => i }
    expand.projections.find { row =>
      groupPositions.nonEmpty && groupPositions.forall { i =>
        row(i) match {
          case Literal(null, _) => true
          case _ => false
        }
      }
    }.orElse {
      // GROUPING SETS (()) alone: no grouping columns at all, only the
      // gid key — the single projection row IS the global set
      if (groupPositions.isEmpty && expand.projections.nonEmpty)
        Some(expand.projections.head)
      else None
    }
  }

  private def rewrite(agg: Aggregate, expand: Expand,
                      globalRow: Seq[Expression]): LogicalPlan = {
    val subst: Map[ExprId, Expression] =
      expand.output.map(_.exprId).zip(globalRow).toMap

    // aggs with Expand attrs replaced by the global set's expressions;
    // top-level plain attrs (the group columns in the SELECT list) become
    // literals and need re-aliasing under their original names
    val aggsGlobal: Seq[NamedExpression] = agg.aggregateExpressions.map { ne =>
      val s = ne.transformUp {
        case a: Attribute if subst.contains(a.exprId) => subst(a.exprId)
      }
      s match {
        case a: Alias => Alias(a.child, a.name)() // fresh exprId for leg 2
        case n: NamedExpression if n.resolved && !subst.contains(n.exprId) => n
        case e => Alias(e, ne.name)()
      }
    }
    val cnt = Alias(Count(Seq(Literal(1))).toAggregateExpression(), GuardName)()
    val globalAgg = Aggregate(Nil, aggsGlobal :+ cnt, expand.child, None)
    val emptyOnly = Filter(EqualTo(cnt.toAttribute, Literal(0L)), globalAgg)
    val leg2 = Project(aggsGlobal.map(_.toAttribute), emptyOnly)
    agg.setTagValue(RewrittenTag, true)
    Union(agg, leg2)
  }
}

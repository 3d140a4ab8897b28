package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY.md §7.5 ladder: `injectOptimizerRule`): rewrites
  * the window-rank top-k idiom
  *
  * {{{ df.withColumn("rnk", row_number().over(partitionBy(K).orderBy(O)))
  *      .filter($"rnk" <= k) }}}
  *
  * onto the engine's partial/final [[TopKPerKeyNode]]. The window form
  * shuffles and sorts EVERY input row before the filter drops all but k per
  * key — at 100 TB that shuffle is the job. The rewritten plan prunes to
  * ≤ k rows per key per partition BEFORE the exchange (bounded heaps), then
  * re-applies the original Window over the surviving ≤ k·|keys| rows — the
  * recomputed row_number assigns exactly the ranks the kept rows had in the
  * full partition (same comparator kept the top k in order), so results are
  * identical, including any extra filter conjuncts, which stay in place.
  *
  * Fires only on the exact safe shape: a single row_number window
  * expression, non-empty partition AND order specs, and a `rnk <= k` /
  * `rnk < k` / `rnk = 1` conjunct (direct or through an integral cast) with
  * a positive literal bound of at most [[WindowRankToTopK.MaxK]] (an absurd
  * k means the idiom was not a top-k query). Memory-safe at ANY key
  * cardinality — including the rank=1-over-unique-keys dedup shape — because
  * [[TopKPerKeyExec]]'s partial stage flushes at a bounded row count and its
  * final stage streams over sorted input (see its memory contract).
  */
class WindowRankToTopK extends Rule[LogicalPlan] with PredicateHelper {

  import WindowRankToTopK.MaxK

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // Re-evaluation safety: TopKPerKeyExec evaluates key/order expressions
    // in three places (partial heaps, the inserted sort, the final stream).
    // That is sound because post-analysis window specs are ALWAYS
    // deterministic — the analyzer's PullOutNondeterministic materializes
    // e.g. orderBy(rand()) into a child Project and the spec references the
    // materialized attribute, so all three passes see one frozen value.
    case f @ Filter(cond, w: Window)
        if !w.child.isInstanceOf[TopKPerKeyNode] && w.partitionSpec.nonEmpty &&
          w.orderSpec.nonEmpty =>
      rowNumberAttr(w) match {
        case Some(rn) =>
          val bounds = splitConjunctivePredicates(cond).flatMap(rankBound(_, rn))
          if (bounds.isEmpty) f
          else {
            val k = bounds.min
            if (k <= 0 || k > MaxK) f
            else f.copy(child = w.copy(child =
              TopKPerKeyNode(k.toInt, w.partitionSpec, w.orderSpec, w.child)))
          }
        case None => f
      }
  }

  /** The single row_number() window expression's output attribute, if that
    * is the Window's only computed column.
    */
  private def rowNumberAttr(w: Window): Option[Attribute] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(_: RowNumber, _), _)) => Some(a.toAttribute)
      case _ => None
    }

  /** k from a `rank <= k`-shaped conjunct over the row_number attribute
    * (possibly behind an integral up-cast, as left by predicate pushdown of
    * a `.cast("long")` alias).
    */
  private def rankBound(e: Expression, rn: Attribute): Option[Long] = {
    def isRank(x: Expression): Boolean = x match {
      case a: Attribute => a.exprId == rn.exprId
      case Cast(a: Attribute, dt, _, _) =>
        a.exprId == rn.exprId && (dt == org.apache.spark.sql.types.LongType ||
          dt == org.apache.spark.sql.types.IntegerType)
      case _ => false
    }
    def bound(lit: Any): Option[Long] = lit match {
      case i: Int => Some(i.toLong)
      case l: Long => Some(l)
      case s: Short => Some(s.toLong)
      case _ => None
    }
    e match {
      case LessThanOrEqual(x, Literal(v, _)) if isRank(x) => bound(v)
      case LessThan(x, Literal(v, _)) if isRank(x) => bound(v).map(_ - 1)
      case EqualTo(x, Literal(v, _)) if isRank(x) => bound(v).filter(_ == 1L)
      case GreaterThanOrEqual(Literal(v, _), x) if isRank(x) => bound(v)
      case GreaterThan(Literal(v, _), x) if isRank(x) => bound(v).map(_ - 1)
      case EqualTo(Literal(v, _), x) if isRank(x) => bound(v).filter(_ == 1L)
      case _ => None
    }
  }
}

object WindowRankToTopK {
  /** Rewrite ceiling for k: beyond this the query is not a top-k pruning
    * problem and the bounded-heap plan buys nothing.
    */
  val MaxK: Long = 100000L
}

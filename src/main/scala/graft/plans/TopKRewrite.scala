package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: the idiomatic top-k-per-group formulation
  *
  * {{{ df.withColumn("rk", row_number().over(Window.partitionBy(g).orderBy(o)))
  *      .filter(col("rk") <= k) }}}
  *
  * sorts every group in full before discarding all but k rows. This
  * rule rewrites the `Filter(rk ≤ k, [Project,] Window(row_number))`
  * pattern into [[TopKPerGroupNode]] — the bounded-heap operator (same
  * single shuffle, no sort, O(keys×k) memory) — so users writing the
  * window idiom get the scale-safe plan without knowing the custom
  * operator exists. Registered by [[graft.GraftExtensions]]; also
  * attachable to a live session via
  * `spark.experimental.extraOptimizations`.
  *
  * Conservative by construction: fires only when the window computes a
  * single `row_number` (→ [[TopKPerGroupNode]]), `rank` (ties kept →
  * [[RankTopKNode]]) or `dense_rank` (first k whole value groups →
  * [[RankTopKNode]] with `dense = true`) over a non-empty partition
  * spec, the filter compares that exact attribute against a positive
  * int literal with `<=`/`<`/`=== 1`, and any intermediate Project is
  * a pure attribute selection (kept on top of the rewrite, so column
  * pruning survives). Ties in a row_number ordering were
  * nondeterministic already; the rewrite preserves "one valid ranking"
  * exactly like Spark's own InferWindowGroupLimit.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  /** Hard max k the rewrite can ever fire for: a bounded heap of a
    * billion rows per key is no longer "top-k" — and keeps k+1 / array
    * allocations far from Int overflow (a `rk < Int.MinValue` filter
    * must not rewrite into a crashing plan; bounds are computed in
    * Long).
    */
  private val MaxK = 1 << 30

  /** Conf key for the user-facing ceiling (default 65536): above it
    * the rewrite declines and the window formulation is kept — its
    * sort path spills via Spark's own machinery, and at huge k the
    * heap's log-k insert cost stops beating the sort anyway. Below it
    * the heap execs are safe at any key cardinality too: they spill
    * sorted runs past `spark.graft.topk.spill.thresholdBytes` and
    * merge-stream the result (see [[TopKSpill]]).
    */
  val MaxKConfKey = "spark.graft.topk.rewrite.maxK"
  private val DefaultMaxK = 65536L

  private def effectiveMaxK: Long = math.min(
    conf.getConfString(MaxKConfKey, DefaultMaxK.toString).toLong, MaxK.toLong)

  private def boundOf(cond: Expression, rank: Attribute): Option[Long] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rank) => Some(k.toLong)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rank) => Some(k.toLong - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rank) => Some(k.toLong)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rank) => Some(k.toLong - 1)
    // the keep-latest idiom: row_number() === 1 ⇔ top-1 (row_number
    // starts at 1, so equality at 1 is exactly the ≤ 1 prefix; === k
    // for k > 1 selects a rank SLICE, which a top-k prefix is not)
    case EqualTo(a: Attribute, Literal(1, IntegerType))
      if a.semanticEquals(rank) => Some(1L)
    case EqualTo(Literal(1, IntegerType), a: Attribute)
      if a.semanticEquals(rank) => Some(1L)
    case _ => None
  }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(fn,
          WindowSpecDefinition(part, order, _)), _))
          if part.nonEmpty &&
            (fn.isInstanceOf[RowNumber] || fn.isInstanceOf[Rank]
              || fn.isInstanceOf[DenseRank]) =>
        boundOf(cond, a.toAttribute)
          .filter(k => k >= 1 && k <= effectiveMaxK).map(_.toInt).map { k =>
          // Spark's InferWindowGroupLimit (which runs earlier) inserts a
          // sort-based rank prune below the window; the heap subsumes it
          // — stripping it removes every per-partition sort from the
          // plan. Only safe when the prune is no tighter than k (a
          // tighter prune changes which rows exist to rank) and its
          // prune function is no stricter than the window's: the kept
          // row sets nest as row_number ⊆ rank ⊆ dense_rank at equal k,
          // so a prune may be stripped only if its function sits at or
          // beyond the window's own function in that chain.
          def looseEnough(pruneFn: Expression): Boolean = fn match {
            case _: RowNumber => true
            case _: Rank => !pruneFn.isInstanceOf[RowNumber]
            case _ => pruneFn.isInstanceOf[DenseRank]
          }
          val child = w.child match {
            case wgl: WindowGroupLimit
              if wgl.partitionSpec == part && wgl.orderSpec == order
                && wgl.limit >= k
                && looseEnough(wgl.rankLikeFunction) => wgl.child
            case c => c
          }
          fn match {
            case _: RowNumber =>
              TopKPerGroupNode(part, order, k, a.toAttribute, child)
            case _: Rank =>
              RankTopKNode(part, order, k, a.toAttribute, child)
            case _ =>
              RankTopKNode(part, order, k, a.toAttribute, child, dense = true)
          }
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w).getOrElse(f)
    case f @ Filter(cond, p @ Project(projectList, w: Window))
        if projectList.forall(_.isInstanceOf[Attribute]) =>
      rewrite(cond, w).map(Project(projectList, _)).getOrElse(f)
  }
}

package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.execution.{GlobalLimitExec, TakeOrderedAndProjectExec, LocalTableScanExec, LeafExecNode}

/** Global single-partition-window guard (VERDICT r13 #4): an unpartitioned
  * `WindowExec` moves its ENTIRE input to one task, so it is legitimate only
  * over inputs already reduced far below corpus size. Until this spec, that
  * claim ("window input is vocab/score-range/cell-bounded, never
  * corpus-sized") lived only in prose comments on the five queries below —
  * a refactor could silently turn one into a corpus-wide single-task sort
  * and nothing would fail before a 100 TB run. Here every declared batch
  * query's initial physical plan is swept; each unpartitioned window (incl.
  * WindowGroupLimit) must (a) belong to the declared whitelist and (b) sit
  * above a REDUCING subtree — every path from the window's child to a data
  * leaf passes through an aggregation or a limit, so the single task sees
  * group-count/limit-many rows, never the raw scan. The whitelist is
  * asserted in both directions (the NoCrossJoinSpec discipline): an entry
  * that stops planning a global window is a stale-entry failure.
  *
  * Model honesty: "passes through an aggregation" bounds the window input
  * by the GROUP COUNT of that aggregation, which the whitelisted queries
  * keep corpus-independent (vocabulary, distinct scores, 10⁴ grid cells,
  * score-range bins — see each query's own comment for the tighter claim).
  * A groupBy(doc_id) would still slip through this structural test; the
  * per-query scale comments + scalecheck exponents carry that last mile.
  */
class BoundedWindowSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  /** Queries whose unpartitioned window is deliberate, with the bound. */
  private val declared: Set[String] = Set(
    "q_hilbert",         // 3 windows over the ≤10⁴-cell box-grid aggregate
    "q_quality_auc",     // window over DISTINCT classifier scores (model
                         // score range, corpus-independent)
    "q_range_partition", // window over the fixed-size boundary sample agg
    "q_vocab_growth",    // window over per-prefix vocabulary aggregates
    "q_zipf"             // window over the vocabulary frequency aggregate
  )

  /** True iff every path from `p` to a data-producing leaf crosses a
    * reducing operator (aggregate / limit / top-k) — i.e. the subtree can
    * never stream a raw corpus-sized scan into the window's single task.
    * LocalTableScan (literal frames) is bounded by construction.
    */
  private def reduced(p: SparkPlan): Boolean = p match {
    case _: BaseAggregateExec => true
    case _: TakeOrderedAndProjectExec => true
    // GlobalLimit bounds the total row count; a bare LocalLimit does NOT
    // (it caps rows PER PARTITION, so a global window above one could
    // still see limit×numPartitions rows — ADVICE r14). Spark plans every
    // limit as GlobalLimit(LocalLimit(…)) or TakeOrdered, so accepting
    // only the global form loses no legitimate plan.
    case _: GlobalLimitExec => true
    case _: LocalTableScanExec => true
    case _: LeafExecNode => false
    case other => other.children.forall(reduced)
  }

  test("every unpartitioned window is whitelisted and aggregation-bounded") {
    val offenders = SparkEntry.registry
      .filterNot(_.name.startsWith("q_stream_")) // memory-sink scans
      .flatMap { q =>
        // executedPlan (prepared, NOT executed): subquery expressions are
        // physically planned there — on the raw sparkPlan they still hold
        // logical plans and collectWithSubqueries class-casts. AQE wrapper
        // traversal is what AdaptiveSparkPlanHelper exists for.
        val plan = q.run(spark, sfDir).queryExecution.executedPlan
        val globals = collectWithSubqueries(plan) {
          case w: WindowExec if w.partitionSpec.isEmpty => w.child
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w.child
        }
        val unbounded = globals.filterNot(reduced)
        if (globals.nonEmpty && !declared(q.name))
          Some(s"${q.name}: undeclared unpartitioned window (${globals.size})")
        else if (unbounded.nonEmpty)
          Some(s"${q.name}: unpartitioned window over a non-reduced input:\n" +
            unbounded.head.treeString.linesIterator.take(12).mkString("\n"))
        else if (globals.isEmpty && declared(q.name))
          Some(s"${q.name}: stale whitelist entry (no global window planned)")
        else None
      }
    spark.sharedState.cacheManager.clearCache() // builder-time cache residue
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}

package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Scale guard for the embedding-dedup family: candidate generation must be
  * bucket-joined (equi-join on the LSH signature), never an all-pairs
  * nested-loop/cartesian over the embeddings table. Round 1 shipped
  * q_dedup_cosine as `a.join(b, vec_a < vec_b)` — a BroadcastNestedLoopJoin
  * that is O(N²) at corpus scale; this spec pins the bounded plan.
  */
class SimilarityPlanSpec extends SparkTestBase {

  private def finalPlan(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.count() // warm: count() plans a sibling QueryExecution, so the
    // inspected plan below is the INITIAL adaptive plan — the full Catalyst
    // tree, before stage wrapping — which is exactly what we want to audit
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  // Robust under both un-executed (full-tree) and executed (stage-wrapped)
  // adaptive plans: QueryStageExec is a LEAF — recurse into it explicitly.
  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
    p.collect(pf) ++
      p.collect { case q: QueryStageExec => collectAll(q.plan)(pf) }.flatten ++
      p.collect { case r: ReusedExchangeExec => collectAll(r.child)(pf) }.flatten ++
      p.subqueries.flatMap(collectAll(_)(pf))

  test("q_dedup_cosine candidates come from a bucket equi-join, not all-pairs") {
    val plan = finalPlan(SparkEntry.queries("q_dedup_cosine")(spark, sfDir))
    val allPairs = collectAll(plan) {
      case j: BroadcastNestedLoopJoinExec => j.nodeName
      case j: CartesianProductExec => j.nodeName
    }
    assert(allPairs.isEmpty, s"unbounded all-pairs join in plan: $allPairs")
    // guard against a vacuously-empty traversal: the probe-bucket join and
    // the two vector join-backs must all be visible equi-joins
    val equiJoins = collectAll(plan) { case j: BaseJoinExec => j }
    assert(equiJoins.size >= 2, s"expected bucket join + vector join-back, got: ${equiJoins.map(_.nodeName)}")
  }
}

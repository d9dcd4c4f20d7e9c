package graft

import org.apache.spark.sql.functions._
import graft.model.Tables

/** Runtime row-level filter injection — the scale feature that makes a
  * SELECTIVE shuffle join cheap at 100 TB: when one join side carries a
  * selective predicate, Spark builds a bloom filter over its join keys at
  * runtime and pushes `might_contain` into the OTHER side's scan, so the
  * probe side drops non-matching rows before the shuffle instead of
  * shuffling the full table. This spec pins that the optimizer actually
  * injects the filter for the canonical shape (filtered dim ⋈ big fact,
  * broadcast disabled), and that the filtered plan returns exactly the
  * un-filtered join's rows — pruning must never change results.
  *
  * The thresholds are session-scoped here because the defaults
  * (10 GB probe-side scan) are sized for clusters, not a 6k-row fixture;
  * the PLAN SHAPE under test is identical at any size.
  */
class RuntimeFilterSpec extends SparkTestBase {

  private def withConfs(kv: (String, String)*)(body: => Unit): Unit = {
    val conf = spark.conf
    val saved = kv.map { case (k, _) => k -> conf.getOption(k) }
    try { kv.foreach { case (k, v) => conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("bloom filter is injected into the probe side of a selective shuffle join") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // fixture-sized thresholds (defaults are cluster-sized):
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force a shuffle join: a broadcast join needs no runtime filter
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // canonical shape: selective dim (≈1/5 of orders) ⋈ full fact scan
      val dim = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val fact = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_quantity"))
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      // pruning is plan-only: the result equals the join without injection
      val n = joined.count()
      withConfs("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        assert(fact.join(dim, col("l_orderkey") === col("o_orderkey")).count() == n)
      }
      assert(n > 0)
    }
  }
}

package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Pins q_quality_classifier's zero-shuffle claim: scoring is one narrow
  * map over the scan — the ONLY exchange in the executed plan is the range
  * partitioning of the deterministic output sort. A regression that
  * introduces an explode+groupBy (the one-hot shape the hashing trick
  * exists to avoid) fails here before it costs a shuffle at scale.
  */
class QualityClassifierSpec extends SparkTestBase
    with AdaptiveSparkPlanHelper {

  test("scoring plans with no shuffle beyond the output sort") {
    val df = SparkEntry.queries("q_quality_classifier")(spark, sfDir)
    df.count() // materialize so AQE finalizes the plan
    // permitted exchanges: the RangePartitioning of the deterministic
    // output ORDER BY and Tables.spread's RoundRobin parallelism floor
    // (a no-op on splittable real-scale tables). A HashPartitioning
    // exchange is the explode+groupBy shape this spec exists to ban.
    val hashShuffles = collectWithSubqueries(df.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec
          if e.outputPartitioning
            .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    assert(hashShuffles.isEmpty,
      s"expected no hash-partitioned shuffle, got ${hashShuffles.size}")
  }

  test("score decomposes as bias + sum of bucket weights") {
    // independent recomputation via the explode+groupBy shape the query
    // avoids — same numbers, different plan
    val wts = (0 until 64).map(j =>
      (graft.ops.Exprs.md5LongLocal(s"qw:$j") % 2001L) - 1000L)
    val bias = graft.ops.Exprs.md5LongLocal("qw:bias") % 2001L - 1000L
    import spark.implicits._
    val wDim = wts.zipWithIndex.map { case (w, j) => (j.toLong, w) }
      .toDF("bkt", "wt")
    val naive = graft.model.Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"),
        (graft.ops.Exprs.md5Long(concat(lit("fh:"), col("w"))) % 64).as("bkt"))
      .join(wDim, Seq("bkt"))
      .groupBy("doc_id").agg((sum("wt") + bias).as("score"))
    val got = SparkEntry.queries("q_quality_classifier")(spark, sfDir)
      .select("doc_id", "score")
    assert(got.except(naive).count() === 0L)
    assert(naive.except(got).count() === 0L)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Co-located fact⋈fact joins via bucketing — the production layout for the
  * engine's one shuffle-heavy join (lineitem⋈orders on orderkey). Writing
  * both tables bucketed by the join key pre-partitions them identically, so
  * the sort-merge join reads buckets pairwise and the plan contains NO
  * shuffle exchange. At 100 TB this turns the dominant network cost of the
  * fact join into pure local reads.
  */
class BucketingSpec extends SparkTestBase {

  test("bucketed lineitem ⋈ orders plans without a shuffle exchange") {
    // warehouse.dir is a static conf — the shared test session's default
    // (spark-warehouse under the sbt cwd) is fine; just make the tables fresh
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")

    graft.model.Tables.lineitem(spark, sfDir)
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    graft.model.Tables.orders(spark, sfDir)
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), Seq("l_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))

    val unbucketed = graft.model.Tables.lineitem(spark, sfDir)
      .join(graft.model.Tables.orders(spark, sfDir)
        .withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))

    // same result...
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val want = unbucketed.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(got.sameElements(want))

    // ...but the bucketed join's plan has no shuffle before the join (the
    // only exchange allowed is the one for the final single-key groupBy).
    joined.count() // force AQE to finalize the plan
    val plan = joined.queryExecution.executedPlan
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Seq[ShuffleExchangeExec] =
      p.collect { case s: ShuffleExchangeExec => s } ++
        p.subqueries.flatMap(shuffles)
    val joinShuffles = shuffles(plan).filterNot { s =>
      // the post-join aggregation exchange partitions by o_orderstatus
      s.outputPartitioning.toString.contains("o_orderstatus")
    }
    assert(joinShuffles.isEmpty,
      s"expected shuffle-free bucketed join, found: $joinShuffles")

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }
}

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

  test("declared q_bucketed_join joins shuffle-free and matches the plain join") {
    val df = SparkEntry.queries("q_bucketed_join")(spark, sfDir)
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))

    // rows match the plain (unbucketed) formulation
    val want = graft.model.Tables.lineitem(spark, sfDir)
      .join(graft.model.Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus", "l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy("o_orderstatus", "l_returnflag")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.sameElements(want))

    // and the executed plan has NO exchange feeding the join — the only
    // shuffles allowed are the post-join aggregation/sort on o_orderstatus
    val plan = df.queryExecution.executedPlan
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Seq[ShuffleExchangeExec] =
      p.collect { case s: ShuffleExchangeExec => s } ++
        p.subqueries.flatMap(shuffles)
    val joinShuffles = shuffles(plan).filterNot(
      _.outputPartitioning.toString.contains("o_orderstatus"))
    assert(joinShuffles.isEmpty,
      s"expected shuffle-free bucketed join, found: $joinShuffles")
  }
}

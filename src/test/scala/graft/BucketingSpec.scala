package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** Co-located fact⋈fact joins via bucketing — the production layout for the
  * engine's one shuffle-heavy join (lineitem⋈orders on orderkey). Writing
  * both tables bucketed by the join key pre-partitions them identically, so
  * the sort-merge join reads buckets pairwise and the plan contains NO
  * shuffle exchange. At 100 TB this turns the dominant network cost of the
  * fact join into pure local reads.
  */
class BucketingSpec extends SparkTestBase {

  // AQE's executedPlan root is AdaptiveSparkPlanExec — a LeafExecNode, so
  // collect{} on it sees nothing. Execute first, then unwrap to the real tree.
  private def finalPlan(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.count() // force AQE to finalize
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  // Once the frame has EXECUTED, AQE's final plan wraps each shuffle stage
  // in a QueryStageExec LEAF — plain collect{} stops there and everything
  // below an exchange (the join included) goes invisible. Recurse into
  // stages and reused exchanges explicitly.
  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
    p.collect(pf) ++
      p.collect { case q: QueryStageExec => collectAll(q.plan)(pf) }.flatten ++
      p.collect { case r: ReusedExchangeExec => collectAll(r.child)(pf) }.flatten ++
      p.subqueries.flatMap(collectAll(_)(pf))

  /** Shuffles not attributable to the post-join o_orderstatus aggregation,
    * plus a non-vacuity witness: the sort-merge join must actually be in the
    * traversed tree, or the empty-shuffle assertion proves nothing.
    */
  private def auditBucketedPlan(plan: SparkPlan): (Seq[ShuffleExchangeExec], Seq[SortMergeJoinExec]) = {
    val joinShuffles = collectAll(plan) { case s: ShuffleExchangeExec => s }
      .filterNot(_.outputPartitioning.toString.contains("o_orderstatus"))
    val smj = collectAll(plan) { case j: SortMergeJoinExec => j }
    (joinShuffles, smj)
  }

  /** At test SF the tables are tiny, so AQE would swap the SMJ for a
    * broadcast join and the bucketed-layout claim would go untested; pin
    * broadcast off so the spec exercises the path that matters at scale.
    */
  private def withNoBroadcast[T](body: => T): T = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "-1"))
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** The in-memory catalog forgets tables across sessions but their
    * warehouse directories survive — drop BOTH or the managed-table create
    * fails with LOCATION_ALREADY_EXISTS on the next run.
    */
  private def dropHard(names: String*): Unit = names.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), t)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("bucketed lineitem ⋈ orders plans without a shuffle exchange") { withNoBroadcast {
    // warehouse.dir is a static conf — the shared test session's default
    // (spark-warehouse under the sbt cwd) is fine; just make the tables fresh
    dropHard("li_b", "ord_b")

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
    val (joinShuffles, smj) = auditBucketedPlan(finalPlan(joined))
    assert(smj.nonEmpty, "no SortMergeJoin in plan — traversal is vacuous")
    assert(joinShuffles.isEmpty,
      s"expected shuffle-free bucketed join, found: $joinShuffles")

    dropHard("li_b", "ord_b")
  } }

  test("declared q_bucketed_join joins shuffle-free and matches the plain join") { withNoBroadcast {
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
    val (joinShuffles, smj) = auditBucketedPlan(finalPlan(df))
    assert(smj.nonEmpty, "no SortMergeJoin in plan — traversal is vacuous")
    assert(joinShuffles.isEmpty,
      s"expected shuffle-free bucketed join, found: $joinShuffles")
  } }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Scan-path regression guard: the §2.1/§2.3 claim that filters and
  * projections reach the parquet reader (Relational.scala scale notes) is
  * pinned here the same way SimilarityPlanSpec pins the bucket join — a
  * refactor that breaks pushdown (e.g. a UDF wrapping the predicate, or a
  * repartition slipped between scan and filter) fails this spec, not just
  * the bench.
  */
class PushdownSpec extends SparkTestBase {

  /** All `PushedFilters: [...]` groups of the formatted physical plan. */
  private def pushedFilters(df: DataFrame): Seq[String] =
    "PushedFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      .map(_.group(1)).toSeq

  private def readSchemas(df: DataFrame): Seq[String] =
    "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      .map(_.group(1)).toSeq

  test("q_conj_filter: conjunctive predicates are pushed to the part scan") {
    val df = SparkEntry.queries("q_conj_filter")(spark, sfDir)
    val pushed = pushedFilters(df)
    assert(pushed.exists(g => g.contains("p_size") && g.contains("p_type")),
      s"filters not pushed to scan: $pushed")
    // column pruning: the scan reads only the four referenced columns
    val schemas = readSchemas(df)
    assert(schemas.nonEmpty && schemas.forall(s =>
      !s.contains("p_comment") && !s.contains("p_retailprice")),
      s"scan reads unreferenced columns: $schemas")
  }

  test("q_fresh_station: scans are pruned to the referenced columns") {
    // The freshness predicate itself CANNOT push here — it compares a
    // computed column (µs truncation of the NANOS-as-long ts) against a
    // join-dependent cutoff (max(ts) − 7d subquery), so it lives above the
    // broadcast join by construction. The scan-path claim that must hold is
    // pruning: events has 6 columns, both scans read ≤ 2.
    val df = SparkEntry.queries("q_fresh_station")(spark, sfDir)
    val schemas = readSchemas(df)
    assert(schemas.nonEmpty && schemas.forall(s => s.split(",").length <= 2),
      s"events scan reads unreferenced columns: $schemas")
    assert(schemas.forall(s => !s.contains("props") && !s.contains("event_type")),
      s"events scan reads unreferenced columns: $schemas")
  }

  test("freshness predicate over a native timestamp column pushes to the scan") {
    // The production form of F1 — a literal cutoff over a parquet TIMESTAMP
    // column — reaches the reader as a pushed filter (at 100 TB this is
    // row-group min/max skipping). q_fresh_station can't show this (its
    // cutoff is data-derived for oracle determinism), so pin it directly.
    val cutoff = java.sql.Timestamp.valueOf("1995-01-01 00:00:00")
    val df = graft.model.Tables.lineitem(spark, sfDir)
      .filter(graft.ops.Exprs.freshDropNull(
        org.apache.spark.sql.functions.col("l_shipdate"),
        org.apache.spark.sql.functions.lit(cutoff)))
      .select("l_orderkey")
    val pushed = pushedFilters(df)
    assert(pushed.exists(_.contains("l_shipdate")),
      s"freshness filter not pushed to scan: $pushed")
  }

  test("q_isin: membership predicate is pushed to the lineitem scan") {
    val df = SparkEntry.queries("q_isin")(spark, sfDir)
    val pushed = pushedFilters(df)
    assert(pushed.exists(_.contains("l_returnflag")),
      s"In-filter not pushed to scan: $pushed")
  }

  test("q_flagship_analog: membership filter pushed, events scan pruned") {
    val df = SparkEntry.queries("q_flagship_analog")(spark, sfDir)
    val pushed = pushedFilters(df)
    assert(pushed.exists(_.contains("event_type")),
      s"event_type In-filter not pushed to scan: $pushed")
    val schemas = readSchemas(df)
    // events has 6 columns; the pipeline references 4 (ts, user_id,
    // event_type, value) — props and event_id must never be read
    assert(schemas.nonEmpty && schemas.forall(s =>
      !s.contains("props") && !s.contains("event_id")),
      s"events scan reads unreferenced columns: $schemas")
  }

  test("q_partition_prune: the status filter prunes partitions at planning") {
    val df = graft.queries.Sinks.prunedOrdersScan(spark, sfDir)
    val plan = df.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    // the filter must appear as a PartitionFilters entry on the scan (prunes
    // directories), not merely as a data filter evaluated per row
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(pf.exists(_.contains("o_orderstatus")),
      s"o_orderstatus not in PartitionFilters: $plan")
  }

  test("q_retention/q_funnel: event-type equality pushes to the events scan") {
    Seq("q_retention", "q_funnel").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      val pushed = pushedFilters(df)
      assert(pushed.exists(_.contains("event_type")),
        s"$q: event_type filter not pushed to scan: $pushed")
      val schemas = readSchemas(df)
      assert(schemas.nonEmpty && schemas.forall(s =>
        !s.contains("props") && !s.contains("value")),
        s"$q: events scan reads unreferenced columns: $schemas")
    }
  }

  test("q_mv_refresh: delta scan reads only the three referenced columns") {
    val df = SparkEntry.queries("q_mv_refresh")(spark, sfDir)
    val schemas = readSchemas(df)
    assert(schemas.nonEmpty && schemas.forall(s =>
      !s.contains("o_orderstatus") && !s.contains("o_orderpriority")),
      s"orders scan reads unreferenced columns: $schemas")
  }

  test("q_sample_stratified: documents scan reads only id and lang") {
    val df = SparkEntry.queries("q_sample_stratified")(spark, sfDir)
    val schemas = readSchemas(df)
    assert(schemas.nonEmpty && schemas.forall(s =>
      !s.contains("text") && !s.contains("n_chars") && !s.contains("source")),
      s"documents scan reads unreferenced columns: $schemas")
  }
}

package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables._

/** Aggregations, windows, set operations and the greedy-prefix encoding —
  * SURVEY.md §2.5–§2.7, §2.9.
  *
  * Scale notes:
  *   - all aggregations are plain `groupBy.agg` → Catalyst plans partial
  *     (map-side) aggregation automatically, so the shuffle carries one row
  *     per (partition × group), not per input row;
  *   - money sums go through DECIMAL(18,2) — exact, order-insensitive, and
  *     therefore both deterministic at any parallelism AND oracle-stable;
  *   - windows shuffle once on their partition key; the greedy-prefix query
  *     is the fully-relational encoding of the reference's data-dependent
  *     early termination (`main.py:277-279`, SURVEY.md §7.4).
  */
object Aggregates {

  val all: Seq[Q] = Seq(

    // ── A1/A5: TPC-H Q1-shaped grouped aggregate ────────────────────────
    Q("q_group_count",
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) {
      (s, d) =>
        val qty = col("l_quantity").cast("decimal(18,2)")
        val price = col("l_extendedprice").cast("decimal(18,2)")
        val disc = col("l_discount").cast("decimal(18,2)")
        lineitem(s, d)
          .filter(col("l_shipdate") <= to_timestamp(lit("2000-09-02 00:00:00")))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"),
            sum(qty).cast("double").as("sum_qty"),
            sum(price).cast("double").as("sum_price"),
            sum(price * (lit(1) - disc)).cast("double").as("sum_disc_price"),
            (sum(qty).cast("double") / count(lit(1))).as("avg_qty"))
          .orderBy("l_returnflag", "l_linestatus")
    },

    // ── A2: collected set, sorted for determinism ───────────────────────
    Q("q_collect_set",
      """SELECT user_id,
        |  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
        |  count(DISTINCT event_type) AS n_types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (s, d) =>
        events(s, d).groupBy("user_id")
          .agg(array_join(array_sort(collect_set(col("event_type"))), ",").as("types"),
            countDistinct(col("event_type")).as("n_types"))
          .orderBy("user_id")
    },

    // ── hot-key mitigation, declared + oracle-proven: the two-phase
    //    salted distinct-set is row-identical to the naive single-reducer
    //    collect_set, so the plain SQL below oracles the rewritten plan ───
    Q("q_twophase_distinct",
      """WITH t AS (SELECT l_returnflag,
        |    CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS q FROM lineitem)
        |SELECT l_returnflag,
        |  string_agg(DISTINCT q, ',' ORDER BY q) AS qty_set,
        |  count(DISTINCT q) AS n_qty
        |FROM t GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, d) =>
        val in = lineitem(s, d)
          .select(col("l_returnflag"),
            col("l_quantity").cast("long").cast("string").as("q"))
        graft.ops.Skew.twoPhaseDistinctSet(in, Seq("l_returnflag"), "q")
          .select(col("l_returnflag"),
            array_join(col("q_set"), ",").as("qty_set"),
            size(col("q_set")).cast("long").as("n_qty"))
          .orderBy("l_returnflag")
    },

    // ── arg-max: "row attribute at the extreme" without a window pass.
    //    Tie-broken deterministically by packing (epoch_us, event_id) into
    //    a fixed-width string key — lexicographic == numeric, portable ────
    Q("q_argmax",
      """SELECT user_id,
        |  arg_max(event_type, printf('%020d%012d', epoch_us(ts), event_id)) AS last_type,
        |  arg_max(event_id, printf('%020d%012d', epoch_us(ts), event_id)) AS last_id
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (s, d) =>
        val key = format_string("%020d%012d", unix_micros(col("ts")), col("event_id"))
        events(s, d).groupBy("user_id")
          .agg(max_by(col("event_type"), key).as("last_type"),
            max_by(col("event_id"), key).as("last_id"))
          .orderBy("user_id")
    },

    // ── statistical moments, exactly: mean/variance/stddev derived from
    //    DECIMAL power sums, so the aggregation is order-insensitive and
    //    bit-identical across engines — the distributed-merge float drift
    //    of built-in stddev/var never appears ──────────────────────────────
    Q("q_stats",
      """SELECT l_returnflag,
        |  count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) *
        |           CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s2,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean,
        |  (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) *
        |            CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) -
        |   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) *
        |   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)) /
        |  (count(*) - 1) AS var_samp,
        |  sqrt((CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) *
        |             CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) -
        |   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) *
        |   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)) /
        |  (count(*) - 1)) AS std_samp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, d) =>
        val q = col("l_quantity").cast("decimal(18,2)")
        lineitem(s, d).groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(q).cast("double").as("s1"),
            sum(q * q).cast("double").as("s2"))
          .select(col("l_returnflag"), col("n"), col("s1"), col("s2"),
            (col("s1") / col("n")).as("mean"),
            // n = 1 → NULL on both engines: DuckDB's x/0 is NULL, Spark
            // under ANSI would throw, so the guard IS the parity
            when(col("n") > 1,
              (col("s2") - col("s1") * col("s1") / col("n")) /
                (col("n") - 1)).as("var_samp"),
            when(col("n") > 1,
              sqrt((col("s2") - col("s1") * col("s1") / col("n")) /
                (col("n") - 1))).as("std_samp"))
          .orderBy("l_returnflag")
    },

    // ── exact percentiles: linear-interpolation quantiles per group ─────
    Q("q_percentile",
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5)  AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, d) =>
        lineitem(s, d).groupBy("l_returnflag")
          .agg(expr("percentile(l_quantity, 0.25)").as("p25"),
            expr("percentile(l_quantity, 0.5)").as("p50"),
            expr("percentile(l_quantity, 0.75)").as("p75"))
          .orderBy("l_returnflag")
    },

    // ── winsorized (clipped) robust statistics per event_type (round 11):
    //    the outlier-tamed mean a metrics pipeline reports next to the raw
    //    one — values clipped to [p05, p95] (exact quantile_cont /
    //    percentile, interpolation proven engine-identical by
    //    q_percentile), then the clipped values quantized to cents via
    //    floor(x·100 + 0.5) — every op an IEEE-identical double primitive
    //    — so the mean's SUM is an order-free exact integer. NOT the
    //    DECIMAL(18,2) cast: a clipped value can BE the interpolated
    //    percentile, whose binary expansion sits at a .005 boundary, and
    //    Spark's double→DECIMAL goes through the SHORTEST decimal string
    //    while DuckDB rounds the binary value — measured one-cent
    //    divergence at sf0.001. (mean_raw keeps the DECIMAL cast: raw
    //    data values are 2-decimal clean, nowhere near a boundary.)
    //    Scale: one groupBy for the per-type percentile frame (|types|
    //    rows, broadcast back), one map-side clip, one map-combined
    //    aggregate — no windows, no sort of the fact table beyond the
    //    percentile aggregate itself. ──────────────────────────────────────
    Q("q_winsorize",
      """WITH p AS (SELECT event_type,
        |    quantile_cont(value, 0.05) AS p05,
        |    quantile_cont(value, 0.95) AS p95
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n, p.p05, p.p95,
        |  CAST(CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)
        |       / count(*) AS DOUBLE) AS mean_raw,
        |  CAST(sum(CAST(floor(least(greatest(e.value, p.p05), p.p95)
        |                      * 100 + 0.5) AS BIGINT)) AS DOUBLE)
        |    / 100.0 / count(*) AS mean_winsorized
        |FROM events e JOIN p ON p.event_type = e.event_type
        |GROUP BY e.event_type, p.p05, p.p95
        |ORDER BY e.event_type""".stripMargin) {
      (s, d) =>
        val p = events(s, d).groupBy("event_type")
          .agg(expr("percentile(value, 0.05)").as("p05"),
            expr("percentile(value, 0.95)").as("p95"))
        events(s, d).join(broadcast(p), Seq("event_type"))
          .groupBy("event_type", "p05", "p95")
          .agg(count(lit(1)).as("n"),
            (sum(col("value").cast("decimal(18,2)")).cast("double") /
              count(lit(1))).as("mean_raw"),
            (sum(floor(least(greatest(col("value"), col("p05")), col("p95"))
              * 100 + 0.5).cast("long").cast("decimal(38,0)"))
              .cast("double") / 100.0 /
              count(lit(1))).as("mean_winsorized"))
          .select(col("event_type"), col("n"), col("p05"), col("p95"),
            col("mean_raw"), col("mean_winsorized"))
          .orderBy("event_type")
    },

    // ── robust outlier detection per event_type (round 13): the median/
    //    MAD rule (|v − median| > 3·MAD) — the anomaly gate a metrics
    //    pipeline runs where mean/σ would be dragged by the very outliers
    //    it hunts. Complements q_winsorize (which TAMES the tail; this
    //    FLAGS it). Medians are exact quantile_cont/percentile
    //    (interpolation proven engine-identical by q_percentile); the
    //    deviation median needs a second pass because MAD is a median OF
    //    residuals against the first median. Every declared number is
    //    either one of those exact medians or an integer count/roundDiv
    //    ratio, so doubles never accumulate. Scale: two percentile
    //    aggregates over the fact table (|event_type| rows out), each
    //    joined back as a BROADCAST dim — no fact-table window, no global
    //    sort; at 100 TB you'd swap the exact percentile for the
    //    accuracy-gated sketch q_sketch_quantile pins, keeping this
    //    query's arithmetic as the truth gate. ─────────────────────────────
    Q("q_outlier_mad",
      s"""WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |           FROM events GROUP BY 1),
        |a AS (SELECT e.event_type, m.med, abs(e.value - m.med) AS adev
        |      FROM events e JOIN m USING (event_type)),
        |d AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
        |      FROM a GROUP BY 1)
        |SELECT a.event_type, CAST(count(*) AS BIGINT) AS n,
        |  max(a.med) AS med, max(d.mad) AS mad,
        |  CAST(count(*) FILTER (a.adev > 3 * d.mad) AS BIGINT) AS n_outliers,
        |  ${graft.ops.Exprs.roundDivSql(
             "count(*) FILTER (a.adev > 3 * d.mad)", "count(*)", 6)}
        |    AS outlier_rate
        |FROM a JOIN d USING (event_type)
        |GROUP BY a.event_type ORDER BY a.event_type""".stripMargin) {
      (s, d) =>
        val ev = events(s, d)
        val med = ev.groupBy("event_type")
          .agg(expr("percentile(value, 0.5)").as("med"))
        val adev = ev.join(broadcast(med), Seq("event_type"))
          .select(col("event_type"), col("med"),
            abs(col("value") - col("med")).as("adev"))
        val mad = adev.groupBy("event_type")
          .agg(expr("percentile(adev, 0.5)").as("mad"))
        adev.join(broadcast(mad), Seq("event_type"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), max(col("med")).as("med"),
            max(col("mad")).as("mad"),
            count(when(col("adev") > col("mad") * 3, 1)).as("n_outliers"))
          .select(col("event_type"), col("n"), col("med"), col("mad"),
            col("n_outliers"),
            graft.ops.Exprs.roundDiv(col("n_outliers"), col("n"), 6)
              .as("outlier_rate"))
          .orderBy("event_type")
    },

    // ── sketch quantiles, accuracy-gated (the q_sketch_distinct pattern,
    //    closing the sketch family: cardinality + quantiles). At 100 TB
    //    approx_percentile's mergeable fixed-size summary replaces the
    //    full-sort exact percentile; its rank-error guarantee (≤1/accuracy
    //    of N, here 0.1%) is checked against EXACT order statistics at
    //    q±1% — a 10× margin, so the flag is stable under any merge order
    //    while a broken sketch flips it red. The declared doubles are the
    //    exact percentiles (portable, proven by q_percentile); the sketch
    //    only feeds the flags. ───────────────────────────────────────────────
    Q("q_sketch_quantile", {
      val qs = Seq(0.5, 0.9, 0.99)
      val exact = qs.map(q =>
        s"quantile_cont(l_extendedprice, $q) AS p${(q * 100).toInt}").mkString(", ")
      val flags = qs.map(q => s"TRUE AS ok${(q * 100).toInt}").mkString(", ")
      s"""SELECT $exact, $flags
         |FROM lineitem""".stripMargin
    }) { (s, d) =>
      val qs = Seq(0.5, 0.9, 0.99)
      val aggs = qs.flatMap { q =>
        val t = (q * 100).toInt
        Seq(expr(s"percentile(l_extendedprice, $q)").as(s"p$t"),
          expr(s"percentile(l_extendedprice, ${q - 0.01})").as(s"lo$t"),
          expr(s"percentile(l_extendedprice, ${math.min(q + 0.01, 1.0)})").as(s"hi$t"),
          expr(s"approx_percentile(l_extendedprice, $q, 1000)").as(s"a$t"))
      }
      val flags = qs.map { q =>
        val t = (q * 100).toInt
        // empty/all-NULL input -> NULL comparison; the sketch made no
        // error there, so coalesce to TRUE — the oracle's declared flag
        coalesce(col(s"a$t") >= col(s"lo$t") && col(s"a$t") <= col(s"hi$t"),
          lit(true)).as(s"ok$t")
      }
      lineitem(s, d).agg(aggs.head, aggs.tail: _*)
        .select(qs.map(q => col(s"p${(q * 100).toInt}")) ++ flags: _*)
    },

    // ── pivot: wide conditional aggregation with an EXPLICT value list
    //    (no extra distinct-scan job to discover columns — the scale form) ─
    Q("q_pivot",
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'click'    THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'error'    THEN 1 END) AS error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'view'     THEN 1 END) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (s, d) =>
        events(s, d).groupBy("user_id")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .count()
          .na.fill(0L)
          .orderBy("user_id")
    },

    // ── A3: distinct ────────────────────────────────────────────────────
    Q("q_distinct",
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin) {
      (s, d) =>
        events(s, d).select("user_id", "event_type").distinct()
          .orderBy("user_id", "event_type")
    },

    // ── A4: coverage superset test ──────────────────────────────────────
    Q("q_coverage",
      """SELECT user_id,
        |  count(DISTINCT CASE WHEN event_type IN ('click','view','purchase','signup')
        |                      THEN event_type END) AS covered,
        |  CAST(CASE WHEN count(DISTINCT CASE WHEN event_type IN
        |    ('click','view','purchase','signup') THEN event_type END) = 4
        |    THEN 1 ELSE 0 END AS BIGINT) AS full_cov
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (s, d) =>
        val target = Seq("click", "view", "purchase", "signup")
        events(s, d).groupBy("user_id")
          .agg(countDistinct(
            when(col("event_type").isin(target: _*), col("event_type"))).as("covered"))
          .withColumn("full_cov", (col("covered") === 4).cast("long"))
          .orderBy("user_id")
    },

    // ── parity: rollup ──────────────────────────────────────────────────
    Q("q_rollup",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS prio,
        |  count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |-- grouping() breaks the tie between a NULL group value coalesced
        |-- to 'ALL' and the genuine subtotal row
        |ORDER BY status, prio,
        |  grouping(o_orderstatus), grouping(o_orderpriority)""".stripMargin) {
      (s, d) =>
        orders(s, d)
          .rollup("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
            grouping(col("o_orderstatus")).as("gs"),
            grouping(col("o_orderpriority")).as("gp"))
          .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
            col("n"), col("sum_price"), col("gs"), col("gp"))
          .orderBy("status", "prio", "gs", "gp")
          .select("status", "prio", "n", "sum_price")
    },

    // ── cube: full grouping-set lattice (rollup's sibling; completes the
    //    multi-dimensional aggregation family) ─────────────────────────────
    Q("q_cube",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS prio,
        |  count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |-- grouping() breaks the tie between a NULL group value coalesced
        |-- to 'ALL' and the genuine subtotal row
        |ORDER BY status, prio,
        |  grouping(o_orderstatus), grouping(o_orderpriority)""".stripMargin) {
      (s, d) =>
        orders(s, d)
          .cube("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
            grouping(col("o_orderstatus")).as("gs"),
            grouping(col("o_orderpriority")).as("gp"))
          .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
            col("n"), col("sum_price"), col("gs"), col("gp"))
          .orderBy("status", "prio", "gs", "gp")
          .select("status", "prio", "n", "sum_price")
    },

    // ── explicit GROUPING SETS: the general lattice rollup/cube are sugar
    //    for — a set list neither of them generates ((status,prio), (prio),
    //    ()), so this exercises the planner path the siblings don't.
    //    grouping() flags disambiguate a rolled-up 'ALL' from a (never
    //    occurring) literal value; one Expand + one aggregate, same scale
    //    shape as q_rollup. ─────────────────────────────────────────────────
    Q("q_grouping_sets",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS prio,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
        |  count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY GROUPING SETS
        |  ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
        |-- g_status/g_prio break the tie between a NULL group value
        |-- coalesced to 'ALL' and the genuine subtotal row
        |ORDER BY status, prio, g_status, g_prio""".stripMargin) {
      (s, d) =>
        orders(s, d)
          .groupingSets(
            Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
              Seq(col("o_orderpriority")), Seq.empty),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(grouping(col("o_orderstatus")).cast("long").as("g_status"),
            grouping(col("o_orderpriority")).cast("long").as("g_prio"),
            count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
          .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
            col("g_status"), col("g_prio"), col("n"), col("sum_price"))
          .orderBy("status", "prio", "g_status", "g_prio")
    },

    // ── rank-statistics windows: percent_rank / cume_dist / first_value —
    //    the normalized-rank family q_rank/q_ntile don't cover. Ratios of
    //    small exact integers (rank-1)/(n-1) and rank/n, identical formulas
    //    on both engines; ordering is the portable (epoch-µs, event_id)
    //    total order. Same scale shape as every window here: partitioned
    //    by an unbounded key, never a global sort. ──────────────────────────
    Q("q_rank_stats",
      """SELECT user_id, event_id,
        |  percent_rank() OVER w AS prk,
        |  cume_dist() OVER w AS cd,
        |  first_value(event_id) OVER w AS first_ev
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |             ORDER BY epoch_us(ts), event_id)
        |ORDER BY user_id, event_id""".stripMargin) {
      (s, d) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id")
          .orderBy(unix_micros(col("ts")), col("event_id"))
        events(s, d)
          .select(col("user_id"), col("event_id"),
            percent_rank().over(w).as("prk"),
            cume_dist().over(w).as("cd"),
            first("event_id").over(w).as("first_ev"))
          .orderBy("user_id", "event_id")
    },

    // ── U1: union across branches (the two-city append) ─────────────────
    Q("q_union",
      """SELECT o_orderkey, o_orderstatus, 'hi' AS src FROM orders
        |WHERE o_totalprice > 200000
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, 'lo' AS src FROM orders
        |WHERE o_totalprice <= 50000
        |ORDER BY o_orderkey, src""".stripMargin) {
      (s, d) =>
        val o = orders(s, d)
        val hi = o.filter(col("o_totalprice") > 200000)
          .select(col("o_orderkey"), col("o_orderstatus"), lit("hi").as("src"))
        val lo = o.filter(col("o_totalprice") <= 50000)
          .select(col("o_orderkey"), col("o_orderstatus"), lit("lo").as("src"))
        hi.unionByName(lo).orderBy("o_orderkey", "src")
    },

    // ── parity: except ──────────────────────────────────────────────────
    Q("q_except",
      """SELECT o_orderkey FROM orders
        |EXCEPT
        |SELECT o_orderkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        |ORDER BY o_orderkey""".stripMargin) {
      (s, d) =>
        val o = orders(s, d).select("o_orderkey")
        val recent = orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01 00:00:00")))
          .select("o_orderkey")
        o.except(recent).orderBy("o_orderkey")
    },

    // ── intersect: completes the set-op family (union / except /
    //    intersect); distinct-set semantics on both engines ───────────────
    Q("q_intersect",
      """SELECT o_orderkey FROM orders WHERE o_totalprice > 150000
        |INTERSECT
        |SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin) {
      (s, d) =>
        val pricey = orders(s, d).filter(col("o_totalprice") > 150000)
          .select("o_orderkey")
        val urgent = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
          .select("o_orderkey")
        pricey.intersect(urgent).orderBy("o_orderkey")
    },

    // ── latest-per-key: THE semantic translation of the reference's
    //    `/latest` endpoint (S4 → row_number over ordered window) ─────────
    Q("q_row_number",
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS od
        |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
        |        row_number() OVER (PARTITION BY o_custkey
        |                           ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"))
          .orderBy("o_custkey")
    },

    // ── running frame (exact decimal running sum) ───────────────────────
    // ── lag/lead: per-key neighbor access (session deltas over events).
    //    The window orders by epoch_us(ts) on BOTH engines: DuckDB reads
    //    the raw TIMESTAMP_NS column while Spark truncates to µs, so
    //    ordering by the raw ts could legitimately disagree sub-µs ────────
    Q("q_lag_lead",
      """SELECT user_id, event_id,
        |  lag(event_id) OVER w AS prev_id,
        |  lead(event_id) OVER w AS next_id,
        |  CAST(coalesce(epoch_us(ts) - epoch_us(lag(ts) OVER w), 0) AS BIGINT) AS gap_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |ORDER BY user_id, event_id""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy("user_id")
          .orderBy(unix_micros(col("ts")), col("event_id"))
        events(s, d)
          .select(col("user_id"), col("event_id"),
            lag("event_id", 1).over(w).as("prev_id"),
            lead("event_id", 1).over(w).as("next_id"),
            coalesce(unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)),
              lit(0L)).as("gap_us"))
          .orderBy("user_id", "event_id")
    },

    // ── ntile: equal-frequency bucketing per partition key. Deliberately
    //    PARTITIONED: a global ORDER BY window funnels every row through
    //    one task — the unpartitioned form does not exist in this engine ──
    Q("q_ntile",
      """SELECT o_orderkey,
        |  CAST(ntile(8) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS bucket
        |FROM orders ORDER BY o_orderkey""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy("o_orderpriority")
          .orderBy("o_totalprice", "o_orderkey")
        orders(s, d)
          .select(col("o_orderkey"), ntile(8).over(w).cast("long").as("bucket"))
          .orderBy("o_orderkey")
    },

    Q("q_window_frame",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey,
        |             l_quantity, l_extendedprice
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""".stripMargin) {
      (s, d) =>
        // (l_orderkey, l_linenumber) is non-unique: the window order carries
        // extra columns so the running sum is deterministic, and running_qty
        // joins the final sort so tied output rows are identical.
        val w = Window.partitionBy("l_suppkey")
          .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_partkey",
            "l_quantity", "l_extendedprice")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        lineitem(s, d)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            sum(col("l_quantity").cast("decimal(18,2)")).over(w)
              .cast("double").as("running_qty"))
          .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
    },

    // ── dense_rank within partition ─────────────────────────────────────
    Q("q_rank",
      """SELECT p_brand, p_partkey, p_retailprice,
        |  CAST(dense_rank() OVER (PARTITION BY p_brand
        |                          ORDER BY p_retailprice DESC) AS BIGINT) AS rk
        |FROM part ORDER BY p_brand, rk, p_partkey""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc)
        part(s, d)
          .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
            dense_rank().over(w).cast("long").as("rk"))
          .orderBy("p_brand", "rk", "p_partkey")
    },

    // ── O4: greedy coverage-driven prefix, fully-relational encoding ────
    // Mirror of the reference's early termination: per group, walk
    // candidates in coverage-rank order, stop once ≥3 candidates are used
    // AND all 4 target types are covered; keep the whole prefix.
    Q("q_greedy_prefix",
      """WITH cand AS (
        |  SELECT user_id % 5 AS grp, user_id,
        |    count(DISTINCT CASE WHEN event_type IN ('click','view','purchase','signup')
        |                        THEN event_type END) AS m
        |  FROM events GROUP BY user_id % 5, user_id
        |  HAVING count(DISTINCT CASE WHEN event_type IN ('click','view','purchase','signup')
        |                             THEN event_type END) > 0),
        |ranked AS (
        |  SELECT grp, user_id, m,
        |    CAST(row_number() OVER (PARTITION BY grp ORDER BY m DESC, user_id) AS BIGINT) AS rank
        |  FROM cand),
        |pairs AS (
        |  SELECT DISTINCT e.user_id % 5 AS grp, e.user_id, e.event_type
        |  FROM events e
        |  WHERE e.event_type IN ('click','view','purchase','signup')),
        |firsts AS (
        |  SELECT p.grp, p.user_id, p.event_type, r.rank,
        |    CASE WHEN row_number() OVER (PARTITION BY p.grp, p.event_type
        |                                 ORDER BY r.rank) = 1 THEN 1 ELSE 0 END AS is_first
        |  FROM pairs p JOIN ranked r ON p.grp = r.grp AND p.user_id = r.user_id),
        |percand AS (
        |  SELECT grp, user_id, rank, SUM(is_first) AS new_types
        |  FROM firsts GROUP BY grp, user_id, rank),
        |cum AS (
        |  SELECT grp, user_id, rank,
        |    SUM(new_types) OVER (PARTITION BY grp ORDER BY rank
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cov
        |  FROM percand),
        |stop AS (
        |  SELECT grp, min(rank) AS stop_rank FROM cum
        |  WHERE cum_cov >= 4 AND rank >= 3 GROUP BY grp)
        |SELECT c.grp, c.rank, c.user_id, CAST(c.cum_cov AS BIGINT) AS cum_cov
        |FROM cum c LEFT JOIN stop s ON c.grp = s.grp
        |WHERE c.rank <= coalesce(s.stop_rank, 9223372036854775807)
        |ORDER BY c.grp, c.rank""".stripMargin) {
      (s, d) =>
        graft.ops.Selection.greedyPrefix(events(s, d))
    },

    // ── streaming-surface parity (batch form): tumbling window ──────────
    Q("q_window_tumbling",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS ws,
        |  event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin) {
      (s, d) =>
        events(s, d)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_v"))
          .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
            col("event_type"), col("n"), col("sum_v"))
          .orderBy("ws", "event_type")
    },

    // ── streaming-surface parity (batch form): sliding window ───────────
    // width 1h, slide 30m → every event lands in exactly 2 windows; the
    // oracle unnests the two 30-minute-grid candidate starts (both grids
    // are epoch-aligned for a 30m slide, so Spark and DuckDB agree).
    Q("q_window_sliding",
      """WITH b AS (SELECT event_type, value,
        |    time_bucket(INTERVAL '30 minutes', ts) AS tb FROM events),
        |w AS (SELECT event_type, value,
        |    unnest([tb, tb - INTERVAL 30 MINUTE]) AS ws FROM b)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS ws, event_type,
        |  count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM w GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin) {
      (s, d) =>
        events(s, d)
          .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_v"))
          .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
            col("event_type"), col("n"), col("sum_v"))
          .orderBy("ws", "event_type")
    },

    // ── streaming-surface parity (batch form): session window ───────────
    // Spark semantics: session = [first ts, last ts + gap); a new session
    // starts when the next event is >= gap after the previous one.
    Q("q_session_window",
      """WITH e0 AS (
        |  -- TIMESTAMP_NS → µs truncation: Spark's session_window sees
        |  -- µs-truncated instants, so the 30-min gap must be computed on
        |  -- the same precision (a gap within 1 µs of the boundary would
        |  -- otherwise split sessions differently between engines)
        |  SELECT user_id, ts::TIMESTAMP AS ts FROM events),
        |x AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e0),
        |y AS (
        |  SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM x)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
        |  count(*) AS n
        |FROM y GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin) {
      (s, d) =>
        events(s, d)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n"))
          .select(col("user_id"),
            date_format(col("session_window.start"),
              "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
            date_format(col("session_window.end"),
              "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
            col("n"))
          .orderBy("user_id", "session_start")
    }
  )
}

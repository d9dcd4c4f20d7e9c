package graft.queries

import org.apache.spark.sql.functions._
import graft.model.Tables._
import graft.ops.Exprs._

/** Scans, projections, scalar functions, filters, sorts and limits —
  * SURVEY.md §2.1–§2.3, §2.6. One declared query per operator row.
  *
  * Scale notes: every query here is scan → narrow ops (→ optional global
  * sort). Filters and projections are expressed directly over the parquet
  * scan so Catalyst pushes them down (PushedFilters/ReadSchema); the only
  * shuffles are the final ORDER BYs demanded by oracle determinism, which at
  * production scale would be dropped (a sink doesn't need a total order) or
  * handled by range partitioning.
  */
object Relational {

  /** Synthetic deterministic coordinates derived from an integer key — the
    * testdata stand-in for station coordinates (SURVEY.md §2.2 P1).
    */
  private def latOf(k: org.apache.spark.sql.Column) = k.cast("double") * 4.7 - 60.0
  private def lonOf(k: org.apache.spark.sql.Column) = k.cast("double") * 13.3 - 170.0

  // DuckDB spelling of Exprs.haversineMeters — keep term-for-term identical
  // so double results are bit-equal (see Exprs.scaladoc).
  private val havSql =
    """2.0 * 6371000.0 * asin(least(1.0, sqrt(
      |  pow(sin(radians(lat2 - lat1) / 2), 2) +
      |  cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(radians(lon2 - lon1) / 2), 2))))""".stripMargin

  private val coordPairsSql =
    """SELECT a.n_nationkey AS k1, b.n_nationkey AS k2,
      |       a.n_nationkey * 4.7 - 60.0 AS lat1, a.n_nationkey * 13.3 - 170.0 AS lon1,
      |       b.n_nationkey * 4.7 - 60.0 AS lat2, b.n_nationkey * 13.3 - 170.0 AS lon2
      |FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey""".stripMargin

  val all: Seq[Q] = Seq(

    // ── S1: plain columnar scan with projection (pushdown-checked) ──────
    Q("q_scan_parquet",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin) {
      (s, d) =>
        // (l_orderkey, l_linenumber) is NOT unique in the testdata — order by
        // every output column so ties are identical rows (oracle-stable).
        lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
          .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    },

    // ── S3/O3: limit (ordered for determinism) ──────────────────────────
    Q("q_limit",
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 100") {
      (s, d) =>
        orders(s, d).select("o_orderkey", "o_totalprice")
          .orderBy("o_orderkey").limit(100)
    },

    // ── P1: haversine distance as a composed codegen'd expression ───────
    Q("q_haversine",
      s"""WITH p AS ($coordPairsSql)
         |SELECT k1, k2, round($havSql, 3) AS dist_m
         |FROM p ORDER BY k1, k2""".stripMargin) {
      (s, d) =>
        val a = nation(s, d).select(col("n_nationkey").as("k1"))
        val b = nation(s, d).select(col("n_nationkey").as("k2"))
        a.join(b, col("k1") < col("k2"))
          .select(col("k1"), col("k2"),
            round(haversineMeters(latOf(col("k1")), lonOf(col("k1")),
              latOf(col("k2")), lonOf(col("k2"))), 3).as("dist_m"))
          .orderBy("k1", "k2")
    },

    // ── F4: distance predicate over the same expression ─────────────────
    Q("q_haversine_filter",
      s"""WITH p AS ($coordPairsSql)
         |SELECT k1, k2, round($havSql, 3) AS dist_m
         |FROM p WHERE $havSql <= 7500000.0 ORDER BY k1, k2""".stripMargin) {
      (s, d) =>
        val a = nation(s, d).select(col("n_nationkey").as("k1"))
        val b = nation(s, d).select(col("n_nationkey").as("k2"))
        val dist = haversineMeters(latOf(col("k1")), lonOf(col("k1")),
          latOf(col("k2")), lonOf(col("k2")))
        a.join(b, col("k1") < col("k2"))
          .filter(dist <= 7500000.0)
          .select(col("k1"), col("k2"), round(dist, 3).as("dist_m"))
          .orderBy("k1", "k2")
    },

    // ── P2: ISO-8601 round-trip with Z→+00:00 normalization ─────────────
    Q("q_ts_parse",
      """SELECT event_id,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ') AS iso,
        |  epoch_us(strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ'),
        |                    '%Y-%m-%dT%H:%M:%S.%fZ')) AS parsed_us
        |FROM events ORDER BY event_id""".stripMargin) {
      (s, d) =>
        val iso = date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
        events(s, d).select(col("event_id"), iso.as("iso"),
          unix_micros(parseIsoTs(iso)).as("parsed_us"))
          .orderBy("event_id")
    },

    // ── P3/P4: unit + name coalesce chains (empty-string-falsy) ─────────
    Q("q_coalesce",
      """SELECT event_id,
        |  coalesce(CASE WHEN event_id % 3 = 0 THEN NULL ELSE event_type END,
        |           CASE WHEN event_id % 5 = 0 THEN NULL ELSE 'unit2' END,
        |           '') AS unit,
        |  coalesce(nullif(CASE WHEN event_id % 2 = 0 THEN '' ELSE event_type END, ''),
        |           'id:' || event_id) AS name
        |FROM events ORDER BY event_id""".stripMargin) {
      (s, d) =>
        val e = events(s, d)
        val u1 = when(col("event_id") % 3 =!= 0, col("event_type"))
        val u2 = when(col("event_id") % 5 =!= 0, lit("unit2"))
        val n1 = when(col("event_id") % 2 === 0, lit("")).otherwise(col("event_type"))
        e.select(col("event_id"),
          unitCoalesce(u1, u2).as("unit"),
          nameCoalesce(n1, lit(null).cast("string"), col("event_id")).as("name"))
          .orderBy("event_id")
    },

    // ── P5 + string functions ───────────────────────────────────────────
    Q("q_string_funcs",
      """SELECT p_partkey, lower(p_type) AS lt, upper(p_brand) AS ub,
        |  concat_ws('#', p_brand, p_type) AS bc,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  substr(p_name, 1, 10) AS pfx,
        |  replace(p_name, ' ', '_') AS und
        |FROM part ORDER BY p_partkey""".stripMargin) {
      (s, d) =>
        part(s, d).select(col("p_partkey"),
          lower(col("p_type")).as("lt"),
          upper(col("p_brand")).as("ub"),
          concat_ws("#", col("p_brand"), col("p_type")).as("bc"),
          length(col("p_name")).cast("long").as("name_len"),
          substring(col("p_name"), 1, 10).as("pfx"),
          regexp_replace(col("p_name"), " ", "_").as("und"))
          .orderBy("p_partkey")
    },

    // ── P6: failure-tolerant casts (try_cast == Python None-on-fail) ────
    Q("q_cast",
      """SELECT event_id,
        |  TRY_CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k,
        |  TRY_CAST(event_type AS BIGINT) AS bad,
        |  CAST(floor(value) AS BIGINT) AS vfloor
        |FROM events ORDER BY event_id""".stripMargin) {
      (s, d) =>
        events(s, d).select(col("event_id"),
          regexp_extract(col("props"), "[0-9]+", 0).try_cast("long").as("k"),
          col("event_type").try_cast("long").as("bad"),
          floor(col("value")).cast("long").as("vfloor"))
          .orderBy("event_id")
    },

    // ── P8: timestamp formatting ────────────────────────────────────────
    Q("q_date_format",
      """SELECT o_orderkey, strftime(o_orderdate, '%Y%m%d_%H%M%S') AS fname
        |FROM orders ORDER BY o_orderkey""".stripMargin) {
      (s, d) =>
        orders(s, d).select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyyMMdd_HHmmss").as("fname"))
          .orderBy("o_orderkey")
    },

    // ── F1: freshness with data-derived cutoff (station semantics) ──────
    Q("q_fresh_station",
      """SELECT event_id, epoch_us(ts) AS ts_us FROM events
        |WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 7 DAY
        |ORDER BY event_id""".stripMargin) {
      (s, d) =>
        val e = events(s, d)
        val mx = e.agg(max(col("ts")).as("mx"))
        e.crossJoin(broadcast(mx))
          .filter(freshDropNull(col("ts"), col("mx") - expr("INTERVAL 7 DAYS")))
          .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
          .orderBy("event_id")
    },

    // ── F8: keep-unparseable freshness (the deliberate F1 asymmetry) ────
    Q("q_fresh_keep_null",
      """SELECT event_id, dstr FROM (
        |  SELECT event_id,
        |    CASE WHEN event_id % 13 = 0 THEN 'not-a-date'
        |         ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ') END AS dstr,
        |    ts FROM events) t
        |WHERE try_strptime(dstr, '%Y-%m-%dT%H:%M:%S.%fZ') IS NULL
        |   OR try_strptime(dstr, '%Y-%m-%dT%H:%M:%S.%fZ') >=
        |      (SELECT max(ts) FROM events) - INTERVAL 7 DAY
        |ORDER BY event_id""".stripMargin) {
      (s, d) =>
        val e = spread(events(s, d))
        val mx = e.agg(max(col("ts")).as("mx"))
        val dstr = when(col("event_id") % 13 === 0, lit("not-a-date"))
          .otherwise(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"))
        e.select(col("event_id"), dstr.as("dstr"))
          .crossJoin(broadcast(mx))
          .filter(freshKeepNull(parseIsoTs(col("dstr")),
            col("mx") - expr("INTERVAL 7 DAYS")))
          .select("event_id", "dstr")
          .orderBy("event_id")
    },

    // ── F2: conjunctive static predicates ───────────────────────────────
    Q("q_conj_filter",
      """SELECT p_partkey, p_brand, p_type, p_size FROM part
        |WHERE p_size >= 10 AND p_size <= 40 AND p_type <> 'PROMO'
        |  AND p_brand <> 'Brand#13'
        |ORDER BY p_partkey""".stripMargin) {
      (s, d) =>
        part(s, d)
          .filter(col("p_size") >= 10 && col("p_size") <= 40 &&
            col("p_type") =!= "PROMO" && col("p_brand") =!= "Brand#13")
          .select("p_partkey", "p_brand", "p_type", "p_size")
          .orderBy("p_partkey")
    },

    // ── F3: null-coordinate guard (nulls synthesized — testdata has none)
    Q("q_notnull",
      """SELECT event_id, lat, lon FROM (
        |  SELECT event_id,
        |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS lat,
        |    CASE WHEN event_id % 11 = 0 THEN NULL ELSE value + 1.0 END AS lon
        |  FROM events) t
        |WHERE lat IS NOT NULL AND lon IS NOT NULL
        |ORDER BY event_id""".stripMargin) {
      (s, d) =>
        events(s, d).select(col("event_id"),
          when(col("event_id") % 7 =!= 0, col("value")).as("lat"),
          when(col("event_id") % 11 =!= 0, col("value") + 1.0).as("lon"))
          .filter(col("lat").isNotNull && col("lon").isNotNull)
          .orderBy("event_id")
    },

    // ── F5: membership predicate ────────────────────────────────────────
    Q("q_isin",
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        |WHERE l_returnflag IN ('A', 'R')
        |ORDER BY l_orderkey, l_linenumber, l_returnflag""".stripMargin) {
      (s, d) =>
        lineitem(s, d)
          .filter(col("l_returnflag").isin("A", "R"))
          .select("l_orderkey", "l_linenumber", "l_returnflag")
          .orderBy("l_orderkey", "l_linenumber", "l_returnflag")
    },

    // ── wide→long reshape (unpivot/melt): three measure columns become
    //    (metric, val) rows, then a per-flag/metric aggregate — the
    //    feature-table→feature-store reshape. Spark's native `unpivot`
    //    keeps the reshape inside one narrow stage (no self-union scans:
    //    ONE pass over lineitem emits all three measures); the oracle
    //    spells the same relation as UNION ALL, the portable SQL form.
    //    Exact decimal sums keep the aggregate order-insensitive. ──────────
    Q("q_unpivot",
      """WITH u AS (
        |  SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS val
        |  FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
        |SELECT l_returnflag, metric, count(*) AS n,
        |  CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM u GROUP BY l_returnflag, metric
        |ORDER BY l_returnflag, metric""".stripMargin) {
      (s, d) =>
        lineitem(s, d)
          .unpivot(Array(col("l_returnflag")),
            Array(col("l_quantity"), col("l_discount"), col("l_tax")),
            "metric", "val")
          .groupBy("l_returnflag", "metric")
          .agg(count(lit(1)).as("n"),
            sum(col("val").cast("decimal(18,2)")).cast("double").as("sum_val"))
          .orderBy("l_returnflag", "metric")
    },

    // ── F7: lexical numeric validation; original string emitted verbatim
    Q("q_numeric_valid",
      """SELECT event_id, vstr FROM (
        |  SELECT event_id,
        |    CASE CAST(event_id % 6 AS INT)
        |      WHEN 0 THEN 'NaN' WHEN 1 THEN 'Infinity' WHEN 2 THEN '1e3'
        |      WHEN 3 THEN 'oops' WHEN 4 THEN ''
        |      ELSE CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR) END AS vstr
        |  FROM events) t
        |WHERE TRY_CAST(vstr AS DOUBLE) IS NOT NULL
        |ORDER BY event_id""".stripMargin) {
      (s, d) =>
        val vstr = when(col("event_id") % 6 === 0, "NaN")
          .when(col("event_id") % 6 === 1, "Infinity")
          .when(col("event_id") % 6 === 2, "1e3")
          .when(col("event_id") % 6 === 3, "oops")
          .when(col("event_id") % 6 === 4, "")
          .otherwise(col("value").cast("decimal(12,2)").cast("string"))
        events(s, d).select(col("event_id"), vstr.as("vstr"))
          .filter(numericValid(col("vstr")))
          .orderBy("event_id")
    },

    // ── O1: sort with null→sentinel (1e12, nulls-last semantics) ────────
    Q("q_sort",
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS d
        |FROM orders
        |ORDER BY coalesce(CASE WHEN o_orderstatus = 'O' THEN NULL
        |                       ELSE o_totalprice END, 1e12), o_orderkey""".stripMargin) {
      (s, d) =>
        val dist = when(col("o_orderstatus") =!= "O", col("o_totalprice"))
        orders(s, d).select(col("o_orderkey"), dist.as("d"))
          .orderBy(coalesce(col("d"), lit(1e12)), col("o_orderkey"))
    },

    // ── O2: top-k (TakeOrderedAndProject, stable via total tiebreak) ────
    Q("q_topk",
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 40""".stripMargin) {
      (s, d) =>
        lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(40)
    },

    // ── temporal arithmetic: shift / truncate / extract / diff ──────────
    Q("q_date_arith",
      """SELECT o_orderkey,
        |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr,
        |  CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS qtr,
        |  CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
        |       AS BIGINT) AS days_since_95
        |FROM orders WHERE o_orderkey % 37 = 0
        |ORDER BY o_orderkey""".stripMargin) {
      (s, d) =>
        orders(s, d)
          .filter(col("o_orderkey") % 37 === 0)
          .select(col("o_orderkey"),
            date_format(col("o_orderdate") + expr("INTERVAL 30 DAYS"),
              "yyyy-MM-dd").as("due"),
            date_format(date_trunc("month", col("o_orderdate")),
              "yyyy-MM-dd").as("month_start"),
            year(col("o_orderdate")).cast("long").as("yr"),
            quarter(col("o_orderdate")).cast("long").as("qtr"),
            datediff(col("o_orderdate").cast("date"),
              to_date(lit("1995-01-01"))).cast("long").as("days_since_95"))
          .orderBy("o_orderkey")
    },

    // ── semi-structured extraction: JSON property → typed column ────────
    // events.props is a JSON object; extraction is a pure map stage, so at
    // scale it runs at scan speed and the extracted column participates in
    // predicates/aggregates like any other.
    Q("q_json_extract",
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
        |ORDER BY event_id""".stripMargin) {
      (s, d) =>
        events(s, d)
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .filter(col("k") >= 50)
          .orderBy("event_id")
    },

    // ── VARIANT (Spark 4's semi-structured type): a nested JSON document
    //    (the flat events.props object wrapped with typed event fields —
    //    composed IDENTICALLY on both engines, so the parse input is
    //    bit-equal) goes through parse_json → VariantType, and typed paths
    //    come back out with variant_get: the open-schema ingestion shape,
    //    where the document's structure is not declared anywhere in the
    //    plan. Parsing is a pure map stage over the scan (no shuffle
    //    added); the extracted columns then filter and aggregate like any
    //    native column. The DuckDB oracle runs the same paths through its
    //    JSON functions on the same composed document. ─────────────────────
    Q("q_variant",
      """WITH j AS (SELECT event_id,
        |    '{"p": ' || props || ', "e": {"t": "' || event_type ||
        |    '", "uid": ' || user_id::VARCHAR || '}}' AS doc
        |  FROM events),
        |x AS (SELECT event_id,
        |    CAST(json_extract_string(doc, '$.p.k') AS BIGINT) AS k,
        |    json_extract_string(doc, '$.e.t') AS t,
        |    CAST(json_extract_string(doc, '$.e.uid') AS BIGINT) AS uid
        |  FROM j)
        |SELECT t, count(CASE WHEN k >= 50 THEN 1 END) AS n,
        |  SUM(CASE WHEN k >= 50 THEN k END)::BIGINT AS sum_k,
        |  count(DISTINCT CASE WHEN k >= 50 THEN uid END) AS n_users
        |FROM x GROUP BY t
        |HAVING count(CASE WHEN k >= 50 THEN 1 END) > 0
        |ORDER BY t""".stripMargin) {
      (s, d) =>
        val doc = concat(lit("{\"p\": "), col("props"),
          lit(", \"e\": {\"t\": \""), col("event_type"),
          lit("\", \"uid\": "), col("user_id").cast("string"), lit("}}"))
        // The `k >= 50` row filter is FOLDED into conditional aggregates
        // (count/sum/distinct over `when(k >= 50, ...)`, then `HAVING
        // n > 0` to drop groups with no qualifying rows — identically on
        // the oracle). A pre-aggregation `.filter` would be substituted
        // below the extraction projection by Catalyst, making parseJson
        // run twice per row; folding it keeps ONE projection whose three
        // variant_get calls share a single parse via whole-stage codegen
        // subexpression elimination — no cache boundary needed, so a
        // 156-query sweep doesn't carry this table's parsed blocks around
        // for the rest of the session.
        events(s, d)
          .select(parse_json(doc).as("v"))
          .select(expr("variant_get(v, '$.p.k', 'bigint')").as("k"),
            expr("variant_get(v, '$.e.t', 'string')").as("t"),
            expr("variant_get(v, '$.e.uid', 'bigint')").as("uid"))
          .groupBy("t")
          .agg(count(when(col("k") >= 50, 1)).as("n"),
            sum(when(col("k") >= 50, col("k"))).as("sum_k"),
            count_distinct(when(col("k") >= 50, col("uid"))).as("n_users"))
          .filter(col("n") > 0)
          .orderBy("t")
    },

    // ── generator / lateral view: positional explode of a token array ───
    Q("q_posexplode",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        |           WHERE doc_id % 97 = 0)
        |SELECT doc_id, CAST(i - 1 AS INT) AS pos, ts[i] AS tok
        |FROM t CROSS JOIN LATERAL (SELECT unnest(range(1, len(ts) + 1)) AS i)
        |ORDER BY doc_id, pos""".stripMargin) {
      (s, d) =>
        documents(s, d)
          .filter(col("doc_id") % 97 === 0)
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
          .orderBy("doc_id", "pos")
    }
  )
}

package graft.queries

import org.apache.spark.sql.functions._
import graft.pipeline.AirQuality
import graft.sources.Snapshots

/** The REAL flagship pipeline — not the events-table analog — under the
  * DuckDB hash gate (VERDICT r4 #7). Input is the checked-in OpenAQ-shaped
  * snapshot fixture (`fixtures/snapshots/` JSON-lines, FIXTURES.md §A plus a
  * 10-station Berlin so the PRIMARY phase runs alongside the fallback), read
  * through the production source path ([[Snapshots.readLocations]] /
  * [[Snapshots.readLatest]], permissive mode over a deliberately corrupt
  * line) and executed by [[AirQuality.run]] — the same plan that serves the
  * driver's `SparkEntry.entry` smoke check. The oracle replays the whole
  * reference semantics (`main.py:103-279`) in DuckDB SQL over the same JSON:
  * two-phase geo with the raw-payload `<10` switch, F1/F3/F4 guards,
  * F5-F8 quirks (lexical nan, unparseable-date keep, sensor id 0, falsy
  * units), A1/O2 ranking with the fallback-only distance tie-break, and the
  * greedy early-terminated selection via its window encoding (a station
  * whose measurements all fail validation is walked but does not count
  * toward the ≥3 stop — Pankow exercises exactly that).
  *
  * Determinism: every output column is the ORIGINAL string (value, unit,
  * date project verbatim), so no float ever reaches the hash; doubles only
  * steer filters/ranks, and the fixture keeps every station kilometers away
  * from any radius boundary so a last-ulp libm difference cannot flip a
  * decision.
  */
object Flagship {

  /** Fixture lives in-repo; resolved to an absolute path so Spark and the
    * driver's DuckDB agree. Prefer the checkout we are actually running in
    * (sbt sets CWD to the repo root); fall back to the canonical location
    * for contexts launched elsewhere.
    */
  private val Base = {
    val local = new java.io.File("fixtures/snapshots")
    if (local.isDirectory) local.getAbsolutePath
    else "/root/repo/fixtures/snapshots"
  }

  private val citySeq = Seq(
    ("Warsaw", 52.2297, 21.0122),
    ("New York", 40.7128, -74.0060),
    ("Berlin", 52.52, 13.405))

  private val cityValuesSql = citySeq
    .map { case (c, la, lo) => s"('$c', $la, $lo)" }.mkString(", ")

  val all: Seq[Q] = Seq(
    Q("q_flagship",
      s"""WITH locs AS (
         |  SELECT * FROM read_json('$Base/locations.jsonl',
         |    format='newline_delimited', ignore_errors=true,
         |    columns={city:'VARCHAR', id:'BIGINT', name:'VARCHAR', locality:'VARCHAR',
         |      coordinates:'STRUCT(latitude DOUBLE, longitude DOUBLE)',
         |      datetimeLast:'STRUCT(utc VARCHAR, local VARCHAR)',
         |      sensors:'STRUCT(id BIGINT, parameter STRUCT(name VARCHAR, units VARCHAR), units VARCHAR, unit VARCHAR)[]'})),
         |meas0 AS (
         |  SELECT location_id, sensorsId, value, unit,
         |         datetime.utc AS datetime_utc, datetime.local AS datetime_local, "date" AS mdate
         |  FROM read_json('$Base/latest.jsonl',
         |    format='newline_delimited', ignore_errors=true,
         |    columns={location_id:'BIGINT', sensorsId:'VARCHAR', value:'VARCHAR', unit:'VARCHAR',
         |      datetime:'STRUCT(utc VARCHAR, local VARCHAR)', "date":'VARCHAR'})),
         |cityc(city, clat, clon) AS (VALUES $cityValuesSql),
         |-- AT TIME ZONE 'UTC' pins every instant to naive UTC wall time
         |-- BEFORE interval arithmetic/comparison: TIMESTAMPTZ ± INTERVAL is
         |-- calendar math in the DuckDB session TZ (SURVEY §5.3), which a
         |-- DST boundary would shift by an hour vs Spark's UTC session,
         |-- while the offset in the source string (the fixture has +02:00)
         |-- still resolves correctly through the TIMESTAMPTZ parse.
         |cutoff AS (SELECT max(try_cast(regexp_replace(datetimeLast.utc, 'Z$$', '+00:00')
         |    AS TIMESTAMPTZ) AT TIME ZONE 'UTC')
         |    - INTERVAL ${AirQuality.FreshDays} DAY AS cut FROM locs),
         |wc AS (
         |  SELECT l.city, l.id, l.name, l.locality, l.sensors,
         |    2.0 * 6371000.0 * asin(least(1.0, sqrt(
         |      pow(sin(radians(l.coordinates.latitude - c.clat) / 2), 2)
         |      + cos(radians(c.clat)) * cos(radians(l.coordinates.latitude))
         |        * pow(sin(radians(l.coordinates.longitude - c.clon) / 2), 2)))) AS dist_m,
         |    (l.coordinates.latitude IS NULL OR l.coordinates.longitude IS NULL) AS cmiss,
         |    try_cast(regexp_replace(l.datetimeLast.utc, 'Z$$', '+00:00') AS TIMESTAMPTZ)
         |      AT TIME ZONE 'UTC' AS last_seen
         |  FROM locs l JOIN cityc c USING (city)),
         |pcnt AS (SELECT city, count(*) AS n FROM wc
         |         WHERE cmiss OR dist_m <= ${AirQuality.PrimaryRadiusM} GROUP BY city),
         |fb AS (SELECT c.city, coalesce(p.n, 0) < ${AirQuality.MinPrimaryResults} AS is_fb
         |       FROM cityc c LEFT JOIN pcnt p USING (city)),
         |geo AS (SELECT wc.*, fb.is_fb FROM wc JOIN fb USING (city)
         |        WHERE CASE WHEN fb.is_fb THEN (NOT cmiss) AND dist_m <= ${AirQuality.FallbackRadiusM}
         |              ELSE cmiss OR dist_m <= ${AirQuality.PrimaryRadiusM} END),
         |fresh AS (SELECT g.* FROM geo g CROSS JOIN cutoff WHERE last_seen >= cut),
         |sens AS (
         |  SELECT city, id AS loc_id,
         |    coalesce(nullif(name, ''), nullif(locality, ''), 'id:' || id) AS loc_name,
         |    dist_m, is_fb, t.s.id AS sensor_id,
         |    lower(t.s.parameter.name) AS pname,
         |    coalesce(nullif(t.s.parameter.units, ''), nullif(t.s.units, ''),
         |             nullif(t.s.unit, ''), '') AS punit
         |  FROM fresh, unnest(sensors) AS t(s)
         |  WHERE t.s.id IS NOT NULL AND t.s.id <> 0
         |    AND t.s.parameter.name IS NOT NULL AND lower(t.s.parameter.name) <> ''),
         |mt AS (SELECT * FROM sens
         |       WHERE pname IN (${AirQuality.Parameters.toSeq.sorted.map(p => s"'$p'").mkString(", ")})),
         |cand AS (SELECT city, loc_id, count(DISTINCT sensor_id) AS matches,
         |           min(dist_m) AS dist_m, any_value(is_fb) AS is_fb
         |         FROM mt GROUP BY city, loc_id),
         |rk AS (SELECT city, loc_id,
         |         CAST(row_number() OVER (PARTITION BY city ORDER BY matches DESC,
         |           CASE WHEN is_fb THEN dist_m ELSE 0.0 END, loc_id) AS BIGINT) AS rank
         |       FROM cand QUALIFY rank <= ${AirQuality.MaxCandidates}),
         |cs AS (SELECT mt.* FROM mt JOIN rk USING (city, loc_id)),
         |ms AS (SELECT location_id, try_cast(sensorsId AS BIGINT) AS sid, value, unit,
         |         coalesce(datetime_utc, datetime_local, mdate) AS dstr
         |       FROM meas0
         |       WHERE try_cast(sensorsId AS BIGINT) IS NOT NULL
         |         AND try_cast(sensorsId AS BIGINT) <> 0
         |         AND try_cast(value AS DOUBLE) IS NOT NULL),
         |val AS (SELECT cs.city, cs.loc_id, cs.loc_name, cs.pname, cs.punit,
         |          m.value, m.unit AS munit, m.dstr
         |        FROM ms m JOIN cs ON m.sid = cs.sensor_id AND m.location_id = cs.loc_id
         |        CROSS JOIN cutoff
         |        WHERE try_cast(regexp_replace(m.dstr, 'Z$$', '+00:00') AS TIMESTAMPTZ) IS NULL
         |           OR try_cast(regexp_replace(m.dstr, 'Z$$', '+00:00') AS TIMESTAMPTZ)
         |              AT TIME ZONE 'UTC' >= cut),
         |cp AS (SELECT DISTINCT city, loc_id, pname FROM val),
         |uc AS (SELECT r.city, r.loc_id, r.rank,
         |         SUM(CASE WHEN cnt.n IS NOT NULL THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY r.city ORDER BY r.rank) AS used_cum
         |       FROM rk r LEFT JOIN (SELECT city, loc_id, count(*) AS n FROM cp
         |                            GROUP BY city, loc_id) cnt USING (city, loc_id)),
         |fpr AS (SELECT cp.city, cp.pname, min(r.rank) AS frk
         |        FROM cp JOIN rk r USING (city, loc_id) GROUP BY cp.city, cp.pname),
         |cov AS (SELECT r.city, r.rank, count(f.pname) AS cov_cnt
         |        FROM rk r LEFT JOIN fpr f ON f.city = r.city AND f.frk <= r.rank
         |        GROUP BY r.city, r.rank),
         |stopr AS (SELECT u.city, min(u.rank) AS stop_rank
         |          FROM uc u JOIN cov c ON c.city = u.city AND c.rank = u.rank
         |          WHERE u.used_cum >= ${AirQuality.MinUsed}
         |            AND c.cov_cnt >= ${AirQuality.Parameters.size} GROUP BY u.city),
         |sel AS (SELECT r.city, r.loc_id FROM rk r LEFT JOIN stopr s USING (city)
         |        WHERE r.rank <= coalesce(s.stop_rank, 9223372036854775807))
         |SELECT v.city, v.loc_name AS location, v.pname AS parameter, v.value,
         |  coalesce(nullif(v.punit, ''), nullif(v.munit, ''), '') AS unit,
         |  v.dstr AS date
         |FROM val v JOIN sel USING (city, loc_id)
         |ORDER BY city, location, parameter, value, unit, date""".stripMargin) {
      (s, _) =>
        import s.implicits._
        val cities = citySeq.toDF("city", "lat", "lon")
        AirQuality.run(s,
          Snapshots.readLocations(s, s"$Base/locations.jsonl"),
          Snapshots.readLatest(s, s"$Base/latest.jsonl"),
          cities)
          .orderBy("city", "location", "parameter", "value", "unit", "date")
    }
  )
}

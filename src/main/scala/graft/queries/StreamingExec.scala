package graft.queries

import org.apache.spark.sql.functions._

/** Declared queries that execute the STREAMING engine (not batch parity):
  * the transform runs through micro-batch Structured Streaming and the
  * final sink contents are what the oracle checks. Excluded from Bench —
  * AvailableNow micro-batch latency measures trigger scheduling, not data
  * throughput (see Bench.scala).
  */
object StreamingExec {

  val all: Seq[Q] = Seq(

    // Same oracle as q_window_tumbling — the point: a genuine streaming
    // execution (file-stream replay + watermark + windowed state + memory
    // sink) lands on the identical, hash-checked result.
    Q("q_stream_tumbling",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS ws,
        |  event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin) {
      (s, d) =>
        graft.streaming.Streams.tumblingFromSnapshot(s, d)
          .select(date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("ws"),
            col("event_type"), col("n"), col("sum_v"))
          .orderBy("ws", "event_type")
    },

    // The watermark's late-data DROP rule, actually exercised (round 11):
    // a staged replay re-delivers every event_id % 100 == 7 row 25 days
    // late AFTER the full snapshot advanced the watermark to max−30d, in
    // append mode (the one mode where the watermark deletes data). The
    // oracle encodes the same cutoff analytically: a laggard survives iff
    // its day-window end exceeds the watermark. See
    // Streams.lateDropFromSnapshot for the batch-boundary staging.
    Q("q_stream_late",
      """WITH mx AS (SELECT max(ts) AS mx FROM events),
        |lg AS (SELECT ts - INTERVAL 25 DAY AS ts, event_type FROM events
        |       WHERE event_id % 100 = 7),
        |kept AS (SELECT l.ts, l.event_type FROM lg l CROSS JOIN mx
        |         WHERE date_trunc('day', l.ts) + INTERVAL 1 DAY
        |               > mx.mx - INTERVAL 30 DAY),
        |u AS (SELECT ts, event_type FROM events
        |      UNION ALL SELECT ts, event_type FROM kept
        |      -- the watermark-grace nudge row (see lateDropFromSnapshot)
        |      UNION ALL SELECT mx.mx, 'click' FROM mx)
        |SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS ws,
        |  event_type, count(*) AS n
        |FROM u GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin) {
      (s, d) =>
        graft.streaming.Streams.lateDropFromSnapshot(s, d)
          .select(date_format(col("ws"), "yyyy-MM-dd").as("ws"),
            col("event_type"), col("n"))
          .orderBy("ws", "event_type")
    },

    // Overlapping-window state under the streaming engine — every event
    // feeds TWO window rows (1 h window, 30 m slide); same oracle as the
    // batch q_window_sliding.
    Q("q_stream_sliding",
      """WITH b AS (SELECT event_type, value,
        |    time_bucket(INTERVAL '30 minutes', ts) AS tb FROM events),
        |w AS (SELECT event_type, value,
        |    unnest([tb, tb - INTERVAL 30 MINUTE]) AS ws FROM b)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS ws, event_type,
        |  count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM w GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin) {
      (s, d) =>
        graft.streaming.Streams.slidingFromSnapshot(s, d)
          .select(date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("ws"),
            col("event_type"), col("n"), col("sum_v"))
          .orderBy("ws", "event_type")
    },

    // Gap-merged session state under the streaming engine — sessions
    // grow and merge across micro-batches; the final state must equal the
    // batch session_window result (same oracle as q_session_window).
    Q("q_stream_session",
      """WITH e0 AS (
        |  -- µs truncation to match Spark's timestamp precision (see
        |  -- q_session_window)
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
        graft.streaming.Streams.sessionsFromSnapshot(s, d)
          .select(col("user_id"),
            date_format(col("ss"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
            date_format(col("se"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
            col("n"))
          .orderBy("user_id", "session_start")
    },

    // Stream-static enrichment: the event stream joins the static customer
    // dim (stateless per micro-batch), then windowed per-segment counts —
    // the standard streaming-ETL shape (enrich, then aggregate). The batch
    // oracle joins and groups the same rows.
    Q("q_stream_enrich",
      """SELECT strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:%M:%S') AS ws,
        |  c.c_mktsegment, count(*) AS n,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY ws, c_mktsegment""".stripMargin) {
      (s, d) =>
        graft.streaming.Streams.enrichedFromSnapshot(s, d)
          .select(date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("ws"),
            col("c_mktsegment"), col("n"), col("sum_v"))
          .orderBy("ws", "c_mktsegment")
    },

    // Custom arbitrary state (flatMapGroupsWithState) under the REAL
    // micro-batch engine: per-user running count + exact decimal total in
    // Update mode; the final per-key state must equal the batch GROUP BY.
    Q("q_stream_running",
      """SELECT user_id, count(*) AS n,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |       AS VARCHAR) AS total
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (s, d) =>
        graft.streaming.Streams.runningFromSnapshot(s, d)
          .orderBy("user_id")
    },

    // STREAM-STREAM event-time interval join (attribution shape): each
    // purchase joins the same user's clicks from the preceding hour, both
    // sides watermarked, the time bound in the join condition so buffered
    // state is watermark-evicted. Two independent file streams (one paced
    // to 1 file/micro-batch) make the join genuinely buffer across
    // batches; the emitted Append rows must be exactly the batch join.
    Q("q_stream_join",
      """WITH e AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type
        |           FROM events),
        |c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
        |      FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
        |      FROM e WHERE event_type = 'purchase')
        |SELECT p.user_id, p.purchase_id, c.click_id,
        |  strftime(p.purchase_ts, '%Y-%m-%d %H:%M:%S.%f') AS pts,
        |  strftime(c.click_ts, '%Y-%m-%d %H:%M:%S.%f') AS cts
        |FROM p JOIN c ON c.user_id = p.user_id
        |  AND c.click_ts >= p.purchase_ts - INTERVAL 1 HOUR
        |  AND c.click_ts <= p.purchase_ts
        |ORDER BY p.user_id, purchase_id, click_id""".stripMargin) {
      (s, d) =>
        graft.streaming.Streams.streamJoinFromSnapshot(s, d)
          .select(col("user_id"), col("purchase_id"), col("click_id"),
            date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("pts"),
            date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("cts"))
          .orderBy("user_id", "purchase_id", "click_id")
    },

    // LEFT-OUTER stream-stream join: purchases with no click in the
    // preceding hour emit null-extended — which requires the engine to
    // PROVE absence via watermark-driven state eviction, the semantics the
    // inner join never exercises. Nullable columns are coalesced to
    // sentinels on both engines so null sort order can't diverge.
    Q("q_stream_outer",
      """WITH e AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type
        |           FROM events),
        |c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
        |      FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
        |      FROM e WHERE event_type = 'purchase')
        |SELECT p.user_id, p.purchase_id,
        |  coalesce(c.click_id, -1) AS click_id,
        |  strftime(p.purchase_ts, '%Y-%m-%d %H:%M:%S.%f') AS pts,
        |  coalesce(strftime(c.click_ts, '%Y-%m-%d %H:%M:%S.%f'), 'none') AS cts
        |FROM p LEFT JOIN c ON c.user_id = p.user_id
        |  AND c.click_ts >= p.purchase_ts - INTERVAL 1 HOUR
        |  AND c.click_ts <= p.purchase_ts
        |ORDER BY p.user_id, purchase_id, click_id""".stripMargin) {
      (s, d) =>
        graft.streaming.Streams.streamOuterJoinFromSnapshot(s, d)
          .filter(col("user_id") >= 0) // replay watermark sentinels, if ever emitted
          .select(col("user_id"), col("purchase_id"),
            coalesce(col("click_id"), lit(-1L)).as("click_id"),
            date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("pts"),
            coalesce(date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"),
              lit("none")).as("cts"))
          .orderBy("user_id", "purchase_id", "click_id")
    },

    // Spark 4 transformWithState (the arbitrary-state API superseding
    // flatMapGroupsWithState): per-user running totals in RocksDB-backed
    // ValueState; same oracle as q_stream_running, so the legacy and new
    // state APIs are proven to agree bit-for-bit.
    Q("q_stream_tws",
      """SELECT user_id, count(*) AS n,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |       AS VARCHAR) AS total
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (s, d) =>
        graft.streaming.Streams.transformWithStateFromSnapshot(s, d)
          .orderBy("user_id")
    },

    // Streaming MERGE ingest via foreachBatch: micro-batches fold into a
    // generation-versioned parquet table, latest event per user winning by
    // (ts, event_id). The final TABLE — not a memory sink — is the declared
    // result, so the upsert write path itself is under the hash gate.
    Q("q_stream_upsert",
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |             ts::TIMESTAMP AS ts FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM e)
        |SELECT user_id, event_id, event_type, value,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin) {
      (s, d) =>
        graft.streaming.Streams.upsertFromSnapshot(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("value"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"))
          .orderBy("user_id")
    },

    // Streaming CDC ingest (the q_mv_refresh_cdc symmetry, streaming
    // form): upsert merge + tombstone deletes (event_id % 17 = 0) flowing
    // through the SAME associative latest-wins fold — deletes survive
    // every intermediate merge and apply at read time, so the result is
    // micro-batching-independent and the batch oracle checks a real
    // streamed CDC table.
    Q("q_stream_cdc",
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |             ts::TIMESTAMP AS ts FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM e)
        |SELECT user_id, event_id, event_type, value,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts
        |FROM r WHERE rn = 1 AND event_id % 17 <> 0
        |ORDER BY user_id""".stripMargin) {
      (s, d) =>
        graft.streaming.Streams.cdcFromSnapshot(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("value"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"))
          .orderBy("user_id")
    },

    // Stateful streaming dedup: watermark-bounded dropDuplicates state,
    // key-only projection so the surviving-row nondeterminism of "first
    // arrival wins" never reaches the output — the key SET is the batch
    // DISTINCT, hash-checked below.
    Q("q_stream_dedup",
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin) {
      (s, d) =>
        graft.streaming.Streams.dedupFromSnapshot(s, d)
          .orderBy("user_id", "event_type")
    },

    // Streaming NEAR-dup dedup (round 13): MinHash band signatures computed
    // STATELESSLY per arriving document, then watermark-bounded
    // dropDuplicatesWithinWatermark on (band, sig) — the streaming build of
    // the LSH dedup index. Key-only projection (which doc claims a bucket
    // is arrival-order-dependent; the bucket set is not), and the oracle is
    // the batch `bands` CTE that q_dedup_minhash's candidate pairs derive
    // from — so the streaming signature computation is hash-pinned against
    // the batch one.
    Q("q_stream_dedup_minhash",
      s"""WITH ${Dedup.MinhashPairsCte}
         |SELECT DISTINCT band, sig FROM bands
         |ORDER BY band, sig""".stripMargin) {
      (s, d) =>
        graft.streaming.Streams.minhashDedupFromSnapshot(s, d)
          .orderBy("band", "sig")
    },

    // Streaming per-key top-k (round 13): Spark 4 transformWithState with
    // a RocksDB-backed LIST state — the state shape q_stream_tws's
    // ValueState doesn't exercise. The per-user top-3 events by
    // (value DESC, event_id ASC) merge is associative + commutative under
    // the deterministic tie-break, so the final list is micro-batching-
    // and arrival-order-independent, and the batch window oracle checks
    // the streamed result exactly. State is O(k) per key forever.
    Q("q_stream_topk",
      """WITH r AS (SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id) AS rank
        |  FROM events)
        |SELECT user_id, CAST(rank AS BIGINT) AS rank, event_id
        |FROM r WHERE rank <= 3 ORDER BY user_id, rank""".stripMargin) {
      (s, d) =>
        graft.streaming.Streams.topkFromSnapshot(s, d)
          .orderBy("user_id", "rank")
    }
  )
}

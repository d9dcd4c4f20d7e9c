package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues,
  ValueState}

/** Structured-Streaming surface (SURVEY.md §2.9): the reference's whole job
  * is an externally-scheduled batch micro-run (Cloud Scheduler cron,
  * `readme.md:72-90`); its Spark-native form is the SAME transformation
  * applied to a streaming DataFrame under a trigger. Every transform here is
  * therefore written against a plain DataFrame — pass a batch frame and it's
  * the batch pipeline, pass `spark.readStream...` and it's the streaming
  * one. The specs verify batch↔stream equivalence (the oracle set can't
  * replay streams — SURVEY.md §5.2.4).
  *
  * Watermark semantics deliberately mirror F8's late-data rule
  * (`main.py:255-259`): rows later than the 30-day tolerance are dropped,
  * anything within it is accepted late.
  */
object Streams {

  /** Tumbling-window counts + exact decimal sums per event type. */
  def tumblingCounts(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_v"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"),
        col("sum_v"))

  /** Sliding-window counts + exact decimal sums (overlapping windows). */
  def slidingCounts(events: DataFrame, width: String = "1 hour",
      slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_v"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"),
        col("sum_v"))

  /** Session windows per user (gap-merged). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("ss"),
        col("session_window.end").as("se"), col("n"))

  /** Streaming wrapper: watermark mirroring F8's 30-day late tolerance,
    * then any of the window transforms above.
    */
  def withLateTolerance(stream: DataFrame, tolerance: String = "30 days"): DataFrame =
    stream.withWatermark("ts", tolerance)

  // Per-process sink counter: memory-sink names must be unique per run or
  // concurrent/repeated executions would collide on the registered table.
  private val sinkSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** Shared snapshot-replay harness: stage `events` as a multi-file parquet
    * directory, replay it as a watermarked file stream through `transform`,
    * run to completion under `Trigger.AvailableNow`, and return the memory
    * sink's final contents. The staging directory is deleted once the run
    * terminates (the memory sink holds the rows; the files are dead weight
    * after `awaitTermination`). At scale the memory sink becomes a real
    * table sink and AvailableNow the scheduled trigger; the plan is
    * unchanged.
    */
  private def replaySnapshot(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, sinkPrefix: String, mode: OutputMode)(
      transform: DataFrame => DataFrame): DataFrame = {
    val staging = java.nio.file.Files.createTempDirectory(sinkPrefix)
    try {
      graft.model.Tables.events(spark, sfDir)
        .repartition(4) // several files → several input splits to micro-batch
        .write.mode("overwrite").parquet(staging.toString)
      val schema = spark.read.parquet(staging.toString).schema
      val src = spark.readStream.schema(schema).parquet(staging.toString)
      val sink = s"${sinkPrefix.replace('-', '_')}_${sinkSeq.incrementAndGet()}"
      val q = transform(withLateTolerance(src))
        .writeStream.outputMode(mode)
        .format("memory").queryName(sink)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(sink)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(staging).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** Two-stream variant of [[replaySnapshot]]: the staged snapshot is read
    * as TWO independent file streams (each with its own source offsets and
    * micro-batch pacing — `maxFilesPerTrigger(1)` on one side staggers the
    * arrival order, so the join genuinely buffers state across batches),
    * joined/transformed by `transform`, appended to a memory sink.
    */
  private def replayTwoStreams(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, sinkPrefix: String, watermarkSentinels: Boolean = false)(
      transform: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val staging = java.nio.file.Files.createTempDirectory(sinkPrefix)
    try {
      graft.model.Tables.events(spark, sfDir)
        .repartition(4)
        .write.mode("overwrite").parquet(staging.toString)
      // Outer stream-stream joins emit their null-extended rows only when
      // the watermark passes the point where a match can no longer arrive;
      // with a finite replay the watermark (max event time − delay) never
      // gets there on real data alone, so trailing unmatched rows would
      // stay buffered forever. Appending two far-future sentinel files
      // (max+31d, max+32d — past the 30-day delay) pushes the watermark
      // beyond every real event; the SECOND sentinel batch carries the
      // watermark advance from the first, so eviction happens in a DATA
      // batch and never depends on a trailing no-data batch. The sentinels
      // must carry the REAL event types ('click'/'purchase'): Catalyst
      // pushes the per-side event-type filter below EventTimeWatermark
      // (watermark is row-metadata to the optimizer), so a row of any
      // other type is pruned AT THE SCAN and never advances event time —
      // measured, not theory. Negative user ids keep them from ever
      // joining (real user ids are non-negative, and the two sides use
      // different ids so they can't match each other); consumers filter
      // `user_id >= 0` from the sink. mtimes are forced +60 s/+120 s so
      // the throttled (1-file-per-trigger) source replays them LAST —
      // real rows are all processed before the watermark jumps, so
      // nothing is ever late-dropped (the events span is under the
      // 30-day delay).
      if (watermarkSentinels) {
        import spark.implicits._
        val maxTs = spark.read.parquet(staging.toString)
          .agg(max("ts")).head().getTimestamp(0)
        Seq((31L, "click", -1L), (32L, "purchase", -2L)).zipWithIndex
          .foreach { case ((days, typ, uid), i) =>
            val before = Option(staging.toFile.listFiles())
              .map(_.map(_.getName).toSet).getOrElse(Set.empty[String])
            val ts = new java.sql.Timestamp(maxTs.getTime + days * 86400000L)
            Seq((-(i + 1).toLong, ts, uid, typ, 0.0, null: String))
              .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
              .coalesce(1).write.mode("append").parquet(staging.toString)
            Option(staging.toFile.listFiles()).foreach(_.foreach { f =>
              if (!before(f.getName) && f.getName.endsWith(".parquet")) {
                val target = System.currentTimeMillis() + (i + 1) * 60000L
                // the replays-last guarantee depends on this mtime bump —
                // fall back to the NIO API and fail loudly rather than
                // silently degrading to creation-time ordering
                if (!f.setLastModified(target)) {
                  java.nio.file.Files.setLastModifiedTime(f.toPath,
                    java.nio.file.attribute.FileTime.fromMillis(target))
                }
              }
            })
          }
      }
      val schema = spark.read.parquet(staging.toString).schema
      val sa = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staging.toString)
      val sb = spark.readStream.schema(schema).parquet(staging.toString)
      val sink = s"${sinkPrefix.replace('-', '_')}_${sinkSeq.incrementAndGet()}"
      val q = transform(sa, sb)
        .writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(sink)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(sink)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(staging).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** REAL streaming execution of a STREAM-STREAM event-time interval join —
    * the attribution shape: each purchase joins the same user's clicks from
    * the preceding hour. Both sides are watermarked and the join condition
    * carries the event-time bound, so each side's buffered state is evicted
    * as the other side's watermark passes — state is O(events within
    * interval + tolerance), never O(history). Inner stream-stream joins
    * emit in Append mode; the result set is exactly the batch join, which
    * is what the DuckDB oracle checks.
    */
  def streamJoinFromSnapshot(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame =
    replayTwoStreams(spark, sfDir, "graft-stream-join") { (sa, sb) =>
      val clicks = sa.filter(col("event_type") === "click")
        .select(col("user_id").as("click_user"),
          col("event_id").as("click_id"), col("ts").as("click_ts"))
        .withWatermark("click_ts", "30 days")
      val purchases = sb.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"))
        .withWatermark("purchase_ts", "30 days")
      purchases.join(clicks,
        col("user_id") === col("click_user") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
          col("click_ts") <= col("purchase_ts"))
        .select(col("user_id"), col("purchase_id"), col("click_id"),
          col("purchase_ts"), col("click_ts"))
    }

  /** REAL streaming execution of a LEFT-OUTER stream-stream event-time join:
    * every purchase emits, click-matched or null-extended. The outer side's
    * unmatched rows can only be emitted once the watermark proves no match
    * can still arrive, so state eviction — not just buffering — is on the
    * executed path (the inner-join variant above never exercises it). The
    * replay's watermark sentinels (see [[replayTwoStreams]]) ride the real
    * event types with negative user ids, so they advance each side's event
    * time but can never join; the final `user_id >= 0` drops them from the
    * result. The emitted Append rows must equal the batch LEFT JOIN, which
    * is what the DuckDB oracle checks.
    */
  def streamOuterJoinFromSnapshot(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame =
    replayTwoStreams(spark, sfDir, "graft-stream-outer",
      watermarkSentinels = true) { (sa, sb) =>
      val clicks = sa.filter(col("event_type") === "click")
        .select(col("user_id").as("click_user"),
          col("event_id").as("click_id"), col("ts").as("click_ts"))
        .withWatermark("click_ts", "30 days")
      val purchases = sb.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"))
        .withWatermark("purchase_ts", "30 days")
      purchases.join(clicks,
        col("user_id") === col("click_user") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
          col("click_ts") <= col("purchase_ts"),
        "left_outer")
        // NO sentinel filter here: a `user_id >= 0` above the join would be
        // pushed below the purchase-side watermark node (same optimizer
        // move as the event-type filter, see replayTwoStreams) and stop
        // the sentinel from advancing event time. The sentinels cannot
        // reach the sink anyway — their own eviction point (ts+delay) is
        // beyond any watermark this replay can reach — and the declared
        // query filters the sink batch-side as a belt-and-braces guard.
        .select(col("user_id"), col("purchase_id"), col("click_id"),
          col("purchase_ts"), col("click_ts"))
    }

  /** REAL streaming MERGE (upsert) ingest — the lakehouse pattern Spark has
    * no native streaming sink for: each micro-batch is folded into a
    * parquet table via `foreachBatch`, keeping the latest event per user
    * (latest-wins by the total order (ts, event_id), carried as a packed
    * struct so `max` is one lexicographic comparison). Latest-wins merging
    * is associative and commutative under a total order, so the final
    * table is independent of how the replay was micro-batched — which is
    * exactly what the batch oracle (window row_number = 1) checks.
    * Intermediate per-batch merge generations live in a RUN-LOCAL temp dir
    * (not [[graft.queries.Sinks.stagingDir]], whose ≤2-generation pruning
    * assumes one generation per query build — ~5 per run here would evict
    * directories an older still-collectable plan reads); only the FINAL
    * merged table is published through stagingDir, preserving its
    * snapshot-isolation contract for downstream readers. State lives in
    * the table, not the engine: the merge itself is O(batch + |table|)
    * per batch with no streaming state operator.
    */
  def upsertFromSnapshot(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame =
    mergeFromSnapshot(spark, sfDir, tombstones = false)

  /** REAL streaming CDC ingest — [[upsertFromSnapshot]]'s merge discipline
    * with a DELETE channel: rows whose `event_id % 17 = 0` are tombstones
    * (the delete operation of a CDC feed). The tombstone flag rides INSIDE
    * the packed ordering struct (after the unique (ts, event_id) prefix,
    * so it never influences the max), which means deletes flow through the
    * SAME associative latest-wins merge as upserts — a user whose latest
    * CDC operation is a delete survives every intermediate merge and is
    * dropped only at read time, exactly how tombstones work in a log-
    * structured table. The batch oracle (latest row per user, filtered on
    * the tombstone rule) must equal the replayed result under ANY
    * micro-batching. The streaming counterpart of `q_mv_refresh_cdc`.
    */
  def cdcFromSnapshot(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame =
    mergeFromSnapshot(spark, sfDir, tombstones = true)

  /** Latest row per user as (user_id, pk) where pk's leading fields are
    * the ordering key — max(pk) IS latest-wins; (ts, event_id) is unique
    * (event_id alone is), so fields after it never affect the max.
    */
  private def reduceLatest(df: DataFrame): DataFrame =
    df.select(col("user_id"), struct(col("ts"), col("event_id"),
        (col("event_id") % 17 === 0).as("del"),
        col("event_type"), col("value")).as("pk"))
      .groupBy("user_id").agg(max(col("pk")).as("pk"))

  private def mergeFromSnapshot(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, tombstones: Boolean): DataFrame = {
    val staging = java.nio.file.Files.createTempDirectory("graft-stream-upsert")
    val mergeTmp = java.nio.file.Files.createTempDirectory("graft-upsert-gen")
    try {
      graft.model.Tables.events(spark, sfDir)
        .repartition(4).write.mode("overwrite").parquet(staging.toString)
      val schema = spark.read.parquet(staging.toString).schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staging.toString)
      val current = new java.util.concurrent.atomic.AtomicReference[String](null)
      val batchSeq = new java.util.concurrent.atomic.AtomicLong(0L)
      val q = src.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val batchLatest = reduceLatest(batch)
          val merged = Option(current.get()) match {
            case Some(prev) => spark.read.parquet(prev)
              .unionByName(batchLatest)
              .groupBy("user_id").agg(max(col("pk")).as("pk"))
            case None => batchLatest
          }
          val gen =
            mergeTmp.resolve(s"gen-${batchSeq.incrementAndGet()}").toString
          merged.write.mode("overwrite").parquet(gen)
          current.set(gen)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // publish the final table through stagingDir (one generation per
      // build — the contract its pruning assumes), then the run-local
      // intermediates can be deleted in the finally block below.
      val published = graft.queries.Sinks.stagingDir(
        if (tombstones) "graft-cdc-table" else "graft-upsert-table", sfDir)
      // an empty events source produces ZERO micro-batches, so `current`
      // is still null here — publish an empty table with the merged schema
      // (reduceLatest of zero rows) instead of NPE-ing on parquet(null)
      (Option(current.get()) match {
        case Some(p) => spark.read.parquet(p)
        case None => reduceLatest(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
      }).write.mode("overwrite").parquet(published)
      val table = spark.read.parquet(published)
      // tombstone read-time filter: a user whose LATEST CDC operation is a
      // delete is absent from the served table
      (if (tombstones) table.filter(!col("pk.del")) else table)
        .select(col("user_id"), col("pk.event_id").as("event_id"),
          col("pk.event_type").as("event_type"), col("pk.value").as("value"),
          col("pk.ts").as("ts"))
    } finally {
      import scala.jdk.CollectionConverters._
      Seq(staging, mergeTmp).foreach { root =>
        java.nio.file.Files.walk(root).iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }

  /** REAL streaming execution of the tumbling-window aggregation over the
    * events snapshot — the declared-query form of the streaming surface:
    * the same rows as the batch `groupBy(window(...))`, produced by the
    * micro-batch engine, so the batch DuckDB oracle verifies a streaming
    * run.
    */
  def tumblingFromSnapshot(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame =
    replaySnapshot(spark, sfDir, "graft-stream-tumbling",
      OutputMode.Complete())(tumblingCounts(_))

  /** REAL streaming execution of the sliding-window aggregation — each
    * event lands in TWO overlapping one-hour windows (30-minute slide), so
    * the windowed state layer maintains multiple window rows per event
    * across micro-batches; the final Complete-mode result must equal the
    * batch `groupBy(window(1h, 30m))`.
    */
  def slidingFromSnapshot(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame =
    replaySnapshot(spark, sfDir, "graft-stream-sliding",
      OutputMode.Complete())(slidingCounts(_))

  /** REAL streaming execution of session-window aggregation — gap-merged
    * session state, the most complex streaming state surface: sessions
    * grow/merge as events arrive across micro-batches.
    */
  def sessionsFromSnapshot(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame =
    replaySnapshot(spark, sfDir, "graft-stream-session",
      OutputMode.Complete())(sessionCounts(_))

  /** REAL watermark late-DROPPING under the streaming engine
    * (q_stream_late) — every other streaming leg arranges that nothing is
    * ever late (the events span is under the 30-day tolerance), so the
    * drop rule itself was only ever exercised by documentation. Staged
    * replay with DETERMINISTIC batch boundaries (one file per micro-batch,
    * mtime-ordered):
    *
    *   1. the full snapshot in ONE file — after this batch the watermark
    *      is max(ts) − 30 d;
    *   2. a NUDGE file (one 'click' row duplicating max(ts), negative
    *      event_id): Spark filters late rows with the watermark LAGGED BY
    *      ONE BATCH (measured, not theory — a laggard file placed directly
    *      after the snapshot is filtered with the epoch watermark and
    *      nothing drops; the per-batch listener shows the operative
    *      watermark at Dec 31 while drops stay 0). The nudge burns that
    *      grace batch without moving the watermark; the oracle accounts
    *      for its one row explicitly;
    *   3. the LAGGARD file: every event_id % 100 == 7 re-arrives 25 days
    *      late (negated event_id, everything else intact). A laggard is
    *      DROPPED by the day-window aggregation iff its window can no
    *      longer change — window end ≤ watermark — i.e. exactly the rows
    *      with day(ts − 25 d) + 1 d ≤ max(ts) − 30 d; on this data both
    *      classes are populated (laggards from the last ~6 days survive);
    *   4./5. the two far-future sentinel files (max+31 d, max+32 d — the
    *      replayTwoStreams discipline: the second batch carries the first's
    *      watermark advance), so every REAL window's append-mode emission
    *      happens in a DATA batch. The sentinels' own windows never emit —
    *      the watermark never passes them — so no sink-side filtering is
    *      needed.
    *
    * Append mode is the point: Complete mode never drops late rows (state
    * is all retained), so this is the one leg where the watermark actually
    * deletes data, and the DuckDB oracle encodes the same cutoff
    * analytically.
    */
  def lateDropFromSnapshot(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame = {
    import spark.implicits._
    val staging = java.nio.file.Files.createTempDirectory("graft-stream-late")
    try {
      val ev = graft.model.Tables.events(spark, sfDir)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
      ev.coalesce(1).write.mode("overwrite").parquet(staging.toString)
      def appendFile(df: DataFrame, bumpMs: Long): Unit = {
        val before = Option(staging.toFile.listFiles())
          .map(_.map(_.getName).toSet).getOrElse(Set.empty[String])
        df.coalesce(1).write.mode("append").parquet(staging.toString)
        Option(staging.toFile.listFiles()).foreach(_.foreach { f =>
          if (!before(f.getName) && f.getName.endsWith(".parquet")) {
            val target = System.currentTimeMillis() + bumpMs
            if (!f.setLastModified(target)) {
              java.nio.file.Files.setLastModifiedTime(f.toPath,
                java.nio.file.attribute.FileTime.fromMillis(target))
            }
          }
        })
      }
      val maxTs = ev.agg(max("ts")).head().getTimestamp(0)
      appendFile(Seq((-999L, maxTs, -3L, "click", 0.0, null: String))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
        60000L)
      appendFile(ev.filter(col("event_id") % 100 === 7)
        .select((-col("event_id")).as("event_id"),
          (col("ts") - expr("INTERVAL 25 DAYS")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props")),
        120000L)
      Seq((31L, "click", -1L), (32L, "purchase", -2L)).zipWithIndex.foreach {
        case ((days, typ, uid), i) =>
          val ts = new java.sql.Timestamp(maxTs.getTime + days * 86400000L)
          appendFile(Seq((-1000L - i, ts, uid, typ, 0.0, null: String))
            .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
            (i + 3) * 60000L)
      }
      // 6. POST-EVICTION straggler: after the sentinels pushed the
      //    watermark past every real window (their state emitted and
      //    evicted), one more 'view' row arrives at min(ts). It must be
      //    SILENTLY DROPPED — not re-open its window and re-emit a
      //    duplicate (ws, event_type) sink row. The oracle is unchanged
      //    (the row contributes nothing); StreamingSpec pins the
      //    no-duplicate-keys property.
      val minTs = ev.agg(min("ts")).head().getTimestamp(0)
      appendFile(Seq((-2000L, minTs, -4L, "view", 0.0, null: String))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
        300000L)
      val schema = spark.read.parquet(staging.toString).schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staging.toString)
      val sink = s"graft_stream_late_${sinkSeq.incrementAndGet()}"
      val q = withLateTolerance(src)
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"))
        .writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(sink)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(sink)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(staging).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** REAL streaming execution of a stream-static enrichment join: the event
    * stream joins the static customer dim on user_id, then aggregates
    * tumbling-window counts per market segment. Stream-static equi-joins are
    * STATELESS — the static side is planned per micro-batch (broadcast here:
    * the dim is far under the autoBroadcastJoinThreshold, and with AQE
    * disabled under streaming the size estimate decides, no hint needed) and
    * no join state accumulates. The windowed aggregation after it is the
    * only stateful operator, watermark-bounded as everywhere else.
    */
  def enrichedFromSnapshot(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame = {
    val dim = graft.model.Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    replaySnapshot(spark, sfDir, "graft-stream-enrich", OutputMode.Complete()) {
      st =>
        st.join(dim, Seq("user_id"))
          .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_v"))
          .select(col("window.start").as("ws"), col("c_mktsegment"), col("n"),
            col("sum_v"))
    }
  }

  /** REAL streaming execution of stateful dedup over the events snapshot:
    * watermarked `dropDuplicates` on (user_id, event_type) replayed as a
    * file stream, appended to the memory sink. Only the KEY columns are
    * emitted — which arriving row survives per key is micro-batch-order
    * dependent, but the key set is exactly the batch DISTINCT, so the
    * result is deterministic and batch-oracle-checkable. State is
    * watermark-bounded and sharded by key (O(window), not O(history)).
    */
  def dedupFromSnapshot(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame =
    replaySnapshot(spark, sfDir, "graft-stream-dedup", OutputMode.Append())(
      _.dropDuplicates("user_id", "event_type")
        .select(col("user_id"), col("event_type")))

  /** REAL streaming execution of [[runningUserStats]] — the
    * flatMapGroupsWithState surface under the micro-batch engine, declared
    * and oracle-checked: per-user running (count, exact decimal total)
    * state evolves across micro-batches in Update mode, the memory sink
    * accumulates every per-batch update row, and the FINAL state per user
    * (the max-n row — n is strictly monotone per key) must equal the batch
    * GROUP BY. Exact decimals make the running sum arrival-order-proof.
    */
  def runningFromSnapshot(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame =
    replaySnapshot(spark, sfDir, "graft-stream-running", OutputMode.Update()) {
      st => runningUserStats(st).toDF("user_id", "n", "total")
    }
      .groupBy("user_id")
      .agg(max("n").as("n"), max_by(col("total"), col("n")).as("total"))

  /** Stateful dedup on event_id under watermark (streaming state bounded by
    * the tolerance window — at scale state size is O(events within
    * tolerance), not O(history)).
    */
  def dedupStream(stream: DataFrame, tolerance: String = "30 days"): DataFrame =
    stream.withWatermark("ts", tolerance)
      .dropDuplicates("event_id")

  /** Per-document MinHash LSH band signatures as a STATELESS projection —
    * the streaming formulation of Dedup.minhashBands (same 3-token
    * shingles, same md5-60-bit hash, same 16 xor-permutations folded into
    * 4 bands of 4, same "-"-joined signature string; the shared DuckDB
    * `bands` CTE hash-pins the two against drift). The batch version
    * aggregates `min` over exploded shingle ROWS (map-side combine is the
    * right shape for a batch corpus scan); a stream can't re-aggregate per
    * key, so here each minhash is an `array_min` over a per-row hash array
    * — zero state, pure whole-stage-codegen projection. The hash array is
    * projected ONCE per row (`hvs`) before the 16 per-permutation lambdas
    * read it: a Column val referenced inside a HOF lambda re-inlines its
    * whole tree per element (the q_bpe 9× trap), which here would mean
    * 16 × |shingles| md5 evaluations instead of |shingles|.
    */
  def minhashBandSignatures(docs: DataFrame): DataFrame = {
    import graft.ops.Exprs.{md5Long, md5LongLocal, wordShingles}
    val withHvs = docs
      .select(col("*"),
        transform(wordShingles(split(col("text"), " "), 3),
          s => md5Long(s)).as("hvs"))
    val mhCols = (0 until 16).map(j =>
      array_min(transform(col("hvs"),
        h => h.bitwiseXOR(lit(md5LongLocal(s"perm:$j"))))).as(s"h$j"))
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b.toLong).as("band"),
        concat_ws("-", (0 until 4).map(k => col(s"h${b * 4 + k}")
          .cast("string")): _*).as("sig"))
    }
    withHvs.select(col("doc_id") +: col("ts") +: mhCols: _*)
      .select(col("doc_id"), col("ts"),
        explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("ts"), col("bs.band").as("band"),
        col("bs.sig").as("sig"))
  }

  /** REAL streaming NEAR-dup dedup (VERDICT r12 ask #5 — the one
    * LLM-pipeline operator q_stream_dedup's exact-key state didn't cover):
    * documents replay as a file stream, each computes its LSH band
    * signatures statelessly ([[minhashBandSignatures]]), and
    * `dropDuplicatesWithinWatermark` keeps ONE row per (band, signature)
    * bucket — the streaming build of the LSH dedup index, where a new
    * document is a near-dup candidate iff some band key is already taken.
    * Only the KEY columns are emitted (q_stream_dedup's discipline: which
    * document claims a bucket is arrival-order-dependent; the bucket SET
    * is the batch DISTINCT over the same `bands` derivation, which is what
    * the DuckDB oracle checks). Documents carry no event time, so the
    * replay synthesizes one inside the tolerance window (doc_id-derived,
    * deterministic) — at scale this is the ingest timestamp, and state is
    * O(band keys within the watermark), not O(corpus history).
    */
  def minhashDedupFromSnapshot(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame = {
    val staging = java.nio.file.Files.createTempDirectory("graft-stream-mhdedup")
    try {
      graft.model.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"),
          timestamp_seconds(lit(1700000000L) + pmod(col("doc_id"), lit(3600L)))
            .as("ts"))
        .repartition(4)
        .write.mode("overwrite").parquet(staging.toString)
      val schema = spark.read.parquet(staging.toString).schema
      val src = spark.readStream.schema(schema).parquet(staging.toString)
      val sink = s"graft_stream_mhdedup_${sinkSeq.incrementAndGet()}"
      val q = minhashBandSignatures(src)
        .withWatermark("ts", "30 days")
        .dropDuplicatesWithinWatermark("band", "sig")
        .select(col("band"), col("sig"))
        .writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(sink)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(sink)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(staging).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** Spark 4 `transformWithState` processor: per-user running (count,
    * exact decimal total) in a RocksDB-backed `ValueState`. The decimal
    * rides as a plain-string so the state encoder stays a simple
    * (Long, String) product — exactness lives in BigDecimal arithmetic,
    * not in encoder scale negotiation. Top-level class (not a closure)
    * so task serialization captures no enclosing state.
    */
  final class RunningTotalsProcessor
      extends StatefulProcessor[Long, (Long, String), (Long, Long, String)] {
    @transient private var st: ValueState[(Long, String)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState("running",
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING), TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[(Long, String)],
        tv: TimerValues): Iterator[(Long, Long, String)] = {
      val (n0, tot0) = if (st.exists()) st.get() else (0L, "0.00")
      var n = n0
      var dec = new java.math.BigDecimal(tot0)
      rows.foreach { r => n += 1; dec = dec.add(new java.math.BigDecimal(r._2)) }
      val out = dec.setScale(2).toPlainString
      st.update((n, out))
      Iterator((key, n, out))
    }
  }

  /** REAL streaming execution of the Spark 4 `transformWithState` surface —
    * the arbitrary-state API that supersedes flatMapGroupsWithState: typed
    * `ValueState` in the RocksDB state store, Update-mode emissions per
    * micro-batch, final per-key state equal to the batch GROUP BY (the
    * same contract q_stream_running pins for the legacy API, so the two
    * declared queries prove old and new state APIs agree bit-for-bit).
    * The provider conf is set for the duration of the run and restored —
    * transformWithState requires the RocksDB provider.
    */
  def transformWithStateFromSnapshot(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      replaySnapshot(spark, sfDir, "graft-stream-tws", OutputMode.Update()) {
        st =>
          import st.sparkSession.implicits._
          st.select(col("user_id").cast("long"),
            col("value").cast("decimal(18,2)").cast("string"))
            .as[(Long, String)]
            .groupByKey(_._1)
            .transformWithState(new RunningTotalsProcessor,
              TimeMode.None(), OutputMode.Update())
            .toDF("user_id", "n", "total")
      }
        .groupBy("user_id")
        .agg(max("n").as("n"), max_by(col("total"), col("n")).as("total"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** Spark 4 `transformWithState` processor #2 (round 13): per-user exact
    * top-k events by (value DESC, event_id ASC) in a RocksDB-backed
    * `ListState` — the state SHAPE [[RunningTotalsProcessor]]'s ValueState
    * doesn't exercise (list get/put round-trips through the store). The
    * merge (union, re-sort, truncate) is associative and commutative under
    * the deterministic tie-break, so the final list is independent of
    * micro-batch boundaries and arrival order — the property that lets the
    * batch oracle check a streamed top-k at all. State is O(k) per key at
    * any stream length; `seen` makes per-batch emissions monotone so the
    * sink-side max_by picks the final list.
    */
  final class TopKEventsProcessor(k: Int)
      extends StatefulProcessor[Long, (Long, Double, Long), (Long, Long, String)] {
    @transient private var st: ListState[(Double, Long)] = _
    @transient private var seen: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getListState("topk",
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong),
        TTLConfig.NONE)
      seen = getHandle.getValueState("seen", Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[(Long, Double, Long)],
        tv: TimerValues): Iterator[(Long, Long, String)] = {
      val incoming = rows.map(r => (r._2, r._3)).toList
      val merged = (st.get().toList ++ incoming)
        .sortBy { case (v, id) => (-v, id) }.take(k)
      st.clear()
      st.appendList(merged.toArray)
      val n = (if (seen.exists()) seen.get() else 0L) + incoming.size
      seen.update(n)
      Iterator((key, n, merged.map(_._2).mkString(",")))
    }
  }

  /** REAL streaming top-k per key over the Spark 4 ListState surface; final
    * per-key list equals the batch window top-3. Same RocksDB-provider
    * scoping as [[transformWithStateFromSnapshot]].
    */
  def topkFromSnapshot(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      replaySnapshot(spark, sfDir, "graft-stream-topk", OutputMode.Update()) {
        st =>
          import st.sparkSession.implicits._
          st.select(col("user_id").cast("long"), col("value").cast("double"),
            col("event_id").cast("long"))
            .as[(Long, Double, Long)]
            .groupByKey(_._1)
            .transformWithState(new TopKEventsProcessor(3),
              TimeMode.None(), OutputMode.Update())
            .toDF("user_id", "n", "ids")
      }
        .groupBy("user_id")
        .agg(max_by(col("ids"), col("n")).as("ids"))
        .select(col("user_id"),
          posexplode(split(col("ids"), ",")).as(Seq("pos", "eid")))
        .select(col("user_id"), (col("pos") + 1).cast("long").as("rank"),
          col("eid").cast("long").as("event_id"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** Recovery-capable form of the streaming MERGE ingest — the
    * failure-injection path StreamCheck drives (VERDICT r9 ask #7). Same
    * latest-wins fold as [[upsertFromSnapshot]], with two changes that make
    * the run checkpointable and crash-idempotent:
    *
    *  - the generation ledger is keyed by BATCH ID and derived from the
    *    generation directory itself (never from driver memory): each
    *    foreachBatch merges its batch into the newest generation with
    *    id < batchId and OVERWRITES `gen-<batchId>` — so a batch replayed
    *    after a crash (its offsets never committed) rewrites its own
    *    generation identically, and a half-written generation from a kill
    *    is never read (reads only touch ids strictly below the batch
    *    being processed, all of which committed their offsets);
    *  - the query runs under a real `checkpointLocation`, so a fresh query
    *    object on the same checkpoint resumes from saved source offsets.
    *
    * `stopAfterBatches = Some(k)` injects the failure: a poller stops the
    * query — interrupting the in-flight micro-batch — once k batches have
    * reported progress. Run one leg with the kill, then a second leg with
    * `None` on the same checkpoint/genRoot; [[mergedGenTable]] reads the
    * final table for comparison against an uninterrupted run.
    */
  def recoverableMergeLeg(spark: org.apache.spark.sql.SparkSession,
      staged: String, ckpt: String, genRoot: String,
      stopAfterBatches: Option[Int]): Int = {
    val schema = spark.read.parquet(staged).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    def gens(): Seq[(Long, String)] = {
      val d = new java.io.File(genRoot)
      Option(d.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
        .map(f => (f.getName.stripPrefix("gen-").toLong, f.getPath))
    }
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prior = gens().filter(_._1 < batchId).sortBy(-_._1).headOption
        val bl = reduceLatest(batch)
        val merged = prior match {
          case Some((_, p)) => spark.read.parquet(p).unionByName(bl)
            .groupBy("user_id").agg(max(col("pk")).as("pk"))
          case None => bl
        }
        merged.write.mode("overwrite").parquet(s"$genRoot/gen-$batchId")
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    stopAfterBatches.foreach { k =>
      while (q.isActive &&
          q.recentProgress.map(_.batchId).distinct.length < k)
        Thread.sleep(20)
      if (q.isActive) q.stop() // interrupts the in-flight batch
    }
    q.awaitTermination()
    q.recentProgress.map(_.batchId).distinct.length
  }

  /** Final table of a [[recoverableMergeLeg]] run: the max-id generation,
    * projected like the declared upsert result.
    *
    * `tombstones = true` serves the CDC view instead ([[cdcFromSnapshot]]'s
    * read-time rule): a user whose LATEST operation is a delete
    * (`pk.del`, riding inside the ordering struct the ledger maxes over)
    * is absent from the served table. The ledger itself is identical for
    * both views — the tombstone flag survives every intermediate merge and
    * every checkpoint replay because it is DATA under the same
    * associative latest-wins fold, which is exactly what StreamCheck's
    * CDC failure-injection leg verifies.
    */
  def mergedGenTable(spark: org.apache.spark.sql.SparkSession,
      genRoot: String, tombstones: Boolean = false): DataFrame = {
    val d = new java.io.File(genRoot)
    val last = Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
      .maxBy(_.getName.stripPrefix("gen-").toLong)
    val table = spark.read.parquet(last.getPath)
    (if (tombstones) table.filter(!col("pk.del")) else table)
      .select(col("user_id"), col("pk.event_id").as("event_id"),
        col("pk.event_type").as("event_type"), col("pk.value").as("value"),
        col("pk.ts").as("ts"))
  }

  /** Count of users suppressed by the tombstone rule in a ledger's final
    * generation — StreamCheck records it so the CDC recovery comparison is
    * visibly non-vacuous (a corpus with zero tombstoned users would make
    * the upsert and CDC views identical).
    */
  def tombstonedUsers(spark: org.apache.spark.sql.SparkSession,
      genRoot: String): Long = {
    val d = new java.io.File(genRoot)
    val last = Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
      .maxBy(_.getName.stripPrefix("gen-").toLong)
    spark.read.parquet(last.getPath).filter(col("pk.del")).count()
  }

  /** Per-key running state carried across micro-batches. Sums are exact
    * decimals so the running total is order-insensitive (batch↔stream
    * comparable bit-for-bit).
    */
  final case class UserRunning(n: Long, sum: java.math.BigDecimal)

  /** Custom arbitrary state via `flatMapGroupsWithState`: per-user running
    * (event count, exact value total), emitting the updated state each
    * micro-batch (Update mode). The same call on a batch frame collapses to
    * one "micro-batch" and yields the final totals directly — which is what
    * the equivalence spec exploits. State is partitioned by user_id, so at
    * scale it shards across executors with the shuffle; per-key size is
    * O(1).
    */
  def runningUserStats(events: DataFrame): Dataset[(Long, Long, String)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("value").cast("decimal(18,2)"),
        col("ts"))
      .as[(Long, java.math.BigDecimal, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long,
         rows: Iterator[(Long, java.math.BigDecimal, java.sql.Timestamp)],
         state: GroupState[UserRunning]) =>
          var s = state.getOption
            .getOrElse(UserRunning(0L, java.math.BigDecimal.ZERO))
          rows.foreach(r => s = UserRunning(s.n + 1, s.sum.add(r._2)))
          state.update(s)
          Iterator((uid, s.n, s.sum.setScale(2).toPlainString))
      }
  }
}

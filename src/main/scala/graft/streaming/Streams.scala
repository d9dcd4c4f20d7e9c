package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Sliding-window counts (overlapping windows). */
  def slidingCounts(events: DataFrame, width: String = "1 hour",
      slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

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

  /** REAL streaming execution of the tumbling-window aggregation over the
    * events snapshot: stage the table as a multi-file parquet directory,
    * replay it as a file stream (watermarked), run to completion under
    * `Trigger.AvailableNow`, and return the final result from the memory
    * sink. This is the declared-query form of the streaming surface — the
    * same rows as the batch `groupBy(window(...))`, produced by the
    * micro-batch engine, so the batch DuckDB oracle verifies a streaming
    * run. At scale the memory sink becomes a real table sink and
    * AvailableNow becomes the scheduled trigger; the plan is unchanged.
    */
  def tumblingFromSnapshot(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame = {
    val staging = java.nio.file.Files
      .createTempDirectory("graft-stream-exec").toString
    graft.model.Tables.events(spark, sfDir)
      .repartition(4) // several files → several input splits to micro-batch
      .write.mode("overwrite").parquet(staging)
    val schema = spark.read.parquet(staging).schema
    val src = spark.readStream.schema(schema).parquet(staging)
    val q = tumblingCounts(withLateTolerance(src))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("graft_stream_tumbling")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table("graft_stream_tumbling")
  }

  /** REAL streaming execution of session-window aggregation — gap-merged
    * session state, the most complex streaming state surface: sessions
    * grow/merge as events arrive across micro-batches.
    */
  def sessionsFromSnapshot(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame = {
    val staging = java.nio.file.Files
      .createTempDirectory("graft-stream-session").toString
    graft.model.Tables.events(spark, sfDir)
      .repartition(4)
      .write.mode("overwrite").parquet(staging)
    val schema = spark.read.parquet(staging).schema
    val src = spark.readStream.schema(schema).parquet(staging)
    val q = sessionCounts(withLateTolerance(src))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("graft_stream_session")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table("graft_stream_session")
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
      sfDir: String): DataFrame = {
    val staging = java.nio.file.Files
      .createTempDirectory("graft-stream-dedup").toString
    graft.model.Tables.events(spark, sfDir)
      .repartition(4)
      .write.mode("overwrite").parquet(staging)
    val schema = spark.read.parquet(staging).schema
    val src = spark.readStream.schema(schema).parquet(staging)
    val q = withLateTolerance(src)
      .dropDuplicates("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("graft_stream_dedup")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table("graft_stream_dedup")
  }

  /** Stateful dedup on event_id under watermark (streaming state bounded by
    * the tolerance window — at scale state size is O(events within
    * tolerance), not O(history)).
    */
  def dedupStream(stream: DataFrame, tolerance: String = "30 days"): DataFrame =
    stream.withWatermark("ts", tolerance)
      .dropDuplicates("event_id")

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

package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Streams

/** Batch↔stream equivalence for the streaming surface (SURVEY.md §5.2.4):
  * the same transform applied to `events` as a file stream must produce the
  * batch result once all data is processed.
  */
class StreamingSpec extends SparkTestBase {

  /** events written once to a temp dir so readStream can replay it. */
  lazy val stagingDir: String = {
    val dir = Files.createTempDirectory("graft-stream").toString
    graft.model.Tables.events(spark, sfDir)
      .repartition(4) // several files → several micro-batched splits
      .write.mode("overwrite").parquet(dir)
    dir
  }

  def streamEvents(): DataFrame = {
    val schema = spark.read.parquet(stagingDir).schema
    spark.readStream.schema(schema).parquet(stagingDir)
  }

  private def runToMemory(df: DataFrame, name: String, mode: String): DataFrame = {
    val q = df.writeStream.outputMode(mode)
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  private def asSortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  test("tumbling window stream == batch groupBy(window)") {
    val batch = Streams.tumblingCounts(graft.model.Tables.events(spark, sfDir))
    val stream = runToMemory(
      Streams.tumblingCounts(Streams.withLateTolerance(streamEvents())),
      "t_tumbling", "complete")
    assert(asSortedRows(stream) == asSortedRows(batch))
  }

  test("sliding window stream == batch") {
    val batch = Streams.slidingCounts(graft.model.Tables.events(spark, sfDir))
    val stream = runToMemory(
      Streams.slidingCounts(Streams.withLateTolerance(streamEvents())),
      "t_sliding", "complete")
    assert(asSortedRows(stream) == asSortedRows(batch))
  }

  test("session window stream == batch") {
    val batch = Streams.sessionCounts(graft.model.Tables.events(spark, sfDir))
    val stream = runToMemory(
      Streams.sessionCounts(Streams.withLateTolerance(streamEvents())),
      "t_session", "complete")
    assert(asSortedRows(stream) == asSortedRows(batch))
  }

  test("streaming dedup keeps one row per event_id") {
    val stream = runToMemory(Streams.dedupStream(streamEvents()),
      "t_dedup", "append")
    val batchCount = graft.model.Tables.events(spark, sfDir)
      .select("event_id").distinct().count()
    assert(stream.count() == batchCount)
    assert(stream.select("event_id").distinct().count() == batchCount)
  }

  test("flatMapGroupsWithState running stats: final stream state == batch totals") {
    // one file per micro-batch so state genuinely carries across batches
    val schema = spark.read.parquet(stagingDir).schema
    val multiBatch = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stagingDir)
    val stream = runToMemory(
      Streams.runningUserStats(multiBatch).toDF("user_id", "n", "sum_v"),
      "t_running", "update")
    // per user, the last update (largest n) is the final running state
    val finalState = stream.collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) => val r = rows.maxBy(_.getLong(1))
        (u, r.getLong(1), r.getString(2)) }
      .toSet
    val batch = Streams.runningUserStats(
      graft.model.Tables.events(spark, sfDir)).collect().toSet
    assert(batch.nonEmpty)
    assert(finalState == batch)
  }

  test("watermark late-drop: laggards beyond tolerance are really deleted") {
    import org.apache.spark.sql.functions._
    val ev = graft.model.Tables.events(spark, sfDir)
      .select("event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
    val maxMs = ev.map(_._2).max
    val dayMs = 86400000L
    // the analytic drop rule lateDropFromSnapshot declares: a laggard
    // (ts − 25 d) survives iff its day-window END exceeds max − 30 d
    val laggards = ev.filter(_._1 % 100 == 7).map(_._2 - 25 * dayMs)
    val wm = maxMs - 30 * dayMs
    val kept = laggards.count(t => (t / dayMs) * dayMs + dayMs > wm)
    val dropped = laggards.length - kept
    // both classes must actually be exercised by this corpus
    assert(kept > 0 && dropped > 0, s"kept=$kept dropped=$dropped")
    // conservation: sink mass = base events + 1 nudge + kept laggards;
    // the dropped laggards are ABSENT from the streaming result
    val rows = SparkEntry.queries("q_stream_late")(spark, sfDir).collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total === ev.length.toLong + 1L + kept,
      s"total=$total base=${ev.length} kept=$kept dropped=$dropped")
    // the post-eviction straggler (a min-ts row delivered after its
    // window was emitted and evicted) must NOT re-emit a duplicate
    // window row — every (ws, event_type) key appears exactly once
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length === keys.length,
      "duplicate window emission after state eviction")
  }
}

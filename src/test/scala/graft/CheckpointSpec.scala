package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Streams

/** Checkpointed restart: the production property Structured Streaming exists
  * for — a query stopped after processing part of its input and STARTED
  * AGAIN with the same checkpoint resumes from saved offsets + state and
  * lands on exactly the batch answer, with windowed aggregation state
  * carried across the restart. No other spec stops/restarts a query;
  * equivalence specs run each stream in one shot.
  */
class CheckpointSpec extends SparkTestBase {

  private def runOnce(src: DataFrame, ckpt: String, sink: String): Unit = {
    val q = Streams.tumblingCounts(Streams.withLateTolerance(src))
      .writeStream.outputMode("complete")
      .format("memory").queryName(sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("tumbling aggregation survives a stop + checkpointed restart") {
    val events = graft.model.Tables.events(spark, sfDir).cache()
    val staging = Files.createTempDirectory("graft-ckpt-staging").toString
    val ckpt = Files.createTempDirectory("graft-ckpt-state").toString

    // first half of the input, then a FULL stop (query object discarded)
    events.filter(col("event_id") % 2 === 0)
      .write.mode("overwrite").parquet(staging)
    val schema = spark.read.parquet(staging).schema
    runOnce(spark.readStream.schema(schema).parquet(staging), ckpt, "ckpt_t")
    val afterHalf = spark.table("ckpt_t").agg(sum("n")).head.getLong(0)
    assert(afterHalf > 0 && afterHalf < events.count(),
      s"first run should process only the first half, saw $afterHalf rows")

    // second half lands in the SAME directory; a fresh query with the same
    // checkpoint must resume from saved offsets (not reprocess, not skip)
    events.filter(col("event_id") % 2 === 1)
      .write.mode("append").parquet(staging)
    runOnce(spark.readStream.schema(schema).parquet(staging), ckpt, "ckpt_t")

    val resumed = spark.table("ckpt_t")
      .select(date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("event_type"), col("n"), col("sum_v"))
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val batch = Streams.tumblingCounts(events)
      .select(date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("event_type"), col("n"), col("sum_v"))
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(resumed == batch,
      "restarted stream diverged from the batch answer")
    events.unpersist()
    // state dir must actually have been used (offsets + state both written)
    assert(Files.exists(Paths.get(ckpt, "offsets")) &&
      Files.exists(Paths.get(ckpt, "state")),
      "checkpoint dir missing offsets/state — the restart proved nothing")
  }
}

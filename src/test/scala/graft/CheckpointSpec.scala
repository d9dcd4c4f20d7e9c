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

  test("transformWithState survives a stop + checkpointed restart (RocksDB state)") {
    val events = graft.model.Tables.events(spark, sfDir).cache()
    val staging = Files.createTempDirectory("graft-tws-staging").toString
    val ckpt = Files.createTempDirectory("graft-tws-state").toString
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // memory sink cannot recover a checkpoint outside Complete mode, so
      // the Update-mode rows land in a driver-side buffer via foreachBatch
      // (a recovery-capable sink)
      val buf = scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
      def runOnceTws(): Unit = {
        val schema = spark.read.parquet(staging).schema
        val src = spark.readStream.schema(schema).parquet(staging)
        import spark.implicits._
        val q = src.select(col("user_id").cast("long"),
            col("value").cast("decimal(18,2)").cast("string"))
          .as[(Long, String)]
          .groupByKey(_._1)
          .transformWithState(new Streams.RunningTotalsProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .toDF("user_id", "n", "total")
          .writeStream.outputMode("update")
          .foreachBatch { (b: DataFrame, _: Long) =>
            buf.synchronized {
              buf ++= b.collect()
                .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
            }
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      events.filter(col("event_id") % 2 === 0)
        .write.mode("overwrite").parquet(staging)
      runOnceTws()
      events.filter(col("event_id") % 2 === 1)
        .write.mode("append").parquet(staging)
      // fresh query, same checkpoint: ValueState must resume, so second-half
      // updates CONTINUE the first half's running totals
      buf.clear()
      runOnceTws()
      val resumed = buf.groupBy(_._1).map { case (u, rows) =>
        u -> rows.map(r => (r._2, r._3)).maxBy(_._1)
      }
      val secondHalfUsers = events.filter(col("event_id") % 2 === 1)
        .select("user_id").distinct().collect().map(_.getLong(0)).toSet
      val batch = events
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
            .cast("string").as("total"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
        .toMap
      // every user touched after the restart must show FULL-history totals —
      // only possible if the first run's state was recovered
      secondHalfUsers.foreach { u =>
        assert(resumed.contains(u), s"user $u missing from restarted output")
        assert(resumed(u) == batch(u),
          s"user $u: restarted state ${resumed(u)} != batch ${batch(u)}")
      }
      assert(Files.exists(Paths.get(ckpt, "state")),
        "checkpoint dir missing state — the restart proved nothing")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
      events.unpersist()
      ()
    }
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

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev utility (not part of the library surface): measure the REAL
  * streaming executions at scale (VERDICT r7 ask #6) — rows/s and
  * state-store size per micro-batch, captured from StreamingQueryProgress
  * while the declared streaming queries replay the events table.
  *
  * Usage: sbt 'runMain graft.StreamCheck [dir ...]'
  * Default: /root/testdata/sf0.1 and tmp/sf1 (from ScaleGen).
  * Writes tools/streamcheck.json.
  *
  * The claim under test: streaming state is bounded by KEY CARDINALITY
  * (distinct users), not event count — the final batch's state rows must
  * equal the user count while cumulative input keeps growing, and state
  * bytes must scale with users, not with replayed events.
  */
object StreamCheck {

  val Queries = Seq("q_stream_upsert", "q_stream_tws", "q_stream_cdc")

  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-batch progress capture: (batchId, inputRows, procRows/s,
    // batchDurationMs, stateRows, stateBytes)
    case class Batch(id: Long, in: Long, rps: Double, ms: Long,
        stateRows: Long, stateBytes: Long)
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Batch]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val st = Option(p.stateOperators).map(_.toSeq).getOrElse(Seq.empty)
        batches.add(Batch(p.batchId, p.numInputRows,
          p.processedRowsPerSecond,
          Option(p.durationMs.get("triggerExecution"))
            .map(_.longValue).getOrElse(-1L),
          st.map(_.numRowsTotal).sum, st.map(_.memoryUsedBytes).sum))
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    def fmt(d: Double) = f"$d%.1f"
    val records = for (dir <- dirs; name <- Queries) yield {
      batches.clear()
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      // drain the async listener bus: progress events for the final batch
      // can trail the awaitTermination return by a beat
      Thread.sleep(500)
      val bs = batches.toArray(Array.empty[Batch]).sortBy(_.id)
      val totalIn = bs.map(_.in).sum
      val lastState = bs.lastOption.map(_.stateRows).getOrElse(0L)
      System.err.println(
        f"[streamcheck] $name%-16s $dir%-22s batches=${bs.length}%2d " +
          f"events=$totalIn%7d out=$rows%6d wall=${fmt(wall)}%6ss " +
          f"stateRows(last)=$lastState%6d")
      val bj = bs.map(b =>
        s"""{"batch":${b.id},"input_rows":${b.in},""" +
          s""""rows_per_sec":${fmt(b.rps)},"ms":${b.ms},""" +
          s""""state_rows":${b.stateRows},"state_bytes":${b.stateBytes}}""")
        .mkString("[", ",", "]")
      s"""{"query":"$name","dir":"$dir","result_rows":$rows,""" +
        s""""wall_sec":${fmt(wall)},"total_input_rows":$totalIn,""" +
        s""""final_state_rows":$lastState,"batches":$bj}"""
    }
    // ── failure injection (VERDICT r9 ask #7): kill mid-batch, resume from
    //    the checkpoint, compare post-resume state to the uninterrupted
    //    run. Driven at the LARGEST dir (1M events when tmp/sf1 exists). ───
    val recovery = recoveryRuns(spark, dirs.last)
    // the 10M-event transformWithState leg (VERDICT r11 ask #7) — runs
    // against tmp/sf10 (ScaleGen ×100) when present, records a skip when
    // not, so the artifact never silently omits the scale point
    val tws10mDir = sys.env.getOrElse("SPARK_GRAFT_TWS10M_DIR", "tmp/sf10")
    val tws10mRec = tws10m(spark, tws10mDir)

    val record =
      s"""{"runs":${records.mkString("[", ",", "]")},""" +
        s""""recovery":$recovery,"tws_10m":$tws10mRec}"""
    println(record)
    val out = ToolPaths.resolve("tools/streamcheck.json")
    val w = new java.io.PrintWriter(out)
    try w.println(record) finally w.close()
    System.err.println(s"[streamcheck] wrote $out")
    spark.stop()
  }

  /** Optionally kill a running query once `stopAfter` distinct batches
    * have reported progress, await termination, and return the distinct
    * batch count — the shared injection/measure step of every recovery
    * leg. Caveat shared by all callers: `recentProgress` retains only the
    * last `spark.sql.streaming.numRecentProgressUpdates` entries (default
    * 100), so the count is valid only for legs under 100 batches (ours
    * replay 16 files).
    */
  private def stopAndCount(
      q: org.apache.spark.sql.streaming.StreamingQuery,
      stopAfter: Option[Int]): Int = {
    stopAfter.foreach { k =>
      while (q.isActive &&
          q.recentProgress.map(_.batchId).distinct.length < k)
        Thread.sleep(20)
      if (q.isActive) q.stop()
    }
    q.awaitTermination()
    q.recentProgress.map(_.batchId).distinct.length
  }

  /** Kill-mid-batch + checkpoint-resume for the three durable-state shapes:
    * the generation-ledger MERGE (q_stream_upsert's discipline, via
    * Streams.recoverableMergeLeg), its CDC tombstone view (q_stream_cdc's
    * read-time delete rule over the same ledger, killed at a different
    * batch), and transformWithState RocksDB state
    * (q_stream_tws's processor). Each: run uninterrupted → truth; then a
    * fresh checkpoint, kill after K batches (stop() interrupts the
    * in-flight micro-batch), resume with a NEW query object on the same
    * checkpoint; final state must equal the uninterrupted run exactly.
    */
  private def recoveryRuns(spark: SparkSession, dir: String): String = {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val killAfter = 4
    val staging = java.nio.file.Files.createTempDirectory("graft-recovery")
    try {
      // 16 files → 16 micro-batches at maxFilesPerTrigger=1: enough room
      // for a mid-run kill at batch 4-5
      graft.model.Tables.events(spark, dir)
        .repartition(16).write.mode("overwrite").parquet(staging.toString)
      val events = spark.read.parquet(staging.toString)
      val nEvents = events.count()

      // ── MERGE ledger ────────────────────────────────────────────────────
      def hashOf(df: DataFrame): String = {
        val h = df.orderBy("user_id")
          .select(concat_ws("|", col("user_id"), col("event_id"),
            col("event_type"), col("value"), col("ts").cast("string")))
          .collect().map(_.getString(0)).mkString("\n")
        java.security.MessageDigest.getInstance("MD5")
          .digest(h.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
      def freshDirs() = (
        java.nio.file.Files.createTempDirectory("graft-rec-ckpt").toString,
        java.nio.file.Files.createTempDirectory("graft-rec-gen").toString)
      val (ck0, gen0) = freshDirs()
      val t0 = System.nanoTime()
      val plainBatches = graft.streaming.Streams.recoverableMergeLeg(
        spark, staging.toString, ck0, gen0, None)
      val plainWall = (System.nanoTime() - t0) / 1e9
      val truthHash = hashOf(graft.streaming.Streams.mergedGenTable(spark, gen0))
      val (ck1, gen1) = freshDirs()
      val t1 = System.nanoTime()
      val killedBatches = graft.streaming.Streams.recoverableMergeLeg(
        spark, staging.toString, ck1, gen1, Some(killAfter))
      val resumedBatches = graft.streaming.Streams.recoverableMergeLeg(
        spark, staging.toString, ck1, gen1, None)
      val recWall = (System.nanoTime() - t1) / 1e9
      val recHash = hashOf(graft.streaming.Streams.mergedGenTable(spark, gen1))
      val mergeEqual = recHash == truthHash
      System.err.println(
        f"[streamcheck] recovery merge  $dir%-22s events=$nEvents%7d " +
          f"killed_after=$killedBatches resumed=$resumedBatches " +
          f"equal=$mergeEqual")

      // ── CDC tombstone path (VERDICT r10 ask #2): the delete semantics
      //    across a checkpoint resume. Same ledger fold — the tombstone
      //    flag is DATA inside the max'd ordering struct — so a tombstone
      //    processed pre-kill must still suppress its user post-resume no
      //    matter which micro-batch replays. Truth = the CDC view of the
      //    UNINTERRUPTED ledger (gen0); the injected run kills at a
      //    DIFFERENT batch than the merge leg so a different replay
      //    boundary is exercised; tombstoned-user counts are recorded so
      //    the comparison is visibly non-vacuous. ─────────────────────────
      val killAfterCdc = killAfter + 3
      val cdcTruthHash =
        hashOf(graft.streaming.Streams.mergedGenTable(spark, gen0,
          tombstones = true))
      val (ck2, gen2) = freshDirs()
      val t2 = System.nanoTime()
      val cdcKilled = graft.streaming.Streams.recoverableMergeLeg(
        spark, staging.toString, ck2, gen2, Some(killAfterCdc))
      val cdcResumed = graft.streaming.Streams.recoverableMergeLeg(
        spark, staging.toString, ck2, gen2, None)
      val cdcWall = (System.nanoTime() - t2) / 1e9
      val cdcHash = hashOf(graft.streaming.Streams.mergedGenTable(spark, gen2,
        tombstones = true))
      val cdcEqual = cdcHash == cdcTruthHash
      val nTomb = graft.streaming.Streams.tombstonedUsers(spark, gen2)
      System.err.println(
        f"[streamcheck] recovery cdc    $dir%-22s events=$nEvents%7d " +
          f"killed_after=$cdcKilled resumed=$cdcResumed " +
          f"tombstoned=$nTomb equal=$cdcEqual")

      // ── transformWithState (RocksDB ValueState) ────────────────────────
      val (twsEqual, twsKilled, twsResumed, twsWall, _) =
        twsRecovery(spark, staging.toString, killAfter)
      System.err.println(
        f"[streamcheck] recovery tws    $dir%-22s events=$nEvents%7d " +
          f"killed_after=$twsKilled resumed=$twsResumed equal=$twsEqual")

      // ── MinHash near-dup dedup (q_stream_dedup_minhash's operator,
      //    VERDICT r12 ask #5): dropDuplicatesWithinWatermark state over
      //    LSH band-signature keys, killed mid-run and resumed on the same
      //    checkpoint. Emissions are at-least-once across the replayed
      //    batch, so equality is on the emitted KEY SET (exactly the
      //    dedup-bucket set the declared query hash-checks); committed
      //    batches must not re-emit — that's the state under test. ─────────
      val (mhEqual, mhKilled, mhResumed, mhWall, mhKeys) =
        mhDedupRecovery(spark, dir, killAfter)
      System.err.println(
        f"[streamcheck] recovery mhdedup $dir%-21s keys=$mhKeys%7d " +
          f"killed_after=$mhKilled resumed=$mhResumed equal=$mhEqual")

      // ── ListState top-k (q_stream_topk's processor, round 13): the list
      //    get→clear→appendList round-trip under kill/resume — a lost or
      //    truncated LIST would re-rank from the replayed batch alone and
      //    diverge from the uninterrupted top-3; yet another replay
      //    boundary (killAfter+2). ─────────────────────────────────────────
      val killAfterTopk = killAfter + 2
      val (tkEqual, tkKilled, tkResumed, tkWall, tkKeys) =
        topkRecovery(spark, staging.toString, killAfterTopk)
      System.err.println(
        f"[streamcheck] recovery topk   $dir%-22s keys=$tkKeys%7d " +
          f"killed_after=$tkKilled resumed=$tkResumed equal=$tkEqual")

      // ── stream-stream join + transactional FILE SINK (4th durable-state
      //    shape): symmetric join state buffered on BOTH sides of the
      //    q_stream_join attribution shape, and the parquet file sink's
      //    _spark_metadata commit log as the exactly-once mechanism under
      //    test — a micro-batch replayed after the kill must not double
      //    its rows in the READABLE view (orphan part-files from the
      //    killed attempt stay unreferenced by the log). Truth = the
      //    uninterrupted run's sink; equality is the full row multiset. ───
      def joinLeg(ckpt: String, outDir: String,
          stopAfter: Option[Int]): Int = {
        val schema = events.schema
        def src = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(staging.toString)
        val clicks = src.filter(col("event_type") === "click")
          .select(col("user_id").as("click_user"),
            col("event_id").as("click_id"), col("ts").as("click_ts"))
          .withWatermark("click_ts", "30 days")
        val purchases = src.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts").as("purchase_ts"))
          .withWatermark("purchase_ts", "30 days")
        val q = purchases.join(clicks,
            col("user_id") === col("click_user") &&
              col("click_ts") >= col("purchase_ts") -
                org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR") &&
              col("click_ts") <= col("purchase_ts"))
          .select(col("user_id"), col("purchase_id"), col("click_id"),
            col("purchase_ts"), col("click_ts"))
          .writeStream.format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        stopAndCount(q, stopAfter)
      }
      def sinkHash(outDir: String): (String, Long) = {
        // spark.read over a file-sink path resolves through the
        // _spark_metadata log — exactly the committed view
        val df = spark.read.parquet(outDir)
        val rows = df.select(concat_ws("|", col("user_id"),
            col("purchase_id"), col("click_id"),
            col("purchase_ts").cast("string"),
            col("click_ts").cast("string")))
          .collect().map(_.getString(0)).sorted
        (java.security.MessageDigest.getInstance("MD5")
          .digest(rows.mkString("\n").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString, rows.length.toLong)
      }
      def freshSink() = (
        java.nio.file.Files.createTempDirectory("graft-join-ckpt").toString,
        java.nio.file.Files.createTempDirectory("graft-join-out").toString)
      val (ckJU, outJU) = freshSink()
      joinLeg(ckJU, outJU, None)
      val (joinTruthHash, joinTruthRows) = sinkHash(outJU)
      val killAfterJoin = killAfter + 1 // a third replay boundary
      val (ckJR, outJR) = freshSink()
      val tj = System.nanoTime()
      val joinKilled = joinLeg(ckJR, outJR, Some(killAfterJoin))
      val joinResumed = joinLeg(ckJR, outJR, None)
      val joinWall = (System.nanoTime() - tj) / 1e9
      val (joinRecHash, joinRecRows) = sinkHash(outJR)
      val joinEqual = joinRecHash == joinTruthHash
      System.err.println(
        f"[streamcheck] recovery join   $dir%-22s events=$nEvents%7d " +
          f"killed_after=$joinKilled resumed=$joinResumed " +
          f"rows=$joinRecRows/$joinTruthRows equal=$joinEqual")

      def fmt(d: Double) = f"$d%.1f"
      s"""{"dir":"$dir","events":$nEvents,"kill_after_batches":$killAfter,""" +
        s""""merge":{"uninterrupted_batches":$plainBatches,""" +
        s""""uninterrupted_wall_sec":${fmt(plainWall)},""" +
        s""""killed_run_batches":$killedBatches,""" +
        s""""resumed_run_batches":$resumedBatches,""" +
        s""""recovery_wall_sec":${fmt(recWall)},""" +
        s""""state_equal":$mergeEqual},""" +
        s""""cdc":{"kill_after_batches":$killAfterCdc,""" +
        s""""killed_run_batches":$cdcKilled,""" +
        s""""resumed_run_batches":$cdcResumed,""" +
        s""""recovery_wall_sec":${fmt(cdcWall)},""" +
        s""""tombstoned_users":$nTomb,""" +
        s""""state_equal":$cdcEqual},""" +
        s""""tws":{"killed_run_batches":$twsKilled,""" +
        s""""resumed_run_batches":$twsResumed,""" +
        s""""recovery_wall_sec":${fmt(twsWall)},""" +
        s""""state_equal":$twsEqual},""" +
        s""""mhdedup":{"killed_run_batches":$mhKilled,""" +
        s""""resumed_run_batches":$mhResumed,""" +
        s""""recovery_wall_sec":${fmt(mhWall)},""" +
        s""""band_keys":$mhKeys,""" +
        s""""state_equal":$mhEqual},""" +
        s""""topk":{"kill_after_batches":$killAfterTopk,""" +
        s""""killed_run_batches":$tkKilled,""" +
        s""""resumed_run_batches":$tkResumed,""" +
        s""""recovery_wall_sec":${fmt(tkWall)},""" +
        s""""keys":$tkKeys,""" +
        s""""state_equal":$tkEqual},""" +
        s""""join":{"kill_after_batches":$killAfterJoin,""" +
        s""""killed_run_batches":$joinKilled,""" +
        s""""resumed_run_batches":$joinResumed,""" +
        s""""recovery_wall_sec":${fmt(joinWall)},""" +
        s""""sink_rows":$joinRecRows,""" +
        s""""truth_rows":$joinTruthRows,""" +
        s""""state_equal":$joinEqual}}"""
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(staging).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** Kill/resume recovery for the ListState top-k leg (q_stream_topk's
    * processor) — the [[twsRecovery]] protocol applied to the LIST state
    * shape: uninterrupted run → per-key truth map merged by max-n, fresh
    * checkpoint, kill after `killAfter` batches, resume on the same
    * checkpoint, compare. Passing requires the list's
    * get → clear → appendList round-trip to survive the RocksDB
    * checkpoint: a lost list re-ranks from the replayed batch alone and
    * diverges from the truth top-3 (where the monotone `seen` counter
    * alone would still merge clean — the list content IS the test).
    */
  private def topkRecovery(spark: SparkSession, stagingDir: String,
      killAfter: Int): (Boolean, Int, Int, Double, Int) = {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = spark.read.parquet(stagingDir).schema
      val state = new java.util.concurrent.ConcurrentHashMap[Long, (Long, String)]()
      def leg(ckpt: String, stopAfter: Option[Int]): Int = {
        import spark.implicits._
        val src = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(stagingDir)
        val q = src.select(col("user_id").cast("long"),
            col("value").cast("double"), col("event_id").cast("long"))
          .as[(Long, Double, Long)]
          .groupByKey(_._1)
          .transformWithState(
            new graft.streaming.Streams.TopKEventsProcessor(3),
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .toDF("user_id", "n", "ids")
          .writeStream.outputMode("update")
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.collect().foreach { r =>
              val (u, n, ids) = (r.getLong(0), r.getLong(1), r.getString(2))
              state.merge(u, (n, ids),
                (old, nw) => if (nw._1 > old._1) nw else old)
            }
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        stopAndCount(q, stopAfter)
      }
      val ckU = java.nio.file.Files.createTempDirectory("graft-topk-u").toString
      leg(ckU, None)
      val truth = Map.from(scala.jdk.CollectionConverters
        .ConcurrentMapHasAsScala(state).asScala)
      state.clear()
      val ckR = java.nio.file.Files.createTempDirectory("graft-topk-r").toString
      val t0 = System.nanoTime()
      val k = leg(ckR, Some(killAfter))
      val r = leg(ckR, None)
      val wall = (System.nanoTime() - t0) / 1e9
      val resumed = Map.from(scala.jdk.CollectionConverters
        .ConcurrentMapHasAsScala(state).asScala)
      (resumed == truth, k, r, wall, truth.size)
    } finally {
      prevProv match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  /** Kill/resume recovery for the transformWithState RocksDB leg over a
    * staged 16-file events directory: uninterrupted run → truth map, then
    * fresh checkpoint, kill after `killAfter` batches, resume, compare.
    * Extracted so the SAME leg runs at both 1M (inside [[recoveryRuns]])
    * and 10M events (VERDICT r11 ask #7 — confirm the state-store
    * behavior isn't 1M-specific). Returns (state_equal, killed-run
    * batches, resumed-run batches, recovery wall sec, distinct keys).
    *
    * Final state per key = the update with max n (n is monotone per key,
    * so micro-batches replayed after the kill are absorbed by the max).
    */
  private def twsRecovery(spark: SparkSession, stagingDir: String,
      killAfter: Int): (Boolean, Int, Int, Double, Int) = {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = spark.read.parquet(stagingDir).schema
      val state = new java.util.concurrent.ConcurrentHashMap[Long, (Long, String)]()
      def leg(ckpt: String, stopAfter: Option[Int]): Int = {
        import spark.implicits._
        val src = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(stagingDir)
        val q = src.select(col("user_id").cast("long"),
            col("value").cast("decimal(18,2)").cast("string"))
          .as[(Long, String)]
          .groupByKey(_._1)
          .transformWithState(new graft.streaming.Streams.RunningTotalsProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .toDF("user_id", "n", "total")
          .writeStream.outputMode("update")
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.collect().foreach { r =>
              val (u, n, t) = (r.getLong(0), r.getLong(1), r.getString(2))
              state.merge(u, (n, t),
                (old, nw) => if (nw._1 > old._1) nw else old)
            }
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        stopAndCount(q, stopAfter)
      }
      val ckU = java.nio.file.Files.createTempDirectory("graft-tws-u").toString
      leg(ckU, None)
      val truth = Map.from(scala.jdk.CollectionConverters
        .ConcurrentMapHasAsScala(state).asScala)
      state.clear()
      val ckR = java.nio.file.Files.createTempDirectory("graft-tws-r").toString
      val tws0 = System.nanoTime()
      val k = leg(ckR, Some(killAfter))
      val r = leg(ckR, None)
      val wall = (System.nanoTime() - tws0) / 1e9
      val resumed = Map.from(scala.jdk.CollectionConverters
        .ConcurrentMapHasAsScala(state).asScala)
      (resumed == truth, k, r, wall, truth.size)
    } finally {
      prevProv match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  /** Kill/resume recovery for the streaming MinHash near-dup dedup
    * (q_stream_dedup_minhash's operator): documents staged into 16 files,
    * band signatures computed statelessly per micro-batch,
    * `dropDuplicatesWithinWatermark` state on (band, sig) under the same
    * kill-at-K/resume-on-checkpoint protocol as the other legs. The truth
    * and recovered runs are compared as emitted KEY SETS: foreachBatch
    * delivery is at-least-once across the one replayed batch (duplicate
    * emissions of that batch's keys are expected and collapse in the set),
    * while the checkpointed dedup state must stop every COMMITTED batch's
    * keys from re-emitting — a state loss would not change the set (keys
    * re-emit, same set), but a state CORRUPTION dropping keys would, and
    * the set must also equal the uninterrupted run's batch-DISTINCT
    * exactly. Returns (state_equal, killed batches, resumed batches,
    * recovery wall sec, truth key count).
    */
  private def mhDedupRecovery(spark: SparkSession, dir: String,
      killAfter: Int): (Boolean, Int, Int, Double, Int) = {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val staging = java.nio.file.Files.createTempDirectory("graft-mhdedup")
    try {
      graft.model.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"),
          timestamp_seconds(lit(1700000000L) + pmod(col("doc_id"), lit(3600L)))
            .as("ts"))
        .repartition(16).write.mode("overwrite").parquet(staging.toString)
      val schema = spark.read.parquet(staging.toString).schema
      val keys = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, String)]()
      def leg(ckpt: String, stopAfter: Option[Int]): Int = {
        val src = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(staging.toString)
        val q = graft.streaming.Streams.minhashBandSignatures(src)
          .withWatermark("ts", "30 days")
          .dropDuplicatesWithinWatermark("band", "sig")
          .select(col("band"), col("sig"))
          .writeStream.outputMode("append")
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.collect().foreach(r => keys.add((r.getLong(0), r.getString(1))))
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        stopAndCount(q, stopAfter)
      }
      val ckU = java.nio.file.Files.createTempDirectory("graft-mhd-u").toString
      leg(ckU, None)
      val truth = Set.from(scala.jdk.CollectionConverters
        .SetHasAsScala(keys).asScala)
      keys.clear()
      val ckR = java.nio.file.Files.createTempDirectory("graft-mhd-r").toString
      val t0 = System.nanoTime()
      val k = leg(ckR, Some(killAfter))
      val r = leg(ckR, None)
      val wall = (System.nanoTime() - t0) / 1e9
      val resumed = Set.from(scala.jdk.CollectionConverters
        .SetHasAsScala(keys).asScala)
      (resumed == truth, k, r, wall, truth.size)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(staging).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** The 10M-event transformWithState recovery leg (VERDICT r11 ask #7):
    * stages `dir`'s events into 16 files (16 micro-batches ≈ 625k
    * events/batch through the RocksDB store), runs the same
    * kill-at-4/resume protocol, and returns the JSON fragment — or a
    * `"skipped"` marker when the 10M directory doesn't exist (ScaleGen
    * hasn't been run on this box).
    */
  private def tws10m(spark: SparkSession, dir: String): String = {
    if (!new java.io.File(s"$dir/events.parquet").exists())
      return s"""{"dir":"$dir","skipped":"no events at $dir"}"""
    val staging = java.nio.file.Files.createTempDirectory("graft-tws10m")
    try {
      graft.model.Tables.events(spark, dir)
        .repartition(16).write.mode("overwrite").parquet(staging.toString)
      val nEvents = spark.read.parquet(staging.toString).count()
      val (equal, killed, resumed, wall, keys) =
        twsRecovery(spark, staging.toString, killAfter = 4)
      System.err.println(
        f"[streamcheck] recovery tws10m $dir%-22s events=$nEvents%8d " +
          f"keys=$keys%6d killed_after=$killed resumed=$resumed " +
          f"wall=$wall%.1fs equal=$equal")
      s"""{"dir":"$dir","events":$nEvents,"distinct_keys":$keys,""" +
        s""""kill_after_batches":4,"killed_run_batches":$killed,""" +
        s""""resumed_run_batches":$resumed,""" +
        f""""recovery_wall_sec":$wall%.1f,"state_equal":$equal}"""
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(staging).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}

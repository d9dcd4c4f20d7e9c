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
    val record = records.mkString("[", ",", "]")
    println(record)
    val out = ToolPaths.resolve("tools/streamcheck.json")
    val w = new java.io.PrintWriter(out)
    try w.println(record) finally w.close()
    System.err.println(s"[streamcheck] wrote $out")
    spark.stop()
  }
}

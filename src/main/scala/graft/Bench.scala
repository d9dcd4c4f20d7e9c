package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts NANOS
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: run every declared query once at the smallest scale
    // factor. This compiles each query's whole-stage codegen (Janino caches
    // on generated source, which is scale-independent) and JITs the hot
    // loops, so the timed pass measures steady-state execution — the regime
    // that matters at cluster scale, where plan-compile time is amortized
    // over hours of processing. Wide-aggregate plans here (60-column SimHash
    // votes, 16-column MinHash) otherwise pay ~10 s of one-time compile.
    // q_stream_* run the micro-batch streaming engine to completion; their
    // wall time is AvailableNow trigger/checkpoint scheduling, not data
    // throughput, so they are correctness-gated (Verify) but not timed.
    val benched = SparkEntry.queries.filterNot(_._1.startsWith("q_stream_"))
    // tolerate a trailing slash in SPARK_GRAFT_SF_DIR; if the path has no
    // recognizable sfX suffix the warm-up just runs at the target scale
    val warmDir = sfDir.replaceAll("sf[0-9.]+/?$", "sf0.001")
    benched.foreach { case (_, fn) =>
      try { fn(spark, warmDir).count() } catch { case _: Throwable => () }
    }
    // Drop warm-up caches so the timed pass starts from parquet.
    spark.sharedState.cacheManager.clearCache()
    val results = benched.map { case (name, fn) =>
      // Two timed passes, report the min: single-pass numbers carry the
      // ambient machine-load noise of whatever else shares the box. The
      // cache clear between passes (and between queries) is outside the
      // timers — queries cache intermediates (encoded bitsets, LSH bands,
      // IVF assignments); left in place they accumulate across the run and
      // later queries pay the GC bill.
      // A pass that throws reports -1 (not its elapsed time): a broken
      // query must show up as an error in the JSON, never as a fast entry.
      def pass(): Double = {
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        val t = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        if (ok) t else -1.0
      }
      val two = Seq(pass(), pass()).filter(_ >= 0)
      // When the two passes disagree wildly, an external load spike hit
      // one of them — take a third and keep the min.
      val dt =
        if (two.isEmpty) -1.0
        else if (two.size == 2 && two.max > 2 * two.min)
          (two ++ Seq(pass()).filter(_ >= 0)).min
        else two.min
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // errored queries carry -1 in "queries" and are excluded from the total
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
object ProfX {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("q_broadcast_join")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Target scale is env-overridable so scale regressions can be profiled
    // at the synthetic sf1/sf3 dirs with the same min-of-5 protocol.
    val dir = sys.env.getOrElse("SPARK_GRAFT_PROF_DIR", "/root/testdata/sf0.1")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, "/root/testdata/sf0.001").count() // warm codegen
      spark.sharedState.cacheManager.clearCache()
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        t
      }
      println(f"PROF $n min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}

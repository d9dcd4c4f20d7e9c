package graft
import org.apache.spark.sql.SparkSession
/** Isolated per-query timing (debug main, like PlanX/ProfX): warms the named
  * query at sf0.001 (codegen + JIT), clears the cache manager, then times two
  * passes at sf0.1 and reports the min — the Bench measurement protocol for
  * ONE query, without the other ~100 adding ambient noise.
  * Usage: sbt 'runMain graft.TimeX q_some_query'
  */
object TimeX {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(args(0))
    fn(spark, "/root/testdata/sf0.001").count() // warm codegen
    spark.sharedState.cacheManager.clearCache()
    val ts = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.1").count()
      val t = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache(); t
    }
    println(f"TIMEX ${args(0)} min=${ts.min}%.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}

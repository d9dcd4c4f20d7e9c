/** Dev utility: run named declared queries at sf0.1 with per-query wall
  * timing (each name may repeat to separate codegen-compile cost from steady
  * state). Usage: sbt 'runMain ProfX q_name [q_name ...]'.
  */
object ProfX {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder
      .master("local[32]").appName("prof")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qs = graft.SparkEntry.queries
    for (name <- args) {
      val t0 = System.nanoTime()
      val c = qs(name)(spark, d).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"PROF $name%-28s $secs%8.2f s  rows=$c")
    }
    spark.stop()
  }
}

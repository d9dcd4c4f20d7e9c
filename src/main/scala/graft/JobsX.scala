package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Debug main (ProfX/PlanX family): run one declared query at sf0.1 and
  * print a per-JOB wall/task breakdown — where an iterative query's time
  * actually goes (driver loop actions, localCheckpoint materializations,
  * collect jobs), which `explain` alone cannot show.
  * Usage: sbt 'runMain graft.JobsX q_some_query [sfDir]'
  */
object JobsX {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    fn(spark, "/root/testdata/sf0.001").count() // warm codegen
    spark.sharedState.cacheManager.clearCache()
    // warm pass at target dir too (page cache + plan cache effects), then
    // the instrumented pass measures steady state like Bench's min
    fn(spark, dir).count()
    spark.sharedState.cacheManager.clearCache()

    case class J(id: Int, var desc: String, var sub: Long, var end: Long,
      var tasks: Int, var taskTime: Long, var stages: Int,
      var gc: Long = 0L, var cpu: Long = 0L, var shufR: Long = 0L,
      var shufW: Long = 0L, var deser: Long = 0L)
    val jobs = mutable.LinkedHashMap.empty[Int, J]
    val stageToJob = mutable.HashMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs(e.jobId) = J(e.jobId, d, e.time, 0L, 0, 0L, e.stageIds.size)
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
          j.tasks += 1
          if (e.taskInfo != null) j.taskTime += e.taskInfo.duration
          if (e.taskMetrics != null) {
            j.gc += e.taskMetrics.jvmGCTime
            j.cpu += e.taskMetrics.executorCpuTime / 1000000L
            j.deser += e.taskMetrics.executorDeserializeTime
            j.shufR += e.taskMetrics.shuffleReadMetrics.totalBytesRead
            j.shufW += e.taskMetrics.shuffleWriteMetrics.bytesWritten
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, dir).count()
    val t = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(300) // drain listener bus
    println(f"JOBSX $name total=$t%.3f s  jobs=${jobs.size}")
    var covered = 0L
    jobs.values.foreach { j =>
      val w = (j.end - j.sub).max(0L); covered += w
      println(f"  job ${j.id}%3d  wall=${w / 1000.0}%7.3f  stages=${j.stages}%2d" +
        f"  tasks=${j.tasks}%4d  taskTime=${j.taskTime / 1000.0}%8.3f" +
        f"  cpu=${j.cpu / 1000.0}%7.3f  gc=${j.gc / 1000.0}%6.3f" +
        f"  deser=${j.deser / 1000.0}%6.3f" +
        f"  shufR=${j.shufR / 1024}%6dK shufW=${j.shufW / 1024}%6dK  ${j.desc.take(60)}")
    }
    println(f"  sum(job walls)=${covered / 1000.0}%.3f s  (gap to total = driver-side planning/collect overhead)")
    spark.stop()
  }
}

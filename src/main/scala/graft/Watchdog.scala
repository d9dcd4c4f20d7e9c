package graft

import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

import org.apache.spark.sql.SparkSession

/** Per-query watchdog for the harness mains (ADVICE r8: a failed round must
  * record "errors or TIMEOUTS", but a hung query used to stall the whole
  * dump with no record at all). Runs one Spark action on a dedicated daemon
  * thread under a named job group; if the action outlives the budget, the
  * group's jobs are cancelled (task threads interrupted) and the caller
  * gets a recordable message instead of a hang.
  */
object Watchdog {

  /** Exception → one bounded log/JSON-safe line. */
  def describe(e: Throwable, lines: Int = 3, max: Int = 500): String =
    s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")
      .linesIterator.take(lines).mkString(" | ").take(max)}"

  def run[T](spark: SparkSession, name: String, timeoutSec: Long)(
      body: => T): Either[String, T] = {
    val result = new LinkedBlockingQueue[Either[Throwable, T]](1)
    val t = new Thread(() => {
      try {
        // job group is thread-local: set it on the thread that will
        // actually submit the jobs, so cancelJobGroup hits them
        spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
        result.put(Right(body))
      } catch { case e: Throwable => result.put(Left(e)) }
    }, s"watchdog-$name")
    t.setDaemon(true)
    t.start()
    val r = result.poll(timeoutSec, TimeUnit.SECONDS)
    if (r == null) {
      // ADVICE r9: cancelJobGroup only hits jobs active at that instant; a
      // multi-action query caught between jobs (driver-side compute, loop
      // bookkeeping) would keep submitting. The future-jobs variant keeps the
      // group cancelled so the leaked thread can't schedule anything more.
      spark.sparkContext.cancelJobGroupAndFutureJobs(name)
      // wait (bounded) for the worker to actually unwind so the next query's
      // jobs don't overlap the dying ones; daemon thread, so a truly stuck
      // action can't block JVM exit either way
      t.join(10000L)
      Left(s"TIMEOUT after ${timeoutSec}s (job group cancelled)")
    } else r.left.map(describe(_))
  }
}

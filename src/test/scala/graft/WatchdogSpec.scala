package graft

/** Pins the harness watchdog: results pass through, exceptions become
  * bounded messages, and an over-budget action returns a recordable
  * TIMEOUT instead of hanging the calling main.
  */
class WatchdogSpec extends SparkTestBase {

  test("passes results and formats exceptions") {
    assert(Watchdog.run(spark, "wd-ok", 30L)(41 + 1) === Right(42))
    val r = Watchdog.run(spark, "wd-boom", 30L) {
      throw new IllegalStateException("boom\nsecond line")
    }
    assert(r.isLeft)
    val msg = r.left.toOption.get
    assert(msg.startsWith("IllegalStateException"))
    assert(msg.contains("boom"))
    assert(!msg.contains("\n")) // JSON/log-safe single line
  }

  test("an over-budget action times out with a recordable message") {
    val t0 = System.nanoTime()
    val r = Watchdog.run(spark, "wd-hang", 1L) {
      Thread.sleep(60000); 1
    }
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(r === Left("TIMEOUT after 1s (job group cancelled)"))
    assert(elapsed < 20.0) // returned promptly, did not wait out the sleep
  }

  test("a timed-out query does not poison the next one") {
    Watchdog.run(spark, "wd-hang2", 1L) { Thread.sleep(30000); 1 }
    // a real Spark action afterwards still works on a fresh job group
    val r = Watchdog.run(spark, "wd-after", 60L) {
      spark.range(1000).count()
    }
    assert(r === Right(1000L))
  }
}

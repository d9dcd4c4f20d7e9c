package graft

import org.apache.spark.sql.functions._

/** Pins AQE's runtime skew-join mitigation — the mechanism that, at 100 TB,
  * saves a shuffle join whose key distribution is hot (one city, one
  * null-ish key, one viral document): the skewed partition is split into
  * sub-partitions at runtime and the matching side is replicated, instead
  * of one straggler task processing the whole hot key. This is the
  * AQE-native complement to the explicit salting rewrite (Skew.scala,
  * q_salted_join): salting is the plan-level fix you write when you KNOW
  * the skew; AQE catches the skew you didn't. Thresholds are fixture-sized
  * (defaults are 256 MB-scale); the mechanism under test is identical.
  */
class AqeSkewJoinSpec extends SparkTestBase {

  private def withConfs(kv: (String, String)*)(body: => Unit): Unit = {
    val conf = spark.conf
    val saved = kv.map { case (k, _) => k -> conf.getOption(k) }
    try { kv.foreach { case (k, v) => conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of a shuffle join at runtime") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // keep the skew handler's sub-partitions visible (coalescing can
      // merge them back at these toy sizes)
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      import spark.implicits._
      // left: 300k rows, 95% on key 0 (the hot key), tail uniform;
      // right: small-but-not-broadcast distinct-key side
      val left = spark.range(300000)
        .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          col("id").as("v"))
      val right = spark.range(50000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val j = left.join(right, "k")
      // execute THIS frame's plan (a count() would build its own
      // QueryExecution and leave j's adaptive plan unfinalized)
      val n = j.collect().length.toLong
      assert(n > 0)
      val planStr = j.queryExecution.executedPlan.toString
      assert(planStr.contains("skew=true"),
        s"no skew-split join in the adaptive executed plan:\n$planStr")
      // and the result is exactly the non-adaptive join's
      withConfs("spark.sql.adaptive.enabled" -> "false") {
        assert(left.join(right, "k").count() == n)
      }
    }
  }
}

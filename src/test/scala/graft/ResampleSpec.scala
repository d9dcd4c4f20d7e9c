package graft

import org.apache.spark.sql.Row
import graft.ops.Exprs.md5LongLocal

/** q_resample_target: hash-thresholded importance resampling toward a
  * uniform length-bucket histogram. Re-derived by a driver-side brute force
  * (plain Scala: bucket counts, integer rates, md5LongLocal thresholds —
  * the same engine rule, a different execution), plus the property that
  * motivates it: the resampled histogram is closer to uniform.
  */
class ResampleSpec extends SparkTestBase {

  private lazy val docs: Array[(Long, Long)] =
    graft.model.Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

  private lazy val got =
    SparkEntry.queries("q_resample_target")(spark, sfDir).collect()
      .map { case Row(b: Long, nb: Long, na: Long, r6: Long,
        sb: Double, sa: Double) => (b, nb, na, r6, sb, sa) }.toSeq

  test("q_resample_target matches a driver-side brute force") {
    val byBucket = docs.groupBy(_._2 / 100)
    val n = docs.length.toLong
    val nb = byBucket.size.toLong
    def halfUp(a: Long, b: Long, p: Long): Double =
      ((2 * a * p + b) / (2 * b)).toDouble / p
    val kept = byBucket.view.mapValues { ds =>
      val r6 = math.min(1000000L, n * 1000000L / (nb * ds.length))
      (ds.length.toLong,
        ds.count(d => md5LongLocal(s"rs:${d._1}") % 1000000L < r6).toLong,
        r6)
    }.toMap
    val na = kept.values.map(_._2).sum max 1L
    val expected = kept.toSeq.sortBy(_._1).map { case (b, (nbf, naf, r6)) =>
      (b, nbf, naf, r6, halfUp(nbf, n, 1000000L), halfUp(naf, na, 1000000L))
    }
    assert(got === expected)
  }

  test("resampling moves the bucket histogram toward uniform") {
    // L∞ distance of the share vector from the uniform share must not
    // increase; on this corpus (a skewed length profile) it strictly drops
    val nb = got.length.toDouble
    val before = got.map(_._5)
    val after = got.map(_._6)
    def linf(shares: Seq[Double]) =
      shares.map(s => math.abs(s - 1.0 / nb)).max
    assert(linf(after) <= linf(before),
      s"after ${linf(after)} vs before ${linf(before)}")
    // a bucket already at/below the uniform share keeps everything
    got.filter(_._4 == 1000000L).foreach { r =>
      assert(r._3 == r._2, s"full-rate bucket dropped rows: $r")
    }
    // every bucket's survivors are a subset of its input
    assert(got.forall(r => r._3 <= r._2 && r._3 >= 0))
  }
}

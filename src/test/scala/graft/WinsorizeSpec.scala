package graft

import org.apache.spark.sql.Row

/** q_winsorize: clipped robust statistics. The percentile parity itself is
  * pinned by q_percentile + the oracle; this spec independently re-derives
  * the clip → cent-quantize → mean pipeline (the part where the DECIMAL
  * cast of an interpolated bound diverged between engines) from collected
  * raw values and the query's own bounds.
  */
class WinsorizeSpec extends SparkTestBase {

  test("q_winsorize: clipped mean re-derived from raw values") {
    val raw = graft.model.Tables.events(spark, sfDir)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = SparkEntry.queries("q_winsorize")(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum === raw.valuesIterator.map(_.length).sum)
    rows.foreach { case Row(t: String, n: Long, p05: Double, p95: Double,
        mr: Double, mw: Double) =>
      val vs = raw(t)
      assert(n === vs.length.toLong)
      // clip + floor(x*100 + 0.5) + exact integer mean, independently
      val cents = vs.map(v =>
        math.floor(math.min(math.max(v, p05), p95) * 100 + 0.5).toLong)
      val expect = cents.sum.toDouble / 100.0 / n
      assert(mw === expect, s"$t winsorized mean")
      // the raw mean through the DECIMAL discipline (2-decimal data)
      val rawCents = vs.map(v => BigDecimal(v)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP))
      assert(mr === (rawCents.sum.toDouble / n), s"$t raw mean")
      // winsorizing pulls the mean inside the clip bounds
      assert(mw >= p05 - 0.01 && mw <= p95 + 0.01)
      // p05 <= p95 always
      assert(p05 <= p95)
    }
  }
}

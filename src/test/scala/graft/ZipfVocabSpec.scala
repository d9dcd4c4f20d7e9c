package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-11 corpus diagnostics: q_zipf (exact top-50 token mass curve) and
  * q_vocab_growth (Heaps-law trigram novelty per doc_id decile). Each is
  * re-derived by a driver-side brute force over sf0.001 so the distributed
  * TakeOrdered/wordcount plans are checked against a different method.
  */
class ZipfVocabSpec extends SparkTestBase {

  private def docs = graft.model.Tables.documents(spark, sfDir)
    .select(col("doc_id"), split(col("text"), " ").as("ts"))
    .collect()
    .map(r => r.getLong(0) -> r.getSeq[String](1))

  test("q_zipf matches driver-side exact counting") {
    val all = docs.flatMap(_._2)
    val total = all.length.toLong
    val head = all.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (tok, cnt) => (-cnt, tok) }.take(50)
    var cum = 0L
    val expected = head.zipWithIndex.map { case ((tok, cnt), i) =>
      cum += cnt
      (i + 1L, tok, cnt,
        (BigDecimal(cnt) / total).setScale(6, BigDecimal.RoundingMode.HALF_UP),
        (BigDecimal(cum) / total).setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }

    val got = SparkEntry.queries("q_zipf")(spark, sfDir).collect()
      .map { case Row(r: Long, t: String, c: Long, s: Double, cs: Double) =>
        (r, t, c, BigDecimal(s).setScale(6), BigDecimal(cs).setScale(6)) }
      .toSeq
    assert(got.map(x => (x._1, x._2, x._3)) ===
      expected.map(x => (x._1, x._2, x._3)))
    got.zip(expected).foreach { case ((r, _, _, s, cs), (_, _, _, es, ecs)) =>
      assert((s - es).abs <= BigDecimal("0.0000005"), s"rank $r share")
      assert((cs - ecs).abs <= BigDecimal("0.0000005"), s"rank $r cum_share")
    }
  }

  test("q_zipf cumulative share is monotone and caps at 1") {
    val cs = SparkEntry.queries("q_zipf")(spark, sfDir)
      .select("cum_share").collect().map(_.getDouble(0))
    assert(cs.zip(cs.tail).forall { case (a, b) => a <= b }, "not monotone")
    assert(cs.last <= 1.0 + 1e-9)
  }

  test("q_vocab_growth matches driver-side trigram novelty") {
    val ds = docs
    val mn = ds.map(_._1).min
    val mx = ds.map(_._1).max
    def bin(id: Long): Long = math.min(9L, (id - mn) * 10 / (mx - mn + 1))
    val occs = for {
      (id, ts) <- ds if ts.length >= 3
      p <- 0 to (ts.length - 3)
    } yield (id, ts.slice(p, p + 3).mkString(" "))
    val firstBin = occs.groupBy(_._2).view
      .mapValues(o => bin(o.map(_._1).min)).toMap
    val newTypes = firstBin.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val vol = occs.groupBy(o => bin(o._1)).view
      .mapValues(_.size.toLong).toMap
    val bins = vol.keySet.toSeq.sorted
    var (ct, cn) = (0L, 0L)
    val expected = bins.map { b =>
      ct += newTypes.getOrElse(b, 0L); cn += vol(b)
      (b, newTypes.getOrElse(b, 0L), ct, vol(b), cn)
    }

    val got = SparkEntry.queries("q_vocab_growth")(spark, sfDir).collect()
      .map { case Row(b: Long, nt: Long, ctg: Long, bn: Long, cng: Long,
          _: Double) => (b, nt, ctg, bn, cng) }.toSeq
    assert(got === expected)
  }

  test("q_vocab_growth novelty decays across deciles on this corpus") {
    // the reason the type unit is the trigram: unigram vocabulary is a
    // fixed 31-token set at every SF and saturates in bin 0
    val nt = SparkEntry.queries("q_vocab_growth")(spark, sfDir)
      .select("new_types").collect().map(_.getLong(0))
    assert(nt.head > nt.last,
      s"expected decaying novelty, got head=${nt.head} last=${nt.last}")
  }
}

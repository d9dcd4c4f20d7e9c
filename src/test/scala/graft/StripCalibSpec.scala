package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-11 operators, second pair: q_span_strip (keep-first substring
  * dedup token budget) and q_quality_calibration (fixed-width-bin score
  * calibration). As with SpansAucSpec, each is re-derived here by a
  * driver-side brute-force reference over sf0.001 so the distributed
  * interval-union / binning plans are checked against a different method.
  */
class StripCalibSpec extends SparkTestBase {

  test("q_span_strip matches a brute-force keep-first interval union") {
    val docs = graft.model.Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val windows = for {
      (id, ts) <- docs if ts.length >= 20
      p <- 1 to (ts.length - 19)
    } yield (id, p.toLong, ts.slice(p - 1, p + 19).mkString(" "))
    // redundant = every occurrence of a >=2-occurrence window EXCEPT the
    // lexicographic (doc, pos) first — count(*) semantics: a within-doc
    // repeat counts
    val redundant = windows.groupBy(_._3).values
      .filter(_.size >= 2)
      .flatMap(occ => occ.sortBy(w => (w._1, w._2)).tail)
      .map(w => (w._1, w._2)).toSeq
    // union length of [p, p+19] per doc via merged covered-position sets
    val removedByDoc: Map[Long, Long] = redundant.groupBy(_._1).map {
      case (id, ws) =>
        id -> ws.flatMap { case (_, p) => p to (p + 19) }.distinct.size.toLong
    }
    val expected = docs.map { case (id, ts) =>
      val rm = removedByDoc.getOrElse(id, 0L)
      (id, ts.length.toLong, rm, ts.length - rm)
    }.sortBy(_._1).toSeq

    val got = SparkEntry.queries("q_span_strip")(spark, sfDir)
      .collect()
      .map { case Row(id: Long, n: Long, rm: Long, k: Long) => (id, n, rm, k) }
      .toSeq
    assert(got === expected)
  }

  test("q_span_strip conserves tokens and never strips short docs") {
    val rows = SparkEntry.queries("q_span_strip")(spark, sfDir).collect()
      .map { case Row(id: Long, n: Long, rm: Long, k: Long) => (id, n, rm, k) }
    rows.foreach { case (id, n, rm, k) =>
      assert(rm + k == n, s"doc $id: removed+kept != n_tokens")
      assert(rm >= 0 && k >= 0, s"doc $id: negative budget")
      if (n < 20) assert(rm == 0, s"doc $id shorter than a window but stripped")
    }
  }

  test("q_quality_calibration matches driver-side fixed-width binning") {
    val scored = SparkEntry.queries("q_quality_classifier")(spark, sfDir)
      .select("doc_id", "score")
      .join(graft.model.Tables.documents(spark, sfDir)
        .select(col("doc_id"), (col("lang") === "en").as("pos")), "doc_id")
      .collect().map(r => (r.getLong(1), r.getBoolean(2)))
    val mn = scored.map(_._1).min
    val mx = scored.map(_._1).max
    def bin(s: Long): Long = math.min(9L, (s - mn) * 10 / (mx - mn + 1))
    val expected = scored.groupBy(t => bin(t._1)).toSeq.sortBy(_._1)
      .map { case (b, xs) =>
        val n = xs.size.toLong
        val p = xs.count(_._2).toLong
        val ssum = xs.map(_._1).sum
        (b, n, p,
          (BigDecimal(p) / n).setScale(6, BigDecimal.RoundingMode.HALF_UP),
          // HALF_UP is already half-away-from-zero for BOTH signs
          // (-2.5 → -3), matching roundDiv's contract
          (BigDecimal(ssum) / n).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      }

    val got = SparkEntry.queries("q_quality_calibration")(spark, sfDir)
      .collect()
      .map { case Row(b: Long, n: Long, p: Long, r: Double, m: Double) =>
        (b, n, p, BigDecimal(r).setScale(6), BigDecimal(m).setScale(6)) }
      .toSeq
    assert(got.map(t => (t._1, t._2, t._3)) ===
      expected.map(t => (t._1, t._2, t._3)))
    got.zip(expected).foreach { case ((b, _, _, r, m), (_, _, _, er, em)) =>
      assert((r - er).abs <= BigDecimal("0.0000005"), s"bin $b pos_rate")
      assert((m - em).abs <= BigDecimal("0.0000005"), s"bin $b mean_score")
    }
  }

  test("q_quality_calibration bins partition the corpus") {
    val total = SparkEntry.queries("q_quality_calibration")(spark, sfDir)
      .agg(sum("n")).collect().head.getLong(0)
    val docs = graft.model.Tables.documents(spark, sfDir).count()
    assert(total == docs, s"bin volumes $total != corpus $docs")
  }
}

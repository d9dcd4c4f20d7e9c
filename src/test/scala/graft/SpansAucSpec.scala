package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-11 operators: q_dedup_spans (maximal duplicated-span merge) and
  * q_quality_auc (exact tie-aware ROC-AUC). Both are re-derived here by a
  * deliberately different method — a driver-side reference implementation
  * over the sf0.001 corpus — so the distributed gaps-and-islands / rank-sum
  * plans are checked against brute force, not against themselves.
  */
class SpansAucSpec extends SparkTestBase {

  test("q_dedup_spans matches a brute-force islands merge") {
    // reference: duplicated 20-token windows computed naively, islands
    // merged with a local scan over sorted positions
    val docs = graft.model.Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val windows = for {
      (id, ts) <- docs if ts.length >= 20
      p <- 1 to (ts.length - 19)
    } yield (id, p.toLong, ts.slice(p - 1, p + 19).mkString(" "))
    val dupKeys = windows.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.size >= 2).keySet
    val expected = windows.filter(w => dupKeys(w._3))
      .groupBy(_._1).toSeq.flatMap { case (id, ws) =>
        val ps = ws.map(_._2).sorted
        // interval-union merge: window [p, p+19] joins the current island
        // whenever it overlaps or touches its end [.., e+19] — i.e.
        // p <= (e+19)+1 — matching the query's running-max-end islands
        val spans = ps.foldLeft(List.empty[(Long, Long, Long)]) {
          case ((s, e, n) :: rest, p) if p <= e + 20 => (s, p, n + 1) :: rest
          case (acc, p) => (p, p, 1L) :: acc
        }.reverse
        spans.map { case (s, e, n) => (id, s, e + 19, n, e - s + 20) }
      }.sortBy(t => (t._1, t._2))

    val got = SparkEntry.queries("q_dedup_spans")(spark, sfDir)
      .collect()
      .map { case Row(id: Long, s: Long, e: Long, n: Long, t: Long) =>
        (id, s, e, n, t) }.toSeq
    assert(got === expected)
  }

  test("q_dedup_spans spans are disjoint with >=1 gap per document") {
    val rows = SparkEntry.queries("q_dedup_spans")(spark, sfDir)
      .select("doc_id", "span_start", "span_end").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).values.foreach { spans =>
      spans.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) =>
          // maximality: a touching/overlapping pair should have merged
          assert(s2 > e1 + 1, s"adjacent spans not merged: $e1 vs $s2")
        case _ =>
      }
    }
  }

  test("q_quality_auc matches the O(P*N) pairwise definition") {
    // reference: literal probability estimate over all (pos, neg) pairs
    // with half credit on ties — the textbook definition the rank-sum
    // query is an O(distinct-scores) reformulation of
    val scored = SparkEntry.queries("q_quality_classifier")(spark, sfDir)
      .select("doc_id", "score")
      .join(graft.model.Tables.documents(spark, sfDir)
        .select(col("doc_id"), (col("lang") === "en").as("pos")), "doc_id")
      .collect().map(r => (r.getLong(1), r.getBoolean(2)))
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    val credit2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val expected = BigDecimal(credit2) /
      (BigDecimal(2) * pos.length * neg.length)

    val row = SparkEntry.queries("q_quality_auc")(spark, sfDir).collect().head
    assert(row.getLong(0) === pos.length.toLong)
    assert(row.getLong(1) === neg.length.toLong)
    val auc = BigDecimal(row.getDouble(2))
    assert((auc - expected).abs <= BigDecimal("0.0000005"),
      s"auc $auc vs pairwise $expected")
  }

  test("q_quality_auc's global window sees distinct scores, not rows") {
    // the scale contract: the ORDER BY score window runs over the score
    // GROUPS — bounded by model geometry, far below corpus cardinality
    val n = graft.model.Tables.documents(spark, sfDir).count()
    val g = SparkEntry.queries("q_quality_classifier")(spark, sfDir)
      .select("score").distinct().count()
    assert(g < n, s"expected distinct scores ($g) below doc count ($n)")
  }
}

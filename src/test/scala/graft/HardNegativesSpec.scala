package graft

import org.apache.spark.sql.Row

/** q_hard_negatives: per-anchor top-2 cross-source near-duplicates. The
  * brute force re-derives the full answer from EXACT all-pairs Jaccard over
  * distinct 2-gram shingles (no banding — a different candidate mechanism;
  * the adaptive banding is measured lossless at these SFs by
  * q_dedup_ngram_recall, so the sets must agree exactly).
  */
class HardNegativesSpec extends SparkTestBase {

  test("q_hard_negatives matches exact all-pairs mining") {
    val docs = graft.model.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").sliding(2).map(_.mkString(" ")).toSet))
    val pairs = for {
      i <- docs.indices.iterator
      j <- (i + 1) until docs.length
      (da, sa, ga) = docs(i)
      (db, sb, gb) = docs(j)
      shared = (ga & gb).size
      jacc = shared.toDouble / (ga.size + gb.size - shared)
      if jacc >= 0.28
    } yield (da, db, sa, sb, jacc)
    val sym = pairs.flatMap { case (a, b, sa, sb, j) =>
      Seq((a, b, sa, sb, j), (b, a, sb, sa, j))
    }.filter(t => t._3 != t._4).toSeq
    val expected = sym.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (d, ns) =>
        ns.sortBy(t => (-t._5, t._2)).take(2).zipWithIndex.map {
          case ((_, n, sa, sn, j), i) => (d, (i + 1).toLong, n, j, sa, sn)
        }
    }
    val got = SparkEntry.queries("q_hard_negatives")(spark, sfDir).collect()
      .map { case Row(d: Long, r: Long, n: Long, j: Double,
        sa: String, sn: String) => (d, r, n, j, sa, sn) }.toSeq
    assert(got === expected)
    // mined pairs really are hard negatives: heavy overlap, disjoint source
    assert(got.nonEmpty)
    assert(got.forall(t => t._4 >= 0.28 && t._5 != t._6))
  }
}

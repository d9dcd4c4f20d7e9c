package graft

import org.apache.spark.sql.Row

/** q_cell_purity: majority label + purity per IVF cell. The driver brute
  * force reproduces the assignment EXACTLY (dotProduct is a left fold with
  * a 0.0 seed — the same IEEE operation sequence is replayed here), then
  * re-derives the per-cell aggregation independently.
  */
class CellPuritySpec extends SparkTestBase {

  private lazy val rows: Array[(Long, Array[Double], Int)] =
    graft.model.Tables.embeddings(spark, sfDir).collect().map {
      case Row(id: Long, e: scala.collection.Seq[_], l: Int) =>
        (id, e.asInstanceOf[scala.collection.Seq[Float]]
          .map(_.toDouble).toArray, l)
    }

  test("q_cell_purity matches a driver-side assignment + aggregation") {
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val m = math.max(31L, math.sqrt(rows.length.toDouble).toLong)
    val cents = rows.filter(_._1 % m == 1)
      .map { case (id, e, _) => (id, e, dot(e, e)) }
    val assigned = rows.map { case (_, e, l) =>
      val nrm = dot(e, e)
      val best = cents.map { case (cid, ce, cn) =>
        (dot(e, ce) / math.sqrt(nrm * cn), cid)
      }.minBy { case (csim, cid) => (-csim, cid) }
      (best._2, l)
    }
    def halfUp(a: Long, b: Long): Double =
      ((2 * a * 1000000L + b) / (2 * b)).toDouble / 1e6
    val expected = assigned.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (cell, ls) =>
        val byLabel = ls.groupBy(_._2).view.mapValues(_.length.toLong)
        val (maj, nMaj) = byLabel.toSeq.minBy { case (l, c) => (-c, l) }
        (cell, ls.length.toLong, maj, nMaj,
          halfUp(nMaj, ls.length.toLong))
    }
    val got = SparkEntry.queries("q_cell_purity")(spark, sfDir).collect()
      .map { case Row(c: Long, n: Long, l: Int, nm: Long, p: Double) =>
        (c, n, l, nm, p) }.toSeq
    assert(got === expected)
    // the cells partition the corpus; purity is a genuine share
    assert(got.map(_._2).sum === rows.length.toLong)
    assert(got.forall(r => r._5 > 0.0 && r._5 <= 1.0 && r._4 <= r._2))
  }
}

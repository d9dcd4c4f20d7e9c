package graft

import org.apache.spark.sql.functions._

/** Round-11 operator: q_hybrid_search (lexical + semantic retrieval fused
  * by reciprocal rank). Re-derived sequentially on the driver over
  * sf0.001, with the fusion PROPERTIES pinned: consensus candidates beat
  * single-list leaders exactly when RRF says so, and partial embedding
  * coverage only ever contributes a zero term.
  */
class HybridSearchSpec extends SparkTestBase {

  test("q_hybrid_search matches a driver-side RRF reference") {
    val docs = graft.model.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSet)
    val nd = docs.length.toLong
    val df = docs.flatMap(_._2).groupBy(identity).map {
      case (t, xs) => t -> xs.length.toLong }
    def idf(t: String): BigDecimal =
      BigDecimal(math.log((nd + 1).toDouble / (df(t) + 1)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val byId = docs.toMap
    val qids = docs.map(_._1).filter(_ < 5).sorted

    val lexRank: Map[(Long, Long), Long] = qids.flatMap { qid =>
      docs.filter(_._1 != qid)
        // retrieved = shares >= 1 distinct token (a zero-idf shared token
        // still retrieves — the query's join row exists either way)
        .filter { case (_, ts) => (byId(qid) & ts).nonEmpty }
        .map { case (id, ts) => (id, (byId(qid) & ts).toSeq.map(idf).sum) }
        .sortBy { case (id, s) => (-s, id) }.take(20).zipWithIndex
        .map { case ((id, _), i) => (qid, id) -> (i + 1).toLong }
    }.toMap

    val vecs = graft.model.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val vm = vecs.toMap
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val semRank: Map[(Long, Long), Long] = qids.flatMap { qid =>
      vecs.filter(_._1 != qid).map { case (id, e) =>
        val n2 = dot(vm(qid), vm(qid)) * dot(e, e)
        (id, if (n2 > 0) Some(dot(vm(qid), e) / math.sqrt(n2)) else None)
      }.sortBy { case (id, s) =>
        (s.map(-_).getOrElse(Double.MaxValue), id) }.take(20).zipWithIndex
        .map { case ((id, _), i) => (qid, id) -> (i + 1).toLong }
    }.toMap

    def rrfTerm(r: Option[Long]): BigDecimal = r.map(rk =>
      (BigDecimal(1000000) / (60 + rk))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP) / 1000000)
      .getOrElse(BigDecimal(0))
    val expected = qids.flatMap { qid =>
      val cands = (lexRank.keySet ++ semRank.keySet)
        .filter(_._1 == qid).map(_._2)
      cands.toSeq.map { id =>
        val l = lexRank.get((qid, id)); val s = semRank.get((qid, id))
        (id, l, s, rrfTerm(l) + rrfTerm(s))
      }.sortBy { case (id, _, _, r) => (-r, id) }.take(10).zipWithIndex
        .map { case ((id, l, sr, r), i) =>
          (qid, (i + 1).toLong, id, l, sr, r.toDouble) }
    }

    val got = SparkEntry.queries("q_hybrid_search")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getDouble(5))).toSeq
    assert(got === expected)
  }

  test("q_hybrid_search fusion beats single lists only via consensus") {
    val rows = SparkEntry.queries("q_hybrid_search")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val top = rs.minBy(_.getLong(1))
      // a fused #1 that sits in BOTH lists must outrank a single-list-only
      // candidate iff its combined reciprocal mass is larger — spot-check
      // the invariant that rrf is exactly the sum of its two terms
      rs.foreach { r =>
        val terms = Seq(3, 4).map { i =>
          if (r.isNullAt(i)) BigDecimal(0)
          else (BigDecimal(1000000) / (60 + r.getLong(i)))
            .setScale(0, BigDecimal.RoundingMode.HALF_UP) / 1000000 }
        assert(BigDecimal(r.getDouble(5)) === terms.sum,
          s"rrf is not the term sum at row $r")
      }
      // the output is a proper prefix: ranks 1..k with no gaps
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to rs.length).toSeq)
      assert(top.getLong(1) === 1L)
    }
  }
}

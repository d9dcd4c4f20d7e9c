package graft

import org.apache.spark.sql.functions._
import graft.ops.Exprs.md5LongLocal

/** Round-11 operators: q_ann_pq (product quantization + ADC recall) and
  * q_overlap_matrix (source-pair shingle containment). Each re-derived by
  * a sequential driver-side implementation over sf0.001, so the
  * distributed assignment/ADC/containment plans are checked against brute
  * force, not themselves.
  */
class PqOverlapSpec extends SparkTestBase {

  test("q_ann_pq matches a driver-side PQ + ADC reference") {
    val vecs = graft.model.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).sortBy(_._1)
    val M = 8; val Sub = 8; val K = 16; val Qn = 20
    def subv(e: Array[Double], m: Int) = e.slice(m * Sub, m * Sub + Sub)
    val cb: Map[(Int, Long), Array[Double]] = (for {
      (id, e) <- vecs if id < K; m <- 0 until M
    } yield (m, id) -> subv(e, m)).toMap
    def dot(a: Array[Double], b: Array[Double]) =
      (0 until Sub).foldLeft(0.0)((s, i) => s + a(i) * b(i))
    def sqd(a: Array[Double], b: Array[Double]) =
      (0 until Sub).foldLeft(0.0)((s, i) => s + (a(i) - b(i)) * (a(i) - b(i)))
    // assignment: argmin codeword per (vec, m), ties to lowest k
    val codes: Map[(Long, Int), Long] = (for {
      (id, e) <- vecs; m <- 0 until M
    } yield (id, m) -> (0L until K).minBy(k => (sqd(subv(e, m), cb((m, k))), k))
    ).toMap
    val rnrm: Map[Long, Double] = vecs.map { case (id, _) =>
      id -> (0 until M).foldLeft(0.0)((s, m) =>
        s + dot(cb((m, codes((id, m)))), cb((m, codes((id, m)))))) }.toMap
    def fullDot(a: Array[Double], b: Array[Double]) =
      (0 until 64).foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val nrm: Map[Long, Double] = vecs.map { case (id, e) =>
      id -> fullDot(e, e) }.toMap
    def top3(score: (Long, Long) => Option[Double]): Seq[(Long, Long)] =
      for {
        (qid, _) <- vecs.toSeq if qid < Qn
        (cid, _) <- vecs.toSeq.filter(_._1 != qid)
          .sortBy { case (cid, _) =>
            (score(qid, cid).map(-_).getOrElse(Double.MaxValue), cid) }
          .take(3)
      } yield (qid, cid)
    val qv = vecs.toMap
    val ptRef = top3 { (qid, cid) =>
      val adc = (0 until M).foldLeft(0.0)((s, m) =>
        s + dot(subv(qv(qid), m), cb((m, codes((cid, m))))))
      val n2 = nrm(qid) * rnrm(cid)
      if (n2 > 0) Some(adc / math.sqrt(n2)) else None
    }.toSet
    val exRef = top3 { (qid, cid) =>
      val n2 = nrm(qid) * nrm(cid)
      if (n2 > 0) Some(fullDot(qv(qid), qv(cid)) / math.sqrt(n2)) else None
    }.toSet
    val expectedHits = (ptRef & exRef).size.toLong

    val row = SparkEntry.queries("q_ann_pq")(spark, sfDir).collect().head
    assert(row.getString(0) === "pq8x16")
    assert(row.getLong(2) === exRef.size.toLong)
    assert(row.getLong(1) === expectedHits,
      s"n_hits ${row.getLong(1)} vs reference $expectedHits")
  }

  test("q_overlap_matrix matches brute-force containment and is complete") {
    val docs = graft.model.Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1).split(" ", -1).toSeq)
    def shingles(ts: Seq[String]): Seq[String] =
      if (ts.length >= 3) ts.sliding(3).map(_.mkString(" ")).toSeq
      else Seq(ts.mkString(" "))
    val bySrc: Map[String, Set[Long]] = docs.groupBy(_._1).map {
      case (src, ds) =>
        src -> ds.flatMap(d => shingles(d._2)).map(md5LongLocal).toSet }
    val srcs = bySrc.keys.toSeq.sorted
    val expected = (for {
      a <- srcs; b <- srcs if a != b
    } yield (a, b, bySrc(a).size.toLong, (bySrc(a) & bySrc(b)).size.toLong))
      .sortBy(t => (t._1, t._2))

    val got = SparkEntry.queries("q_overlap_matrix")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSeq === expected)
    // completeness: every ordered pair present exactly once
    assert(got.length === srcs.size * (srcs.size - 1))
    // intersection symmetry + containment in [0,1]
    val shared = got.map(t => (t._1, t._2) -> t._4).toMap
    got.foreach { case (a, b, na, ns, c) =>
      assert(shared((b, a)) === ns, s"asymmetric intersection $a/$b")
      assert(c >= 0.0 && c <= 1.0)
      assert(ns <= na)
    }
  }
}

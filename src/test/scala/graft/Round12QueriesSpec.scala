package graft

import org.apache.spark.sql.functions._

/** Independent references for the round-12 queries — each checked against
  * a recomputation that shares NO code with the declared query path (the
  * GramAggSpec discipline): the oracle gate proves Spark == DuckDB; these
  * prove both == the definition.
  */
class Round12QueriesSpec extends SparkTestBase {

  test("q_knn_loo matches a driver-side brute-force 1-NN recomputation") {
    // sf0.001 has ~60 vectors — small enough to fold exactly on the
    // driver with the same left-to-right double accumulation order the
    // DotProduct expression codegens, so sims are bit-identical and the
    // argmax (ties to smaller cid) reproduces the window's rank-1 row.
    val rows = graft.model.Tables.embeddings(spark, sfDir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val probes = rows.filter(_._1 < 50)
    val expected = probes.map { case (qid, qlabel, qe) =>
      val qn = dot(qe, qe)
      val best = rows.filter(_._1 != qid).map { case (cid, clabel, ce) =>
        val n2 = qn * dot(ce, ce)
        val sim = if (n2 > 0) dot(qe, ce) / math.sqrt(n2)
                  else Double.NegativeInfinity // NULL sims rank last
        (-sim, cid, clabel) // sort asc on -sim, then cid — the window order
      }.min
      (qlabel, best._3)
    }
    val expByLabel = expected.groupBy(_._1).map { case (l, xs) =>
      l -> (xs.length.toLong, xs.count(x => x._2 == x._1).toLong)
    }
    val got = SparkEntry.queries("q_knn_loo")(spark, sfDir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expByLabel)
  }

  test("q_dedup_containment: banded pairs equal exact all-pairs containment") {
    // the recall claim made concrete at this SF: every containment-0.9
    // pair sits within size ratio 3, so the banded candidates must be
    // LOSSLESS against an exact inverted-index recomputation
    import graft.ops.Exprs.{md5Long, wordShingles}
    val docs = graft.model.Tables.documents(spark, sfDir)
    val toks = split(col("text"), " ")
    val h = docs.select(col("doc_id"),
      explode(array_distinct(wordShingles(toks, 2))).as("g"))
      .select(col("doc_id"), md5Long(col("g")).as("hv"))
    val sz = h.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = h.select(col("doc_id").as("doc_a"), col("hv"))
    val b = h.select(col("doc_id").as("doc_b"), col("hv"))
    val exact = a.join(b, "hv").filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .filter(col("shared").cast("double") / least(col("na"), col("nb"))
        >= 0.9)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = SparkEntry.queries("q_dedup_containment")(spark, sfDir)
      .collect()
    val bandedPairs = banded.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bandedPairs === exact)
    // the contained side is always the smaller-or-equal set, and the
    // containment value can never exceed 1
    assert(banded.forall(r => r.getDouble(3) <= 1.0 + 1e-12))
  }

  test("q_bm25 scores rank-monotonically and self-retrieval is excluded") {
    val res = SparkEntry.queries("q_bm25")(spark, sfDir).collect()
    assert(res.nonEmpty)
    res.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val byRank = rs.sortBy(_.getLong(1))
      // ranks are 1..k dense, scores non-increasing, query doc never
      // retrieves itself (the LOO discipline)
      assert(byRank.map(_.getLong(1)).toSeq == (1L to byRank.length))
      val scores = byRank.map(_.getDouble(3)).toSeq
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
      assert(byRank.forall(_.getLong(2) != qid))
      // every BM25 term is idf>=0 times a positive saturation ratio
      assert(scores.forall(_ >= 0.0))
    }
  }
}

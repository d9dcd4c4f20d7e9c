package graft

/** Independent reference for the round-14 query — the Round12/13QueriesSpec
  * discipline: the declared result is checked against a driver-side
  * recomputation from raw table rows that shares no plan code with the
  * query path (the oracle gate proves Spark == DuckDB; this proves both ==
  * the definition).
  */
class Round14QueriesSpec extends SparkTestBase {

  test("q_mmr matches a driver-side greedy MMR recomputation") {
    val vecs = graft.model.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    // strict left-to-right folds, matching Spark aggregate()/DuckDB
    // list_reduce element order so the doubles are bit-identical
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def nrm(a: Array[Double]): Double = dot(a, a)
    def cos(a: Long, b: Long): Double =
      dot(vecs(a), vecs(b)) / math.sqrt(nrm(vecs(a)) * nrm(vecs(b)))

    val expected = (0L until 3L).flatMap { qid =>
      val pool = vecs.keys.filter(_ != qid).toSeq
        .map(c => (c, cos(qid, c)))
        .sortBy { case (c, r) => (-r, c) }.take(20)
      var picked = Vector.empty[(Long, Double, Double)] // (cid, rel, score)
      var avail = pool
      while (picked.size < 5) {
        val scored = avail.map { case (c, r) =>
          val sc =
            if (picked.isEmpty) 0.5 * r
            else 0.5 * r - 0.5 * picked.map(p => cos(c, p._1)).max
          (c, r, sc)
        }
        val best = scored.sortBy { case (c, _, sc) => (-sc, c) }.head
        picked :+= best
        avail = avail.filterNot(_._1 == best._1)
      }
      picked.zipWithIndex.map { case ((c, r, sc), i) =>
        (qid, (i + 1).toLong, c, r, sc)
      }
    }
    val got = SparkEntry.queries("q_mmr")(spark, sfDir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    spark.sharedState.cacheManager.clearCache()
    assert(got == expected.toSeq)
  }
}

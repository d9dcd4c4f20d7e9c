package graft

/** Mathematical invariants of the measured-quality queries — properties the
  * oracle hash can't express because they must hold at EVERY scale, not just
  * equal a value at one: recall/precision are genuine ratios of subset
  * counts, and no packing can beat the volume lower bound.
  */
class QualityMetricsSpec extends SparkTestBase {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir).collect()

  test("q_minhash_recall: hits are a subset of both truth and candidates") {
    val r = run("q_minhash_recall").head
    val (nCand, nTruth, nHits) =
      (r.getAs[Long]("n_cand"), r.getAs[Long]("n_truth"), r.getAs[Long]("n_hits"))
    assert(nHits <= nTruth && nHits <= nCand)
    assert(nTruth > 0, "vacuous ground truth — no Jaccard>=0.5 pairs in corpus")
    val (rec, prec) = (r.getAs[Double]("recall"), r.getAs[Double]("prec"))
    assert(rec >= 0.0 && rec <= 1.0 && prec >= 0.0 && prec <= 1.0)
  }

  test("q_pack_bins: bin consumption is exact, straddles are bounded by docs") {
    val rows = run("q_pack_bins")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bins, total, nDocs) = (r.getAs[Long]("bins"),
        r.getAs[Long]("total_tok"), r.getAs[Long]("n_docs"))
      assert(bins >= 1L && bins * 2048 >= total && (bins - 1) * 2048 < total,
        s"bins != ceil(total/2048) in ${r.getAs[String]("source")}")
      Seq("straddle_naive", "straddle_sorted").foreach { c =>
        val st = r.getAs[Long](c)
        assert(st >= 0L && st <= nDocs,
          s"$c out of [0, n_docs] in ${r.getAs[String]("source")}")
      }
    }
  }

  test("q_shuffle_shards: a true permutation — contiguous positions per shard") {
    val rows = run("q_shuffle_shards")
    val n = graft.model.Tables.documents(spark, sfDir).count()
    assert(rows.length == n, "shuffle must keep every document exactly once")
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rs) =>
      val pos = rs.map(_.getAs[Long]("pos")).sorted.toSeq
      assert(pos == (1L to rs.length).toSeq,
        s"shard $shard positions are not contiguous 1..${rs.length}")
    }
  }

  test("q_length_outliers: strictly-above-p95 rows are at most ~5% of corpus") {
    val n = graft.model.Tables.documents(spark, sfDir).count()
    val outliers = run("q_length_outliers").length
    assert(outliers <= n * 0.05 + 1,
      s"$outliers outliers from $n docs exceeds the p95 tail bound")
  }
}

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

  test("q_pack_bins: no packing order beats the volume lower bound") {
    val rows = run("q_pack_bins")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lb = r.getAs[Long]("bins_lb")
      assert(lb >= 1L)
      assert(r.getAs[Long]("bins_naive") >= lb,
        s"naive packing beat the lower bound in ${r.getAs[String]("source")}")
      assert(r.getAs[Long]("bins_sorted") >= lb,
        s"sorted packing beat the lower bound in ${r.getAs[String]("source")}")
    }
  }

  test("q_length_outliers: strictly-above-p95 rows are at most ~5% of corpus") {
    val n = graft.model.Tables.documents(spark, sfDir).count()
    val outliers = run("q_length_outliers").length
    assert(outliers <= n * 0.05 + 1,
      s"$outliers outliers from $n docs exceeds the p95 tail bound")
  }
}

package graft

/** Pins the round-14 wide-integer fix in q_quality_auc's shared kernel
  * (`TextAnalysis.aucOfGroups`): the old shape computed num2 and the 2·P·N
  * denominator in LongType, which wraps SILENTLY (non-ANSI) once
  * count-products pass 2^63 — the VERDICT r13 bound was N ≈ 3.0e6 docs via
  * roundDiv's 2·10⁶ scale multiplier, and at the 100 TB operating point
  * N ≫ 3e6 is the norm while the sf0.01 oracle can never reach it. Every
  * case here drives the kernel with synthetic per-score group counts AT or
  * PAST the old bound and matches an exact BigInt recomputation of the
  * Mann-Whitney statistic (half-credit ties, round-half-away at 6 dp).
  */
class AucWideSpec extends SparkTestBase {

  /** Exact rational AUC from (score, p, ng) groups — pure BigInt, shares
    * nothing with the query path.
    */
  private def exactAuc(groups: Seq[(Long, Long, Long)]): (Long, Long, Option[Double]) = {
    val sorted = groups.sortBy(_._1)
    var nb = BigInt(0); var num2 = BigInt(0)
    var nPos = 0L; var nNeg = 0L
    sorted.foreach { case (_, p, ng) =>
      num2 += BigInt(p) * (2 * nb + ng)
      nb += ng; nPos += p; nNeg += ng
    }
    val auc =
      if (nPos > 0 && nNeg > 0) {
        val den = BigInt(2) * nPos * nNeg
        // round-half-away-from-zero at 6 dp on the true rational
        val mag = (num2.abs * 2 * 1000000L + den) / (den * 2)
        Some(mag.toDouble / 1e6)
      } else None
    (nPos, nNeg, auc)
  }

  private def run(groups: Seq[(Long, Long, Long)]): (Long, Long, Option[Double]) = {
    import spark.implicits._
    val g = groups.toDF("score", "p", "ng")
    val r = graft.queries.TextAnalysis.aucOfGroups(g).collect()(0)
    (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))
  }

  test("num2 past the old 2^63/(2*10^6) wrap bound is exact") {
    // nb for the top group is 3e6 → num2 = 3e6·(6e6+1e6) = 2.1e13, which
    // the old roundDiv scale multiplier (×2·10⁶) pushed past 2^63
    val groups = Seq((1L, 0L, 3000000L), (2L, 3000000L, 1000000L))
    assert(run(groups) === exactAuc(groups))
    assert(run(groups)._3 === Some(0.875))
  }

  test("billions-scale counts: num2 and 2*P*N both exceed 2^63") {
    // num2 = 3e9·(2·4e9) = 2.4e19 > 2^63; den = 2·3e9·4e9 = 2.4e19 > 2^63:
    // every N-sized product in the old LongType shape wraps here
    val sep = Seq((1L, 0L, 4000000000L), (2L, 3000000000L, 0L))
    assert(run(sep) === exactAuc(sep))
    assert(run(sep)._3 === Some(1.0))

    // single tied group: num2 = 3e9·4e9 = 1.2e19 > 2^63 → half credit
    val tied = Seq((5L, 3000000000L, 4000000000L))
    assert(run(tied) === exactAuc(tied))
    assert(run(tied)._3 === Some(0.5))
  }

  test("degenerate single-class inputs yield null auc") {
    assert(run(Seq((1L, 5L, 0L))) === (5L, 0L, None))
    assert(run(Seq((1L, 0L, 5L))) === (0L, 5L, None))
  }

  test("an uneven many-group case matches the exact rational") {
    val groups = (0L until 40L).map(i =>
      (i, (i * 2654435761L) % 2000000000L, (i * 40503L * 65537L) % 1500000000L))
    assert(run(groups) === exactAuc(groups))
  }
}

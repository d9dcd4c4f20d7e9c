package graft

import org.apache.spark.sql.functions._

/** q_pca_power: dominant principal component by exact-integer power
  * iteration. Checked against an INDEPENDENT driver-side eigensolver —
  * plain double-precision covariance + 300 power-iteration steps with L2
  * normalization (a different arithmetic, normalization, and iteration
  * count from the query's quantized ∞-norm loop) — the two must agree in
  * direction to ~quantization error. Plus the spectral invariants.
  */
class PcaSpec extends SparkTestBase {

  private lazy val vecs: Array[Array[Double]] =
    graft.model.Tables.embeddings(spark, sfDir)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  private lazy val result = {
    val rows = SparkEntry.queries("q_pca_power")(spark, sfDir).collect()
    (rows.map(_.getDouble(1)), rows.head.getLong(2))
  }

  test("loading agrees in direction with a double-precision eigensolver") {
    val n = vecs.length
    val dims = vecs.head.length
    val mean = Array.tabulate(dims)(d => vecs.map(_(d)).sum / n)
    val cov = Array.tabulate(dims, dims) { (i, j) =>
      vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
    }
    var v = Array.fill(dims)(1.0)
    for (_ <- 1 to 300) {
      val w = Array.tabulate(dims)(i =>
        (0 until dims).map(j => cov(i)(j) * v(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm)
    }
    val (loading, _) = result
    val dot = loading.zip(v).map { case (a, b) => a * b }.sum
    val na = math.sqrt(loading.map(x => x * x).sum)
    val cosine = math.abs(dot) / na // v is unit-norm
    assert(cosine > 0.9999, s"direction cosine $cosine")
  }

  test("spectral invariants: unit ∞-norm, PSD eigenvalue, Rayleigh match") {
    val (loading, lambdaN) = result
    // ∞-norm normalization pins max |component| to ~1 (the 1e9 scale)
    val mx = loading.map(math.abs).max
    assert(mx <= 1.0 && mx > 0.5, s"inf-norm $mx")
    // covariance is PSD: the dominant eigenvalue estimate is nonnegative
    assert(lambdaN >= 0L)
    // lambda_n is the ∞-norm Rayleigh quotient of the normalized integer
    // matrix — recompute the same quotient in double from the raw data and
    // demand agreement within the quantization/normalization slack
    val n = vecs.length.toDouble
    val dims = vecs.head.length
    val q = vecs.map(_.map(x => math.floor(x * 1e6)))
    val s2 = Array.tabulate(dims, dims) { (i, j) =>
      q.map(v => v(i) * v(j)).sum
    }
    val m = Array.tabulate(dims)(d => q.map(_(d)).sum)
    val c = Array.tabulate(dims, dims)((i, j) => n * s2(i)(j) - m(i) * m(j))
    val dv = c.flatten.map(math.abs).max / 1e9 + 1
    val lam = {
      val w = Array.tabulate(dims)(i =>
        (0 until dims).map(j => c(i)(j) / dv * result._1(j)).sum)
      w.map(math.abs).max / result._1.map(math.abs).max
    }
    // lambda_n is declared in 1e-6 units of the normalized matrix
    assert(math.abs(lam - lambdaN / 1e6) / lam < 1e-3,
      s"rayleigh $lam vs ${lambdaN / 1e6}")
  }

  test("q_axis_histogram matches a driver-side projection + binning") {
    // rebuild the projection from the raw vectors and the QUERY's own
    // loading vector (exact: loading·1e9 is the integer eigenvector), bin
    // with the same floor rule, compare the full histogram
    val v = result._1.map(x => math.round(x * 1e9))
    val projs = vecs.map { x =>
      x.indices.map(d => math.floor(x(d) * 1e6).toLong * v(d)).sum
    }
    val mn = projs.min
    val mx = projs.max
    val byBin = projs.groupBy(p =>
      math.min(15L, (p - mn) * 16 / (mx - mn + 1)))
    def halfUp(a: Long, b: Long): Double =
      ((2 * a * 1000000L + b) / (2 * b)).toDouble / 1e6
    val expected = byBin.toSeq.sortBy(_._1).map { case (b, ps) =>
      (b, ps.length.toLong, ps.min, ps.max,
        halfUp(ps.length.toLong, projs.length.toLong))
    }
    val got = SparkEntry.queries("q_axis_histogram")(spark, sfDir).collect()
      .map { case org.apache.spark.sql.Row(b: Long, n: Long, lo: Long,
        hi: Long, sh: Double) => (b, n, lo, hi, sh) }.toSeq
    assert(got === expected)
    // the histogram partitions the corpus
    assert(got.map(_._2).sum === vecs.length.toLong)
  }
}

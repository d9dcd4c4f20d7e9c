package graft

import org.apache.spark.sql.functions._
import graft.functions.GramAgg

/** Exactness pins for the GramMoments TypedImperativeAggregate — the
  * one-pass Gram kernel behind q_pca_power. Three things can silently rot
  * in a typed-imperative aggregate and none shows up in a plan audit: the
  * cell enumeration order, the serialize/merge path (only exercised when
  * partial buffers cross partitions), and the long→BigInteger overflow
  * flush. Each is pinned against a driver-side BigInt reference.
  */
class GramAggSpec extends SparkTestBase {

  private def reference(rows: Seq[Seq[Long]], dims: Int): Seq[BigInt] = {
    val nTri = dims * (dims + 1) / 2
    val acc = Array.fill(nTri + dims + 1)(BigInt(0))
    rows.foreach { x =>
      var k = 0
      for (i <- 0 until dims; j <- i until dims) {
        acc(k) += BigInt(x(i)) * BigInt(x(j)); k += 1
      }
      for (i <- 0 until dims) acc(nTri + i) += BigInt(x(i))
      acc(nTri + dims) += 1
    }
    acc.toSeq
  }

  private def run(rows: Seq[Seq[Long]], dims: Int, parts: Int): Seq[BigInt] = {
    import spark.implicits._
    rows.toDF("q").repartition(parts)
      .agg(GramAgg.gramMoments(col("q"), dims).as("g"))
      .head().getSeq[java.math.BigDecimal](0)
      .map(bd => BigInt(bd.toBigInteger))
  }

  test("matches the exact BigInt reference, including enumeration order") {
    val dims = 4
    val rows = (1 to 57).map(r =>
      Seq.tabulate(dims)(i => (r * 31L + i * 17L) * (if (i % 2 == 0) 1 else -1)))
    assert(run(rows, dims, parts = 1) === reference(rows, dims))
  }

  test("merge across many partitions is exact (serialize/deserialize path)") {
    val dims = 5
    val rows = (1 to 203).map(r =>
      Seq.tabulate(dims)(i => (r * 997L - i * 403L) % 1000000L))
    // 7 partitions on 203 rows forces partial buffers through
    // serialize → shuffle → deserialize → merge
    assert(run(rows, dims, parts = 7) === reference(rows, dims))
  }

  test("near-bound magnitudes trigger the BigInteger flush and stay exact") {
    // |x| = 2.9e9 → per-row prodMax ≈ 8.4e18 > SlackMax (≈4.6e18), so the
    // long lane flushes on EVERY row — the overflow path is the hot path
    // here. True Gram sums (≈ 3.4e20) exceed Long by two orders of
    // magnitude; exact equality proves no silent wrap.
    val dims = 3
    val big = 2900000000L
    val rows = (1 to 40).map(r => Seq(big, -big, r.toLong))
    assert(run(rows, dims, parts = 3) === reference(rows, dims))
  }

  test("null rows are skipped; out-of-bound magnitudes refuse loudly") {
    import spark.implicits._
    val dims = 2
    val df = Seq(Some(Seq(3L, 4L)), None, Some(Seq(5L, 6L)))
      .toDF("q").repartition(2)
    val got = df.agg(GramAgg.gramMoments(col("q"), dims).as("g"))
      .head().getSeq[java.math.BigDecimal](0).map(bd => BigInt(bd.toBigInteger))
    assert(got === reference(Seq(Seq(3L, 4L), Seq(5L, 6L)), dims))
    val bad = Seq(Seq(4000000000L, 0L)).toDF("q")
    val e = intercept[Exception] {
      bad.agg(GramAgg.gramMoments(col("q"), dims)).head()
    }
    assert(e.getMessage != null)
  }

  test("wrong element type fails at ANALYSIS, not with silently wrong sums") {
    // The hot loop reads raw 8-byte words (UnsafeArrayData.getLong); an
    // array<int> child would read misaligned words and produce garbage
    // sums with no runtime error. checkInputDataTypes must reject it
    // before any task runs (ADVICE r12).
    import spark.implicits._
    val ints = Seq(Seq(3, 4), Seq(5, 6)).toDF("q")
    val e = intercept[Exception] {
      ints.agg(GramAgg.gramMoments(col("q"), 2)).head()
    }
    assert(e.getMessage.contains("array<bigint>"),
      s"expected analysis-time type error, got: ${e.getMessage}")
  }
}

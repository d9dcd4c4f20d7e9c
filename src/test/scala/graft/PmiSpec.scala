package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** q_pmi_terms: top-3 distinctive tokens per source by PMI with a c_ws ≥ 5
  * support floor. Re-derived by a driver-side brute force over sf0.001
  * (plain Scala maps, BigDecimal rounding — a different method from the
  * distributed marginal joins + window), plus the identities that make PMI
  * the right distinctiveness score.
  */
class PmiSpec extends SparkTestBase {

  private lazy val toks: Seq[(String, String)] =
    graft.model.Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .toSeq.flatMap { case Row(s: String, t: String) =>
        t.split(" ", -1).map(s -> _) }

  test("q_pmi_terms matches a driver-side brute force") {
    val cws = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cs = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cw = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = toks.length.toLong
    val expected = cws.toSeq.collect {
      case ((src, tok), c) if c >= 5 =>
        val pmi = BigDecimal(math.log((c * n) / (cs(src) * cw(tok)).toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (src, tok, c, pmi)
    }.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (src, terms) =>
      terms.sortBy(t => (-t._4, t._2)).take(3).zipWithIndex.map {
        case ((s, tok, c, pmi), i) => (s, (i + 1).toLong, tok, c, pmi)
      }
    }

    val got = SparkEntry.queries("q_pmi_terms")(spark, sfDir).collect()
      .map { case Row(s: String, r: Long, t: String, c: Long, p: Double) =>
        (s, r, t, c, p) }.toSeq
    assert(got === expected)
  }

  test("q_pmi_terms: PMI of a source-exclusive token is ln(N / c_s)") {
    // identity check on a synthetic corpus: if token w occurs ONLY in
    // source s (c_w = c_ws), PMI = ln(c_ws·N / (c_s·c_ws)) = ln(N/c_s) —
    // independent of the count; and a token spread proportionally across
    // sources has PMI = ln 1 = 0. Both exercised by construction.
    import spark.implicits._
    // source a: 10 tokens, 5 of them the a-only word "zonly"; source b:
    // 30 tokens. "common" appears in proportion 5:15 = c_s ratio → PMI 0.
    val docs = Seq(
      (1L, ("zonly " * 5 + "common " * 5).trim, "en", "a"),
      (2L, ("common " * 15 + "filler " * 15).trim, "en", "b"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("pmi_probe").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q_pmi_terms")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(2), r.getDouble(4))).toSeq
    val n = 40.0
    val lnExclusive = BigDecimal(math.log(n / 10.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.contains(("a", "zonly", lnExclusive)))
    assert(rows.contains(("a", "common", 0.0)))
    assert(rows.contains(("b", "common", 0.0)))
    // real-corpus sanity: support floor and rank bound hold everywhere
    val real = SparkEntry.queries("q_pmi_terms")(spark, sfDir).collect()
    assert(real.nonEmpty)
    assert(real.forall(r => r.getLong(3) >= 5L && r.getLong(1) <= 3L))
  }
}

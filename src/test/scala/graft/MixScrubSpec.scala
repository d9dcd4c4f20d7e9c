package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.Exprs.md5Long

/** Pins the two round-9 curation operators.
  *
  * q_mix_sources' bucket-threshold selection exists so a source is never
  * funnelled through one window task; this spec proves the optimization is
  * semantics-free — the selected set must EQUAL the naive per-source greedy
  * prefix (one global window per source over (bkt, hv, doc_id) order, the
  * plan the bucketed form deliberately avoids at scale).
  *
  * q_pii_scrub must actually scrub: zero residual pattern matches in the
  * scrubbed text, and the planted PII rows must be counted.
  */
class MixScrubSpec extends SparkTestBase {

  private val emailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private val ipRe = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""

  test("q_mix_sources equals the naive per-source greedy prefix") {
    val got = SparkEntry.queries("q_mix_sources")(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // independent naive derivation: same hash channel / weights / budget,
    // but selection via ONE running-sum window per source
    val tb = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        md5Long(concat(lit("mix:"), col("doc_id").cast("string"))).as("hv"))
      .withColumn("bkt", col("hv") % 256)
    val tot = tb.agg(expr("sum(n_tok) div 2").as("budget"))
    val sw = tb.groupBy("source").agg(
      expr("cast(cast(substr(source, 4) as int) % 4 + 1 as bigint)").as("w"))
    val tgt = sw.crossJoin(tot).crossJoin(sw.agg(sum("w").as("tw")))
      .select(col("source"), expr("budget * w div tw").as("target"))
    val w = Window.partitionBy("source").orderBy("bkt", "hv", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = tb.join(tgt, Seq("source"))
      .withColumn("pre", coalesce(sum("n_tok").over(w), lit(0L)))
      .filter(col("pre") < col("target"))
      .select("doc_id").collect().map(_.getLong(0)).toSet

    assert(got === naive)
    assert(got.nonEmpty)
  }

  test("q_mix_sources respects every source allocation") {
    // selected tokens stay within target + one straddling document (the
    // greedy-prefix overshoot bound), and no source is over-allocated by
    // a whole document
    val sel = SparkEntry.queries("q_mix_sources")(spark, sfDir)
    val tb = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    val tot = tb.agg(expr("sum(n_tok) div 2").as("budget"))
    val sw = tb.groupBy("source").agg(
      expr("cast(cast(substr(source, 4) as int) % 4 + 1 as bigint)").as("w"))
    val tgt = sw.crossJoin(tot).crossJoin(sw.agg(sum("w").as("tw")))
      .select(col("source"), expr("budget * w div tw").as("target"))
    val bad = sel.groupBy("source")
      .agg(sum("n_tok").as("sel_tok"), max("n_tok").as("max_tok"))
      .join(tgt, Seq("source"))
      .filter(col("sel_tok") > col("target") + col("max_tok"))
      .count()
    assert(bad === 0L)
  }

  test("q_pii_scrub leaves no residual matches and counts planted PII") {
    val out = SparkEntry.queries("q_pii_scrub")(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val byId = rows.map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    byId.foreach { case (id, (nEmail, nIp)) =>
      if (id % 3 == 0) { assert(nEmail >= 1L); assert(nIp >= 1L) }
      else if (id % 7 == 2) assert(nIp >= 1L)
      else assert(nEmail === 0L)
    }
    // re-scrub the scrubbed text: the declared query only exposes the
    // hash, so recompute the scrub here and assert idempotence
    val aug = when(col("doc_id") % 3 === 0,
      concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@mail.example.com from 10.0."),
        (col("doc_id") % 256).cast("string"), lit(".7")))
      .when(col("doc_id") % 7 === 2,
        concat(col("text"), lit(" ip 192.168.1."),
          (col("doc_id") % 200).cast("string")))
      .otherwise(col("text"))
    val residual = Tables.documents(spark, sfDir)
      .select(regexp_replace(
        regexp_replace(aug, emailRe, "<EMAIL>"), ipRe, "<IP>").as("t"))
      .filter(regexp_count(col("t"), lit(emailRe)) > 0 ||
        regexp_count(col("t"), lit(ipRe)) > 0)
      .count()
    assert(residual === 0L)
  }
}

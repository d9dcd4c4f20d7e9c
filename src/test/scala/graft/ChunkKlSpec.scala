package graft

import org.apache.spark.sql.functions._
import graft.ops.Exprs.md5LongLocal

/** Round-11 operators: q_chunk_cdc (content-defined chunking + duplicate-
  * chunk census) and q_kl_sources (per-source unigram KL divergence).
  * Each is checked against an independent driver-side derivation, and the
  * PROPERTIES that motivate the operators are pinned directly: CDC's
  * content-locality under edits, and KL's non-negativity for genuine
  * smoothed distributions.
  */
class ChunkKlSpec extends SparkTestBase {

  /** The query's boundary rule, driver-side: token closes its chunk when
    * md5("cdc:"||tok) mod 16 == 0.
    */
  private def isBreak(tok: String): Boolean =
    md5LongLocal("cdc:" + tok) % 16 == 0

  /** Driver-side reference chunker: (chunk_id, start, tokens) per doc. */
  private def chunk(ts: Seq[String]): Seq[(Long, Long, Seq[String])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Seq[String])]
    var id = 0L; var start = 1L
    var cur = scala.collection.mutable.ArrayBuffer.empty[String]
    ts.zipWithIndex.foreach { case (t, i) =>
      cur += t
      if (isBreak(t) && i < ts.length - 1) {
        out += ((id, start, cur.toSeq)); id += 1; start = i + 2
        cur = scala.collection.mutable.ArrayBuffer.empty[String]
      }
    }
    if (cur.nonEmpty) out += ((id, start, cur.toSeq))
    out.toSeq
  }

  test("q_chunk_cdc tiles every document and matches the reference chunker") {
    val docs = graft.model.Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val expected = docs.toSeq.flatMap { case (id, ts) =>
      chunk(ts).map { case (cid, start, toks) =>
        (id, cid, start, toks.length.toLong,
          md5LongLocal(toks.mkString(" ")))
      }
    }.sortBy(t => (t._1, t._2))

    val got = SparkEntry.queries("q_chunk_cdc")(spark, sfDir)
      .select("doc_id", "chunk_id", "start", "n_tok", "fp")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sortBy(t => (t._1, t._2))
    assert(got === expected)

    // tiling: per doc, chunks are contiguous from 1 to n with no gap
    got.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 === 1L)
      sorted.sliding(2).foreach {
        case Seq((_, _, s1, n1, _), (_, _, s2, _, _)) =>
          assert(s2 === s1 + n1, s"doc $id: gap between chunks")
        case _ =>
      }
      assert(sorted.map(_._4).sum === docs(id).length.toLong)
    }
  }

  test("q_chunk_cdc n_docs census matches a brute-force fingerprint count") {
    val rows = SparkEntry.queries("q_chunk_cdc")(spark, sfDir)
      .select("doc_id", "fp", "n_docs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byFp = rows.groupBy(_._2).map { case (fp, xs) =>
      fp -> xs.map(_._1).distinct.size.toLong }
    rows.foreach { case (_, fp, nd) => assert(nd === byFp(fp)) }
  }

  test("CDC boundaries are content-local: an edit re-chunks only its span") {
    // the property that makes CDC the dedup chunking: splice 5 tokens into
    // the middle of a real document and the chunk fingerprints outside the
    // edited chunk's neighborhood are IDENTICAL, while fixed-width
    // chunking shifts every chunk after the edit point
    val ts = graft.model.Tables.documents(spark, sfDir)
      .orderBy(desc("n_chars")).select(split(col("text"), " "))
      .limit(1).collect().head.getSeq[String](0)
    assert(ts.length >= 40, "need a long doc for the splice test")
    val mid = ts.length / 2
    val edited = ts.take(mid) ++ Seq("x1", "x2", "x3", "x4", "x5") ++ ts.drop(mid)

    def fps(t: Seq[String]) = chunk(t).map(_._3.mkString(" ")).map(md5LongLocal)
    val before = fps(ts)
    val after = fps(edited)
    // all original fingerprints except the one(s) covering the splice
    // point survive; the edit inserts/alters a bounded neighborhood
    val sharedHead = before.zip(after).takeWhile { case (a, b) => a == b }.length
    val sharedTail = before.reverse.zip(after.reverse)
      .takeWhile { case (a, b) => a == b }.length
    assert(sharedHead + sharedTail >= before.length - 2,
      s"edit disturbed more than 2 chunks: head=$sharedHead tail=$sharedTail of ${before.length}")
    assert(after.length >= before.length, "splice cannot lose chunks")

    // contrast: fixed-width (16-token) chunking shifts EVERY chunk at or
    // after the edit — the downstream fingerprints all churn
    def fixed(t: Seq[String]) = t.grouped(16).map(g => md5LongLocal(g.mkString(" "))).toSeq
    val fb = fixed(ts); val fa = fixed(edited)
    val fixedHead = fb.zip(fa).takeWhile { case (a, b) => a == b }.length
    val fixedTail = fb.reverse.zip(fa.reverse)
      .takeWhile { case (a, b) => a == b }.length
    assert(fixedTail == 0 || ts.length % 16 == (ts.length + 5) % 16,
      "fixed-width should not preserve the tail on a 5-token splice")
    assert(fixedHead + fixedTail < fb.length,
      "fixed-width chunking should churn the post-edit fingerprints")
  }

  test("q_kl_sources is non-negative and matches a driver-side KL") {
    val docs = graft.model.Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1).split(" ", -1).toSeq)
    val all = docs.flatMap(_._2)
    val nAll = all.length.toLong
    val vocab = all.distinct
    val v = vocab.length.toLong
    val cAll = all.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val expected = docs.groupBy(_._1).toSeq.map { case (src, ds) =>
      val toks = ds.flatMap(_._2)
      val nS = toks.length.toLong
      val cS = toks.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
      // same per-term rounding discipline as the query: round(ln, 6),
      // exact weighted sum, one final half-away rounding at 1e-6
      val sum6 = vocab.map { w =>
        val cs = cS.getOrElse(w, 0L)
        val lr = BigDecimal(math.log((cs + 1).toDouble * (nAll + v) /
          ((cAll(w) + 1).toDouble * (nS + v))))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        BigDecimal(cs + 1) * lr
      }.sum
      val kl = (sum6 * 1000000 / BigDecimal(nS + v))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP) / 1000000
      (src, nS, cS.size.toLong, kl.toDouble)
    }.sortBy(_._1)

    val got = SparkEntry.queries("q_kl_sources")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got.map(t => (t._1, t._2, t._3)) ===
      expected.map(t => (t._1, t._2, t._3)))
    got.zip(expected).foreach { case ((src, _, _, g), (_, _, _, e)) =>
      // double log vs BigDecimal-of-double log agree after round-6; allow
      // one ulp of the 1e-6 grid for the final division
      assert((g - e).abs <= 2e-6, s"$src: kl $g vs reference $e")
    }
    // genuine smoothed distributions over one vocabulary: KL >= 0 up to
    // the accumulated per-term rounding (<= 5e-7) + final rounding
    got.foreach { case (src, _, _, kl) =>
      assert(kl >= -2e-6, s"$src: negative KL $kl")
    }
  }
}

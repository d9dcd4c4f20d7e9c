package graft

import org.apache.spark.sql.Row

/** Independent references for the round-13 queries — the Round12QueriesSpec
  * discipline: each declared result is checked against a driver-side
  * recomputation from raw table rows that shares no plan code with the
  * query path (the oracle gate proves Spark == DuckDB; these prove both ==
  * the definition).
  */
class Round13QueriesSpec extends SparkTestBase {

  private val S = 1000000L

  test("q_logreg_train replays the fixed-point GD loop exactly") {
    import graft.ops.Exprs.md5LongLocal
    val docs = graft.model.Tables.documents(spark, sfDir)
      .select("text", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // features: 8 bucket counts over the independent 'lt:' channel
    val feat = docs.map { case (text, lang) =>
      val f = new Array[Long](8)
      // split(" ", -1): keep trailing empty tokens, matching Spark split /
      // DuckDB string_split (Java's 1-arg split drops them)
      text.split(" ", -1).foreach(w => f((md5LongLocal(s"lt:$w") % 8).toInt) += 1)
      (if (lang == "en") 1L else 0L, f)
    }
    val n = feat.length.toLong
    def truncDiv4(m: Long): Long = { val q = math.abs(m) / 4; if (m < 0) -q else q }
    def roundHalfAway(a: BigInt, b: BigInt): Long =
      ((a.abs * 2 + b) / (b * 2)).toLong * (if (a < 0) -1 else 1)
    var b = 0L; var w = new Array[Long](8)
    val perEpoch = (1 to 4).map { _ =>
      var nc = 0L; var gb = BigInt(0); val g = Array.fill(8)(BigInt(0))
      feat.foreach { case (y, f) =>
        val m = b + (0 until 8).map(j => w(j) * f(j)).sum
        val phat = math.min(S, math.max(0L, S / 2 + truncDiv4(m)))
        val r = phat - y * S
        if ((m > 0) == (y == 1L)) nc += 1
        gb += r
        (0 until 8).foreach(j => g(j) += BigInt(r) * f(j))
      }
      val snapshotB = b; val snapshotW = w.clone()
      b -= roundHalfAway(gb, BigInt(10) * n)
      w = (0 until 8).map(j => w(j) - roundHalfAway(g(j), BigInt(10) * n)).toArray
      (snapshotB, snapshotW, nc) // nc is the accuracy AT the snapshot weights
    }
    val rows = SparkEntry.queries("q_logreg_train")(spark, sfDir)
      .collect().sortBy(_.getLong(0))
    assert(rows.length === 3)
    rows.foreach { r =>
      val e = r.getLong(0).toInt
      // declared row e carries weights AFTER update e = the snapshot the
      // (e+1)-th pass evaluated, and n_correct measured at those weights
      val (expB, expW, expNc) = perEpoch(e) // perEpoch(e) snapshots w_e
      assert(r.getLong(1) === expB, s"epoch $e bias")
      (0 until 8).foreach(j =>
        assert(r.getLong(2 + j) === expW(j), s"epoch $e w$j"))
      assert(r.getLong(10) === expNc, s"epoch $e n_correct")
      val accExact = (BigInt(expNc) * 2 * 1000000 + n) / (BigInt(n) * 2)
      assert(r.getDouble(11) === accExact.toLong / 1e6, s"epoch $e accuracy")
    }
    // the training curve must actually learn: accuracy at w3 >= at w1
    assert(rows.last.getLong(10) >= rows.head.getLong(10))
  }

  test("q_embed_stats matches BigInt moment recomputation") {
    val vecs = graft.model.Tables.embeddings(spark, sfDir)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dims = vecs.head.length
    val rows = SparkEntry.queries("q_embed_stats")(spark, sfDir).collect()
    assert(rows.length === dims)
    rows.foreach { case Row(dim: Long, n: Long, qmin: Long, qmax: Long,
        mean: Double, m2: Double) =>
      val qs = vecs.map(v => math.floor(v(dim.toInt) * 1000000 + 0.5).toLong)
      assert(n === qs.length.toLong)
      assert(qmin === qs.min && qmax === qs.max)
      val sq = qs.map(BigInt(_)).sum
      val sqq = qs.map(q => BigInt(q) * q).sum
      def rdiv(a: BigInt, b: BigInt, p: Long): Double = {
        val mag = (a.abs * 2 * p + b) / (b * 2)
        (if (a < 0) -mag else mag).toLong / p.toDouble
      }
      assert(mean === rdiv(sq, n, 1000000L), s"dim $dim mean")
      assert(m2 === rdiv(sqq, n, 100L), s"dim $dim m2")
      // moments are consistent: variance = m2 - mean^2 must be >= 0 up to
      // the two roundings' combined grid error
      assert(m2 - mean * mean >= -0.01)
    }
  }

  test("q_stream_topk: streamed ListState top-3 equals a driver recomputation") {
    val raw = graft.model.Tables.events(spark, sfDir)
      .select("user_id", "value", "event_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val expected = raw.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      es.sortBy { case (_, v, id) => (-v, id) }.take(3)
        .zipWithIndex.map { case ((_, _, id), i) => (u, (i + 1).toLong, id) }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q_stream_topk")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("q_schema_merge: old-generation rows really null-fill the new column") {
    val rows = SparkEntry.queries("q_schema_merge")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val ev = graft.model.Tables.events(spark, sfDir)
      .select("event_id", "event_type", "user_id", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    def agg(p: ((Long, String, Long, Double)) => Boolean, label: String) = {
      val g = ev.filter(p)
      (label, g.length.toLong, g.map(_._3).distinct.length.toLong,
        g.map(e => BigDecimal(e._4).setScale(2, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble)
    }
    val expected = (ev.map(_._2).distinct.sorted
      .map(t => agg(e => e._1 % 2 == 1 && e._2 == t, t)) :+
      agg(e => e._1 % 2 == 0, "(pre-schema)")).sortBy(_._1)
    assert(rows.toSeq === expected)
    // the sentinel group exists — i.e. the evolved column null-filled
    // for the old generation instead of dropping or erroring
    assert(rows.exists(_._1 == "(pre-schema)"))
  }

  test("q_dataset_diff statuses match the v2 derivation rules analytically") {
    val docs = graft.model.Tables.documents(spark, sfDir)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // the derivation: %10==3 removed, %10==7 changed (token appended —
    // content hash always differs), %10==0 cloned as added, rest unchanged
    val expected = docs.flatMap { case (id, src) =>
      val base = (id % 10) match {
        case 3 => Seq(("removed", src))
        case 7 => Seq(("changed", src))
        case 0 => Seq(("unchanged", src), ("added", src))
        case _ => Seq(("unchanged", src))
      }
      base
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = SparkEntry.queries("q_dataset_diff")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === expected)
  }

  test("q_bootstrap_ci: replica means and CI match a driver recomputation") {
    import graft.ops.Exprs.md5LongLocal
    val docs = graft.model.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def rdiv(a: BigInt, b: BigInt): Double =
      (((a.abs * 2 * 1000000 + b) / (b * 2)) * (if (a < 0) -1 else 1))
        .toLong / 1e6
    // Spark Percentile's exact op order: lo*(hi-pos) + hi*(pos-lo) — NOT
    // lo + (hi-lo)*frac, which differs in the last ulp on some inputs
    def pctl(vs: Array[Double], q: Double): Double = {
      val s = vs.sorted
      val pos = q * (s.length - 1); val lo = pos.toInt
      if (lo == s.length - 1) s(lo)
      else s(lo) * (lo + 1 - pos) + s(lo + 1) * (pos - lo)
    }
    val rows = SparkEntry.queries("q_bootstrap_ci")(spark, sfDir).collect()
    docs.groupBy(_._2).foreach { case (src, ds) =>
      val means = (0 until 32).flatMap { b =>
        val in = ds.filter(d => md5LongLocal(s"bs:$b:${d._1}") % 2 == 0)
        if (in.isEmpty) None
        else Some(rdiv(BigInt(in.map(_._3).sum), BigInt(in.length)))
      }.toArray
      val r = rows.find(_.getString(0) == src).get
      assert(r.getLong(1) === ds.length.toLong)
      assert(r.getDouble(2) === rdiv(BigInt(ds.map(_._3).sum), BigInt(ds.length)))
      assert(r.getLong(3) === means.length.toLong)
      assert(r.getDouble(4) === pctl(means, 0.025), s"$src ci_lo")
      assert(r.getDouble(5) === pctl(means, 0.975), s"$src ci_hi")
      // the interval brackets the full mean (half-sampling, huge overlap)
      assert(r.getDouble(4) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(5))
    }
  }

  test("q_phrase_search matches a driver-side positional recomputation") {
    val docs = graft.model.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).take(1024)))
    val bigrams = docs.flatMap { case (id, ts) =>
      ts.sliding(2).filter(_.length == 2)
        .zipWithIndex.map { case (Array(a, b), i) => (id, a, b, i + 1L) }
    }
    val (tw1, tw2) = bigrams.groupBy(b => (b._2, b._3)).toSeq
      .map { case (k, v) => (-v.length, k._1, k._2) }.min match {
      case (_, a, b) => (a, b)
    }
    val expected = bigrams.filter(b => b._2 == tw1 && b._3 == tw2)
      .groupBy(_._1).toSeq
      .map { case (id, os) => (id, tw1, tw2, os.length.toLong, os.map(_._4).min) }
      .sortBy(_._1)
    val got = SparkEntry.queries("q_phrase_search")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected)
  }

  test("q_outlier_mad matches a driver-side median/MAD recomputation") {
    val raw = graft.model.Tables.events(spark, sfDir)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // Spark Percentile / DuckDB quantile_cont interpolation, replicated op
    // for op (q_percentile proved the two engines agree; this pins both):
    // the exact form is lo*(hi-pos) + hi*(pos-lo)
    def pctl(vs: Array[Double], q: Double): Double = {
      val s = vs.sorted
      val pos = q * (s.length - 1)
      val lo = pos.toInt
      if (lo == s.length - 1) s(lo)
      else s(lo) * (lo + 1 - pos) + s(lo + 1) * (pos - lo)
    }
    val rows = SparkEntry.queries("q_outlier_mad")(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet === raw.keySet)
    rows.foreach { case Row(t: String, n: Long, med: Double, mad: Double,
        nOut: Long, rate: Double) =>
      val vs = raw(t)
      assert(n === vs.length.toLong)
      val expMed = pctl(vs, 0.5)
      assert(med === expMed, s"$t median")
      val adev = vs.map(v => math.abs(v - expMed))
      val expMad = pctl(adev, 0.5)
      assert(mad === expMad, s"$t mad")
      val expOut = adev.count(_ > 3 * expMad).toLong
      assert(nOut === expOut, s"$t outliers")
      val mag = (BigInt(expOut) * 2 * 1000000 + n) / (BigInt(n) * 2)
      assert(rate === mag.toLong / 1e6, s"$t rate")
    }
  }
}

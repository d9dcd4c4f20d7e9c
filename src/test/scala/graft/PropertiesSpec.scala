package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.Exprs._

/** Property tests for the scalar operators (SURVEY.md §5.2.3). Random cases
  * are generated driver-side with ScalaCheck generators, evaluated in ONE
  * Spark pass per property (a Spark job per ScalaCheck case would be
  * prohibitively slow), and the invariant asserted over every row.
  */
class PropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val EarthR = 6371000.0

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Seq.tabulate(n)(i => g.apply(Gen.Parameters.default, Seed(i.toLong)).get)

  private val coordGen: Gen[(Double, Double)] = for {
    lat <- Gen.chooseNum(-90.0, 90.0)
    lon <- Gen.chooseNum(-180.0, 180.0)
  } yield (lat, lon)

  private lazy val triples = sample(
    for { a <- coordGen; b <- coordGen; c <- coordGen } yield (a, b, c), 500)
    .map { case ((a1, a2), (b1, b2), (c1, c2)) => (a1, a2, b1, b2, c1, c2) }

  test("Morton interleave (q_zorder): bijective on the 1024x1024 key space") {
    // the same bit-interleave formula the query builds, evaluated in one
    // Spark pass; decode must invert encode exactly for random (x, y)
    val pairs = sample(for {
      x <- Gen.chooseNum(0L, 1023L); y <- Gen.chooseNum(0L, 1023L)
    } yield (x, y), 2000)
    val zCol = (0 until 10).map(b =>
      (shiftright(col("x"), b) % 2) * lit(1L << (2 * b)) +
        (shiftright(col("y"), b) % 2) * lit(1L << (2 * b + 1)))
      .reduce(_ + _)
    def unshuffle(zShifted: org.apache.spark.sql.Column) = // even bits of z
      (0 until 10).map(b =>
        (shiftright(zShifted, 2 * b) % 2) * lit(1L << b)).reduce(_ + _)
    val rows = pairs.toDF("x", "y")
      .withColumn("z", zCol)
      .select(col("x"), col("y"), col("z"),
        unshuffle(col("z")).as("x2"),
        unshuffle(shiftright(col("z"), 1)).as("y2"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(3) && r.getLong(1) == r.getLong(4),
        s"Morton round-trip failed: $r")
      assert(r.getLong(2) >= 0L && r.getLong(2) < (1L << 20))
    }
  }

  test("haversine: symmetry, zero self-distance, range [0, piR]") {
    val rows = triples.toDF("la", "lo", "lb", "ob", "lc", "oc")
      .select(
        haversineMeters(col("la"), col("lo"), col("lb"), col("ob")).as("ab"),
        haversineMeters(col("lb"), col("ob"), col("la"), col("lo")).as("ba"),
        haversineMeters(col("la"), col("lo"), col("la"), col("lo")).as("self"))
      .collect()
    rows.foreach { r =>
      val (ab, ba, self) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(math.abs(ab - ba) <= 1e-6, s"symmetry: $ab vs $ba")
      assert(self == 0.0, s"self-distance: $self")
      assert(ab >= 0.0 && ab <= math.Pi * EarthR + 1e-6, s"range: $ab")
    }
  }

  test("haversine: triangle inequality (with fp tolerance)") {
    val rows = triples.toDF("la", "lo", "lb", "ob", "lc", "oc")
      .select(
        haversineMeters(col("la"), col("lo"), col("lc"), col("oc")).as("ac"),
        haversineMeters(col("la"), col("lo"), col("lb"), col("ob")).as("ab"),
        haversineMeters(col("lb"), col("ob"), col("lc"), col("oc")).as("bc"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) <= r.getDouble(1) + r.getDouble(2) + 1e-3,
        s"triangle: ${r.getDouble(0)} > ${r.getDouble(1)} + ${r.getDouble(2)}")
    }
  }

  test("P2/P8 parse-format round-trip on generated UTC instants") {
    val tsGen = Gen.chooseNum(0L, 4102444800L) // 1970..2100, seconds
    val secs = sample(tsGen, 500)
    val rows = secs.toDF("s")
      .select(timestamp_seconds(col("s")).as("ts"))
      .withColumn("iso", date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
      .withColumn("back", parseIsoTs(col("iso")))
      .filter(col("back") =!= col("ts") || col("back").isNull)
    assert(rows.count() == 0)
  }

  test("O2 top-k == sort-then-take (total order)") {
    val li = graft.model.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    val ord = Seq(col("l_extendedprice").desc, col("l_orderkey").asc,
      col("l_linenumber").asc)
    val topk = li.orderBy(ord: _*).limit(40).collect().toSeq
    val full = li.orderBy(ord: _*).collect().take(40).toSeq
    assert(topk == full)
  }

  test("U1 union row-count additivity and unionByName column safety") {
    val o = graft.model.Tables.orders(spark, sfDir)
    val a = o.filter(col("o_orderkey") % 2 === 0)
    val b = o.filter(col("o_orderkey") % 2 =!= 0)
    assert(a.unionByName(b).count() == a.count() + b.count())
    // column order must not matter for unionByName
    val shuffledCols = Seq("o_orderpriority", "o_orderkey") ++
      o.columns.filterNot(Set("o_orderpriority", "o_orderkey"))
    val shuffled = b.select(shuffledCols.map(col): _*)
    assert(a.unionByName(shuffled).count() == o.count())
  }
  test("Hilbert chain (q_hilbert): matches classical xy2d and is injective") {
    // Scala reference: the classical iterative xy2d (rotate + reflect)
    def xy2d(x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var s = 512L
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    val pts = sample(for {
      x <- Gen.chooseNum(0L, 1023L); y <- Gen.chooseNum(0L, 1023L)
    } yield (x, y), 2000).distinct
    // the query's unrolled xor-free column chain, same construction
    var df = pts.toDF("x", "y")
      .select(col("x").as("xin"), col("y").as("yin"),
        col("x").as("x0"), col("y").as("y0"), lit(0L).as("d0"))
    for (i <- 0 until 10) {
      val sh = 1024 >> (i + 1)
      val rx = when(col(s"x$i").bitwiseAND(lit(sh.toLong)) > 0, 1L).otherwise(0L)
      val ry = when(col(s"y$i").bitwiseAND(lit(sh.toLong)) > 0, 1L).otherwise(0L)
      df = df.select(col("xin"), col("yin"),
        (col(s"d$i") + lit(sh.toLong * sh) *
          (rx * (lit(3L) - ry) + (lit(1L) - rx) * ry)).as(s"d${i + 1}"),
        when(ry === 1, col(s"x$i"))
          .when(rx === 1, lit((sh - 1).toLong) - col(s"y$i"))
          .otherwise(col(s"y$i")).as(s"x${i + 1}"),
        when(ry === 1, col(s"y$i"))
          .when(rx === 1, lit((sh - 1).toLong) - col(s"x$i"))
          .otherwise(col(s"x$i")).as(s"y${i + 1}"))
    }
    val rows = df.select(col("xin"), col("yin"), col("d10")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    rows.foreach { case ((x, y), dv) =>
      assert(dv == xy2d(x, y), s"chain != xy2d at ($x,$y)")
      assert(dv >= 0L && dv < (1L << 20))
    }
    assert(rows.map(_._2).distinct.length == rows.length,
      "Hilbert key collided — curve not injective on sample")
  }

  test("q_bpe_step premise: for w1 != w2, bigram count == greedy merge count") {
    // the query's exactness rests on this: occurrences of a non-identical
    // pair can never share a token, so the plain bigram count IS the greedy
    // left-to-right non-overlapping merge count. Simulate the greedy merge
    // on random sequences over a small alphabet and compare.
    val alpha = Vector("a", "b", "c")
    val seqGen = Gen.chooseNum(2, 30)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(alpha)))
    val cases = sample(seqGen, 400)
    cases.foreach { toks =>
      for (w1 <- alpha; w2 <- alpha if w1 != w2) {
        val bigramCount = toks.sliding(2)
          .count { case Seq(x, y) => x == w1 && y == w2; case _ => false }
        // greedy left-to-right merge
        var i = 0; var merges = 0
        while (i < toks.length - 1) {
          if (toks(i) == w1 && toks(i + 1) == w2) { merges += 1; i += 2 }
          else i += 1
        }
        assert(bigramCount == merges,
          s"pair ($w1,$w2) over $toks: bigrams=$bigramCount greedy=$merges")
      }
    }
  }

  test("q_rolling_window: RANGE frame == brute-force trailing-window scan") {
    val rowGen = for {
      u <- Gen.chooseNum(0L, 3L)
      t <- Gen.chooseNum(0L, 500L)
      v <- Gen.chooseNum(-100L, 100L)
    } yield (u, t, v)
    val rows = sample(rowGen, 300).zipWithIndex
      .map { case ((u, t, v), i) => (u, t, v, i.toLong) }
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy("t").rangeBetween(-50L, 0L)
    val got = rows.toDF("u", "t", "v", "id")
      .select(col("u"), col("t"), col("id"),
        count(lit(1)).over(win).as("n"),
        sum(col("v")).over(win).as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    rows.foreach { case (u, t, v, id) =>
      val inWin = rows.filter { case (u2, t2, _, _) =>
        u2 == u && t2 >= t - 50 && t2 <= t } // RANGE: peers by value, all ids
      val want = (inWin.length.toLong, inWin.map(_._3).sum)
      assert(got((u, t, id)) == want,
        s"row ($u,$t,$id): got ${got((u, t, id))}, want $want")
    }
  }

  test("HammingJoin: blocked join == all-pairs for random signatures and distances") {
    val sigGen = Gen.chooseNum(Long.MinValue, Long.MaxValue)
      .map(_ & ((1L << 60) - 1))
    // mix random signatures with planted near-dup clusters
    val base = sample(sigGen, 40)
    val flips = sample(Gen.chooseNum(0, 59), 120)
    val sigs = (base ++ base.take(20).zipWithIndex.flatMap { case (b, i) =>
      Seq(b ^ (1L << flips(i)), b ^ (1L << flips(i + 20)) ^ (1L << flips(i + 40)))
    }).zipWithIndex.map { case (sg, i) => (i.toLong, sg) }
    val df = sigs.toDF("doc_id", "simhash")
    for (maxDist <- Seq(0, 3, 8); k <- Seq(1, 2, 3)) {
      val naive = df.as("a").crossJoin(df.as("b"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"),
          bit_count(expr("a.simhash ^ b.simhash")).cast("long").as("h"))
        .filter(col("h") <= maxDist)
        .orderBy("a.doc_id", "b.doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val blocked = graft.ops.HammingJoin
        .pairsWithin(df, "doc_id", "simhash", 60, maxDist, requiredMatches = k)
        .orderBy("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(blocked.sameElements(naive), s"maxDist=$maxDist k=$k")
    }
  }

  test("q_bpe doubled-space replace == reference greedy merge (random sequences)") {
    // The q_bpe core claim: on doubled-space strings, one boundary-anchored
    // replace(' w1  w2 ' -> ' w1_w2 ') performs EXACTLY the greedy
    // non-overlapping merge of every (w1, w2) adjacency — including
    // back-to-back occurrences ('a b a b') and tokens that are
    // prefixes/suffixes of each other ('a' vs 'ab'). Reference semantics
    // implemented directly over the token list; both sides evaluated for
    // 400 random sequences in one Spark pass.
    def refMerge(toks: List[String], w1: String, w2: String): List[String] =
      toks match {
        case a :: b :: rest if a == w1 && b == w2 =>
          s"${a}_$b" :: refMerge(rest, w1, w2)
        case a :: rest => a :: refMerge(rest, w1, w2)
        case Nil => Nil
      }
    val vocab = Seq("a", "b", "ab", "ba", "aa")
    val caseGen = for {
      n <- Gen.chooseNum(2, 14)
      toks <- Gen.listOfN(n, Gen.oneOf(vocab))
      w1 <- Gen.oneOf(vocab)
      w2 <- Gen.oneOf(vocab.filterNot(_ == w1))
    } yield (toks, w1, w2)
    val cases = sample(caseGen, 400).zipWithIndex
      .map { case ((toks, w1, w2), i) => (i.toLong, toks.mkString(" "), w1, w2) }
    val rows = cases.toDF("id", "text", "w1", "w2")
      .select(col("id"),
        // the exact q_bpe pipeline: double, pad, anchored replace,
        // collapse, trim
        trim(call_function("replace",
          call_function("replace",
            concat(lit(" "),
              call_function("replace", col("text"), lit(" "), lit("  ")),
              lit(" ")),
            concat(lit(" "), col("w1"), lit("  "), col("w2"), lit(" ")),
            concat(lit(" "), col("w1"), lit("_"), col("w2"), lit(" "))),
          lit("  "), lit(" "))).as("merged"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (id, text, w1, w2) =>
      val expect = refMerge(text.split(" ").toList, w1, w2).mkString(" ")
      assert(rows(id) == expect,
        s"case $id: merge($w1,$w2) of '$text' gave '${rows(id)}', want '$expect'")
    }
  }

}

package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Scale guard for the embedding-dedup family: candidate generation must be
  * bucket-joined (equi-join on the LSH signature), never an all-pairs
  * nested-loop/cartesian over the embeddings table. Round 1 shipped
  * q_dedup_cosine as `a.join(b, vec_a < vec_b)` — a BroadcastNestedLoopJoin
  * that is O(N²) at corpus scale; this spec pins the bounded plan.
  */
class SimilarityPlanSpec extends SparkTestBase {

  private def finalPlan(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.count() // warm: count() plans a sibling QueryExecution, so the
    // inspected plan below is the INITIAL adaptive plan — the full Catalyst
    // tree, before stage wrapping — which is exactly what we want to audit
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  // Robust under both un-executed (full-tree) and executed (stage-wrapped)
  // adaptive plans: QueryStageExec is a LEAF — recurse into it explicitly.
  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
    p.collect(pf) ++
      p.collect { case q: QueryStageExec => collectAll(q.plan)(pf) }.flatten ++
      p.collect { case r: ReusedExchangeExec => collectAll(r.child)(pf) }.flatten ++
      p.subqueries.flatMap(collectAll(_)(pf))

  test("q_dedup_cosine candidates come from a bucket equi-join, not all-pairs") {
    val plan = finalPlan(SparkEntry.queries("q_dedup_cosine")(spark, sfDir))
    val allPairs = collectAll(plan) {
      case j: BroadcastNestedLoopJoinExec => j.nodeName
      case j: CartesianProductExec => j.nodeName
    }
    assert(allPairs.isEmpty, s"unbounded all-pairs join in plan: $allPairs")
    // guard against a vacuously-empty traversal: the probe-bucket join and
    // the two vector join-backs must all be visible equi-joins
    val equiJoins = collectAll(plan) { case j: BaseJoinExec => j }
    assert(equiJoins.size >= 2, s"expected bucket join + vector join-back, got: ${equiJoins.map(_.nodeName)}")
  }

  test("q_semdedup pair stage is a cell equi-join, not all-pairs") {
    val df = SparkEntry.queries("q_semdedup")(spark, sfDir)
    val plan = finalPlan(df)
    // the one tolerated nested-loop is assignTopK's single-row broadcast
    // centroid-array frame (collect_list -> crossJoin(broadcast)); any
    // OTHER BNLJ/cartesian means the within-cell compare degenerated to
    // all-pairs over the corpus
    val allPairs = collectAll(plan) {
      case j: BroadcastNestedLoopJoinExec if j.condition.isDefined => j.nodeName
      case j: CartesianProductExec => j.nodeName
    }
    assert(allPairs.isEmpty, s"unbounded all-pairs join in plan: $allPairs")
    // a genuine hash/sort-merge equi-join, NOT the tolerated condition-less
    // BNLJ above (ADVICE r10: BroadcastNestedLoopJoinExec extends
    // BaseJoinExec, so an exists-on-BaseJoinExec was tautological)
    val equiJoins = collectAll(plan) { case j: BaseJoinExec => j }
    assert(equiJoins.exists(j => !j.isInstanceOf[BroadcastNestedLoopJoinExec]),
      s"expected cell equi-join in plan, got: ${equiJoins.map(_.nodeName)}")
    // semantics smoke: kept + dropped partitions the corpus, and every
    // dropped vector names a LOWER-id duplicate source
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val kept = r.getAs[Long]("kept")
      val dupOf = if (r.isNullAt(r.fieldIndex("dup_of"))) None
        else Some(r.getAs[Long]("dup_of"))
      (kept == 1L) == dupOf.isEmpty &&
        dupOf.forall(_ < r.getAs[Long]("vec_id"))
    })
  }

  // Width-formula pins: the scalecheck loop caught q_dedup_cosine at 21.4x
  // growth on 10x data when the signature width was a CONSTANT 6 bits
  // (candidate volume O(N²/2^bits)); the fix derives the width from the
  // corpus. Round 10 tightened the target from 2^bits >= N to
  // 2^bits >= 2N (floor 6, cap 30): at >= N, occupancy N/2^bits
  // saw-tooths through (0.5, 1] as the corpus crosses powers of two
  // (sf1 0.61 vs sf3 0.92 — a 1.5x candidate-volume step that read as
  // exponent ~1.4 on a linear kernel); at >= 2N occupancy is pinned to
  // (0.25, 0.5] everywhere. These exact values fail on any regression to
  // a constant width OR back to the saw-toothing >= N ceiling.
  test("adaptive cosine signature width follows 2^bits >= 2N (floor 6, cap 30)") {
    import graft.queries.Similarity.adaptiveBits
    assert(adaptiveBits(0L) == 6)
    assert(adaptiveBits(32L) == 6)     // floor: tiny corpora keep 6 bits
    assert(adaptiveBits(33L) == 7)     // first width step
    assert(adaptiveBits(5000L) == 14)  // sf0.1 regime
    assert(adaptiveBits(50000L) == 17) // sf1 regime
    assert(adaptiveBits(1L << 29) == 30)
    assert(adaptiveBits(Long.MaxValue) == 30) // cap: signatures stay packable
    // the formula property itself, not just samples: minimal b with
    // 2^b >= 2n (computed as 2^(b-1) >= n so Long.MaxValue can't overflow)
    for (n <- Seq(100L, 1000L, 123456L, 10000000L)) {
      val b = adaptiveBits(n)
      assert((1L << (b - 1)) >= n && (b == 6 || (1L << (b - 2)) < n),
        s"n=$n b=$b")
    }
  }

  // IVF coarse-quantizer sizing: nlist must grow as √N, not N. Round 7's
  // fixed modulus 31 made nlist = N/31 and the assignment stage O(N²/31) —
  // the 1.85 sf1→sf3 growth exponent in tools/scalecheck.json. These exact
  // values fail on any regression back to a constant modulus.
  test("adaptive IVF modulus follows max(31, floor(sqrt(N)))") {
    import graft.queries.Similarity.ivfModulus
    assert(ivfModulus(0L) == 31)
    assert(ivfModulus(961L) == 31)    // 31² — last corpus on the floor
    assert(ivfModulus(1024L) == 32)   // first width step
    assert(ivfModulus(2000L) == 44)   // sf0.1 regime
    assert(ivfModulus(20000L) == 141) // sf1 regime
    assert(ivfModulus(60000L) == 244) // sf3 regime
    for (n <- Seq(100L, 5000L, 123456L, 10000000L)) {
      val m = ivfModulus(n)
      assert(m == math.max(31L, math.sqrt(n.toDouble).toLong), s"n=$n m=$m")
    }
  }

  // The assignment itself must stay MAP-SIDE (assignTopK: broadcast
  // centroid array + per-row sorted slice): the only Window in the whole
  // q_ann_ivf plan is the final per-query rank. A second Window means the
  // N×nlist assignment frame is being shuffled again.
  test("q_ann_ivf assignment is map-side: exactly one Window (the final rank)") {
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = finalPlan(SparkEntry.queries("q_ann_ivf")(spark, sfDir))
    val windows = collectAll(plan) { case w: WindowExec => w }
    assert(windows.size == 1,
      s"expected only the final rank window, got ${windows.size}")
  }

  // Same discipline for the pigeonhole hamming join (q_simhash_pairs): the
  // combo key must WIDEN with the corpus — smallest k whose packed key
  // space covers N — or bucket occupancy grows linearly and the candidate
  // stage goes quadratic (the r7 11.3x scalecheck outlier).
  test("adaptive pigeonhole combo width follows 2^keyBits >= N (cap k=3)") {
    import graft.ops.HammingJoin.adaptiveRequiredMatches
    // bits=60, maxDist=3: k=1 → 15-bit key; k=2 → 24; k=3 → 30
    assert(adaptiveRequiredMatches(500L, 60, 3) == 1)
    assert(adaptiveRequiredMatches(1L << 15, 60, 3) == 1)
    assert(adaptiveRequiredMatches((1L << 15) + 1, 60, 3) == 2) // sf1 regime
    assert(adaptiveRequiredMatches(1L << 24, 60, 3) == 2)
    assert(adaptiveRequiredMatches((1L << 24) + 1, 60, 3) == 3)
    assert(adaptiveRequiredMatches(Long.MaxValue, 60, 3) == 3)  // cap
  }

  // q_dedup_ngram_jaccard's MinHash geometry must ADAPT too (round 11):
  // at fixed 6×3 banding the random-collision floor E[J^rows]·N²·bands is
  // quadratic — the largest ×30 scalecheck cost of round 10. rows grows
  // one per decade past 10⁴ docs; bands is the smallest count holding the
  // catch rate at the 6×3 design point (miss ≤ 0.0082 at J = 0.82). The
  // verify SFs (≤ 10⁴ docs) sit on the 6×3 point, so oracle hashes never
  // moved. The DuckDB oracle ladder (`prm` CTE) must mirror these values.
  test("adaptive jaccard banding: rows +1 per decade past 1e4, recall-preserving bands") {
    import graft.ops.SetSimilarity.adaptiveBanding
    assert(adaptiveBanding(0L) == (6, 3))
    assert(adaptiveBanding(10000L) == (6, 3))      // verify SFs: design point
    assert(adaptiveBanding(10001L) == (8, 4))      // first decade step
    assert(adaptiveBanding(60000L) == (8, 4))      // sf1 regime
    assert(adaptiveBanding(180000L) == (11, 5))    // sf3/sf10 regime
    assert(adaptiveBanding(2000000L) == (14, 6))
    assert(adaptiveBanding(Long.MaxValue) == (22, 8)) // ladder cap
    // the recall property itself: every geometry keeps P(miss J=0.82)
    // at or below the 6×3 design point
    val designMiss = math.pow(1 - math.pow(0.82, 3), 6)
    for (n <- Seq(1L, 10001L, 200000L, 5000000L, 50000000L, 500000000L)) {
      val (b, r) = adaptiveBanding(n)
      val miss = math.pow(1 - math.pow(0.82, r), b)
      assert(miss <= designMiss * 1.001, s"n=$n bands=$b rows=$r miss=$miss")
    }
  }

  // The q_phash_pairs geometry (bits=60, maxDist=8, maxK=4): k=3's 15-bit
  // key space saturates at 32k docs — the 10×/30× scale points (50k/150k)
  // must escape to k=4 (20-bit keys, C(12,4)=495 combos) or the bucket
  // join goes quadratic (measured exponent 1.59, 128 s at 30× before the
  // escape). Small SFs stay at k ≤ 3, so their plans don't move.
  test("phash pigeonhole escapes to k=4 past the 15-bit key space") {
    import graft.ops.HammingJoin.adaptiveRequiredMatches
    assert(adaptiveRequiredMatches(5000L, 60, 8, maxK = 4) == 3)
    assert(adaptiveRequiredMatches(1L << 15, 60, 8, maxK = 4) == 3)
    assert(adaptiveRequiredMatches(50000L, 60, 8, maxK = 4) == 4)  // sf1
    assert(adaptiveRequiredMatches(150000L, 60, 8, maxK = 4) == 4) // sf3
    assert(adaptiveRequiredMatches(Long.MaxValue, 60, 8, maxK = 4) == 4)
  }
}

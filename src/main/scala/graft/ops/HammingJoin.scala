package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pigeonhole-blocked hamming-distance self-join (the SimHash near-dup
  * candidate kernel; used by `q_simhash_pairs` and `q_simhash_recall`).
  *
  * All-pairs hamming comparison is O(n²) — a broadcast nested-loop join
  * works at test scale and dies at corpus scale. The pigeonhole principle
  * bounds it: split the `bits`-bit signature into `maxDist + k` disjoint
  * blocks; two signatures within hamming distance `maxDist` differ in at
  * most `maxDist` blocks, so AT LEAST `k` blocks are bit-identical — for
  * every k-subset of those, the pair shares the concatenated block values.
  * Candidate generation is therefore an equi-join on (combo index, packed
  * block values) — a hash shuffle join whose fan-out is the bucket sizes,
  * never n². The exact hamming filter then runs only on candidates, and
  * duplicates (pairs equal in several combos) are kept only in their FIRST
  * matching combo — pure bit math, no distinct() shuffle.
  *
  * `requiredMatches` (k) is the key-width dial: k = 1 is the classic
  * multi-index (block-permuted SimHash tables, Manku et al. WWW'07); larger
  * k multiplies the explode by C(maxDist+k, k) but widens the join key from
  * bits/(maxDist+1) to ~k·bits/(maxDist+k) bits, shrinking random-collision
  * buckets exponentially — measured on the sf0.1 corpus at maxDist = 3:
  * 277k candidates at k = 1, 40k at k = 2, 15k at k = 3.
  * [[adaptiveRequiredMatches]] picks the smallest k whose combo-key space
  * covers the corpus (2^keyBits ≥ n — the same data-derived-width
  * discipline as the adaptive cosine signature), so the block key scales
  * with N instead of letting bucket occupancy grow.
  */
object HammingJoin {

  /** Smallest k in [1, maxK] whose packed combo key has at least log2(n)
    * bits (expected bucket occupancy ≤ 1 on uniform signatures); clustered
    * signatures keep more, but the trend — key width grows with the corpus
    * — is what prevents the quadratic bucket regime.
    */
  def adaptiveRequiredMatches(n: Long, bits: Int, maxDist: Int,
      maxK: Int = 3): Int =
    (1 to maxK).find { k =>
      val keyBits = math.min(62, k * (bits / (maxDist + k)))
      (1L << keyBits) >= n
    }.getOrElse(maxK)

  /** All (doc_a < doc_b) id pairs whose signatures are within `maxDist`
    * hamming distance. Output columns: doc_a, doc_b, hamming (long).
    * Exact for any `requiredMatches` >= 1 (candidates are a superset of
    * the true pairs by the pigeonhole argument above; the hamming filter
    * is exact).
    */
  def pairsWithin(
      sig: DataFrame,
      idCol: String,
      sigCol: String,
      bits: Int,
      maxDist: Int,
      requiredMatches: Int = 1): DataFrame = {
    val k = requiredMatches
    require(k >= 1, "requiredMatches >= 1")
    require(maxDist >= 0 && bits > maxDist, "need bits > maxDist >= 0")
    require(bits <= 64, "signatures are single longs: bits <= 64")
    val nBlocks = maxDist + k
    require(nBlocks <= bits, "need maxDist + requiredMatches <= bits")
    // a 64-bit block's mask cannot be built as (1L << 64) - 1 (JVM shifts
    // are mod 64, yielding mask 0 and a degenerate single-bucket join)
    def maskOf(len: Int): Long = if (len >= 64) -1L else (1L << len) - 1L
    val base = bits / nBlocks
    val rem = bits % nBlocks
    val blocks = (0 until nBlocks).map { b =>
      val lo = b * base + math.min(b, rem)
      val len = base + (if (b < rem) 1 else 0)
      (lo, len)
    }
    // every k-subset of block indices, with a stable enumeration order
    // shared by the explode and the first-match dedup below
    val combos: Seq[(Int, Seq[Int])] =
      (0 until nBlocks).combinations(k).toSeq.zipWithIndex.map(_.swap)
    def blockOf(c: String, b: Int) = {
      val (lo, len) = blocks(b)
      shiftrightunsigned(col(c), lo).bitwiseAND(lit(maskOf(len)))
    }
    // combo key: the k chosen blocks' values packed into ONE long — the
    // blocks are disjoint sub-ranges of `bits` <= 64, so the packed key
    // always fits
    def keyOf(c: String, cbs: Seq[Int]) =
      cbs.foldLeft(lit(0L): org.apache.spark.sql.Column) {
        case (acc, b) => shiftleft(acc, blocks(b)._2).bitwiseOR(blockOf(c, b))
      }
    val s0 = sig.select(col(idCol).as("id"), col(sigCol).as("sig"))
    // One row per (id, combo): combo index + packed key as the join key.
    // The explode is ×C(maxDist+k, k), not ×n.
    val bk = explode(array(combos.map { case (ci, cbs) =>
      struct(lit(ci).as("cmb"), keyOf("sig", cbs).as("key"))
    }: _*)).as("bk")
    val ex = s0.select(col("id"), col("sig"), bk)
      .select(col("id"), col("sig"),
        col("bk.cmb").as("cmb"), col("bk.key").as("key"))
    val a = ex.select(col("id").as("doc_a"), col("sig").as("sig_a"),
      col("cmb"), col("key"))
    val b = ex.select(col("id").as("doc_b"), col("sig").as("sig_b"),
      col("cmb"), col("key"))
    // A pair matching in several combos would appear once per matching
    // combo; rather than a distinct() shuffle afterwards, keep each pair
    // only in its FIRST matching combo — pure bit math on the two
    // signatures already present in the joined row, exact by construction.
    // (Whole-stage codegen's subexpression elimination shares the per-block
    // equality tests across the C(maxDist+k, k) conjunctions.)
    val eqB = (0 until nBlocks).map(b =>
      blockOf("sig_a", b) === blockOf("sig_b", b))
    val firstMatch = coalesce(combos.map { case (ci, cbs) =>
      when(cbs.map(eqB).reduce(_ && _), lit(ci))
    }: _*)
    a.join(b, Seq("cmb", "key"))
      .filter(col("doc_a") < col("doc_b") && col("cmb") === firstMatch)
      .withColumn("hamming", bit_count(expr("sig_a ^ sig_b")).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select("doc_a", "doc_b", "hamming")
  }
}

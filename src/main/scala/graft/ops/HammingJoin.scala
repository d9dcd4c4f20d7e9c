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
    *
    * `aPred` — a predicate over the output column `doc_a` (write it as
    * `col("doc_a") < …`) — optionally restricts the SMALLER-id side of
    * each emitted pair BEFORE the bucket join: the `naiveJaccardPairs`
    * aPred discipline. A probe-bounded measurement (doc_a < probe) then
    * joins probe×corpus bucket rows instead of corpus×corpus and filtering
    * afterwards. Exact because doc_a < doc_b makes "pairs whose smaller id
    * satisfies aPred" precisely "pairs whose A-side row satisfies aPred".
    *
    * Geometry contract: requires maxDist + requiredMatches ≤ 14 (throws
    * otherwise). The first-match dedup below resolves through a
    * driver-built 2^(maxDist+requiredMatches) lookup table shipped into
    * codegen as a literal array; past 14 blocks the table itself becomes
    * per-task payload and the build cost quadratic-ish on the driver
    * (this bound was 20 before round 11 — callers in the 15..20 range
    * that used to run slowly now fail fast at plan time).
    */
  def pairsWithin(
      sig: DataFrame,
      idCol: String,
      sigCol: String,
      bits: Int,
      maxDist: Int,
      requiredMatches: Int = 1,
      aPred: org.apache.spark.sql.Column = lit(true)): DataFrame = {
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
    val s0 = sig.select(col(idCol).as("id"), col(sigCol).as("sig"))
    // One row per (id, combo): combo index + the k chosen blocks' values
    // packed into ONE long (blocks are disjoint sub-ranges of bits <= 64,
    // so the packed key always fits; the packing is acc·2^len + v —
    // identical bits to shift-and-or for disjoint ranges). The explode is
    // ×C(maxDist+k, k), not ×n. CODE SHAPE matters as much as row counts
    // here: the obvious explode(array(<one struct per combo, key folded
    // inline>)) is a single expression tree with thousands of nodes at
    // C(12,4) = 495 combos — it breaches Janino's 64 KB method ceiling,
    // throws the whole Generate stage back to interpreted evaluation, and
    // was measured as the bulk of q_phash_pairs' 128 s at the 30× point
    // (~1000 interpreted node-visits × n rows even at k = 3). Instead the
    // fan-out is a plain explode(sequence(0, nCombos-1)) followed by a
    // broadcast EQUI-join against a tiny combo table carrying each slot's
    // (shift, mask, multiplier); the key is then k unrolled arithmetic
    // ops on attributes — every stage stays inside whole-stage codegen at
    // any combo count. (shiftrightunsigned must come via expr(): the
    // Scala functions variant takes only literal shift amounts, and
    // arithmetic div would sign-break on a bits = 64 signature.)
    val nC = combos.size
    val comboTable = {
      val rows = combos.map { case (ci, cbs) =>
        val lo = cbs.map(b => blocks(b)._1.toLong)
        val mask = cbs.map(b => maskOf(blocks(b)._2))
        // multiplier = 2^(total len of the slots packed to the right)
        val mul = cbs.indices.map(j =>
          1L << cbs.drop(j + 1).map(b => blocks(b)._2).sum)
        (ci, lo, mask, mul)
      }
      val ss = sig.sparkSession
      import ss.implicits._
      rows.toDF("cmb", "klo", "kmask", "kmul")
    }
    val keyExpr = (0 until k).map { j =>
      expr(s"shiftrightunsigned(sig, element_at(klo, ${j + 1}))")
        .bitwiseAND(element_at(col("kmask"), j + 1)) *
        element_at(col("kmul"), j + 1)
    }.reduce(_ + _)
    val ex = s0
      .select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(nC - 1))).as("cmb"))
      .join(broadcast(comboTable), "cmb")
      .select(col("id"), col("sig"), col("cmb"), keyExpr.as("key"))
    val a = ex.select(col("id").as("doc_a"), col("sig").as("sig_a"),
        col("cmb"), col("key"))
      .filter(aPred)
    val b = ex.select(col("id").as("doc_b"), col("sig").as("sig_b"),
      col("cmb"), col("key"))
    // A pair matching in several combos would appear once per matching
    // combo; rather than a distinct() shuffle afterwards, keep each pair
    // only in its FIRST matching combo — pure bit math on the two
    // signatures already present in the joined row, exact by construction.
    // HOW matters at scale: the obvious encoding — a C(nBlocks, k)-branch
    // coalesce of per-combo conjunctions — blows past Janino's 64 KB
    // method ceiling at 165+ branches, dropping the whole join stage out
    // of codegen and evaluating thousands of interpreted expression nodes
    // per candidate row (measured: the entire q_phash_pairs 30× budget,
    // 128 s, sat in this filter). Instead: pack the per-block equality
    // tests into ONE nBlocks-bit mask, and resolve "first combo whose
    // blocks are all equal" through a driver-built 2^nBlocks lookup table
    // (a literal int array — element_at is O(1) and codegen-trivial).
    // nBlocks is maxDist + k ≤ 12 in every deployed geometry, so the
    // table is ≤ 4096 entries built once on the driver. The guard caps at
    // 14 (16384 entries, still trivially broadcastable) rather than the
    // r10 value of 20: at 2^20 entries the LUT build scans up to
    // C(20,k) combos per entry on the driver and the ~1M-element literal
    // array would ride into every task (ADVICE r10) — a geometry this
    // kernel is not designed for and must refuse loudly.
    require(nBlocks <= 14,
      s"first-match LUT sized 2^nBlocks: nBlocks=$nBlocks > 14")
    val eqMask = (0 until nBlocks).map(b =>
      when(blockOf("sig_a", b) === blockOf("sig_b", b), lit(1 << b))
        .otherwise(lit(0))).reduce(_ + _)
    // lut(mask) = first combo index fully contained in the equal set, or
    // -1 (unreachable for joined rows: the matched combo is contained by
    // construction, so SOME combo always is)
    val lut: Seq[Int] = (0 until (1 << nBlocks)).map { m =>
      combos.collectFirst {
        case (ci, cbs) if cbs.forall(b => ((m >> b) & 1) == 1) => ci
      }.getOrElse(-1)
    }
    val firstMatch = element_at(typedLit(lut), eqMask + 1)
    a.join(b, Seq("cmb", "key"))
      .filter(col("doc_a") < col("doc_b") && col("cmb") === firstMatch)
      .withColumn("hamming", bit_count(expr("sig_a ^ sig_b")).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select("doc_a", "doc_b", "hamming")
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pigeonhole-blocked hamming-distance self-join (the SimHash near-dup
  * candidate kernel; used by `q_simhash_pairs`).
  *
  * All-pairs hamming comparison is O(n²) — a broadcast nested-loop join
  * works at test scale and dies at corpus scale. The pigeonhole principle
  * bounds it: split the `bits`-bit signature into `maxDist + 1` disjoint
  * blocks; two signatures within hamming distance `maxDist` differ in at
  * most `maxDist` blocks, so AT LEAST ONE block is bit-identical. Candidate
  * generation is therefore an equi-join on (block index, block value) — a
  * hash shuffle join whose fan-out is the bucket sizes, never n². The exact
  * hamming filter then runs only on candidates, and duplicates (pairs equal
  * in several blocks) collapse with one distinct.
  *
  * This is the standard multi-index approach from near-duplicate detection
  * (block-permuted SimHash tables); it degrades gracefully: smaller
  * `maxDist` → more selective blocks → fewer candidates.
  */
object HammingJoin {

  /** All (doc_a < doc_b) id pairs whose signatures are within `maxDist`
    * hamming distance. Output columns: doc_a, doc_b, hamming (long).
    */
  def pairsWithin(
      sig: DataFrame,
      idCol: String,
      sigCol: String,
      bits: Int,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0 && bits > maxDist, "need bits > maxDist >= 0")
    require(bits <= 64, "signatures are single longs: bits <= 64")
    val nBlocks = maxDist + 1
    // a 64-bit block's mask cannot be built as (1L << 64) - 1 (JVM shifts
    // are mod 64, yielding mask 0 and a degenerate single-bucket join)
    def maskOf(len: Int): Long = if (len >= 64) -1L else (1L << len) - 1L
    val base = bits / nBlocks
    val rem = bits % nBlocks
    val blocks = (0 until nBlocks).map { b =>
      val lo = b * base + math.min(b, rem)
      val len = base + (if (b < rem) 1 else 0)
      (b, lo, len)
    }
    val s0 = sig.select(col(idCol).as("id"), col(sigCol).as("sig"))
    // One row per (id, block): block index + that block's bit value as the
    // join key. The explode is ×(maxDist+1), not ×n.
    val bk = explode(array(blocks.map { case (b, lo, len) =>
      struct(lit(b).as("blk"),
        shiftrightunsigned(col("sig"), lo)
          .bitwiseAND(lit(maskOf(len))).as("key"))
    }: _*)).as("bk")
    val ex = s0.select(col("id"), col("sig"), bk)
      .select(col("id"), col("sig"),
        col("bk.blk").as("blk"), col("bk.key").as("key"))
    val a = ex.select(col("id").as("doc_a"), col("sig").as("sig_a"),
      col("blk"), col("key"))
    val b = ex.select(col("id").as("doc_b"), col("sig").as("sig_b"),
      col("blk"), col("key"))
    // A pair matching in several blocks would appear once per matching
    // block; rather than a distinct() shuffle afterwards, keep each pair
    // only in its FIRST matching block — pure bit math on the two
    // signatures already present in the joined row, exact by construction.
    def blockOf(c: String, lo: Int, len: Int) =
      shiftrightunsigned(col(c), lo).bitwiseAND(lit(maskOf(len)))
    val firstMatch = coalesce(blocks.map { case (b2, lo, len) =>
      when(blockOf("sig_a", lo, len) === blockOf("sig_b", lo, len), lit(b2))
    }: _*)
    a.join(b, Seq("blk", "key"))
      .filter(col("doc_a") < col("doc_b") && col("blk") === firstMatch)
      .withColumn("hamming", bit_count(expr("sig_a ^ sig_b")).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select("doc_a", "doc_b", "hamming")
  }
}

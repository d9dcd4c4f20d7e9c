package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation plan rewrites (no new semantics — each produces results
  * identical to its naive form, proven by the equivalence specs).
  *
  * When to reach for these at 100 TB: AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin`) handles most hot-partition cases at
  * runtime; explicit salting remains necessary when a single JOIN KEY is hot
  * (AQE can split a partition but not a key) or when a non-algebraic
  * aggregate (collect_set/countDistinct) funnels a hot key through one
  * reducer. Broadcast stays the first choice whenever one side fits in
  * memory — salting is for big⋈big with hot keys.
  */
object Skew {

  /** Salted equi-join: the left (big, skewed) side gets a salt in
    * [0, buckets); the right side is replicated `buckets` times; the join
    * key becomes (key, salt), spreading each hot key over `buckets`
    * reducers. Row-identical to `left.join(right, keys)` for any salt
    * assignment, so the salt uses a cheap deterministic spread
    * (xxhash64 of the whole left row).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      buckets: Int = 16): DataFrame = {
    val salt = pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(buckets))
    val saltedLeft = left.withColumn("_salt", salt)
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0L), lit((buckets - 1).toLong))))
    saltedLeft.join(replicatedRight, keys :+ "_salt").drop("_salt")
  }

  /** Two-phase distinct collection for skewed group keys: partial
    * `collect_set` on (key, salt) shrinks each hot key to ≤ buckets
    * partial sets before the final merge — the single final reducer
    * handles O(buckets · distinct) instead of O(rows). Output sets are
    * sorted (deterministic), equal to
    * `groupBy(keys).agg(array_sort(collect_set(valueCol)))`.
    */
  def twoPhaseDistinctSet(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 16): DataFrame = {
    val salt = pmod(xxhash64(col(valueCol)), lit(buckets))
    df.withColumn("_salt", salt)
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(collect_set(valueCol).as("_partial"))
      .groupBy(keys.map(col): _*)
      // no array_distinct needed: salting by xxhash64(value) sends equal
      // values to the same bucket, so the partial sets are disjoint
      .agg(array_sort(flatten(collect_list("_partial")))
        .as(s"${valueCol}_set"))
  }

  /** Two-phase exact distinct count under the same salting scheme. */
  def twoPhaseCountDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 16): DataFrame = {
    val salt = pmod(xxhash64(col(valueCol)), lit(buckets))
    df.withColumn("_salt", salt)
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(countDistinct(col(valueCol)).as("_partial"))
      .groupBy(keys.map(col): _*)
      // value-hash salting sends equal values to the same salt bucket, so
      // partial distinct counts add up exactly
      .agg(sum("_partial").as(s"${valueCol}_distinct"))
  }
}

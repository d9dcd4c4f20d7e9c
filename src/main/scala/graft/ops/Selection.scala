package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy coverage-driven candidate selection — the one genuinely
  * non-relational operator in the reference (`main.py:277-279`, SURVEY.md
  * §7.4): walk candidates in coverage-rank order and stop once at least
  * `minUsed` candidates are taken AND all `targets` are covered.
  *
  * Two encodings:
  *   - [[greedyPrefix]]: pure-relational window encoding (cumulative
  *     first-coverage flags) — oracle-checkable, one window shuffle, scales
  *     to any number of groups because state lives per-(group,rank) row;
  *   - [[greedySelect]]: driver-side loop for the flagship pipeline — the
  *     reference caps candidates at 40/city, so the collected aggregate is
  *     tiny by construction; chosen ids are semi-joined back (no
  *     collect of row data, only of the ≤40-row candidate summary).
  */
object Selection {

  val DefaultTargets: Seq[String] = Seq("click", "view", "purchase", "signup")

  /** Relational greedy prefix over `events`-shaped input (grp = user_id % 5,
    * candidate = user_id, parameter = event_type). Output: one row per
    * candidate in the selected prefix with its rank and cumulative coverage.
    */
  def greedyPrefix(
      events: DataFrame,
      targets: Seq[String] = DefaultTargets,
      minUsed: Int = 3): DataFrame = {
    val inTarget = col("event_type").isin(targets.map(x => x: Any): _*)

    // ONE events scan: the distinct (grp, candidate, parameter) set feeds
    // BOTH the coverage ranking (a count over it IS countDistinct of the
    // original rows) and the first-coverage flags — cached because three
    // downstream branches read it.
    val pairs = events.filter(inTarget)
      .select((col("user_id") % 5).as("grp"), col("user_id"), col("event_type"))
      .distinct()
      .cache()

    // candidates + coverage-count ranking (A1/O2 analog); every pairs row
    // is a distinct in-target parameter, so m > 0 by construction
    val cand = pairs.groupBy("grp", "user_id")
      .agg(count(lit(1)).as("m"))
    val ranked = cand.withColumn("rank",
      row_number().over(Window.partitionBy("grp")
        .orderBy(col("m").desc, col("user_id"))).cast("long"))

    // each parameter's FIRST covering candidate flagged; per-candidate
    // count of newly covered parameters
    val firsts = pairs
      .join(ranked.select("grp", "user_id", "rank"), Seq("grp", "user_id"))
      .withColumn("is_first",
        when(row_number().over(Window.partitionBy("grp", "event_type")
          .orderBy("rank")) === 1, 1).otherwise(0))
    val perCand = firsts.groupBy("grp", "user_id", "rank")
      .agg(sum("is_first").as("new_types"))

    // cumulative coverage along the rank order; stop at the first rank
    // satisfying both conditions; keep the prefix. Cached: `stop` and the
    // final prefix filter both read it, and it is one row per candidate —
    // without the cache the two scans + join + three windows above run
    // twice.
    val cum = perCand.withColumn("cum_cov",
      sum("new_types").over(Window.partitionBy("grp").orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .cache()
    // distinct: cum_cov counts distinct covered types, so a duplicated
    // entry in `targets` must not inflate the required coverage
    val stop = cum
      .filter(col("cum_cov") >= targets.distinct.size && col("rank") >= minUsed)
      .groupBy("grp").agg(min("rank").as("stop_rank"))
    cum.join(broadcast(stop), Seq("grp"), "left")
      .filter(col("rank") <= coalesce(col("stop_rank"), lit(Long.MaxValue)))
      .select(col("grp"), col("rank"), col("user_id"),
        col("cum_cov").cast("long").as("cum_cov"))
      .orderBy("grp", "rank")
  }

  /** Driver-side greedy walk (`main.py:220-279` shape) over a ranked,
    * per-group candidate summary: `(group, candidateId, emittedParams)`
    * already ordered by rank within group, where `emittedParams` is the set
    * of parameters the candidate actually emitted VALID measurements for
    * (empty = no valid rows survived F6/F7/F8). Mirrors the reference's
    * interleaving of measurement validation with selection: every walked
    * candidate is selected (its rows go to the output), but only
    * candidates with ≥ 1 valid row count toward the `minUsed` stop
    * (`main.py:273-274`) and only emitted parameters grow the covered set
    * (`main.py:270`) — a station whose measurements all fail validation
    * forces the walk onward. Input must be small (the reference caps at
    * MAX_CANDIDATES = 40 per group) — callers aggregate + limit BEFORE
    * collecting.
    */
  def greedySelect(
      ranked: Seq[(String, Long, Set[String])],
      targets: Set[String],
      minUsed: Int = 3): Map[String, Seq[Long]] =
    ranked.groupBy(_._1).map { case (grp, cands) =>
      val sel = Vector.newBuilder[Long]
      var covered = Set.empty[String]
      var used = 0
      val it = cands.iterator
      var done = false
      while (it.hasNext && !done) {
        val (_, id, params) = it.next()
        sel += id
        covered ++= params
        if (params.nonEmpty) used += 1
        if (used >= minUsed && targets.subsetOf(covered)) done = true
      }
      grp -> sel.result()
    }
}

package graft

import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => SCTest}
import graft.ops.Selection

/** Property tests for the greedy coverage selection (SURVEY.md §5.2.3). */
class SelectionSpec extends SparkTestBase {

  val targets: Set[String] = Set("pm25", "pm10", "o3", "no2")

  val candGen: Gen[List[Set[String]]] =
    Gen.listOfN(12, Gen.someOf(targets + "so2" + "co").map(_.toSet))

  private def check(name: String)(prop: org.scalacheck.Prop): Unit =
    test(name) {
      val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
      assert(r.passed, r.status.toString)
    }

  check("greedy prefix is minimal satisfying (used≥3 ∧ covered⊇targets) when satisfiable") {
    forAll(candGen) { cands =>
      val ranked = cands.zipWithIndex.map { case (ps, i) => ("g", i.toLong, ps) }
      val sel = Selection.greedySelect(ranked, targets)("g")
      val coveredAt = (k: Int) => ranked.take(k).flatMap(_._3).toSet
      // `used` counts only PRODUCTIVE candidates (non-empty emitted-param
      // set), mirroring main.py:273-274 — an empty set is walked but
      // doesn't advance the ≥3 stop
      val usedAt = (k: Int) => ranked.take(k).count(_._3.nonEmpty)
      val satisfiableAt = (k: Int) =>
        usedAt(k) >= 3 && targets.subsetOf(coveredAt(k))
      val anySatisfiable = (1 to ranked.size).exists(satisfiableAt)
      if (anySatisfiable) {
        // selected prefix satisfies, and no shorter prefix does
        satisfiableAt(sel.size) && !(1 until sel.size).exists(satisfiableAt)
      } else {
        // unsatisfiable → whole list consumed
        sel.size == ranked.size
      }
    }
  }

  check("selection is a prefix of the ranked order") {
    forAll(candGen) { cands =>
      val ranked = cands.zipWithIndex.map { case (ps, i) => ("g", i.toLong, ps) }
      val sel = Selection.greedySelect(ranked, targets)("g")
      sel == ranked.take(sel.size).map(_._2)
    }
  }

  test("relational greedyPrefix agrees with driver-side greedySelect on testdata") {
    val events = graft.model.Tables.events(spark, sfDir)
    val rel = Selection.greedyPrefix(events).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet

    // reproduce via the driver-side walk
    import org.apache.spark.sql.functions._
    val t = Selection.DefaultTargets
    val cand = events
      .filter(col("event_type").isin(t.map(x => x: Any): _*))
      .groupBy((col("user_id") % 5).as("grp"), col("user_id"))
      .agg(countDistinct("event_type").as("m"),
        array_sort(collect_set("event_type")).as("cov"))
      .orderBy(col("grp"), col("m").desc, col("user_id"))
      .collect()
      .map(r => (r.getLong(0).toString, r.getLong(1), r.getSeq[String](3).toSet))
      .toSeq
    val sel = Selection.greedySelect(cand, t.toSet)
    // .toSeq first — flatMap on the Map itself would collapse to one id/group
    val expect = sel.toSeq.flatMap { case (g, ids) => ids.map(id => (g.toLong, id)) }.toSet
    assert(rel == expect)
  }
}

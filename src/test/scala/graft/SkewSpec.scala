package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Equivalence proofs for the skew-mitigation rewrites: each salted plan
  * must be row-identical to its naive form (the whole point — same
  * semantics, redistributed work).
  */
class SkewSpec extends SparkTestBase {

  private lazy val events = graft.model.Tables.events(spark, sfDir)
  private lazy val orders = graft.model.Tables.orders(spark, sfDir)

  private def sorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  test("saltedJoin == plain equi-join on a hot key") {
    // event_type has a handful of distinct values over every event row —
    // the hot-key shape a big⋈big join chokes on
    val dim = events.groupBy("event_type")
      .agg(count(lit(1)).as("type_n"))
    val plain = events.select("event_id", "event_type")
      .join(dim, Seq("event_type"))
    val salted = Skew.saltedJoin(
      events.select("event_id", "event_type"), dim, Seq("event_type"))
    assert(sorted(salted) == sorted(plain))
    assert(plain.count() == events.count())
  }

  test("twoPhaseDistinctSet == direct collect_set") {
    val direct = events.groupBy("event_type")
      .agg(array_sort(collect_set("user_id")).as("user_id_set"))
    val twoPhase = Skew.twoPhaseDistinctSet(
      events.select("event_type", "user_id"), Seq("event_type"), "user_id")
    assert(sorted(twoPhase) == sorted(direct))
  }

  test("twoPhaseCountDistinct == direct countDistinct") {
    val direct = orders.groupBy("o_orderstatus")
      .agg(countDistinct("o_custkey").as("o_custkey_distinct"))
    val twoPhase = Skew.twoPhaseCountDistinct(
      orders.select("o_orderstatus", "o_custkey"),
      Seq("o_orderstatus"), "o_custkey")
    assert(sorted(twoPhase) == sorted(direct))
  }
}

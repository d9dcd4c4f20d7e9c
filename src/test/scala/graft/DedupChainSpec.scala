package graft

import org.apache.spark.sql.functions._

/** Cross-consistency pins for q_dedup_chain against its standalone stage
  * operators (each oracle-proven in isolation): the chain must attribute
  * exactly the drops the standalone stages would make on its stage inputs,
  * and its canonical pointers must respect the stage order.
  */
class DedupChainSpec extends SparkTestBase {

  private lazy val chain =
    SparkEntry.queries("q_dedup_chain")(spark, sfDir).cache()

  test("exact-stage drops equal q_dedup_exact's non-canonical members") {
    val chainExact = chain.filter(col("dropped_by") === "exact").count()
    // q_dedup_exact reports one row per key with n_dupes; non-canonical
    // members = sum(n_dupes - 1)
    val standalone = SparkEntry.queries("q_dedup_exact")(spark, sfDir)
      .agg(sum(col("n_dupes") - 1)).collect()(0).getLong(0)
    assert(chainExact === standalone)
  }

  test("every document appears exactly once, with a stage-lawful canonical") {
    val n = graft.model.Tables.documents(spark, sfDir).count()
    assert(chain.count() === n)
    assert(chain.select("doc_id").distinct().count() === n)
    // dropped docs never point at themselves; survivors always do
    assert(chain.filter(col("dropped_by").isNotNull &&
      col("canonical") === col("doc_id")).count() === 0L)
    assert(chain.filter(col("dropped_by").isNull &&
      col("canonical") =!= col("doc_id")).count() === 0L)
    // a canonical always precedes (min-id convention) the doc it replaces
    assert(chain.filter(col("canonical") > col("doc_id")).count() === 0L)
  }

  test("semantic-stage canonicals are final survivors") {
    // the cosine stage runs last, so its cluster representative (min id,
    // its own component) can never be dropped by a later stage — every
    // canonical of a cosine-dropped doc must be a NULL-dropped_by survivor
    val survivors = chain.filter(col("dropped_by").isNull)
      .select(col("doc_id").as("canonical"))
    val dangling = chain.filter(col("dropped_by") === "cosine")
      .select("canonical")
      .join(survivors, Seq("canonical"), "left_anti")
      .count()
    assert(dangling === 0L)
  }
}

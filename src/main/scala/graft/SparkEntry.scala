package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared inventory (SURVEY.md §2 + the
  * training-data extensions); `oracleSql` carries the DuckDB-dialect oracle
  * for every SQL-expressible query. Names and aliases match pairwise — the
  * driver sorts columns by name before hashing.
  */
object SparkEntry {

  /** Every declared query, in registration order. */
  val registry: Seq[Q] =
    Relational.all ++ Joins.all ++ Aggregates.all ++
      TextAnalysis.all ++ Dedup.all ++ Similarity.all ++ Multimodal.all ++
      StreamingExec.all ++ FlagshipAnalog.all ++ Flagship.all ++ Curation.all ++
      Sinks.all ++ Typed.all ++ Analytics.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    pipeline.AirQuality.flagship(spark)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: the Spark implementation plus (when SQL-expressible)
  * the DuckDB oracle the driver hash-compares against (SURVEY.md §5.2).
  *
  * Contract reminders (SURVEY.md §5.3):
  *   - output is TOTALLY ordered (ORDER BY every key column) on both sides;
  *   - column names/aliases identical on both sides;
  *   - computed integers are BIGINT on both sides, timestamps are projected
  *     as strings or epoch-µs BIGINTs, money aggregates go through
  *     DECIMAL(18,2) and are cast to DOUBLE at the end;
  *   - no current_timestamp(), no approx_*.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}

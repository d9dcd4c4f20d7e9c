package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take a `sfDir` (e.g. `/root/testdata/sf0.01`) and read one
  * parquet file per table. Filters/projections applied on top of these scans
  * are pushed into the parquet reader by Catalyst (verify with
  * `.explain("formatted")` → `PushedFilters` / `ReadSchema`), so at 100 TB the
  * scan reads only the referenced columns and skips row groups via min/max
  * stats. Nothing here materializes or caches — each query composes a lazy
  * plan over the scan.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * as a timestamp. Read it as nanos-since-epoch (legacy.parquet.nanosAsLong)
    * and truncate to a µs TimestampType — exactly what DuckDB's TIMESTAMP_NS
    * → TIMESTAMP cast does, so both engines see identical µs instants.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `documents` with rows spread across all cores. The test table is a
    * single parquet row group → a one-partition scan, but it feeds the most
    * CPU-intensive per-row work in the engine (tokenize → shingle → hash);
    * without an exchange that work runs on one core. The round-robin shuffle
    * moves only the raw texts (~MB here). On a production multi-file table
    * the scan already splits, and AQE coalesces this exchange away.
    */
  def documentsSpread(s: SparkSession, d: String): DataFrame =
    documents(s, d).repartition(s.sparkContext.defaultParallelism)
}

/** The fixed output row of the air-quality pipeline (reference
  * `main.py:262-269`): all six columns are strings; `value` and `date` keep
  * their source lexical form.
  */
final case class Measurement(
    city: String,
    location: String,
    parameter: String,
    value: String,
    unit: String,
    date: String)

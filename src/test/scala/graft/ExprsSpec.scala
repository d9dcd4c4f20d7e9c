package graft

import org.apache.spark.sql.functions._
import graft.ops.Exprs._

/** Unit tests for the quirk-compatible scalar operators (SURVEY.md §7.4.2):
  * each confirmed-by-execution reference semantic gets a pinned test.
  */
class ExprsSpec extends SparkTestBase {
  import spark.implicits._

  test("F7 numericValid: lexical NaN/Infinity/1e3 pass, junk and empty fail") {
    val rows = Seq("NaN", "Infinity", "1e3", "12.5", "oops", "", "{\"u\":1}")
      .toDF("v")
      .select(col("v"), numericValid(col("v")).as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(rows("NaN") && rows("Infinity") && rows("1e3") && rows("12.5"))
    assert(!rows("oops") && !rows("") && !rows("{\"u\":1}"))
  }

  test("F8 freshKeepNull keeps unparseable dates; F1 freshDropNull drops them") {
    val cutoff = to_timestamp(lit("2025-08-08 00:00:00"))
    val df = Seq(
      ("fresh", "2025-09-07T19:00:00Z"),
      ("stale", "2020-01-01T00:00:00Z"),
      ("junk", "not-a-date")).toDF("tag", "d")
      .select(col("tag"),
        freshKeepNull(parseIsoTs(col("d")), cutoff).as("keep"),
        freshDropNull(parseIsoTs(col("d")), cutoff).as("drop_null_keep"))
    val m = df.collect().map(r => r.getString(0) ->
      (r.getBoolean(1), Option(r.get(2)).exists(_ == true))).toMap
    assert(m("fresh") == ((true, true)))
    assert(m("stale") == ((false, false)))
    // THE asymmetry: junk kept by F8, dropped by F1
    assert(m("junk")._1 && !m("junk")._2)
  }

  test("F6 sensorIdValid drops null, junk, and falsy id 0") {
    val m = Seq("9001", "0", "junk", null.asInstanceOf[String])
      .toDF("sid")
      .select(col("sid"), sensorIdValid(col("sid")).as("ok"))
      .collect().map(r => Option(r.getString(0)).getOrElse("null") ->
        Option(r.get(1)).exists(_ == true)).toMap
    assert(m("9001") && !m("0") && !m("junk") && !m("null"))
  }

  test("P2 parseIsoTs: Z and +02:00 offsets, unparseable → null") {
    val got = Seq("2025-09-07T19:00:00Z", "2025-09-07T21:00:00+02:00", "nope")
      .toDF("d")
      .select(unix_micros(parseIsoTs(col("d"))).as("us"))
      .collect().map(r => Option(r.get(0)))
    // both ISO forms denote the same instant
    assert(got(0).isDefined && got(0) == got(1))
    assert(got(2).isEmpty)
  }

  test("P3/P4 coalesce chains: precedence and empty-string-falsy names") {
    val df = Seq((null.asInstanceOf[String], "u2", ""),
      (null.asInstanceOf[String], null.asInstanceOf[String], "")).toDF("a", "b", "nm")
      .select(unitCoalesce(col("a"), col("b")).as("u"),
        nameCoalesce(col("nm"), lit(null).cast("string"), lit(42L)).as("n"))
    val rows = df.collect()
    assert(rows(0).getString(0) == "u2" && rows(1).getString(0) == "")
    assert(rows.forall(_.getString(1) == "id:42"))   // "" falls through
  }

  test("P3 unitCoalesce: empty string is falsy like Python's or-chain") {
    // main.py:160/183-194 use `or` / `if unit:` — "" falls through, so a
    // sensor whose unit coalesced to "" must yield the measurement's unit
    val df = Seq(("", "ppm"), ("µg/m³", "ppm"), ("", ""))
      .toDF("sensor_u", "meas_u")
      .select(unitCoalesce(col("sensor_u"), col("meas_u")).as("u"))
    val got = df.collect().map(_.getString(0))
    assert(got.sameElements(Array("ppm", "µg/m³", "")))
  }

  test("P1 haversine: zero distance, symmetry, known value, range") {
    val df = Seq((52.2297, 21.0122, 40.7128, -74.0060)).toDF("a", "b", "c", "d")
    val fwd = df.select(haversineMeters(col("a"), col("b"), col("c"), col("d")))
      .head.getDouble(0)
    val rev = df.select(haversineMeters(col("c"), col("d"), col("a"), col("b")))
      .head.getDouble(0)
    val zero = df.select(haversineMeters(col("a"), col("b"), col("a"), col("b")))
      .head.getDouble(0)
    assert(zero == 0.0)
    assert(fwd == rev)
    assert(math.abs(fwd - 6854000) < 30000)         // Warsaw→NYC ≈ 6854 km
    assert(fwd >= 0 && fwd <= math.Pi * 6371000.0)  // ≤ half circumference
  }

  test("md5Long is stable and non-negative (oracle-portable hash)") {
    val vals = Seq("a", "b", "a").toDF("s").select(md5Long(col("s")).as("h"))
      .collect().map(_.getLong(0))
    assert(vals(0) == vals(2) && vals(0) != vals(1) && vals.forall(_ >= 0))
  }

  test("wordShingles: 3-grams, short docs collapse to whole text") {
    val out = Seq("a b c d", "x y").toDF("t")
      .select(wordShingles(split(col("t"), " "), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq("x y"))
  }

  test("cosineSim: identical vectors → 1.0, orthogonal → 0.0") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f), Array(0.0f, 2.0f)))
      .toDF("a", "b", "c")
    val r = df.select(cosineSim(col("a"), col("b")), cosineSim(col("a"), col("c")))
      .head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }
}

package graft

import graft.pipeline.AirQuality

/** End-to-end flagship pipeline over the FIXTURES.md §A fixture: checks the
  * golden rows and that every quirk path (nan kept, unknown sensor dropped,
  * sensor 0 dropped, stale dropped, unparseable date kept, far/stale/no-coord
  * stations excluded) behaves as the reference does.
  */
class FlagshipSpec extends SparkTestBase {

  lazy val rows: Seq[(String, String, String, String, String, String)] =
    AirQuality.flagship(spark).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getString(5)))

  test("flagship returns rows (driver smoke contract)") {
    assert(rows.nonEmpty)
  }

  test("excluded stations contribute no rows") {
    val locs = rows.map(_._2).toSet
    assert(!locs.contains("Stale Station"))   // F1: stale last-seen
    assert(!locs.contains("NoCoords"))        // F3: missing coordinate
    assert(!locs.contains("Gdansk"))          // F4: >75 km away
    assert(!locs.contains("NoLastSeen"))      // F1: missing last-seen
  }

  test("lexical 'nan' value is kept verbatim (F7 quirk)") {
    assert(rows.exists(_._4 == "nan"))
  }

  test("unparseable measurement date is kept (F8 quirk)") {
    assert(rows.exists(_._6 == "not-a-date"))
  }

  test("invalid value, unknown sensor and sensor id 0 are dropped") {
    assert(!rows.exists(_._4 == "oops"))                    // F7
    assert(!rows.exists(_._4 == "1.0"))                     // F6: sensor 4242
    assert(!rows.exists(r => r._2 == "Manhattan" && r._3 == "pm25")) // F6: id 0
  }

  test("stale measurement dropped, non-target parameter absent") {
    assert(!rows.exists(_._6 == "2020-01-01T00:00:00Z"))    // F8 stale
    assert(!rows.exists(_._3 == "so2"))                     // F5
  }

  test("P4 name coalesce: locality used when name missing") {
    assert(rows.exists(_._2 == "Kondratowicza"))
  }

  test("P5+unit coalesce: uppercase PM25 matched, units resolved") {
    val wokalna = rows.filter(_._2 == "Warszawa, ul. Wokalna")
    assert(wokalna.exists(r => r._3 == "pm25" && r._5 == "µg/m³"))
    // sensor 9002 declares its unit at the sensor level, not parameter level
    assert(wokalna.exists(r => r._3 == "no2" && r._5 == "µg/m³"))
  }

  test("both cities present (U1 union)") {
    assert(rows.map(_._1).toSet == Set("Warsaw", "New York"))
  }

  test("K1 CSV sink: header, fixed column order, lossless round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("k1csv").toString
    try {
      AirQuality.writeCsv(AirQuality.flagship(spark), dir)
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".csv"))
      assert(files.length == 1) // coalesce(1): one part file
      val header = scala.io.Source.fromFile(files.head, "UTF-8").getLines().next()
      assert(header == "city,location,parameter,value,unit,date")
      val back = spark.read.option("header", true).csv(dir)
      assert(back.count() == rows.size)
      // values survive verbatim (incl. the lexical "nan" quirk row)
      assert(back.collect().exists(_.getString(3) == "nan"))
    } finally {
      scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}

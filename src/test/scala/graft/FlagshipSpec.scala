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

  // ── two-phase geo plan + interleaved-selection fixtures ───────────────
  import AirQuality.{Coordinates, DatetimeLast, LatestRow, Location, ParameterInfo, Sensor, City}

  private val FreshTs = "2025-09-07T12:00:00Z"
  private def mkLoc(city: String, id: Long, name: String, lat: Double,
      sens: Seq[Sensor]): Location =
    Location(city, id, Some(name), None,
      Some(Coordinates(Some(lat), Some(0.0))),
      Some(DatetimeLast(Some(FreshTs), None)), sens)
  private def mkSensor(id: Long, p: String): Sensor =
    Sensor(Some(id), Some(ParameterInfo(Some(p), Some("µg/m³"))), None, None)
  private def mkMeas(locId: Long, sid: Long, v: String): LatestRow =
    LatestRow(locId, Some(sid.toString), Some(v), None, Some(FreshTs), None, None)

  private def runCity(locs: Seq[Location], meas: Seq[LatestRow]): Set[String] = {
    import spark.implicits._
    AirQuality.run(spark, locs.toDS().toDF(), meas.toDS().toDF(),
      Seq(City("T", 0.0, 0.0)).toDS().toDF())
      .collect().map(_.getString(1)).toSet
  }

  // 1° latitude ≈ 111.2 km: 0.01 ≈ 1.1 km (inside 25 km), 0.45 ≈ 50 km
  // (outside 25 km, inside 75 km)
  test("two-phase geo: ≥10 primary-radius stations → 25 km plan, no fallback") {
    val near = (1 to 12).map(i =>
      mkLoc("T", 100L + i, s"Near$i", 0.01 * i, Seq(mkSensor(1000L + i, "pm25"))))
    val mid = mkLoc("T", 200L, "Mid50", 0.45, Seq(mkSensor(2000L, "pm25")))
    val meas = (1 to 12).map(i => mkMeas(100L + i, 1000L + i, "1.0")) :+
      mkMeas(200L, 2000L, "9.9")
    val locs = runCity(near :+ mid, meas)
    // the 50 km station is reachable only through the 75 km fallback —
    // with 12 primary hits the fallback is provably NOT taken
    assert(!locs.contains("Mid50"))
    assert(locs.contains("Near1") && locs.size == 12)
  }

  test("two-phase geo: <10 primary-radius stations → 75 km fallback taken") {
    val near = (1 to 5).map(i =>
      mkLoc("T", 100L + i, s"Near$i", 0.01 * i, Seq(mkSensor(1000L + i, "pm25"))))
    val mid = mkLoc("T", 200L, "Mid50", 0.45, Seq(mkSensor(2000L, "pm25")))
    val meas = (1 to 5).map(i => mkMeas(100L + i, 1000L + i, "1.0")) :+
      mkMeas(200L, 2000L, "9.9")
    val locs = runCity(near :+ mid, meas)
    assert(locs.contains("Mid50")) // 5 < 10 primary hits → country-wide 75 km
    assert(locs.size == 6)
  }

  test("two-phase geo: null-coordinate station counts toward the primary payload") {
    // The reference's fallback decision is `len(results)` of the RAW 25 km
    // payload (`main.py:119-122`) — before the coordinate guard. 9 located
    // stations + 1 null-coordinate station = 10 primary hits → primary
    // path, so the 50 km station must NOT appear. (Counting after the
    // guard would see 9 → fallback → Mid50 selected — the round-2 bug.)
    val near = (1 to 9).map(i =>
      mkLoc("T", 100L + i, s"Near$i", 0.01 * i, Seq(mkSensor(1000L + i, "pm25"))))
    val noCoord = Location("T", 300L, Some("NoCoord"), None,
      Some(Coordinates(None, Some(0.0))),
      Some(DatetimeLast(Some(FreshTs), None)), Seq(mkSensor(3000L, "pm25")))
    val mid = mkLoc("T", 200L, "Mid50", 0.45, Seq(mkSensor(2000L, "pm25")))
    val meas = (1 to 9).map(i => mkMeas(100L + i, 1000L + i, "1.0")) ++
      Seq(mkMeas(300L, 3000L, "2.0"), mkMeas(200L, 2000L, "9.9"))
    val locs = runCity(near ++ Seq(noCoord, mid), meas)
    assert(!locs.contains("Mid50"))  // 10 raw primary hits → no fallback
    // and in the PRIMARY path the station is a full candidate — the
    // reference's _valid_active_location (main.py:89-97) never checks
    // coordinates, and primary ranking needs no distance (payload-order
    // ties); the coordinate guard exists only inside the fallback scan
    assert(locs.contains("NoCoord"))
    assert(locs.size == 10)
    // control: without the null-coordinate station the payload is 9 → the
    // 75 km fallback IS taken and Mid50 is selected
    val ctrl = runCity(near :+ mid,
      (1 to 9).map(i => mkMeas(100L + i, 1000L + i, "1.0")) :+
        mkMeas(200L, 2000L, "9.9"))
    assert(ctrl.contains("Mid50"))
  }

  test("selection interleaving: station with only invalid rows forces a 4th") {
    val a = mkLoc("T", 1L, "A", 0.01, Seq(mkSensor(11, "pm25"),
      mkSensor(12, "pm10"), mkSensor(13, "o3"), mkSensor(14, "no2")))
    val b = mkLoc("T", 2L, "B", 0.02, Seq(mkSensor(21, "pm25"),
      mkSensor(22, "pm10"), mkSensor(23, "o3")))
    val c = mkLoc("T", 3L, "C", 0.03, Seq(mkSensor(31, "pm25")))
    val d = mkLoc("T", 4L, "D", 0.04, Seq(mkSensor(41, "pm25")))
    val meas = Seq(
      mkMeas(1, 11, "1.0"), mkMeas(1, 12, "2.0"),
      mkMeas(1, 13, "3.0"), mkMeas(1, 14, "4.0"),
      // B ranks 2nd (3 matched sensors) but every value fails F7 — the
      // reference walks it without counting it (main.py:273-274)
      mkMeas(2, 21, "oops"), mkMeas(2, 22, "broken"), mkMeas(2, 23, "bad"),
      mkMeas(3, 31, "5.0"),
      mkMeas(4, 41, "6.0"))
    val locs = runCity(Seq(a, b, c, d), meas)
    // rank order A(4) B(3) C(1) D(1); A covers all params, but `used` only
    // reaches 3 at D because B emitted nothing valid → D must be selected
    assert(locs == Set("A", "C", "D"))
  }

  test("K3 observe(): health counters ride the plan, no second scan") {
    import spark.implicits._
    val a = mkLoc("T", 1, "A", 0.01, Seq(mkSensor(11, "pm25"), mkSensor(12, "o3"),
      mkSensor(13, "pm10"), mkSensor(14, "no2")))
    val b = mkLoc("T", 2, "B", 0.02, Seq(mkSensor(21, "pm25")))
    val c = mkLoc("T", 3, "C", 0.03, Seq(mkSensor(31, "o3")))
    val meas = Seq(mkMeas(1, 11, "1.0"), mkMeas(1, 12, "2.0"),
      mkMeas(1, 13, "3.0"), mkMeas(1, 14, "4.0"),
      mkMeas(2, 21, "5.0"), mkMeas(3, 31, "6.0"))
    val obs = org.apache.spark.sql.Observation("graft-flagship-metrics")
    val out = AirQuality.run(spark, Seq(a, b, c).toDS().toDF(),
      meas.toDS().toDF(), Seq(City("T", 0.0, 0.0)).toDS().toDF(), Some(obs))
    val n = out.count() // the one action: metrics must arrive with it
    assert(obs.get("n_rows") == n, "CollectMetrics row count != action count")
    assert(obs.get("n_empty_unit") == 0L) // every fixture sensor has a unit
  }

  test("cache boundary: final projection reads `valid` from InMemoryRelation") {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import spark.implicits._
    val a = mkLoc("T", 1, "A", 0.01, Seq(mkSensor(11, "pm25"), mkSensor(12, "o3"),
      mkSensor(13, "pm10"), mkSensor(14, "no2")))
    val b = mkLoc("T", 2, "B", 0.02, Seq(mkSensor(21, "pm25")))
    val meas = Seq(mkMeas(1, 11, "1.0"), mkMeas(1, 12, "2.0"),
      mkMeas(1, 13, "3.0"), mkMeas(1, 14, "4.0"), mkMeas(2, 21, "5.0"))
    val out = AirQuality.run(spark, Seq(a, b).toDS().toDF(),
      meas.toDS().toDF(), Seq(City("T", 0.0, 0.0)).toDS().toDF())
    // The measurements⋈candidates join (`valid`) feeds both the greedy
    // summary (already collected inside run()) and this final plan; the
    // cache boundary means the final action replays an InMemoryRelation
    // instead of re-executing the measurement scan + join. Logical plan, not
    // executed plan: AQE's QueryStageExec wrapping hides physical subtrees.
    val imrs = out.queryExecution.optimizedPlan.collect {
      case r: InMemoryRelation => r
    }
    assert(imrs.nonEmpty, "final flagship plan does not read the cached `valid`")
    // and the action still computes the right rows from the cache
    assert(out.collect().map(_.getString(1)).toSet == Set("A", "B"))
  }

  test("flagship plan: pruned snapshot scans, every join a broadcast") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    import graft.sources.Snapshots
    import spark.implicits._
    // the REAL pipeline over the production source path — same build as
    // q_flagship (snapshot JSON through Snapshots.read*)
    val base = new java.io.File("fixtures/snapshots").getAbsolutePath
    val cities = Seq(("Warsaw", 52.2297, 21.0122), ("New York", 40.7128, -74.0060),
      ("Berlin", 52.52, 13.405)).toDF("city", "lat", "lon")
    val out = AirQuality.run(spark,
      Snapshots.readLocations(spark, s"$base/locations.jsonl"),
      Snapshots.readLatest(spark, s"$base/latest.jsonl"), cities)
    // pre-AQE physical plan (no QueryStageExec wrapping), recursing through
    // the cache boundaries — the scans and the big joins live INSIDE the
    // cached `valid`/`candidates` plans, which the outer explain hides.
    // A cached plan is itself compiled under AQE, so its root is an
    // AdaptiveSparkPlanExec LEAF: recurse into its inputPlan (the
    // deterministic initial plan, same discipline as NoCrossJoinSpec).
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val here = p.collect { case x => x }
      here ++ here.collect {
        case s: InMemoryTableScanExec => flatten(s.relation.cachedPlan)
        case a: AdaptiveSparkPlanExec => flatten(a.inputPlan)
      }.flatten
    }
    val plans = flatten(out.queryExecution.sparkPlan)
    // 1. Column pruning reaches both snapshot scans: the PERMISSIVE-mode
    //    _corrupt_record column is dropped at the SCAN (readSchema), not
    //    after it — at 100 TB that column is a second copy of every
    //    malformed payload. explode(sensors) must not widen the scan back.
    //    (The snapshots now arrive through the DSv2 connector, so the scan
    //    node is BatchScanExec over SnapshotScan, not a file scan.)
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val scans = plans.collect { case b: BatchScanExec => b }
    assert(scans.size >= 2, s"expected both snapshot scans, saw ${scans.size}")
    scans.foreach { b =>
      assert(!b.scan.readSchema().fieldNames.contains("_corrupt_record"),
        s"unpruned _corrupt_record in scan: ${b.scan.readSchema().catalogString}")
    }
    // 2. Every join in the flagship is a broadcast: the candidate-sensor
    //    map, the city config, the one-row cutoff and the chosen-station
    //    semi-join are all bounded-small by construction. A SortMergeJoin
    //    or ShuffledHashJoin here means something bounded stopped being
    //    broadcast — the 100 TB measurement scan would shuffle.
    val shuffledJoins = plans.collect {
      case j: SortMergeJoinExec => j.nodeName
      case j: ShuffledHashJoinExec => j.nodeName
    }
    assert(shuffledJoins.isEmpty,
      s"flagship plans a shuffled join: ${shuffledJoins.mkString(", ")}")
    val bhj = plans.count(_.nodeName.contains("BroadcastHashJoin"))
    assert(bhj >= 3,
      s"expected >=3 broadcast hash joins (config, candidate map, semi), saw $bhj")
    spark.sharedState.cacheManager.clearCache() // run() caches valid/candidates
  }

  test("K1 CSV sink: BOM, header, fixed column order, lossless round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("k1csv").toString
    try {
      AirQuality.writeCsv(AirQuality.flagship(spark), dir)
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".csv"))
      assert(files.length == 1) // coalesce(1): one part file
      // utf-8-sig fidelity (`main.py:287`): the file starts with EF BB BF,
      // immediately followed by the header row
      val bytes = java.nio.file.Files.readAllBytes(files.head.toPath)
      assert(bytes.take(3).toSeq ==
        Seq(0xEF.toByte, 0xBB.toByte, 0xBF.toByte), "missing UTF-8 BOM")
      val header = new String(bytes.drop(3), "UTF-8").linesIterator.next()
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

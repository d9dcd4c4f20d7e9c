package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Tables._

object KernelX {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    import graft.ops.Exprs.{md5Long, md5LongLocal, wordShingles}
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"KX $label%-28s ${(System.nanoTime()-t0)/1e9}%8.3f s"); r
    }
    // replicate bandedSharedCounts stages for the ngram_jaccard input
    val toks = split(col("text"), " ")
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      spark.sharedState.cacheManager.clearCache()
      val e = spread(documents(spark, d))
        .select(col("doc_id"), explode(array_distinct(wordShingles(toks, 2))).as("g"))
      time("explode+shingle count")(e.count())
      val base = e.select(col("doc_id"), col("g"))
      val h = base.select(col("doc_id"), md5Long(col("g")).as("hv")).cache()
      time("h materialize")(h.count())
      val bands = 6; val rows = 3; val nH = bands*rows
      val minAggs = (0 until nH).map(j =>
        min(col("hv").bitwiseXOR(lit(md5LongLocal(s"jperm:$j")))).as(s"h$j"))
      val hs = h.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
      time("signatures")(hs.count())
      val bandStructs = (0 until bands).map { b =>
        struct(lit(b.toLong).as("band"),
          concat_ws("-", (0 until rows).map(k =>
            col(s"h${b * rows + k}").cast("string")): _*).as("sig"))
      }
      val bnd = hs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
        .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
      val ba = bnd.select(col("doc_id").as("doc_a"), col("band"), col("sig"))
      val bb = bnd.select(col("doc_id").as("doc_b"), col("band"), col("sig"))
      val cand = ba.join(bb, Seq("band", "sig"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct().cache()
      time("cand join+distinct")(cand.count())
      val sz = h.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val candIds = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
      val hc = h.join(broadcast(candIds), Seq("doc_id"), "left_semi")
      val pa = hc.select(col("doc_id").as("doc_a"), col("hv"))
      val pb = hc.select(col("doc_id").as("doc_b"), col("hv"))
      val pr = cand.join(pa, "doc_a").join(pb, Seq("doc_b", "hv"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      time("verify join")(pr.count())
      val full = pr.join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      time("size joins")(full.count())
      println(s"counts: e=${e.count()} cand=${cand.count()}")
    }
    spark.stop()
  }
}

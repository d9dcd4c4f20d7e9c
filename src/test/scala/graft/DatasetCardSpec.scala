package graft

import org.apache.spark.sql.Row
import graft.ops.Exprs.md5LongLocal

/** q_dataset_card: the per-source curation summary. Re-derived on the
  * driver from collected rows — plain Scala counts, the md5 dup key, the
  * hashing-trick classifier replayed from its md5-derived constants, and a
  * BigDecimal entropy with the same round-6 discipline.
  */
class DatasetCardSpec extends SparkTestBase {

  test("q_dataset_card matches a driver-side re-derivation") {
    val docs = graft.model.Tables.documents(spark, sfDir)
      .select("source", "lang", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3).split(" ", -1)))
    val wts = (0 until 64).map(j => md5LongLocal(s"qw:$j") % 2001L - 1000L)
    val bias = md5LongLocal("qw:bias") % 2001L - 1000L
    def score(ts: Array[String]): Long =
      bias + ts.map(t => wts((md5LongLocal(s"fh:$t") % 64L).toInt)).sum
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def halfUp(a: Long, b: Long): Double = {
      val m = (2 * math.abs(a) * 1000000L + b) / (2 * b)
      math.signum(a.toDouble) * m / 1e6
    }
    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (src, rs) =>
        val nDocs = rs.length.toLong
        val nTokens = rs.map(_._4.length.toLong).sum
        val nChars = rs.map(_._3).sum
        val nKeys = rs.map(r => md5hex(r._4.take(2).mkString(" ")))
          .distinct.length.toLong
        val sumScore = rs.map(r => score(r._4)).sum
        val ent = -rs.groupBy(_._2).values.map { ls =>
          val o = ls.length.toLong
          val lr = BigDecimal(math.log(o.toDouble / nDocs))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)
          BigDecimal(o) * lr
        }.sum.toDouble / nDocs
        (src, nDocs, nTokens, nChars, halfUp(nDocs - nKeys, nDocs),
          ent, halfUp(sumScore, nDocs))
    }
    val got = SparkEntry.queries("q_dataset_card")(spark, sfDir).collect()
      .map { case Row(s: String, d: Long, t: Long, c: Long, dr: Double,
        h: Double, ms: Double) => (s, d, t, c, dr, h, ms) }.toSeq
    assert(got === expected)
    // entropy bounds and rate sanity
    val nLangs = docs.map(_._2).distinct.length
    assert(got.forall(r => r._6 >= -1e-9 && r._6 <= math.log(nLangs) + 1e-6))
    assert(got.forall(r => r._5 >= 0.0 && r._5 < 1.0))
  }
}

package graft.queries

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.model.Tables._

/** The typed `Dataset[T]` surface: a custom [[Aggregator]] and a
  * `KeyValueGroupedDataset.cogroup`, both declared and oracle-checked. The
  * rest of the inventory is untyped DataFrame by design (schemas are
  * dynamic); these two pin the places where the typed API genuinely adds
  * something — a reusable exact-decimal aggregation object, and per-key
  * merge logic over TWO grouped inputs that SQL needs a full outer join of
  * two aggregates to express.
  */
object Typed {

  /** Exact decimal sum of a Double column as a typed Aggregator: the input
    * double is cast to DECIMAL(18,2) (HALF_UP, matching Spark's and
    * DuckDB's `CAST(x AS DECIMAL(18,2))`), summed exactly, and emitted as a
    * plain string — arrival-order-proof, so partial aggregation across any
    * partitioning is bit-stable. The buffer rides Spark's native decimal
    * encoder (not kryo), so the partial-merge shuffle stays columnar.
    */
  private final class DecimalSum extends Aggregator[Double, java.math.BigDecimal, String] {
    def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO
    def reduce(b: java.math.BigDecimal, v: Double): java.math.BigDecimal =
      // valueOf (Double.toString-based), NOT new BigDecimal(v) (exact binary
      // expansion): Spark's CAST(double AS DECIMAL) and DuckDB both round
      // the decimal string form, and half-way doubles like 2.675
      // (binary 2.67499…) diverge under the exact-expansion constructor
      b.add(java.math.BigDecimal.valueOf(v).setScale(2, java.math.RoundingMode.HALF_UP))
    def merge(a: java.math.BigDecimal, b: java.math.BigDecimal): java.math.BigDecimal =
      a.add(b)
    def finish(b: java.math.BigDecimal): String =
      b.setScale(2).toPlainString
    def bufferEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  val all: Seq[Q] = Seq(

    // ── custom typed Aggregator: exact decimal sum per group through
    //    groupByKey(...).agg(aggregator.toColumn) — the typed analog of the
    //    DECIMAL(18,2) discipline every untyped query uses. Participates in
    //    partial aggregation like any declarative agg (one shuffle of
    //    per-partition partials, not rows). ─────────────────────────────────
    Q("q_typed_agg",
      """SELECT l_returnflag,
        |  count(*) AS n,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |       AS VARCHAR) AS total
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val sumAgg = new DecimalSum().toColumn
        lineitem(s, d)
          .select(col("l_returnflag"), col("l_quantity"))
          .as[(String, Double)]
          .groupByKey(_._1)
          .mapValues(_._2) // the aggregator consumes the bare quantity
          .agg(count(lit(1)).as("n").as[Long],
            sumAgg.name("total"))
          .toDF("l_returnflag", "n", "total")
          .orderBy("l_returnflag")
    },

    // ── typed cogroup: orders and lineitem grouped by order key, merged
    //    per key in one function over both iterators — what SQL needs a
    //    full outer join of two aggregates for. One co-partitioned shuffle
    //    of each side, merge logic runs partition-local; the exact-decimal
    //    sum keeps the per-key fold arrival-order-proof. ────────────────────
    Q("q_cogroup",
      """WITH o AS (SELECT o_orderkey AS k, count(*) AS n_ord
        |           FROM orders GROUP BY o_orderkey),
        |l AS (SELECT l_orderkey AS k, count(*) AS n_line,
        |        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |             AS DECIMAL(18,2)) AS VARCHAR) AS qty
        |      FROM lineitem GROUP BY l_orderkey)
        |SELECT coalesce(o.k, l.k) AS k,
        |  coalesce(n_ord, 0) AS n_ord,
        |  coalesce(n_line, 0) AS n_line,
        |  coalesce(qty, '0.00') AS qty
        |FROM o FULL JOIN l ON o.k = l.k ORDER BY k""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val o = orders(s, d).select(col("o_orderkey")).as[Long]
          .groupByKey(identity)
        val l = lineitem(s, d)
          .select(col("l_orderkey"), col("l_quantity")).as[(Long, Double)]
          .groupByKey(_._1)
        o.cogroup(l) { (k, os, ls) =>
          var nOrd = 0L
          os.foreach(_ => nOrd += 1)
          var nLine = 0L
          var qty = java.math.BigDecimal.ZERO
          ls.foreach { case (_, v) =>
            nLine += 1
            qty = qty.add( // valueOf: match CAST rounding (see DecimalSum)
              java.math.BigDecimal.valueOf(v).setScale(2, java.math.RoundingMode.HALF_UP))
          }
          Iterator((k, nOrd, nLine, qty.setScale(2).toPlainString))
        }
          .toDF("k", "n_ord", "n_line", "qty")
          .orderBy("k")
    }
  )
}

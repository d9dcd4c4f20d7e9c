package graft

import org.apache.spark.sql.functions._
import graft.queries.Similarity

/** Bit-equality regression for the codegen IVF assignment kernel
  * ([[graft.functions.CellAssign]]) against the reference HOF formulation
  * (`slice(array_sort(transform(...), cmp), 1, k)`) it replaced — same
  * discipline as ExprsSpec's DotProduct-vs-HOF check. The two plans must
  * agree on EVERY (vec_id, ccid, crk) row: the kernel's insertion top-k is
  * only equivalent to sort-then-slice because the comparator is a total
  * order (unique centroid ids break all ties), and the doubles only compare
  * equal because the dot product accumulates in the identical IEEE order —
  * this spec is what keeps both facts pinned.
  */
class CellAssignSpec extends SparkTestBase {

  private def centsOf(n: org.apache.spark.sql.DataFrame, mod: Long) =
    n.filter(col("vec_id") % mod === 1)
      .select(col("vec_id").as("ccid"), col("e").as("ce"),
        col("nrm").as("cn"))

  test("cell assignment matches the HOF sort-slice reference (k=1 and k=4)") {
    val n = Similarity.withNorms(spark, sfDir).cache()
    for (mod <- Seq(31L, 7L); k <- Seq(1, 4)) {
      val cent = centsOf(n, mod)
      val fast = Similarity.assignTopK(n, cent, k)
      val ref = Similarity.assignTopKHof(n, cent, k)
      assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty,
        s"assignment mismatch at mod=$mod k=$k")
      // sanity: every vector got exactly k cells (more centroids than k)
      val counts = fast.groupBy("vec_id").agg(count(lit(1)).as("c"))
        .select("c").distinct().collect().map(_.getLong(0)).toSeq
      assert(counts == Seq(k.toLong), s"per-vector cell counts $counts")
    }
  }

  test("k larger than the centroid count degrades to all centroids, ranked") {
    val n = Similarity.withNorms(spark, sfDir).cache()
    // huge modulus -> very few centroids; k=4 must return just those
    val cent = centsOf(n, 997L)
    val nCent = cent.count()
    assert(nCent > 0 && nCent < 4)
    val fast = Similarity.assignTopK(n, cent, 4)
    val ref = Similarity.assignTopKHof(n, cent, 4)
    assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty)
    assert(fast.groupBy("vec_id").count()
      .filter(col("count") =!= nCent).isEmpty)
  }
}

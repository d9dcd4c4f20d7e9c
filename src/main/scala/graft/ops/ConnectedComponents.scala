package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Min-label connected components over an undirected edge list — the
  * clustering step of near-duplicate dedup: candidate pairs (MinHash bands,
  * SimHash blocks, Jaccard threshold) form a graph; each component is one
  * duplicate cluster and its minimum doc id is the canonical survivor.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with itself; each round, a node's label becomes the min of its own and
  * all neighbors' labels; stop when a round changes nothing. Rounds are
  * bounded by the graph diameter (duplicate clusters are near-cliques, so
  * 2–3 rounds in practice). Each round is one shuffle join + one
  * aggregation — the driver holds only the loop counter and a changed-row
  * count, never data. At corpus scale the same loop runs with the edges
  * bucketed by node; the alternating large-star/small-star optimization
  * drops in here if diameters grow, without changing the contract.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame (a, b) of undirected edges; node ids
    *              are longs.
    * @return (node, component) — component = min node id reachable.
    */
  def components(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.toDF("a", "b")
    // symmetric closure once; reused by every round
    val sym = e.select(col("a").as("u"), col("b").as("v"))
      .unionByName(e.select(col("b").as("u"), col("a").as("v")))
      .distinct()
      .cache()
    var labels = sym.select(col("u").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .cache()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // neighbor labels: for each edge (u,v), v's current label reaches u
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("node", "v")
          .withColumnRenamed("lbl", "nlbl"), Seq("v"))
        .groupBy(col("u").as("node"))
        .agg(min("nlbl").as("minNbr"))
      val next = labels.join(viaNeighbors, Seq("node"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("minNbr"), col("lbl"))).as("lbl"))
        .cache()
      val changed = next.join(labels.withColumnRenamed("lbl", "old"), Seq("node"))
        .filter(col("lbl") =!= col("old")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels.select(col("node"), col("lbl").as("component"))
  }
}

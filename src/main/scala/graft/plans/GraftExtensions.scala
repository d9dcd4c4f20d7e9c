package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point (`spark.sql.extensions=graft.plans
  * .GraftExtensions` or `builder.withExtensions(new GraftExtensions)`):
  *
  *  - registers `haversine_distance(lat1, lon1, lat2, lon2)` as a SQL
  *    function (the [[HaversineDistance]] RuntimeReplaceable — execution is
  *    the composed built-in tree, nothing custom survives analysis);
  *  - injects [[HaversineBoundingBox]], which augments literal-center
  *    radius predicates with scan-pushable bounding-box conjuncts.
  *
  * The declared oracle queries do NOT depend on the extension (they use the
  * composed `Exprs.haversineMeters` directly); this is the opt-in
  * optimization surface for geo-heavy deployments, spec-verified by
  * SessionExtensionsSpec.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("haversine_distance"),
      new ExpressionInfo(classOf[HaversineDistance].getName,
        "haversine_distance"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 4,
          s"haversine_distance takes 4 arguments, got ${args.length}")
        HaversineDistance(args(0), args(1), args(2), args(3))
      }))
    // vector similarity as SQL functions over the codegen DotProduct
    // expression — the custom-Expression hot path (VectorExprs) becomes
    // SQL-visible; cosine is a pure expression-tree composition with the
    // IDENTICAL operation shape as Exprs.cosineSim, so SQL and DataFrame
    // callers get bit-equal results
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName,
        "dot_product"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2,
          s"dot_product takes 2 arguments, got ${args.length}")
        graft.functions.DotProduct(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      // no single implementing Expression class — the builder composes
      // DotProduct/Sqrt/Divide — so DESCRIBE FUNCTION points here (the
      // registration site) and the usage string states the composition
      new ExpressionInfo(classOf[GraftExtensions].getName, null,
        "cosine_similarity",
        "cosine_similarity(a, b) - Cosine similarity of two float arrays, " +
          "composed as dot_product(a, b) / sqrt(dot_product(a, a) * " +
          "dot_product(b, b)).", ""),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2,
          s"cosine_similarity takes 2 arguments, got ${args.length}")
        import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Divide, GreaterThan, Literal, Multiply, Sqrt}
        val (a, b) = (args(0), args(1))
        // zero-norm guard matching Exprs.cosineSim: a/0 must be NULL (the
        // DuckDB behavior), not an ANSI DIVIDE_BY_ZERO error
        val n2 = Multiply(graft.functions.DotProduct(a, a),
          graft.functions.DotProduct(b, b))
        CaseWhen(Seq((GreaterThan(n2, Literal(0.0)),
          Divide(graft.functions.DotProduct(a, b), Sqrt(n2)))), None)
      }))
    ext.injectPostHocResolutionRule(_ => HaversineBoundingBox)
  }
}

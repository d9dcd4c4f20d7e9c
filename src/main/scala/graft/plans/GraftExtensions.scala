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
    ext.injectPostHocResolutionRule(_ => HaversineBoundingBox)
  }
}

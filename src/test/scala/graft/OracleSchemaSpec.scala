package graft

import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType}

/** Guard for the harness's oracle comparator: the driver sorts result columns
  * with pandas, which cannot sort/factorize ARRAY, MAP or BINARY cells
  * (round 4's sole red row, q_quantize, was exactly this — a top-level
  * `ARRAY<BIGINT>` column crashed `sort_values` with
  * "unhashable type: 'numpy.ndarray'"). Every declared query must therefore
  * project complex values through the stringify rule
  * (`array_join(array_sort(...), ",")` / `array_to_string(...)`) before the
  * final SELECT. This spec fails the build the moment any declared query
  * reintroduces a bare complex column.
  */
class OracleSchemaSpec extends SparkTestBase {

  test("no declared query projects a top-level array/map/binary column") {
    // Deliberately includes q_stream_* even though building their frames
    // executes each micro-batch pipeline (~seconds apiece): a streaming
    // query's declared output schema only exists after the run, and the
    // oracle comparator reads exactly that output — excluding them would
    // leave the guard blind to the five declared streaming results.
    val offenders = SparkEntry.registry.flatMap { q =>
      val bad = q.run(spark, sfDir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType == BinaryType => s"${q.name}.${f.name}: ${f.dataType.simpleString}"
      }
      bad
    }
    spark.sharedState.cacheManager.clearCache() // builder-time cache residue
    assert(offenders.isEmpty,
      s"oracle-incomparable top-level columns (stringify them): ${offenders.mkString(", ")}")
  }
}

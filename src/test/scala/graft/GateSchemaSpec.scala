package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType, DataType}

/** Gate-output contract: every declared query's result schema must be
  * flat primitives. The driver's correctness gate canonicalizes rows
  * by sorting on EVERY column through pandas, and a nested cell
  * (array/map/struct) makes that sort raise "unhashable type" — the
  * r8 q_profile_sketch red was exactly this, an operator that was
  * fine but whose gate row recorded the checker's own crash. This
  * spec makes the invariant structural: a future operator that leaks
  * a nested column into `SparkEntry.queries` fails here, in-repo,
  * before the driver ever sees it.
  *
  * Schema-only: builds each query's plan at sf0.001 without executing
  * it (driver-side fit collects inside plan construction still run,
  * which is why this uses the smallest fixture).
  */
class GateSchemaSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def nested(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }

  test("every declared query has an oracle, and no oracle is orphaned") {
    // a query without an oracle silently degrades to the driver's
    // rows-only check; an oracle without a query is dead SQL — both
    // are drift, so the two key sets must match exactly
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries with no oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphaned oracles: ${(o -- q).toSeq.sorted}")
  }

  test("every SparkEntry query emits flat primitive columns only") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val bad = q(spark, sfDir).schema.fields.filter(f => nested(f.dataType))
        bad.map(f => s"$name.${f.name}: ${f.dataType.simpleString}")
    }
    assert(offenders.isEmpty,
      s"nested gate-output columns (driver canonicalizer cannot sort " +
        s"these):\n${offenders.mkString("\n")}")
  }
}

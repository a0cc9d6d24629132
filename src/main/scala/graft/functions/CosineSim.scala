package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity of two numeric arrays in one pass — the kernel of
  * every pairwise-similarity join ([[graft.operators.Similarity]]).
  *
  * Exists because the higher-order spelling —
  * `aggregate(zip_with(a,b,*)) / (sqrt(aggregate(...)) · sqrt(...))` —
  * evaluates three interpreted lambda folds per pair; on
  * q_dedup_semantic's ~500k intra-cluster pairs × 64 dims that was
  * ~14 s of lambda dispatch. This expression runs the identical
  * arithmetic as a JVM loop.
  *
  * Value-compatibility with the HOF spelling (and the DuckDB
  * `list_reduce(list_prepend(0.0, list_transform(...)))` oracles) is
  * load-bearing: three independent accumulators (dot, ‖a‖², ‖b‖²)
  * each fold ascending from 0.0 — the same IEEE-754 sequence as three
  * separate `aggregate` folds — then `dot / (sqrt(na) * sqrt(nb))`.
  * Float elements widen to double exactly as `cast(double)` does.
  * Null inputs, null elements, or length mismatch → null (the HOF
  * spelling's zip_with null-padding likewise nulls the result).
  *
  * Zero-norm inputs → 0.0, NOT the raw 0/0 = NaN: real corpora carry
  * zero embeddings (failed encodes, padding rows), and NaN similarity
  * is poison downstream — Spark orders NaN as the LARGEST double, so
  * a single zero vector would outrank every true neighbor in a
  * `.desc` top-k and pass every `>= tau` gate, while other engines'
  * NaN comparison rules differ (the cross-engine edge-fixture sweep
  * caught exactly this divergence). 0.0 means "never a neighbor, never
  * a duplicate" deterministically on every engine; the DuckDB oracles
  * mirror it with an explicit zero-norm CASE arm.
  */
case class CosineSimExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // analysis-time rejection with a readable message (the BpeEncodeExpr
  // pattern) instead of an IllegalStateException mid-job
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_cosine expects two array<float|double> arguments, got ($l, $r)")
    }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val lf = isFloat(left)
  @transient private lazy val rf = isFloat(right)
  @transient private lazy val lNulls = left.dataType.asInstanceOf[ArrayType].containsNull
  @transient private lazy val rNulls = right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    // null-element check folded into the accumulation loop: the
    // separate `(0 until n).exists` pass allocated a Range + boxed
    // predicate per pair, on the hot path this expression exists to
    // keep allocation-free (partial sums before a null are discarded
    // by the return, so semantics are identical)
    val checkNulls = lNulls || rNulls
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
}

object CosineSim {
  import org.apache.spark.sql.GraftSqlBridge

  def cosine(a: Column, b: Column): Column = {
    val s = org.apache.spark.sql.SparkSession.active
    GraftSqlBridge.column(CosineSimExpr(
      GraftSqlBridge.expression(s, a), GraftSqlBridge.expression(s, b)))
  }
}

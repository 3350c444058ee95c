package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Cosine similarity over two DOUBLE arrays as a native codegen'd Catalyst
  * expression — the hot path of every ANN/near-dup query. The higher-order-
  * function formulation ([[VectorFunctions.cosineHof]]) evaluates interpreted
  * (HOFs are CodegenFallback) and walks the arrays five times; this is one
  * fused whole-stage-codegen loop.
  *
  * Numeric contract (oracle parity): each accumulator (dot, |a|², |b|²) is a
  * strict left-to-right sum, result = dot / sqrt(na·nb) — the exact IEEE op
  * sequence of `list_dot_product(a,b)/sqrt(list_dot_product(a,a)*
  * list_dot_product(b,b))` in DuckDB, and bit-identical to the HOF fold
  * (pinned by a property test). Array elements must be non-null.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    CosineSimilarityFn.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSimilarityFn.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarityFn {
  /** Referenced from generated code. */
  def compute(x: ArrayData, y: ArrayData): Double = {
    // a prefix cosine over mismatched lengths would be plausible-but-wrong
    // everywhere this feeds ANN/near-dup; the HOF reference null-poisons
    // and DuckDB errors — fail loudly like the oracle, don't guess
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"cosine_similarity: vector lengths differ " +
          s"(${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val a = x.getDouble(i)
      val b = y.getDouble(i)
      dot += a * b
      na += a * a
      nb += b * b
      i += 1
    }
    dot / math.sqrt(na * nb)
  }
}

object CosineSimilarity {
  def apply(a: Column, b: Column): Column = GraftSqlBridge.column(
    CosineSimilarity(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

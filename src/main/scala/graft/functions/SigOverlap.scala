package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** MinHash signature overlap — the count of equal positions between two
  * LONG signature arrays — as a native codegen'd Catalyst expression: the
  * verify predicate of every minhash near-dup path (`dedup_minhash_lsh`,
  * the streaming store engines, `pipeline_curate_v2`).
  *
  * Why native (r16): the zip_with+aggregate fold it replaces is a
  * higher-order function, which evaluates INTERPRETED (CodegenFallback) —
  * fine at sf0.1's ~1.5 M verify rows (~1 s/batch), but the 100× text
  * store verifies up to ~170 M candidate rows per micro-batch once the
  * pair distinct is dropped (the r16 held-stage re-shape), where the
  * interpreted fold is the new wall. One fused whole-stage-codegen loop,
  * exact integer count — value-identical to the fold and to the oracle's
  * 64-term CASE sum ([[graft.ops.DedupQueries.matchTermsSql]]), so hash
  * parity is untouched.
  *
  * Array elements must be non-null (minhash signatures are total);
  * mismatched lengths fail loudly — a prefix overlap would be
  * plausible-but-wrong in every consumer, and the oracle's column-wise
  * form cannot even express it.
  */
case class SigOverlap(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sig_overlap"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigOverlapFn.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SigOverlapFn.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigOverlap =
    copy(left = newLeft, right = newRight)
}

/** The PREDICATE form of [[SigOverlap]] — `overlap(a, b) >= k` with early
  * exit in both directions: succeed the moment the k-th match lands, fail
  * the moment the (n-k+1)-th mismatch does. Value-identical to
  * `SigOverlap(a, b) >= k` position for position (so every oracle's
  * 64-term CASE sum stays a twin), but on the dominant class at scale —
  * candidate pairs that FAIL the verify (random signatures mismatch
  * almost every position) — the loop exits after ~n-k+1 ≈ 20 of 64
  * positions instead of scanning all 64. Used everywhere the overlap
  * count is only ever compared against [[graft.ops.DedupQueries.VerifyMin]]
  * (the store engines' verify, `verifiedPairs`, `pipeline_curate_v2`);
  * [[SigOverlap]] remains for consumers that need the count itself.
  */
case class SigOverlapAtLeast(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "sig_overlap_at_least"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigOverlapFn.atLeast(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SigOverlapFn.atLeast($a, $b, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigOverlapAtLeast =
    copy(left = newLeft, right = newRight)
}

object SigOverlapAtLeast {
  def apply(a: Column, b: Column, k: Int): Column = GraftSqlBridge.column(
    SigOverlapAtLeast(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b), k))
}

object SigOverlapFn {
  /** Referenced from generated code. */
  def compute(x: ArrayData, y: ArrayData): Long = {
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"sig_overlap: signature lengths differ " +
          s"(${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) c += 1L
      i += 1
    }
    c
  }

  /** Referenced from generated code. `compute(x, y) >= k`, early-exiting
    * both ways (k-th match → true; (n-k+1)-th mismatch → false). */
  def atLeast(x: ArrayData, y: ArrayData, k: Int): Boolean = {
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"sig_overlap_at_least: signature lengths differ " +
          s"(${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
    if (k <= 0) return true
    if (k > n) return false
    val maxMiss = n - k
    var miss = 0
    var c = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) {
        c += 1
        if (c >= k) return true
      } else {
        miss += 1
        if (miss > maxMiss) return false
      }
      i += 1
    }
    false
  }
}

object SigOverlap {
  def apply(a: Column, b: Column): Column = GraftSqlBridge.column(
    SigOverlap(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

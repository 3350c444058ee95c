package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint (SURVEY §2.4 "text analysis"
  * extension; the reference has no UDF surface at all, so this is the
  * engine's showcase custom scalar: a native Catalyst `Expression` with
  * `doGenCode`, which stays inside whole-stage codegen — no UDF
  * serialization, no codegen fence).
  *
  * hash = foldLeft(codePoints(s), 0)((acc, cp) => (acc * 31 + cp) mod 10^17)
  *
  * The modulus keeps the fold inside BIGINT range in engines with checked
  * 64-bit overflow (DuckDB), making the function oracle-expressible:
  * `list_reduce(list_prepend(0, list_transform(list_filter(string_split(s,''),
  * c -> c <> ''), c -> unicode(c))), (a, c) -> (a*31 + c) % 10^17)`.
  */
object RollingHashFn {
  final val Mod = 100000000000000000L // 10^17: acc*31 + cp < 2^63, no overflow

  /** Referenced from generated code — must be public, static-path stable. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}

case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires a string argument, got ${child.dataType.sql}")
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHashFn.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHashFn.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Column-API form: `rolling_hash($"text")`. */
  def apply(c: Column): Column = GraftSqlBridge.column(
    RollingHash(GraftSqlBridge.expression(c)))
}

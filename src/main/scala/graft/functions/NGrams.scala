package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating function (UDTF surface of SURVEY §2.4): one input string
  * → one output row per whitespace n-gram. A native Catalyst [[Generator]],
  * so it plans as the same `Generate` operator as `explode` — streaming
  * per-row expansion, no array materialization of all n-grams per document
  * first (the `transform(sequence(...))`-then-explode formulation builds the
  * whole n-gram array in memory per row; this emits them lazily, which is
  * the difference between O(longest document) and O(1) extra memory per row
  * at 100 TB).
  *
  * SQL-registered as `ngrams(text, n)` via [[graft.plans.GraftExtensions]]:
  * `SELECT ngram FROM docs LATERAL VIEW ngrams(text, 3) t AS ngram` or
  * `SELECT ngrams(text, 3) AS ngram FROM docs`.
  */
case class NGrams(child: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)

  override def elementSchema: StructType =
    StructType(Seq(StructField("ngram", StringType)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n.dataType == IntegerType && n.foldable)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"ngrams requires (string, int literal), got " +
          s"(${child.dataType.sql}, ${n.dataType.sql})")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = child.eval(input).asInstanceOf[UTF8String]
    if (s == null) Iterator.empty
    else {
      val size = n.eval(input).asInstanceOf[Int]
      // limit -1 keeps trailing empty tokens, matching Spark's split() and
      // DuckDB's string_split (Java's default split drops them, which would
      // skew n-gram counts on text with trailing whitespace)
      val toks = s.toString.split(" ", -1)
      if (size <= 0 || toks.length < size) Iterator.empty
      else (0 to toks.length - size).iterator.map { i =>
        InternalRow(UTF8String.fromString(
          toks.slice(i, i + size).mkString(" ")))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NGrams =
    copy(child = newChildren(0), n = newChildren(1))
}

object NGrams {
  /** Column-API form: `NGrams($"text", 3)` — use inside `select` like
    * `explode`.
    */
  def apply(c: Column, n: Int): Column = GraftSqlBridge.column(
    NGrams(GraftSqlBridge.expression(c),
      org.apache.spark.sql.catalyst.expressions.Literal(n)))
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.NumToWords

/** P3 `_num_to_words` (claude_research_optimal.py:37–64) as a native
  * Catalyst `Expression` with `doGenCode` — stays inside whole-stage
  * codegen (the generated code is a direct static call, no UDF
  * serialization, no Option boxing), null-safe, foldable when its
  * child is foldable so constant inputs fold at optimization time.
  */
final case class NumToWordsExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"num_to_words requires BIGINT, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(NumToWords.concat(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.NumToWords.javaConcat($c))")

  override protected def withNewChildInternal(
      newChild: Expression): NumToWordsExpression = copy(child = newChild)

  override def prettyName: String = "num_to_words"
}

package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode-spoof expressions over [[graft.operators.Spoof]]
  * — one static call per row inside whole-stage codegen. SQL names
  * (registered by [[SpoofExprs.register]]): `spoof_skeleton(s)`,
  * `mixed_script_tokens(s)`, `invisible_count(s)`. Null-strict
  * (UnaryExpression default): NULL in → NULL out.
  */
abstract class SpoofExpr extends UnaryExpression {
  protected def fn: String
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn expects a string column, got $other")
    }
}

case class SpoofSkeleton(child: Expression) extends SpoofExpr {
  override protected def fn: String = "spoof_skeleton"
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    graft.operators.Spoof.skeletonUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.Spoof.skeletonUtf8($c)")
  override protected def withNewChildInternal(
      newChild: Expression): SpoofSkeleton = copy(child = newChild)
}

case class MixedScriptTokens(child: Expression) extends SpoofExpr {
  override protected def fn: String = "mixed_script_tokens"
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    graft.operators.Spoof.mixedUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.Spoof.mixedUtf8($c)")
  override protected def withNewChildInternal(
      newChild: Expression): MixedScriptTokens = copy(child = newChild)
}

case class InvisibleCount(child: Expression) extends SpoofExpr {
  override protected def fn: String = "invisible_count"
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    graft.operators.Spoof.invisibleUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.Spoof.invisibleUtf8($c)")
  override protected def withNewChildInternal(
      newChild: Expression): InvisibleCount = copy(child = newChild)
}

object SpoofExprs {
  private def one(name: String, mk: Expression => Expression)
                 (exprs: Seq[Expression]): Expression = {
    if (exprs.length != 1) throw new IllegalArgumentException(
      s"$name expects exactly one argument, got ${exprs.length}")
    mk(exprs.head)
  }
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("spoof_skeleton",
      one("spoof_skeleton", SpoofSkeleton.apply), "built-in")
    reg.createOrReplaceTempFunction("mixed_script_tokens",
      one("mixed_script_tokens", MixedScriptTokens.apply), "built-in")
    reg.createOrReplaceTempFunction("invisible_count",
      one("invisible_count", InvisibleCount.apply), "built-in")
  }
}

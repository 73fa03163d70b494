package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd URL expressions over [[graft.operators.Url]] — one static
  * call inside whole-stage codegen per row, no UDF boxing. All three
  * return NULL for unparsable input (the engine's null-on-fail
  * conversion discipline), so `nullable` is unconditionally true and
  * codegen re-checks the result.
  *
  * SQL names (registered by [[UrlExprs.register]]):
  * `url_canonical(s)`, `url_host(s)`, `url_domain(s)`.
  */
abstract class UrlExpr extends UnaryExpression {
  protected def fn: String
  protected def call(u: UTF8String): UTF8String

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn expects a string column, got $other")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    call(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.operators.Url.${fn}Utf8($c);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
    """.stripMargin)
}

case class UrlCanonical(child: Expression) extends UrlExpr {
  override protected def fn: String = "canonical"
  override protected def call(u: UTF8String): UTF8String =
    graft.operators.Url.canonicalUtf8(u)
  override protected def withNewChildInternal(newChild: Expression): UrlCanonical =
    copy(child = newChild)
}

case class UrlHost(child: Expression) extends UrlExpr {
  override protected def fn: String = "host"
  override protected def call(u: UTF8String): UTF8String =
    graft.operators.Url.hostUtf8(u)
  override protected def withNewChildInternal(newChild: Expression): UrlHost =
    copy(child = newChild)
}

case class UrlDomain(child: Expression) extends UrlExpr {
  override protected def fn: String = "domain"
  override protected def call(u: UTF8String): UTF8String =
    graft.operators.Url.domainUtf8(u)
  override protected def withNewChildInternal(newChild: Expression): UrlDomain =
    copy(child = newChild)
}

/** RFC 3986 §5.2 reference resolution: `url_resolve(base, ref)` — the
  * href→frontier step (resolve each extracted link against the page
  * URL, canonicalized). NULL when the base is unparsable or the ref is
  * a non-hierarchical URI (mailto:, javascript: …).
  */
case class UrlResolve(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"url_resolve expects two string columns, got ($l, $r)")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(base: Any, ref: Any): Any =
    graft.operators.Url.resolveUtf8(
      base.asInstanceOf[UTF8String], ref.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, r) => s"""
      |${ev.value} = graft.operators.Url.resolveUtf8($b, $r);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
    """.stripMargin)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UrlResolve =
    copy(left = newLeft, right = newRight)
}

object UrlExprs {
  private def one(name: String, mk: Expression => Expression)
                 (exprs: Seq[Expression]): Expression = {
    if (exprs.length != 1) throw new IllegalArgumentException(
      s"$name expects exactly one argument, got ${exprs.length}")
    mk(exprs.head)
  }
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("url_canonical",
      one("url_canonical", UrlCanonical.apply), "built-in")
    reg.createOrReplaceTempFunction("url_host",
      one("url_host", UrlHost.apply), "built-in")
    reg.createOrReplaceTempFunction("url_domain",
      one("url_domain", UrlDomain.apply), "built-in")
    reg.createOrReplaceTempFunction("url_resolve",
      exprs => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"url_resolve expects exactly two arguments, got ${exprs.length}")
        UrlResolve(exprs(0), exprs(1))
      }, "built-in")
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: integer dot product of two `array<bigint>`
  * columns, with whole-stage codegen (`doGenCode` emits the primitive loop
  * directly into the generated stage — no boxing, no lambda dispatch).
  *
  * This is the (b) extension tier for vector math when the pairing itself
  * is produced by a join (bucketed candidates, pre-paired frames) and a
  * broadcast kernel doesn't apply: `q_dot(a.q, b.q)` stays inside the same
  * generated function as the surrounding filter/projection.
  */
case class QDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"q_dot expects two array<bigint> args, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "q_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0L
    var i = 0
    while (i < n) { d += x.getLong(i) * y.getLong(i); i += 1 }
    d
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getLong($i) * $b.getLong($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QDot =
    copy(left = newLeft, right = newRight)
}

/** Session-extensions entry point: injects graft's native expressions at
  * session build, the deployment path for a real cluster —
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) makes `q_dot` a resolved
  * built-in on every executor with no per-session registration call.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("q_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[QDot].getName, "q_dot"),
      (exprs: Seq[Expression]) => QDot(exprs(0), exprs(1))))
}

/** SQL registration for graft's native expressions. */
object GraftFunctions {
  /** Makes `q_dot(a, b)` available to `selectExpr` / `spark.sql`.
    * Idempotent per session: re-registering an existing temp function logs
    * a replacement warning on every query, so skip when already present.
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("q_dot")
    if (!registry.functionExists(id))
      registry.createOrReplaceTempFunction(
        "q_dot", exprs => QDot(exprs(0), exprs(1)), "built-in")
  }
}

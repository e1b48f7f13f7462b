package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two float-array columns.
  *
  * Why a custom Catalyst expression (SURVEY §7.3 preference order (b)):
  * the built-in routes are either interpreted higher-order functions
  * (`aggregate(zip_with(...))` — per-row closure allocation, no
  * codegen) or a statically unrolled `element_at` sum — codegen'd but
  * one expression node per dimension (64-dim → ~200 nodes, slow to
  * plan/compile and dimension-bound at plan time). This expression
  * emits a single tight loop over the unsafe array data: accumulation
  * in double, ascending index — the exact semantics the DuckDB oracle
  * reproduces with `list_sum(list_transform(...))`.
  *
  * NULL iff either side is NULL; mismatched lengths use the common
  * prefix (callers validate dimensions upstream).
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column API: dot product of two array<float> columns. */
  def dotF(a: Column, b: Column): Column =
    Bridge.column(DotProductF(Bridge.expression(a), Bridge.expression(b)))

  /** SQL surface: `SELECT dot_product_f(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerBinary(spark, "dot_product_f", DotProductF(_, _))
}

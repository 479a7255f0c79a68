package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** `vec_dot(a, b)` — integer dot product of two `array<bigint>` columns.
  *
  * The second deliberate custom Expression (SURVEY §7.3's "escape hatch,
  * only if benchmarks demand"): the HOF spelling
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,v) -> acc+v)` is
  * interpreted (higher-order functions don't codegen) and allocates a
  * zipped array per evaluation — measured as the bottleneck of the
  * embedding near-dup join (d04) at sf0.1. This expression generates a
  * primitive long loop over the unsafe array data: no allocation, no
  * virtual calls, stays inside whole-stage codegen.
  *
  * Semantics match the HOF/DuckDB spelling exactly (exact BIGINT math on
  * quantized vectors — see Similarity's determinism note); length mismatch
  * truncates to the shorter side, null input → null.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot"
  override def foldable: Boolean = left.foldable && right.foldable

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

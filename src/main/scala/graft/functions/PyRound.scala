package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Static helper so generated code can call a plain static method. */
object PyRoundUtil {
  /** Python-semantics round(x, scale): round-half-even applied to the EXACT
    * binary value of the double (CPython rounds via correctly-rounded
    * decimal conversion of the true binary64 value).
    */
  def round(x: Double, scale: Int): Double = {
    if (x.isNaN || x.isInfinite) x
    else new JBigDecimal(x).setScale(scale, RoundingMode.HALF_EVEN).doubleValue()
  }
}

/** `py_round(x, s)` — CPython-fidelity banker's rounding.
  *
  * Why a custom Catalyst Expression (the one deliberate extension point in
  * this engine): the reference's DEPLOYED variant (the zip's
  * `lambda_function_aws.py:57-62`, csv.DictReader loop) rounds with Python
  * `round()`, which rounds the exact binary double — the semantics this
  * expression implements. (The loose pandas variant, `py:43-46`, uses
  * `Series.round(2)` = numpy's scaled `rint(x*100)/100`; that can disagree
  * with CPython on doubles whose exact value and fl(100·x) fall on opposite
  * sides of a .5 boundary. This engine follows the deployed artifact; the
  * distinction is noted so the V1/V2 divergence isn't mistaken for a bug.)
  * Spark's `bround` matches neither: it routes through
  * `BigDecimal.valueOf(d)` — the SHORTEST DECIMAL STRING of
  * the double — so on boundary values the engines disagree:
  * `round(2.675, 2)` = 2.67 in Python (2.675 is really 2.67499999…)
  * but `bround(2.675, 2)` = 2.68 in Spark. No composition of built-ins
  * fixes this, so the semantics get their own expression — with `doGenCode`
  * emitting a static call, it stays inside whole-stage codegen.
  */
case class PyRound(child: Expression, scale: Int) extends UnaryExpression {

  // Input typing is enforced by the registration builder (GraftExtensions
  // wraps the argument in Cast(_, DoubleType)); AbstractDataType /
  // ExpectsInputTypes are private[sql], so a third-party expression pins
  // types at construction instead.
  override def dataType: DataType = DoubleType
  override def prettyName: String = "py_round"
  // participate in ConstantFolding when the argument is literal
  override def foldable: Boolean = child.foldable

  override protected def nullSafeEval(input: Any): Any =
    PyRoundUtil.round(input.asInstanceOf[Double], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PyRoundUtil.round($c, $scale)")

  override protected def withNewChildInternal(newChild: Expression): PyRound =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Static helper so generated code can call a plain static method — the
  * whole point: the loop body is ONE small JIT-friendly method instead of
  * 32 unrolled per-level projections fused into the enclosing
  * whole-stage-codegen method.
  */
object HilbertIndexUtil {
  /** The standard xy2d Hilbert walk (extract the level's bit pair, add the
    * quadrant's curve offset s²·(3rx XOR ry) — which collapses to
    * `if rx=0 then ry else 3−ry` — then rotate/reflect the frame masked
    * into [0, s)): per-level IDENTICAL to [[graft.queries.Extras.hilbertD]]'s
    * projection chain and to the DuckDB oracle's CTE dialect
    * (ExtendedSpec pins all three against each other and enumerates the
    * 4-level instantiation's bijectivity + jump-freedom).
    */
  def xy2d(levels: Int, x: Long, y: Long): Long = {
    var hx = x
    var hy = y
    var hd = 0L
    var k = levels - 1
    while (k >= 0) {
      val rx = (hx >> k) & 1L
      val ry = (hy >> k) & 1L
      val s = 1L << k
      hd += s * s * (if (rx == 0L) ry else 3L - ry)
      val m = s - 1L
      val nx = if (ry == 1L) hx & m else if (rx == 1L) m - (hy & m) else hy & m
      val ny = if (ry == 1L) hy & m else if (rx == 1L) m - (hx & m) else hx & m
      hx = nx
      hy = ny
      k -= 1
    }
    hd
  }
}

/** `hilbert_index(x, y, levels)` — the Hilbert curve position of a
  * non-negative grid cell (x, y) ∈ [0, 2^levels)² as a bigint in
  * [0, 4^levels).
  *
  * Why a custom Catalyst Expression rather than the relational per-level
  * projection pipeline ([[graft.queries.Extras.hilbertD]], which remains
  * the test reference): the state recursion needs 2 projections × 16
  * levels, and while each is a cheap narrow Project, whole-stage codegen
  * fuses ALL of them (plus the Morton interleave and the downstream
  * partial aggregate) into one generated `processNext` whose bytecode
  * lands beyond HotSpot's 8 KB JIT-compilation ceiling — the method runs
  * in the bytecode interpreter at ~12 µs/row, ~100× the arithmetic's real
  * cost, and Spark only self-reports at 64 KB (measured on q180: 8 s for
  * 600 k rows at sf0.1, flat across `methodSplitThreshold`/
  * `hugeMethodLimit`; 0.4 s the moment the fused method shrinks). A
  * `doGenCode` that emits one static call keeps the operator inside
  * whole-stage codegen AND keeps the enclosing method small enough to
  * JIT; the interpreted `eval` path is the same static method.
  */
case class HilbertIndex(left: Expression, right: Expression, levels: Int)
    extends BinaryExpression {

  require(levels >= 1 && levels <= 31, s"levels must be in [1, 31], got $levels")

  // Input typing is enforced by the registration builder (GraftExtensions
  // wraps both arguments in Cast(_, LongType)); ExpectsInputTypes is
  // private[sql], so a third-party expression pins types at construction.
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"
  override def foldable: Boolean = left.foldable && right.foldable

  override protected def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndexUtil.xy2d(levels, x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.HilbertIndexUtil.xy2d($levels, $x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

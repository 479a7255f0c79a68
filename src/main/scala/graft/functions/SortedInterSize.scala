package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static helper so generated code calls one small JIT-friendly method. */
object SortedInterSizeUtil {
  /** |A ∩ B| of two ASCENDING-sorted bigint arrays by linear merge —
    * O(|A|+|B|) primitive long comparisons, zero allocation. Null
    * ELEMENTS fail loudly: ArrayData.getLong on a null slot returns
    * whatever bytes sit there (silently wrong counts), and a null inside
    * a sorted shingle-hash set is always an upstream bug (r09 advice).
    */
  private def read(arr: ArrayData, k: Int): Long = {
    if (arr.isNullAt(k))
      throw new IllegalArgumentException("sorted_inter_size: null array element")
    arr.getLong(k)
  }

  def inter(a: ArrayData, b: ArrayData): Long = {
    val la = a.numElements()
    val lb = b.numElements()
    if (la == 0 || lb == 0) return 0L
    // heads are CACHED and refreshed only on advance: each element pays
    // exactly one null-check + one getLong (the per-iteration re-read of
    // both slots was measurable on d28's ~9M-pair verify path)
    var i = 0
    var j = 0
    var n = 0L
    var x = read(a, 0)
    var y = read(b, 0)
    while (true) {
      if (x == y) {
        n += 1; i += 1; j += 1
        if (i >= la || j >= lb) return n
        x = read(a, i); y = read(b, j)
      } else if (x < y) {
        i += 1
        if (i >= la) return n
        x = read(a, i)
      } else {
        j += 1
        if (j >= lb) return n
        y = read(b, j)
      }
    }
    n // unreachable
  }

  /** Threshold-aware merge: EXACT |A ∩ B| whenever that is ≥ `minReq`,
    * else SOME value < `minReq` (the partial count at the abort point).
    *
    * The early exit fires when the running count plus the best-case
    * remaining overlap, `n + min(|A|−i, |B|−j)` — an upper bound on the
    * true intersection because every future match consumes one element of
    * EACH suffix — can no longer reach `minReq`. A caller that filters on
    * `inter ≥ minReq` (equivalently any predicate that is false for all
    * values < minReq) therefore drops exactly the same rows as with the
    * exact merge, and every SURVIVING row carries the exact count: a
    * qualifying pair keeps the bound ≥ true-inter ≥ minReq at every step,
    * so it can never abort. Non-qualifying candidates — the vast majority
    * on d28's ~9M-pair k=2 verify path — abort after scanning only the
    * slack `(|A|+|B|)·(1 − τ-ish)` prefix instead of the full merge.
    */
  def interAtLeast(a: ArrayData, b: ArrayData, minReq: Long): Long = {
    val la = a.numElements()
    val lb = b.numElements()
    if (la == 0 || lb == 0) return 0L
    if (minReq <= 0) return inter(a, b)
    var i = 0
    var j = 0
    var n = 0L
    var x = read(a, 0)
    var y = read(b, 0)
    while (true) {
      if (x == y) {
        n += 1; i += 1; j += 1
        if (i >= la || j >= lb) return n
        x = read(a, i); y = read(b, j)
      } else if (x < y) {
        i += 1
        if (i >= la) return n
        x = read(a, i)
      } else {
        j += 1
        if (j >= lb) return n
        y = read(b, j)
      }
      // upper bound on the final count; abort once minReq is unreachable
      val remA = la - i
      val remB = lb - j
      val rem = if (remA < remB) remA else remB
      if (n + rem < minReq) return n
    }
    n // unreachable
  }
}

/** `sorted_inter_size(a, b)` — exact intersection size of two
  * ascending-sorted `array<bigint>` columns.
  *
  * Why a custom Expression (the VecDot precedent): the set-similarity
  * verify step evaluates |A ∩ B| once per CANDIDATE PAIR, and at small
  * shingle k the candidate set approaches all-pairs (measured at sf0.1,
  * k=2: 9.1 M pairs — d28's entire cost). Spark's `array_intersect`
  * builds a hash set per evaluation (generic, allocating, and it
  * materializes the intersection ARRAY when only its size is needed);
  * on sorted inputs the size is one linear merge of primitive longs.
  * Callers must guarantee the sort order (the dedup indexes carry an
  * `h`-sorted twin of the df-ordered prefix array precisely for this) —
  * on unsorted input the result is meaningless, which is why this is an
  * internal engine function rather than a general-purpose one.
  */
case class SortedInterSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_inter_size"

  /** Analysis-time gate (r09 advice): called on anything but
    * array<bigint>, ArrayData.getLong reads the wrong slot width and
    * returns garbage counts instead of an error. Element NULLABILITY is
    * accepted statically (Spark marks `transform`/`collect_list` outputs
    * containsNull conservatively even when no null can occur); actual
    * null elements fail loudly at eval in [[SortedInterSizeUtil.inter]].
    */
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"sorted_inter_size requires (array<bigint>, array<bigint>), " +
            s"got (${l.simpleString}, ${r.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedInterSizeUtil.inter(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedInterSizeUtil.inter($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedInterSize =
    copy(left = newLeft, right = newRight)
}

/** `sorted_inter_size(a, b, min_req)` — the THRESHOLD-AWARE form of the
  * merge (see [[SortedInterSizeUtil.interAtLeast]]): exact when the
  * intersection reaches `min_req`, free to abort (returning some value
  * < `min_req`) once the running upper bound proves it cannot. Callers
  * keep their original τ filter verbatim — any predicate false for all
  * values < min_req — so the surviving row set and its `inter` values are
  * bit-identical to the exact form; only the work spent on rejected
  * candidates shrinks. Same prettyName as the binary form: the d15
  * plan-shape pin (PlanSpec) keys on the function name, and the two forms
  * are one operator with and without the abort bound.
  */
case class SortedInterSizeBounded(first: Expression, second: Expression,
                                  third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_inter_size"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r, m) =>
        TypeCheckResult.TypeCheckFailure(
          s"sorted_inter_size requires (array<bigint>, array<bigint>, " +
            s"bigint), got (${l.simpleString}, ${r.simpleString}, " +
            s"${m.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any, m: Any): Any =
    SortedInterSizeUtil.interAtLeast(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], m.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, m) => s"graft.functions.SortedInterSizeUtil.interAtLeast($a, $b, $m)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SortedInterSizeBounded =
    copy(first = newFirst, second = newSecond, third = newThird)
}

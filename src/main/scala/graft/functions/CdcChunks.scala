package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Static helper so generated code can call a plain static method. */
object CdcUtil {

  /** Content-defined chunk spans of a binary payload, 1-based inclusive:
    * a boundary closes the current chunk at position `pos` whenever the
    * polynomial hash of the `window` bytes ENDING at `pos`
    * (Σ_{k=0..window-1} byte[pos-k] * 31^k) is ≡ 0 (mod `mask`), with
    * boundaries considered only from `minPos` on so the window is always
    * full. The whole payload is always covered: the final span ends at
    * `len` whether or not `len` is a boundary, and an empty payload yields
    * the single degenerate span (1, 0) — byte-for-byte the same span set
    * as the relational spelling (starts = 1 ∪ {boundary+1 | boundary <
    * len}; fins = next start - 1 ∪ {len}) that the DuckDB oracle runs.
    *
    * One pass, O(len × window) byte math in JIT'd Java: the hash at each
    * position is recomputed directly from its own `window` trailing bytes
    * (position-independent by construction — the CDC stability property),
    * so there is no sequential state and no per-position allocation.
    */
  def spans(payload: Array[Byte], minPos: Int, window: Int, mask: Long): ArrayData = {
    val len = payload.length
    // 31^k, k = 0..window-1 (tiny; recomputed per call keeps this static
    // method parameter-pure for codegen).
    val pow = new Array[Long](window)
    var k = 0
    var p = 1L
    while (k < window) { pow(k) = p; p *= 31L; k += 1 }
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](math.max(1, len / 32))
    var start = 1
    var pos = minPos
    while (pos <= len) {
      var h = 0L
      k = 0
      while (k < window) {
        // pos >= minPos >= window keeps pos-1-k in range by construction;
        // the guard mirrors the oracle's CASE for minPos < window configs.
        val idx = pos - 1 - k
        if (idx >= 0) h += (payload(idx) & 0xffL) * pow(k)
        k += 1
      }
      if (h % mask == 0 && pos < len) {
        out += InternalRow(start, pos)
        start = pos + 1
      }
      pos += 1
    }
    out += InternalRow(start, len) // final span; (1, 0) when payload is empty
    new GenericArrayData(out.toArray)
  }
}

/** `cdc_chunks(payload)` — content-defined chunk spans
  * (`array<struct<start:int, fin:int>>`, 1-based inclusive) of a binary
  * column, as a codegen'd Catalyst expression.
  *
  * Why custom (same justification as [[Shingles]], SURVEY §7.3): the SQL
  * spelling — per-byte window hash as nested `filter`/`aggregate` higher-
  * order lambdas — runs interpreted, and worse, Catalyst inlines the
  * byte-array alias INTO each lambda, so the O(len) byte decode re-runs
  * for every (position, window-offset) pair: O(len² × window) interpreted
  * evals per row (measured: the m04 HOF spelling never finished at sf0.1;
  * the per-byte-explode spelling finished but cost 6.2 s and 64× the
  * transient rows). This expression computes the same span set in ONE
  * JIT'd pass per row and stays inside whole-stage codegen via a static
  * call. Per-row expression → no shuffle change: only chunk hashes move,
  * exactly m03's shuffle footprint.
  */
case class CdcChunks(child: Expression, minPos: Int, window: Int, mask: Long)
    extends UnaryExpression {

  // Input typing enforced at registration (GraftExtensions): child must be
  // binary.
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("start", IntegerType, nullable = false),
                   StructField("fin", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcUtil.spans(input.asInstanceOf[Array[Byte]], minPos, window, mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcUtil.spans($c, $minPos, $window, ${mask}L)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper so generated code can call a plain static method. */
object ShingleUtil {
  private val Space = UTF8String.fromString(" ")

  /** All k-token shingles of a token array, each joined with a single
    * space: positions 1..max(1, n-k+1); a document shorter than k tokens
    * yields ONE shingle = the whole text (same semantics as the
    * slice-based SQL spelling in TextHash.sparkShinglesOf / duckShingles).
    */
  def build(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val m = math.max(1, n - k + 1)
    val out = new Array[AnyRef](m)
    i = 0
    while (i < m) {
      val end = math.min(i + k, n)
      out(i) = UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(toks, i, end): _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `shingles(tokens, k)` — word k-gram shingles of an `array<string>`
  * column, as a codegen'd Catalyst expression.
  *
  * Why custom (third deliberate escape hatch, SURVEY §7.3): the SQL
  * spelling `transform(sequence(1, n-k+1), i -> array_join(slice(toks, i,
  * k), ' '))` runs as an interpreted higher-order lambda — no whole-stage
  * codegen, a fresh sliced array allocated per shingle, O(tokens × k)
  * allocation per row. At sf0.1 that made t04_fingerprint cost 79.7 s —
  * 28% of the whole benchmark — and the same shape feeds d01/d03. This
  * expression builds the shingle array in ONE pass over the token array
  * (byte-level UTF8String concat, no per-shingle token copies) and stays
  * inside whole-stage codegen via a static call. Per-row expression → no
  * extra shuffle: the 100 TB plan shape is unchanged, only the per-row
  * constant falls.
  */
case class Shingles(child: Expression, k: Int) extends UnaryExpression {

  // Input typing enforced at registration (GraftExtensions): child must
  // already be array<string>; AbstractDataType is private[sql].
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"
  override def foldable: Boolean = child.foldable

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.build(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleUtil.build($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

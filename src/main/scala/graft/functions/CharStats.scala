package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helper so generated code can call a plain static method. */
object CharStatsUtil {

  /** Code-point histogram moments of a string, in one JIT'd pass:
    * (n_chars, n_distinct, max_freq, sum_sq) where sum_sq = Σ count(c)²
    * over distinct code points c. The counts are over Unicode code points
    * (what DuckDB's `string_split(text, '')` unnests), not UTF-16 units,
    * so supplementary-plane text agrees with the oracle too.
    *
    * ASCII fast path: a flat int[128]; anything else falls back to a
    * HashMap opened lazily, so the common all-ASCII corpus never
    * allocates beyond the one array.
    */
  def stats(s: UTF8String): InternalRow = {
    val str = s.toString
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Integer] = null
    var i = 0
    var n = 0L
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Integer]()
        other.merge(cp, 1, (a: Integer, b: Integer) => a + b)
      }
      n += 1
      i += Character.charCount(cp)
    }
    var distinct = 0L
    var maxFreq = 0L
    var sumSq = 0L
    var c = 0
    while (c < 128) {
      val f = ascii(c)
      if (f > 0) {
        distinct += 1
        if (f > maxFreq) maxFreq = f
        sumSq += f.toLong * f.toLong
      }
      c += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val f = it.next().toLong
        distinct += 1
        if (f > maxFreq) maxFreq = f
        sumSq += f * f
      }
    }
    InternalRow(n, distinct, maxFreq, sumSq)
  }
}

/** `char_stats(text)` — code-point histogram moments as a codegen'd
  * Catalyst expression:
  * `struct<n_chars:bigint, n_distinct:bigint, max_freq:bigint, sum_sq:bigint>`.
  *
  * Why custom (same justification as [[Shingles]]/[[CdcChunks]], SURVEY
  * §7.3): the SQL spelling is either explode(split(text,'')) + groupBy —
  * one shuffle ROW PER CHARACTER, ~300× the input row count moving
  * through a shuffle that a per-row computation never needs — or nested
  * higher-order lambdas (`transform(array_distinct(cs), c ->
  * size(filter(cs, ...)))`), which run interpreted at O(distinct × len)
  * per row. This expression computes the four moments in ONE JIT'd pass
  * per row and stays inside whole-stage codegen via a static call, so the
  * consuming query (t22) is a pure map with NO shuffle at all — the shape
  * that scores a 100 TB corpus in a single pass.
  */
case class CharStats(child: Expression) extends UnaryExpression {

  // Input typing enforced at registration (GraftExtensions): child must be
  // string.
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_freq", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false)))
  override def prettyName: String = "char_stats"

  override protected def nullSafeEval(input: Any): Any =
    CharStatsUtil.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharStatsUtil.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): CharStats =
    copy(child = newChild)
}

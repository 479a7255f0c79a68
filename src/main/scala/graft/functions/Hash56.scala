package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper so generated code can call a plain static method. */
object Hash56Util {
  private val localMd: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Top 56 bits of md5(s): the first 7 digest bytes, assembled directly —
    * the same value as `cast(conv(substring(md5(s), 1, 14), 16, 10) as
    * bigint)` (the first 14 hex digits ARE the first 7 bytes; differential
    * property test in PropertySpec) without materializing the 32-char hex
    * string or running a base-16 parse per row.
    */
  def hash(s: UTF8String): Long = {
    val md = localMd.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }
}

/** `hash56(s)` — the engine's cross-engine 56-bit content hash as a codegen
  * expression. Semantics identical to TextHash.sparkHash56's SQL spelling
  * (and therefore to the DuckDB oracle spelling); this is purely the fast
  * path for the hash-per-row hot loops (MinHash signatures, SimHash,
  * deterministic sampling).
  */
case class Hash56(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hash56"
  override def foldable: Boolean = child.foldable

  override protected def nullSafeEval(input: Any): Any =
    Hash56Util.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash56Util.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash56 =
    copy(child = newChild)
}

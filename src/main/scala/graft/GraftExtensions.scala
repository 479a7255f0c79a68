package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{DoubleType, IntegerType}
import graft.functions.{CdcChunks, CharStats, Hash56, HilbertIndex, PyRound, Shingles, VecDot}

/** Engine extension point, registered via the PUBLIC
  * `SparkSessionExtensions` API (builder.withExtensions or
  * `spark.sql.extensions=graft.GraftExtensions`).
  *
  * Injects two SQL functions:
  *  - `py_round(x, s)` — CPython-fidelity half-even rounding on the exact
  *    binary double (see PyRound for why Spark's `bround` can't express it).
  *  - `vec_dot(a, b)` — codegen'd integer dot product over array<bigint>
  *    (see VecDot for why the HOF spelling was the d04 bottleneck).
  *  - `shingles(tokens, k)` — codegen'd word k-gram shingle array over
  *    array<string> (see Shingles for why the HOF spelling was the t04
  *    bottleneck).
  *  - `cdc_chunks(payload)` — codegen'd content-defined chunk spans over
  *    binary (see CdcChunks for why the HOF spelling was the m04
  *    bottleneck).
  *  - `log2_hist(v)` — native TypedImperativeAggregate building the
  *    power-of-two histogram sketch with a genuine partial phase (see
  *    Log2Hist; pinned by x14 + PlanSpec).
  *  - `hilbert_index(x, y, levels)` — codegen'd Hilbert curve position
  *    (see HilbertIndex for why the per-level Project-pipeline spelling
  *    was the q180 bottleneck: 32 fused projections put the whole-stage
  *    method beyond HotSpot's JIT ceiling).
  *
  * one planner strategy:
  *  - [[graft.plans.TopKPerKeyStrategy]] — plans the custom
  *    [[graft.plans.TopKPerKeyPlan]] node as a two-phase bounded-heap
  *    top-k per key (map-side partial before the shuffle — the shape
  *    window `row_number() <= k` cannot produce).
  *
  * and two optimizer rules:
  *  - [[graft.plans.PushFilterThroughTopKPerKey]] — key-only filters
  *    commute with the custom top-k node and reach the scan.
  *  - [[graft.plans.RangeBucketJoin]] — conf-gated automatic rewrite of
  *    pure point-in-interval inner joins into bucketed equi-joins
  *    (see the rule's scaladoc; exercised by q129).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughTopKPerKey)
    ext.injectOptimizerRule(_ => graft.plans.RangeBucketJoin)
    ext.injectFunction((
      new FunctionIdentifier("py_round"),
      new ExpressionInfo(classOf[PyRound].getName, "py_round"),
      (args: Seq[Expression]) => args match {
        case Seq(x, Literal(s: Int, IntegerType)) =>
          PyRound(Cast(x, DoubleType), s)
        case other =>
          throw new IllegalArgumentException(
            s"py_round(x, <int literal scale>) expected, got $other")
      }))
    ext.injectFunction((
      new FunctionIdentifier("hash56"),
      new ExpressionInfo(classOf[Hash56].getName, "hash56"),
      (args: Seq[Expression]) => args match {
        case Seq(e) => Hash56(Cast(e, org.apache.spark.sql.types.StringType))
        case other =>
          throw new IllegalArgumentException(s"hash56(<string>) expected, got $other")
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "shingles"),
      (args: Seq[Expression]) => args match {
        case Seq(toks, Literal(k: Int, IntegerType)) => Shingles(toks, k)
        case other =>
          throw new IllegalArgumentException(
            s"shingles(<array<string>>, <int literal k>) expected, got $other")
      }))
    ext.injectFunction((
      new FunctionIdentifier("cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "cdc_chunks"),
      (args: Seq[Expression]) => args match {
        case Seq(payload) =>
          CdcChunks(payload, graft.operators.Multimodal.CdcMinPos,
            graft.operators.Multimodal.CdcWindowBytes,
            graft.operators.Multimodal.CdcMask)
        case other =>
          throw new IllegalArgumentException(
            s"cdc_chunks(<binary>) expected, got $other")
      }))
    ext.injectFunction((
      new FunctionIdentifier("char_stats"),
      new ExpressionInfo(classOf[CharStats].getName, "char_stats"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => CharStats(text)
        case other =>
          throw new IllegalArgumentException(
            s"char_stats(<string>) expected, got $other")
      }))
    ext.injectFunction((
      new FunctionIdentifier("log2_hist"),
      new ExpressionInfo(classOf[graft.functions.Log2Hist].getName, "log2_hist"),
      (args: Seq[Expression]) => args match {
        case Seq(v) =>
          graft.functions.Log2Hist(
            Cast(v, org.apache.spark.sql.types.LongType)).toAggregateExpression()
        case other =>
          throw new IllegalArgumentException(
            s"log2_hist(<bigint>) expected, got $other")
      }))
    ext.injectFunction((
      new FunctionIdentifier("sorted_inter_size"),
      new ExpressionInfo(classOf[graft.functions.SortedInterSize].getName,
        "sorted_inter_size"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => graft.functions.SortedInterSize(a, b)
        // threshold-aware form: exact ≥ min_req, early-abort below it —
        // see SortedInterSizeBounded for the equivalence contract
        case Seq(a, b, m) => graft.functions.SortedInterSizeBounded(
          a, b, Cast(m, org.apache.spark.sql.types.LongType))
        case other =>
          throw new IllegalArgumentException(
            s"sorted_inter_size(a, b[, min_req]) expected, got $other")
      }))
    ext.injectFunction((
      new FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "hilbert_index"),
      (args: Seq[Expression]) => args match {
        case Seq(x, y, Literal(levels: Int, IntegerType)) =>
          HilbertIndex(Cast(x, org.apache.spark.sql.types.LongType),
            Cast(y, org.apache.spark.sql.types.LongType), levels)
        case other =>
          throw new IllegalArgumentException(
            s"hilbert_index(x, y, <int literal levels>) expected, got $other")
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => VecDot(a, b)
        case other =>
          throw new IllegalArgumentException(
            s"vec_dot(a, b) expected, got $other")
      }))
  }
}

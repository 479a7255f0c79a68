package graft

/** Extended-surface semantic pins that deliberately live OUTSIDE the
  * benched/oracle path (round-5 verdict item 2): builtins whose execution
  * shape is unacceptable at scale are verified here against their
  * scale-safe relational twins on the sf0.001 corpus.
  */
class ExtendedSpec extends SparkSpec {

  test("q80 builtin percentile_disc equals the relational prefix-sum leg") {
    // The builtin is an ImperativeAggregate (buffers a whole group per
    // task) so it must never run in the benched query — but its semantics
    // must keep matching the relational spelling exactly. Bit-for-bit
    // equality, all three groups, all three quantiles.
    val rel = graft.queries.Extended.q80PercentileDisc(spark, sf).collect()
    val blt = graft.queries.Extended.q80BuiltinTwin(spark, sf).collect()
    assert(rel.length === blt.length)
    rel.zip(blt).foreach { case (r, b) =>
      assert(r.getString(0) === b.getString(0))
      (1 to 3).foreach { i =>
        assert(r.getDouble(i) === b.getDouble(i),
          s"quantile col $i diverges for key ${r.getString(0)}")
      }
    }
  }
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.{TopKPerKey, TopKPerKeyExec}

/** The custom two-phase top-k-per-key operator (logical node + strategy +
  * bounded-heap exec, injected via GraftExtensions).
  */
class TopKPerKeySpec extends SparkSpec {

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  private def customTopK(k: Int) =
    TopKPerKey(
      Tables.orders(spark, sf).select("o_custkey", "o_orderkey", "o_totalprice"),
      Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), k)

  test("custom operator equals the window row_number spelling (k=3)") {
    val got = customTopK(3).orderBy("o_custkey", "o_orderkey").collect().toSeq
    val want = windowTopK(3).orderBy("o_custkey", "o_orderkey").collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("k larger than every group degenerates to the identity set") {
    val n = Tables.orders(spark, sf).count()
    assert(customTopK(1000000).count() === n)
  }

  test("k=1 is the per-key argmax") {
    val got = customTopK(1).orderBy("o_custkey").collect().toSeq
    val want = windowTopK(1).orderBy("o_custkey").collect().toSeq
    assert(got === want)
  }

  test("plan is partial exec -> exchange -> final exec; no window, no full sort") {
    val plan = customTopK(3).queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("TopKPerKeyPartial"), s"missing partial stage:\n$s")
    assert(s.contains("TopKPerKeyFinal"), s"missing final stage:\n$s")
    assert(s.contains("Exchange"), s"missing shuffle between phases:\n$s")
    assert(!s.contains("WindowExec") && !s.contains("windowspecdefinition"),
      s"window crept into the custom plan:\n$s")
    // the partial stage must be UPSTREAM of the exchange (map-side)
    val partialDepth = s.linesIterator.indexWhere(_.contains("TopKPerKeyPartial"))
    val exchangeDepth = s.linesIterator.indexWhere(_.contains("Exchange"))
    assert(partialDepth > exchangeDepth,
      s"partial stage is not below the exchange in the tree:\n$s")
  }

  test("optimizer rule pushes key-only filters below the operator, to the scan") {
    val filtered = customTopK(3).filter(col("o_custkey") < 50)
    val optimized = filtered.queryExecution.optimizedPlan
    // after the rule, the Filter sits BELOW TopKPerKeyPlan (then Catalyst's
    // own pushdown carries it into the parquet scan)
    val topkIdx = optimized.collect { case t: graft.plans.TopKPerKeyPlan => t }
    assert(topkIdx.nonEmpty, s"node vanished:\n$optimized")
    assert(!optimized.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter],
      s"filter stayed above the top-k node:\n$optimized")
    val physical = filtered.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [") && physical.contains("LessThan(o_custkey,50)"),
      s"key filter did not reach the parquet scan:\n$physical")
    // and semantics hold: filter-then-topk == topk-then-filter for key filters
    val got = filtered.orderBy("o_custkey", "o_orderkey").collect().toSeq
    val want = windowTopK(3).filter(col("o_custkey") < 50)
      .orderBy("o_custkey", "o_orderkey").collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("order-column filters are NOT pushed (they would change the competition)") {
    val filtered = customTopK(3).filter(col("o_totalprice") > 100.0)
    val optimized = filtered.queryExecution.optimizedPlan
    // the top node must still be the Filter, above TopKPerKeyPlan
    assert(optimized.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter],
      s"unsafe pushdown of an order-column filter:\n$optimized")
    // and results match the window spelling filtered the same way
    val got = filtered.orderBy("o_custkey", "o_orderkey").collect().toSeq
    val want = windowTopK(3).filter(col("o_totalprice") > 100.0)
      .orderBy("o_custkey", "o_orderkey").collect().toSeq
    assert(got === want)
  }

  test("randomized differential: custom operator equals window spelling on 50 seeds") {
    import spark.implicits._
    val rng = new scala.util.Random(42) // fixed seed: deterministic replay
    for (trial <- 1 to 50) {
      val n = 1 + rng.nextInt(60)
      val nKeys = 1 + rng.nextInt(6)
      val k = 1 + rng.nextInt(4)
      // values collide often (small range) so heap tie-handling is exercised;
      // rid makes the order total, per the operator's determinism contract
      val rows = (0 until n).map { rid =>
        (rng.nextInt(nKeys).toLong, rng.nextInt(5).toDouble, rid.toLong)
      }
      val df = rows.toDF("key", "v", "rid")
      val got = TopKPerKey(df, Seq("key"), Seq(("v", false), ("rid", true)), k)
        .orderBy("key", "rid").collect().toSeq
      val w = Window.partitionBy("key").orderBy(col("v").desc, col("rid").asc)
      val want = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .orderBy("key", "rid").collect().toSeq
      assert(got === want, s"trial $trial diverged (n=$n keys=$nKeys k=$k)")
    }
  }

  test("map-side survivors bound the shuffle: partial output <= partitions * keys * k") {
    val k = 2
    // AQE wraps executed stages in query-stage nodes that plan.collect
    // can't traverse; turn it off (through execution) so the metric
    // objects are reachable.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val partial =
      try {
        val df = customTopK(k)
        df.collect()
        df.queryExecution.executedPlan.collect {
          case e: TopKPerKeyExec if e.partial => e
        }.head
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val out = partial.metrics("numOutputRows").value
    val nKeys = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    val parts = spark.sessionState.conf.numShufflePartitions
    assert(out <= nKeys * k * parts, s"partial emitted $out rows")
    assert(out > 0)
  }
}

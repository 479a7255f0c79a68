package graft

import org.apache.spark.sql.functions._
import graft.sources.LedgerSink

/** The DSv2 WRITE half of the connector contract (TransactionSourceSpec
  * covers the read half): rows become visible only through the driver's
  * BatchWrite.commit, all-or-nothing per job.
  */
class LedgerSinkSpec extends SparkSpec {

  test("V2 commit protocol: exactly-once append; overwrite truncates") {
    import spark.implicits._
    LedgerSink.clear("t1")
    val df = (1 to 100).toDF("v").repartition(8)
      .withColumn("s", expr("concat('r', v)"))
    df.write.format("graft.sources.LedgerSink")
      .option("ledger", "t1").mode("append").save()
    val got = LedgerSink.rows("t1")
    assert(got.size === 100)
    assert(got.map(_.head.asInstanceOf[Int]).toSet === (1 to 100).toSet)
    assert(got.forall(r => r(1) == s"r${r.head}"))
    // append accumulates
    spark.range(3).selectExpr("cast(id as int) AS v", "'x' AS s")
      .write.format("graft.sources.LedgerSink")
      .option("ledger", "t1").mode("append").save()
    assert(LedgerSink.rows("t1").size === 103)
    // overwrite = SupportsTruncate: the ledger swaps atomically
    spark.range(5).selectExpr("cast(id as int) AS v", "'y' AS s")
      .write.format("graft.sources.LedgerSink")
      .option("ledger", "t1").mode("overwrite").save()
    assert(LedgerSink.rows("t1").size === 5)
  }

  test("V2 commit protocol: a failed job leaves the ledger untouched") {
    LedgerSink.clear("t2")
    // 8 partitions; one row in the LAST partition raises — most tasks
    // complete (and task-commit their messages) before the job aborts.
    // The driver must drop every message: zero partial visibility.
    val failing = spark.range(0, 80, 1, 8)
      .selectExpr("cast(id as int) AS v")
      .withColumn("s",
        expr("CASE WHEN v = 79 THEN raise_error('boom') ELSE 'ok' END"))
    intercept[Exception] {
      failing.write.format("graft.sources.LedgerSink")
        .option("ledger", "t2").mode("append").save()
    }
    assert(LedgerSink.rows("t2").isEmpty,
      s"partial rows leaked past an aborted job: ${LedgerSink.rows("t2").size}")
  }
}

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

  test("V2 streaming write: per-epoch commits; duplicate epoch commit is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    LedgerSink.clear("t3")
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    val q = mem.toDF().toDF("v").withColumn("s", expr("concat('e', v)"))
      .writeStream.format("graft.sources.LedgerSink")
      .option("ledger", "t3")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ledger_ckpt").toString)
      .start()
    mem.addData(1, 2, 3)
    q.processAllAvailable()
    mem.addData(4, 5)
    q.processAllAvailable()
    q.stop()
    val got = LedgerSink.rows("t3")
    assert(got.map(_.head.asInstanceOf[Int]).sorted === Seq(1, 2, 3, 4, 5))
    // the idempotence fence, exercised at protocol level: re-committing an
    // already-applied epoch (micro-batch recovery does this) must not
    // double-append
    val sw = new graft.sources.LedgerStreamingWrite(
      new org.apache.spark.sql.types.StructType()
        .add("v", "int").add("s", "string"), "t3")
    sw.commit(999L, Array(graft.sources.LedgerRows(Seq(Seq(42, "dup")))))
    sw.commit(999L, Array(graft.sources.LedgerRows(Seq(Seq(42, "dup")))))
    assert(LedgerSink.rows("t3").count(_.head == 42) === 1,
      "duplicate epoch commit double-appended")
  }

  test("s31: the fraud stream writes through the DSv2 ledger sink end-to-end") {
    // Integration of the two custom connectors: the synthetic DSv2
    // streaming SOURCE feeds the reference filter pipeline, which lands
    // in the DSv2 streaming SINK — rows visible only via epoch commits,
    // and the ledger must equal the batch pipeline over the same
    // deterministic indices (s14's parity discipline, now through the
    // custom write path too).
    LedgerSink.clear("s31")
    val stream = spark.readStream.format("graft.sources.TransactionSource")
      .option("rows", 600).option("partitions", 4)
      .option("rowsPerBatch", 250).load()
    val q = graft.operators.FraudPipeline(stream)
      .writeStream.format("graft.sources.LedgerSink")
      .option("ledger", "s31")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("s31_ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val batch = graft.operators.FraudPipeline(
      spark.read.format("graft.sources.TransactionSource")
        .option("rows", 600).option("partitions", 4).load())
      .collect().map(_.toSeq).toSet
    val got = LedgerSink.rows("s31").map(_.toSeq).toSet
    assert(got === batch.map(_.map(identity)),
      s"stream-through-ledger (${got.size}) != batch (${batch.size})")
    assert(got.nonEmpty)
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

package graft

import java.nio.file.Files
import graft.operators.EtlStatus

/** A13 status-envelope fidelity: 200/500 + body, exactly the reference's
  * three outcomes (empty branch, success, exception), plus the streaming
  * listener counterpart.
  */
class EtlStatusSpec extends SparkSpec {

  private val header =
    "step,type,amount,nameOrig,oldbalanceOrg,newbalanceOrig,nameDest,oldbalanceDest,newbalanceDest,isFraud,isFlaggedFraud"

  private def dir(rows: String*): String = {
    val d = Files.createTempDirectory("status_fixture")
    Files.writeString(d.resolve("t.csv"), (header +: rows).mkString("", "\n", "\n"))
    d.toString
  }

  test("success path: 200 + inserted-count body, sink sees the fraud rows") {
    val in = dir(
      "1,TRANSFER,181.0,C1,181.0,0.0,M1,0.0,0.0,1,0",
      "1,CASH_OUT,300.0,C2,300.0,0.0,M2,0.0,0.0,1,0",
      "1,PAYMENT,100.0,C3,1000.0,900.0,M3,0.0,0.0,0,0")
    var sunk = -1L
    val st = EtlStatus.run(spark, in)(df => sunk = df.count())
    assert(st === EtlStatus(200, "2 fraud transactions processed and stored in RDS!"))
    assert(sunk === 2)
  }

  test("empty branch: 200 no-fraud, sink never invoked (A9)") {
    val in = dir("1,PAYMENT,100.0,C3,1000.0,900.0,M3,0.0,0.0,0,0")
    var called = false
    val st = EtlStatus.run(spark, in)(_ => called = true)
    assert(st === EtlStatus(200, "No fraud transactions found."))
    assert(!called, "sink ran on the empty branch")
  }

  test("failure path: 500 + str(e)") {
    val in = dir("1,TRANSFER,181.0,C1,181.0,0.0,M1,0.0,0.0,1,0")
    val st = EtlStatus.run(spark, in)(_ => throw new RuntimeException("db down"))
    assert(st.statusCode === 500)
    assert(st.body.contains("db down"))
  }

  test("streaming listener folds clean termination into a 200") {
    val in = dir("1,TRANSFER,181.0,C1,181.0,0.0,M1,0.0,0.0,1,0")
    val out = Files.createTempDirectory("status_out").toString
    val ckpt = Files.createTempDirectory("status_ckpt").toString
    val listener = new EtlStatus.StatusListener
    spark.streams.addListener(listener)
    try {
      val q = graft.streaming.StreamOps.s01FraudStream(spark, in, out, ckpt)
      q.awaitTermination()
      // listener events are delivered asynchronously after termination
      val deadline = System.nanoTime() + 10_000_000_000L
      while (listener.status.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(listener.status.map(_.statusCode) === Some(200), s"got ${listener.status}")
    } finally spark.streams.removeListener(listener)
  }
}

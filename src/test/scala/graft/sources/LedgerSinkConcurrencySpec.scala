package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins the appendEpoch atomicity contract (round-6 advice item 2): the
  * epoch fence and the epoch's rows move together. A thread that loses
  * the apply race (appendEpoch returns false — the fence is visible) must
  * ALWAYS find the epoch's rows already present; with the fence-then-
  * append-outside-the-lock spelling this fails, because the winner can be
  * preempted between fencing and appending. Pure JVM test — no Spark.
  */
class LedgerSinkConcurrencySpec extends AnyFunSuite {

  test("a visible epoch fence implies the epoch's rows are visible") {
    val name = "conc_ledger"
    LedgerSink.clear(name)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val epochs = 500
    val racersPerEpoch = 4
    try {
      val done = new java.util.concurrent.CountDownLatch(epochs * racersPerEpoch)
      for (e <- 0 until epochs; _ <- 0 until racersPerEpoch) {
        pool.execute { () =>
          try {
            val applied =
              LedgerSink.appendEpoch(name, e.toLong, Seq(Seq[Any](e.toLong)))
            // Losing the race means the fence was visible — the data must
            // be too, with no wait or retry allowed.
            if (!applied &&
                !LedgerSink.rows(name).exists(_.head == e.toLong))
              errors.add(s"epoch $e: fence visible, rows missing")
          } finally done.countDown()
        }
      }
      assert(done.await(60, java.util.concurrent.TimeUnit.SECONDS),
        "racers did not finish")
    } finally pool.shutdownNow()
    assert(errors.isEmpty, s"atomicity violations: $errors")
    // and the fence kept the apply exactly-once per epoch
    val counts = LedgerSink.rows(name).groupBy(_.head).view.mapValues(_.size)
    assert(counts.size === epochs)
    val dups = counts.filter(_._2 != 1)
    assert(dups.isEmpty, s"epochs applied more than once: $dups")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.functions.TextHash
import graft.functions.PyRoundUtil

/** Property-style checks (SURVEY §5.3) for the engine's scalar kernels —
  * pure JVM, seeded deterministic sampling (the scalatest/scalacheck
  * bridge isn't in the offline cache, so properties run as seeded loops).
  */
class PropertySpec extends AnyFunSuite {

  private def rng = new Random(42)

  test("py_round matches CPython round() on golden boundary values") {
    // goldens computed with CPython 3: round(v, 2)
    val goldens = Seq(
      2.675 -> 2.67, 2.665 -> 2.67, 0.125 -> 0.12, 0.135 -> 0.14,
      1.005 -> 1.0, 2.5 -> 2.5, -2.675 -> -2.67, 1234.565 -> 1234.57,
      0.015 -> 0.01, 99.995 -> 100.0, 0.0 -> 0.0, -0.125 -> -0.12)
    goldens.foreach { case (in, want) =>
      assert(PyRoundUtil.round(in, 2) === want, s"py_round($in, 2)")
    }
  }

  test("py_round is idempotent and within half-a-cent of the input") {
    val r = rng
    (1 to 2000).foreach { _ =>
      val x = (r.nextDouble() - 0.5) * 2e9
      val y = PyRoundUtil.round(x, 2)
      assert(PyRoundUtil.round(y, 2) === y, s"idempotence at $x")
      assert(math.abs(y - x) <= 0.005 + math.ulp(x), s"distance at $x")
    }
  }

  test("minhash permutations stay in [0, P) and are deterministic") {
    val r = rng
    (1 to 200).foreach { _ =>
      val s = r.alphanumeric.take(r.nextInt(30) + 1).mkString
      val agg = new graft.functions.MinHashAgg(2)
      val sig1 = agg.reduce(agg.zero, s)
      val sig2 = agg.reduce(agg.zero, s)
      assert(sig1.toSeq === sig2.toSeq)
      sig1.foreach(v => assert(v >= 0 && v < TextHash.P))
    }
  }

  test("minhash group signature == elementwise min of member signatures") {
    val r = rng
    (1 to 200).foreach { _ =>
      val docs = List.fill(3)(
        List.fill(r.nextInt(8) + 3)(r.alphanumeric.take(4).mkString).mkString(" "))
      val agg = new graft.functions.MinHashAgg(2)
      val together = docs.foldLeft(agg.zero)(agg.reduce)
      val merged = docs.map(d => agg.reduce(agg.zero, d))
        .reduce((a, b) => agg.merge(a.clone(), b))
      assert(together.toSeq === merged.toSeq)
    }
  }

  test("multimodal stub decode: histogram always partitions the bytes") {
    val r = rng
    (1 to 200).foreach { _ =>
      val bs = Array.fill(r.nextInt(4096))(r.nextInt().toByte)
      val (mean, hist) = graft.operators.Multimodal.fakeDecode(bs)
      assert(hist.sum === bs.length)
      if (bs.nonEmpty) assert(mean >= 0 && mean <= 255)
    }
  }
}

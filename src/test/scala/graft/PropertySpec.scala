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

  test("ShingleUtil.build matches the naive sliding-window reference") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val r = rng
    (1 to 500).foreach { _ =>
      val tokens = List.fill(r.nextInt(15) + 1)(r.alphanumeric.take(r.nextInt(6) + 1).mkString)
      val k = r.nextInt(9) + 1
      val arr = new GenericArrayData(tokens.map(t => UTF8String.fromString(t)).toArray[Any])
      val got = {
        val out = graft.functions.ShingleUtil.build(arr, k)
        (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
      }
      val want = // reference: positions 1..max(1, n-k+1), slice truncated at end
        (0 until math.max(1, tokens.length - k + 1))
          .map(i => tokens.slice(i, i + k).mkString(" "))
      assert(got === want, s"tokens=$tokens k=$k")
    }
  }

  test("MinHashAgg byte-assembled hash56 == md5-hex top-14-digits spelling") {
    // the UDAF reads the first 7 digest bytes directly; the SQL spelling
    // parses the first 14 hex chars — they must be the same 56-bit value
    val r = rng
    val md = java.security.MessageDigest.getInstance("MD5")
    (1 to 500).foreach { _ =>
      val s = r.alphanumeric.take(r.nextInt(40) + 1).mkString
      md.reset()
      val d = md.digest(s.getBytes("UTF-8"))
      val viaHex = java.lang.Long.parseLong(
        d.map(b => f"$b%02x").mkString.substring(0, 14), 16)
      var viaBytes = 0L
      (0 until 7).foreach(i => viaBytes = (viaBytes << 8) | (d(i) & 0xffL))
      assert(viaBytes === viaHex, s"hash56 mismatch on '$s'")
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

  test("char_stats histogram moments: goldens + invariants on random strings") {
    import org.apache.spark.unsafe.types.UTF8String
    def st(s: String): (Long, Long, Long, Long) = {
      val r = graft.functions.CharStatsUtil.stats(UTF8String.fromString(s))
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    assert(st("") === ((0L, 0L, 0L, 0L)))
    assert(st("aaaa") === ((4L, 1L, 4L, 16L)))
    assert(st("abab") === ((4L, 2L, 2L, 8L)))
    // non-ASCII and supplementary-plane: counts are CODE POINTS, so the
    // 2-UTF-16-unit emoji is ONE char — the unit DuckDB's split('') yields
    assert(st("héé") === ((3L, 2L, 2L, 5L)))
    assert(st("a😀a") === ((3L, 2L, 2L, 5L)))
    val r = rng
    (1 to 300).foreach { _ =>
      val s = (1 to r.nextInt(200)).map(_ => (r.nextInt(96) + 32).toChar).mkString
      val (n, dn, mx, ss) = st(s)
      val counts = s.groupBy(identity).map(_._2.length.toLong)
      assert(n === s.length.toLong)
      assert(dn === counts.size.toLong)
      assert(mx === (if (counts.isEmpty) 0L else counts.max))
      assert(ss === counts.map(c => c * c).sum)
    }
  }
}

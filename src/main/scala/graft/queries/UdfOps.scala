package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{MinHashAgg, TextHash}

/** User-extension surface (SURVEY §2 Part B u01–u03, x01): scalar UDF,
  * typed Aggregator UDAF, generator, and sketch aggregation.
  *
  * Design notes:
  *  - u01 shows the scalar-UDF contract but the scoring math is pure IEEE
  *    double + floor, so it still cross-checks against DuckDB exactly.
  *    (Production guidance stands: built-in expressions beat UDFs — the
  *    same formula as a Column expr stays in codegen; the UDF exists to
  *    prove the extension surface.)
  *  - u02 is a typed Aggregator (partial-agg friendly: merge = elementwise
  *    min) registered via functions.udaf; output exploded to scalar rows so
  *    the oracle compares plain columns, not engine-specific list types.
  *  - u03 is the generator surface — posexplode (built-in Generator); the
  *    typed Dataset.flatMap equivalent is exercised in ScalaTest.
  *  - x01 approx_count_distinct is declared WITHOUT an oracle (sketches are
  *    engine-specific); ScalaTest bounds it against the exact count.
  */
object UdfOps {

  type Q = (SparkSession, String) => DataFrame

  /** u01: scalar UDF — integer fraud-score band from price and discount.
    * floor(p * (1-d) / 1000): double ops are IEEE-identical across JVM and
    * DuckDB, floor is exact → oracle-safe despite being a black-box UDF.
    */
  val u01UdfFraudScore: Q = (s, d) => {
    val score = udf((price: Double, disc: Double) =>
      math.floor(price * (1 - disc) / 1000).toLong)
    s.udf.register("fraud_score", score) // SQL-callable, proves registration
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        score(col("l_extendedprice"), col("l_discount")).as("score"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
  }

  /** u02: UDAF — per-language MinHash signature of the union of each
    * language's documents' shingle sets. Output exploded to (lang, idx, sig).
    */
  val u02UdafMinhash: Q = (s, d) => {
    val mh = udaf(new MinHashAgg(TextHash.MinhashShingleK))
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(mh(col("text")).as("sig"))
      .select(col("lang"), posexplode(col("sig")).as(Seq("idx", "sig")))
      .orderBy("lang", "idx")
  }

  /** u03: generator surface — tokenize with position via posexplode. */
  val u03UdtfTokenize: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      .orderBy("doc_id", "pos")

  /** x01: HLL++ approximate distinct. The sketch itself is engine-specific
    * (DuckDB cannot reproduce Spark's HLL++ estimate), so the DRIVER-VISIBLE
    * contract is a bounded property: the exact count plus a boolean
    * asserting the estimate landed within 3×rsd of it (HLL++ is
    * deterministic for fixed data, so the boolean is replay-stable). The
    * oracle checks the exact count and expects `true`. ScalaTest still
    * bounds the raw estimate.
    */
  val x01ApproxDistinct: Q = (s, d) =>
    Tables.orders(s, d)
      .agg(
        countDistinct(col("o_custkey")).as("n_exact"),
        approx_count_distinct(col("o_custkey"), 0.05).as("approx"))
      .select(
        col("n_exact"),
        (abs(col("approx") - col("n_exact")) * 100 <= col("n_exact") * 15)
          .as("within_15pct"))

  /** u04: SQL-body UDF (Spark 4 `CREATE FUNCTION … RETURN expr`) — the
    * declarative extension surface: the function body is a SQL expression,
    * so unlike u01's black-box closure Catalyst INLINES it into the plan
    * (constant folding, pushdown, and codegen all still apply — the
    * no-UDF-tax extension point). Body is floor math — IEEE multiply then
    * exact floor — because round(_, 2) ties diverge between Spark
    * (HALF_UP on the shortest decimal string) and DuckDB in OUTPUT
    * position (q01 only ever compares the rounded value, which is stable;
    * emitting it is not).
    */
  val u04SqlUdf: Q = (s, d) => {
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION net_price(price DOUBLE, disc DOUBLE)
        |RETURNS BIGINT RETURN CAST(floor(price * (1 - disc)) AS BIGINT)""".stripMargin)
    Tables.lineitem(s, d).createOrReplaceTempView("li_u04")
    s.sql(
      """SELECT l_orderkey, l_linenumber,
        |       net_price(l_extendedprice, l_discount) AS net
        |FROM li_u04 ORDER BY l_orderkey, l_linenumber""".stripMargin)
  }

  /** u05: SQL TABLE function (Spark 4 `CREATE FUNCTION … RETURNS TABLE`)
    * — the declarative UDTF surface beside u03's generator and u04's
    * scalar SQL UDF: a per-document term-frequency table expanded through
    * correlated LATERAL invocation. Like u04, the body is a macro the
    * analyzer INLINES into the calling plan (explode + partial-agg
    * groupBy here) — no black-box row-at-a-time callback, so pushdown and
    * codegen see straight through it; the repeated-token filter composes
    * on the function's output columns.
    */
  val u05SqlTableUdf: Q = (s, d) => {
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION tok_tf(txt STRING)
        |RETURNS TABLE (t STRING, n BIGINT)
        |RETURN SELECT t, COUNT(1) AS n
        |       FROM (SELECT explode(split(txt, ' ')) AS t) GROUP BY t""".stripMargin)
    Tables.documents(s, d).createOrReplaceTempView("docs_u05")
    s.sql(
      """SELECT d.doc_id, f.t, f.n
        |FROM docs_u05 d, LATERAL tok_tf(d.text) f
        |WHERE f.n >= 3
        |ORDER BY d.doc_id, f.t""".stripMargin)
  }

  /** u06: SQL UDF with DEFAULT parameters + NAMED-argument invocation
    * (Spark 4 surface beside u04's positional scalar UDF): a tiered-fee
    * function where the rate and cap default, called three ways — all
    * positional, defaulted, and by name out of order. Like u04, the
    * analyzer INLINES the body, so the three call forms compile to the
    * same codegen'd arithmetic; the pin is the binding semantics, not
    * execution. Exact integer cents so both engines agree bit-for-bit.
    */
  val u06SqlUdfDefaults: Q = (s, d) => {
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION fee_cents(
        |  amount DOUBLE,
        |  rate_bps BIGINT DEFAULT 250,
        |  cap_cents BIGINT DEFAULT 50000)
        |RETURNS BIGINT
        |RETURN least(cap_cents,
        |             CAST(floor(amount * 100) AS BIGINT) * rate_bps div 10000)""".stripMargin)
    Tables.orders(s, d).createOrReplaceTempView("orders_u06")
    s.sql(
      """SELECT o_orderkey,
        |       fee_cents(o_totalprice) AS fee_default,
        |       fee_cents(o_totalprice, 100) AS fee_1pct,
        |       fee_cents(o_totalprice, cap_cents => 10000) AS fee_capped,
        |       fee_cents(cap_cents => 10000, amount => o_totalprice,
        |                 rate_bps => 500) AS fee_named
        |FROM orders_u06 ORDER BY o_orderkey""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "u06_sql_udf_defaults" -> u06SqlUdfDefaults,
    "u01_udf_fraud_score" -> u01UdfFraudScore,
    "u02_udaf_minhash"    -> u02UdafMinhash,
    "u03_udtf_tokenize"   -> u03UdtfTokenize,
    "u04_sql_udf"         -> u04SqlUdf,
    "u05_sql_table_udf"   -> u05SqlTableUdf,
    "x01_approx_distinct" -> x01ApproxDistinct)

  val oracles: Map[String, String] = Map(
    // u06: the oracle spells each binding out literally — if Spark's
    // default/named binding resolved differently, the values diverge.
    "u06_sql_udf_defaults" ->
      """SELECT o_orderkey,
        |       least(50000, CAST(FLOOR(o_totalprice * 100) AS BIGINT) * 250 // 10000)
        |         AS fee_default,
        |       least(50000, CAST(FLOOR(o_totalprice * 100) AS BIGINT) * 100 // 10000)
        |         AS fee_1pct,
        |       least(10000, CAST(FLOOR(o_totalprice * 100) AS BIGINT) * 250 // 10000)
        |         AS fee_capped,
        |       least(10000, CAST(FLOOR(o_totalprice * 100) AS BIGINT) * 500 // 10000)
        |         AS fee_named
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "u01_udf_fraud_score" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |       CAST(floor(l_extendedprice * (1 - l_discount) / 1000) AS BIGINT) AS score
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,
    "u02_udaf_minhash" -> {
      import TextHash._
      val shingles = TextHash.duckShingles("text", MinhashShingleK)
      s"""WITH sigs AS (
         |  SELECT lang,
         |    list_transform(generate_series(0, ${NumHashes - 1}), i ->
         |      list_min(list_transform(
         |        list_transform($shingles, sh -> ${TextHash.duckHash56("sh")} % $P),
         |        x -> ($aLitDuck[i + 1] * x + $bLitDuck[i + 1]) % $P))) AS sig
         |  FROM documents)
         |SELECT lang, CAST(g.i AS INT) AS idx, MIN(sig[g.i + 1]) AS sig
         |FROM sigs CROSS JOIN generate_series(0, ${NumHashes - 1}) AS g(i)
         |GROUP BY lang, g.i ORDER BY lang, idx""".stripMargin
    },
    "u03_udtf_tokenize" ->
      // parallel unnests zip pairwise in DuckDB (lateral generate_series
      // with a column bound is not supported)
      """SELECT doc_id, CAST(pos - 1 AS INT) AS pos, token FROM (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
        |         unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
        |  FROM documents)
        |ORDER BY doc_id, pos""".stripMargin,
    "u05_sql_table_udf" ->
      """SELECT doc_id, t, CAST(n AS BIGINT) AS n FROM (
        |  SELECT doc_id, t, COUNT(1) AS n FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |  GROUP BY doc_id, t)
        |WHERE n >= 3 ORDER BY doc_id, t""".stripMargin,
    "u04_sql_udf" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(floor(l_extendedprice * (1 - l_discount)) AS BIGINT) AS net
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // x01: the sketch value is engine-specific; the oracle checks the exact
    // count and the bounded-error property (Spark side emits the boolean).
    "x01_approx_distinct" ->
      """SELECT COUNT(DISTINCT o_custkey) AS n_exact, true AS within_15pct
        |FROM orders""".stripMargin
  )
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.functions.TextHash

/** Extended SQL surface beyond the SURVEY §2 core: pivot/unpivot, scalar
  * and IN subqueries, deterministic hash sampling. Same determinism rules
  * as Relational (total-order sorts, decimal aggregates, md5-based
  * hashing where an engine-neutral hash is needed).
  */
object Extended {

  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** q35: pivot — returnflag columns per linestatus. The pivot values are
    * DECLARED (not discovered) so the plan is a single pass with no
    * values-collection job — the formulation that scales.
    */
  val q35Pivot: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(dec(sum(dec(col("l_quantity")))))
      .orderBy("l_linestatus")

  /** q36: unpivot (wide → long) of per-row charge components. */
  val q36Unpivot: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
              dec(col("l_discount")).as("discount"), dec(col("l_tax")).as("tax"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey")),
        Array(col("discount"), col("tax")),
        "component", "value")
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "component")

  /** q37: scalar subquery — orders above the (decimal-exact) mean price.
    * The average is computed in DECIMAL so both engines agree bit-for-bit
    * at the comparison boundary (double averages are accumulation-order
    * dependent).
    */
  val q37SubqueryScalar: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("orders_sq")
    s.sql("""
      SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders_sq
      WHERE CAST(o_totalprice AS DECIMAL(18,2)) >
            (SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
             FROM orders_sq)
      ORDER BY o_orderkey
    """)
  }

  /** q38: IN subquery (semi-join under the hood). */
  val q38InSubquery: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("orders_in")
    Tables.customer(s, d).createOrReplaceTempView("customer_in")
    s.sql("""
      SELECT o_orderkey, o_custkey
      FROM orders_in
      WHERE o_custkey IN (SELECT c_custkey FROM customer_in
                          WHERE c_mktsegment = 'BUILDING')
      ORDER BY o_orderkey
    """)
  }

  /** q39: deterministic hash sampling — an engine-neutral 5% sample via
    * md5(key) % 20. TABLESAMPLE is seed/engine-dependent; hash sampling is
    * reproducible across engines, runs, and cluster sizes — the property a
    * training-data pipeline needs for stable eval splits.
    */
  val q39SampleHash: Q = (s, d) =>
    Tables.orders(s, d)
      .filter(expr(
        s"${TextHash.sparkHash56("cast(o_orderkey as string)")} % 20 = 0"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")

  val queries: Map[String, Q] = Map(
    "q35_pivot"           -> q35Pivot,
    "q36_unpivot"         -> q36Unpivot,
    "q37_subquery_scalar" -> q37SubqueryScalar,
    "q38_in_subquery"     -> q38InSubquery,
    "q39_sample_hash"     -> q39SampleHash)

  val oracles: Map[String, String] = Map(
    "q35_pivot" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS "A",
        |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS "N",
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS "R"
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q36_unpivot" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, component, value FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         'discount' AS component, CAST(l_discount AS DECIMAL(18,2)) AS value
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         'tax' AS component, CAST(l_tax AS DECIMAL(18,2)) AS value
        |  FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, component""".stripMargin,
    "q37_subquery_scalar" ->
      """SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |FROM orders
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) >
        |      (SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |       FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q38_in_subquery" ->
      """SELECT o_orderkey, o_custkey
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "q39_sample_hash" ->
      s"""SELECT o_orderkey, o_custkey, o_totalprice
         |FROM orders
         |WHERE ${TextHash.duckHash56("CAST(o_orderkey AS VARCHAR)")} % 20 = 0
         |ORDER BY o_orderkey""".stripMargin
  )
}

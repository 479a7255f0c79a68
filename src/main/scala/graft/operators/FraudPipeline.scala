package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference pipeline, re-expressed Spark-first.
  *
  * Semantics derived from the reference at /root/reference (see SURVEY.md):
  * CSV scan with a declared schema (`Lambda Function` zip variant,
  * lambda_function_aws.py:36-52), a balance-consistency validity filter
  * with round-half-even 2-dp arithmetic (py:43-46 / zip:57-62), a
  * fraud-flag disjunction filter (py:50-52 / zip:66-68), an empty-branch
  * (py:55-60), and a batched append sink (py:90-99).
  *
  * Design notes vs the reference:
  *  - The two cascaded filters stay declarative; Catalyst's CombineFilters
  *    merges them and pushes the conjunction into the scan, so at 100 TB
  *    this is a single shuffle-free stage (scan → filter → sink), fully
  *    partition-parallel — the reference processes one file on one thread.
  *  - `bround` (HALF_EVEN) is used, matching Python's banker's rounding;
  *    Spark's `round` is HALF_UP and would disagree on .005 boundaries.
  *  - Column resolution is case-insensitive (spark.sql.caseSensitive=false,
  *    Spark's default), which resolves the reference's lowercase-vs-camelCase
  *    header mismatch (SURVEY §1.3) the way the reference intended.
  *  - Null balance rows: three-valued logic makes the predicate null → row
  *    dropped, matching the pandas variant's NaN-comparison behavior.
  */
object FraudPipeline {

  /** Declared input schema, mirroring the sink DDL (py:71-84). */
  val schema: StructType = StructType(Seq(
    StructField("step", IntegerType),
    StructField("type", StringType),
    StructField("amount", DoubleType),
    StructField("nameOrig", StringType),
    StructField("oldbalanceOrg", DoubleType),
    StructField("newbalanceOrig", DoubleType),
    StructField("nameDest", StringType),
    StructField("oldbalanceDest", DoubleType),
    StructField("newbalanceDest", DoubleType),
    StructField("isFraud", IntegerType),
    StructField("isFlaggedFraud", IntegerType)
  ))

  final case class Transaction(
      step: Int, `type`: String, amount: Double, nameOrig: String,
      oldbalanceOrg: Double, newbalanceOrig: Double, nameDest: String,
      oldbalanceDest: Double, newbalanceDest: Double,
      isFraud: Int, isFlaggedFraud: Int)

  /** CSV scan with declared schema (zip variant). `FAILFAST` ≈ the zip's
    * hard `ValueError` on a bad cast; pass `permissive = true` for the
    * pandas variant's null-and-drop behavior.
    */
  def readCsv(spark: SparkSession, path: String,
              permissive: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", if (permissive) "PERMISSIVE" else "FAILFAST")
      .csv(path)

  /** A7: keep rows whose balances are arithmetically consistent:
    * py_round(oldbalanceOrg - newbalanceOrig, 2) >= amount
    * OR py_round(oldbalanceDest + amount, 2) >= newbalanceDest.
    *
    * `py_round` (graft.functions.PyRound, injected by GraftExtensions) is
    * CPython-fidelity half-even rounding on the exact binary double —
    * Spark's `bround` rounds the double's shortest decimal string instead
    * and disagrees with the reference on boundary values like 2.675
    * (Python: 2.67, bround: 2.68). Codegen'd, so the filter stays in one
    * whole-stage-codegen span over the scan.
    */
  def validityFilter(df: DataFrame): DataFrame = df.filter(
    expr("py_round(oldbalanceOrg - newbalanceOrig, 2) >= amount OR " +
         "py_round(oldbalanceDest + amount, 2) >= newbalanceDest"))

  /** A8: keep rows flagged as fraud by either flag. */
  def fraudFilter(df: DataFrame): DataFrame =
    df.filter(col("isFraud") === 1 || col("isFlaggedFraud") === 1)

  /** Full pipeline body: validity filter then fraud filter. Catalyst merges
    * the cascade into one predicate (CombineFilters).
    */
  def apply(df: DataFrame): DataFrame = fraudFilter(validityFilter(df))

  /** Stage row counts without extra jobs: attach observers; read them from a
    * QueryExecutionListener after an action (replaces the reference's
    * len()-based stage logging, py:40/47/53, which re-scans in pandas).
    */
  def withObservedCounts(df: DataFrame): DataFrame = {
    val in    = df.observe("fraud_input", count(lit(1)).as("rows"))
    val valid = validityFilter(in).observe("fraud_valid", count(lit(1)).as("rows"))
    fraudFilter(valid).observe("fraud_flagged", count(lit(1)).as("rows"))
  }
}

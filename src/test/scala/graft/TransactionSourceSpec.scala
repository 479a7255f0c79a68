package graft

import org.apache.spark.sql.functions._
import graft.operators.FraudPipeline

/** DataSource V2 synthetic transaction generator. */
class TransactionSourceSpec extends SparkSpec {

  private def read(rows: Long, parts: Int) =
    spark.read.format("graft.sources.TransactionSource")
      .option("rows", rows).option("partitions", parts).load()

  test("schema matches the reference transaction schema; row count exact") {
    val df = read(10000, 8)
    assert(df.schema === FraudPipeline.schema)
    assert(df.count() === 10000)
    assert(df.rdd.getNumPartitions === 8)
  }

  test("generation is deterministic and partitioning-invariant") {
    val sum4 = read(5000, 4).agg(sum("amount"), sum("isFraud")).collect()(0)
    val sum16 = read(5000, 16).agg(sum("amount"), sum("isFraud")).collect()(0)
    assert(sum4 === sum16)
    // rerun identical
    assert(read(5000, 4).agg(sum("amount")).collect()(0) ===
           read(5000, 4).agg(sum("amount")).collect()(0))
  }

  test("column pruning reaches the source (V2 pruneColumns)") {
    val df = read(1000, 2).select("amount")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("amount") && !plan.contains("nameOrig"),
      s"pruned scan should not mention unprojected columns:\n$plan")
    assert(df.count() === 1000)
  }

  test("fraud pipeline runs end-to-end on the synthetic source") {
    val df = read(50000, 8)
    val fraud = FraudPipeline(df)
    val n = fraud.count()
    // fraud rate is ~1/50 and fraud rows are built balance-consistent
    assert(n > 500 && n < 1500, s"unexpected fraud count $n")
    assert(fraud.filter(col("isFraud") === 0 && col("isFlaggedFraud") === 0).count() === 0)
  }
}

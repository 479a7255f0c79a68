package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Scale-mechanics evidence: salted joins preserve semantics, bucketed
  * joins avoid shuffles, partition pruning reaches the file index.
  */
class PartitioningSpec extends SparkSpec {

  test("salted join equals plain join on a skewed fixture") {
    import spark.implicits._
    // hot key: 10k rows of key=1, plus a uniform tail
    val skewed = ((1 to 10000).map(i => (1L, s"v$i")) ++
                  (1 to 100).map(i => (i.toLong % 7 + 2, s"t$i")))
      .toDF("k", "payload")
    val dim = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain = skewed.join(dim, "k")
    val salted = SkewJoin.saltedInnerJoin(skewed, dim, "k",
      saltSource = col("payload"), saltFactor = 8)

    assert(salted.count() === plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // a previously interrupted run can leave the managed location behind
    // even after DROP TABLE; clear it so saveAsTable can't collide
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    for (t <- Seq("b_orders", "b_customer")) {
      val p = java.nio.file.Paths.get(wh, t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    Tables.orders(spark, sf).write
      .bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    Tables.customer(spark, sf).write
      .bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_customer")

    val joined = spark.table("b_orders")
      .join(spark.table("b_customer"),
            col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() === Tables.orders(spark, sf).count())
  }

  test("partition pruning: partitioned write + filter reads one partition") {
    val dir = Files.createTempDirectory("part_orders").toString + "/data"
    Tables.orders(spark, sf)
      .withColumn("status", col("o_orderstatus"))
      .write.partitionBy("status").parquet(dir)

    val pruned = spark.read.parquet(dir).filter(col("status") === "F")
    val expl = pruned.queryExecution.executedPlan.toString
    // the scan's partition filter must mention the partition column
    assert(expl.contains("PartitionFilters") && expl.contains("status"),
      s"expected partition filters in:\n$expl")
    val expected = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F").count()
    assert(pruned.count() === expected)
  }
}

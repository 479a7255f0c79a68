package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parallel JDBC ingest — the read-side twin of the FraudSink write path
  * (reference: the Lambda's single-connection psycopg2 read/write,
  * `py:70-87`): a production backfill pulls a warehouse table into Spark
  * with ONE task per key range, not one connection for everything.
  *
  * `partitionedRead` is the auto-bounded spelling of
  * `spark.read.jdbc(url, table, partitionColumn, lower, upper, numParts)`:
  * the bounds come from a one-row MIN/MAX probe of the table itself (the
  * step every real backfill scripts by hand), so callers never hard-code
  * stale bounds. Spark then plans `numParts` concurrent range scans
  * (`WHERE col >= lo AND col < hi`), which is the difference between a
  * 100 GB table arriving through one socket and arriving through 32.
  *
  * Scale notes: the probe is O(1) rows; stride math is BIGINT-safe; a
  * degenerate table (min == max, or empty) falls back to a single
  * partition rather than planning empty strides.
  */
object JdbcRead {

  def partitionedRead(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, numPartitions: Int,
                      props: Properties): DataFrame = {
    val bounds = spark.read.jdbc(
        url, s"(SELECT MIN($partitionColumn) AS lo, MAX($partitionColumn) AS hi FROM $table) b",
        props)
      .collect().head
    if (bounds.isNullAt(0) || bounds.isNullAt(1))
      return spark.read.jdbc(url, table, props) // empty table: one task
    val lo = bounds.get(0).toString.toLong
    val hi = bounds.get(1).toString.toLong
    if (lo == hi) spark.read.jdbc(url, table, props)
    else spark.read.jdbc(url, table, partitionColumn, lo, hi + 1,
      math.min(numPartitions.toLong, hi - lo + 1).toInt, props)
  }
}

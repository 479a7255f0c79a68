package graft.operators

import java.sql.{Connection, DriverManager}
import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode}

/** The reference's sink contract (SURVEY §2 A10–A12), Spark-first.
  *
  * Reference behavior (`Lambda Function/lambda_function_aws.py`):
  *  - A10 `py:70-87`: `CREATE TABLE IF NOT EXISTS fraud_transactions
  *    (id SERIAL PRIMARY KEY, … 11 cols)` executed every invocation.
  *  - A11 `py:96`: rows pivoted to positional tuples.
  *  - A12 `py:90-99`: batched `INSERT` + one commit per file;
  *    at-least-once across retries (no idempotence key).
  *
  * Spark design:
  *  - The SERIAL/IDENTITY primary key cannot be emitted by Spark's JDBC
  *    writer, so the table is pre-created over plain JDBC with the exact
  *    DDL (dialect-parameterized: Postgres spelling mirrors the reference;
  *    the Derby spelling exists so the sink is integration-TESTED in this
  *    repo with the embedded Derby that ships in Spark's jars).
  *  - The append itself is `df.write.jdbc` — name-aligned (strictly safer
  *    than the reference's positional tuples), executor-parallel with
  *    bounded connections (`numPartitions`) and batched statements
  *    (`batchsize`), i.e. the scale-out version of `executemany`.
  *  - `appendBatch` is the `foreachBatch` body for the streaming flagship:
  *    empty-batch guard (A9) + idempotent DDL (A10) + append (A12).
  */
object FraudSink {

  /** The 11 data columns + DB-generated id, exactly as the reference's DDL. */
  def ddl(table: String, idColumn: String): String =
    s"""CREATE TABLE $table (
       |  $idColumn,
       |  step INT,
       |  type VARCHAR(20),
       |  amount FLOAT,
       |  nameOrig VARCHAR(50),
       |  oldbalanceOrg FLOAT,
       |  newbalanceOrig FLOAT,
       |  nameDest VARCHAR(50),
       |  oldbalanceDest FLOAT,
       |  newbalanceDest FLOAT,
       |  isFraud INT,
       |  isFlaggedFraud INT
       |)""".stripMargin

  /** Postgres spelling — byte-for-byte the reference's column set (py:71-84). */
  def postgresDdl(table: String = "fraud_transactions"): String =
    ddl(table, "id SERIAL PRIMARY KEY")

  /** Derby spelling (embedded Derby has no SERIAL and no IF NOT EXISTS). */
  def derbyDdl(table: String = "fraud_transactions"): String =
    ddl(table, "id INT GENERATED ALWAYS AS IDENTITY PRIMARY KEY")

  /** A10: idempotent create — "IF NOT EXISTS" portably, by swallowing the
    * dialect's table-exists error (Derby: X0Y32; Postgres: duplicate_table).
    */
  def ensureTable(url: String, props: Properties, createSql: String): Unit = {
    val conn: Connection = DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try st.execute(createSql)
      catch {
        case e: java.sql.SQLException
            if e.getSQLState == "X0Y32" || e.getSQLState == "42P07" => // exists
      }
      finally st.close()
    } finally conn.close()
  }

  /** A12: batched, executor-parallel append. */
  def append(df: DataFrame, url: String, table: String, props: Properties,
             batchSize: Int = 1000, numPartitions: Int = 8): Unit =
    df.coalesce(numPartitions)
      .write.mode(SaveMode.Append)
      .option("batchsize", batchSize)
      .jdbc(url, table, props)

  /** foreachBatch body for the streaming flagship: A9 empty guard + A10 DDL
    * + A12 append. At-least-once, exactly like the reference (replaying a
    * batch re-inserts); see appendBatchIdempotent for the upgrade.
    */
  def appendBatch(url: String, table: String, props: Properties,
                  createSql: String)(batch: DataFrame, batchId: Long): Unit = {
    if (!batch.isEmpty) {
      ensureTable(url, props, createSql)
      append(batch, url, table, props)
    }
  }

  /** Effectively-once upgrade over the reference's at-least-once (A12): a
    * ledger table keyed by (sink table, batchId) is claimed with a primary-
    * key INSERT before the append. A replayed micro-batch (checkpoint
    * recovery, manual restart) hits the PK violation and skips the append,
    * so rows land exactly once per batchId. The claim-then-append order
    * means a crash BETWEEN claim and append can drop a batch's rows — the
    * standard trade documented here; flipping the order gives the
    * reference's duplicate behavior instead. Production systems put claim +
    * rows in one transaction; Spark's JDBC writer commits per partition, so
    * the ledger is the portable approximation.
    */
  def appendBatchIdempotent(url: String, table: String, props: Properties,
                            createSql: String)
                           (batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    ensureTable(url, props, createSql)
    ensureTable(url, props,
      s"""CREATE TABLE ${table}_ledger (
         |  sink_table VARCHAR(128) NOT NULL,
         |  batch_id BIGINT NOT NULL,
         |  PRIMARY KEY (sink_table, batch_id)
         |)""".stripMargin)
    val conn = DriverManager.getConnection(url, props)
    val claimed =
      try {
        val st = conn.prepareStatement(
          s"INSERT INTO ${table}_ledger (sink_table, batch_id) VALUES (?, ?)")
        st.setString(1, table)
        st.setLong(2, batchId)
        try { st.executeUpdate(); true }
        catch {
          case e: java.sql.SQLException
              // duplicate key: Derby 23505, Postgres 23505
              if e.getSQLState == "23505" => false
        }
        finally st.close()
      } finally conn.close()
    if (claimed) append(batch, url, table, props)
  }
}

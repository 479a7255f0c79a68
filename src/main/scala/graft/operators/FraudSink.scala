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

  /** Effectively-once upgrade over the reference's at-least-once (A12),
    * via a two-phase ledger keyed by (sink table, batchId):
    *
    *  1. claim the batch as `pending`, recording the sink's current MAX(id)
    *     as a watermark;
    *  2. append the rows;
    *  3. finalize the claim to `done`.
    *
    * Replay cases (micro-batches are appended serially by one streaming
    * query — the single-writer assumption the watermark relies on):
    *  - claim exists as `done` → the batch fully landed; skip (no dupes).
    *  - claim exists as `pending` → a previous attempt failed BETWEEN claim
    *    and finalize (transient JDBC error, executor loss, partial
    *    per-partition commit — Spark's JDBC writer commits per partition,
    *    so partial batches are real). Delete the failed attempt's partial
    *    rows (`id > watermark` — ids are sink-generated SERIAL, strictly
    *    increasing) and re-append. This is the common failure path; a
    *    claim-first-skip-on-conflict ledger would silently DROP the batch
    *    here (permanent row loss), which is why the finalize step exists.
    *
    * Production systems put claim + rows in one transaction; the two-phase
    * ledger is the portable approximation when the writer can't.
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
         |  status VARCHAR(8) NOT NULL,
         |  start_id BIGINT NOT NULL,
         |  PRIMARY KEY (sink_table, batch_id)
         |)""".stripMargin)
    val conn = DriverManager.getConnection(url, props)
    try {
      val maxId = {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(s"SELECT COALESCE(MAX(id), 0) FROM $table")
          rs.next(); rs.getLong(1)
        } finally st.close()
      }
      val claimedFresh = {
        val st = conn.prepareStatement(
          s"INSERT INTO ${table}_ledger (sink_table, batch_id, status, start_id) " +
            "VALUES (?, ?, 'pending', ?)")
        st.setString(1, table)
        st.setLong(2, batchId)
        st.setLong(3, maxId)
        try { st.executeUpdate(); true }
        catch {
          case e: java.sql.SQLException
              // duplicate key: Derby 23505, Postgres 23505
              if e.getSQLState == "23505" => false
        }
        finally st.close()
      }
      if (!claimedFresh) {
        val st = conn.prepareStatement(
          s"SELECT status, start_id FROM ${table}_ledger " +
            "WHERE sink_table = ? AND batch_id = ?")
        st.setString(1, table)
        st.setLong(2, batchId)
        val (status, startId) =
          try {
            val rs = st.executeQuery()
            rs.next(); (rs.getString(1), rs.getLong(2))
          } finally st.close()
        if (status == "done") return // fully landed on a previous attempt
        // unfinalized claim: remove the failed attempt's partial rows, then
        // fall through to re-append from the ORIGINAL watermark
        val del = conn.prepareStatement(s"DELETE FROM $table WHERE id > ?")
        del.setLong(1, startId)
        try del.executeUpdate() finally del.close()
      }
      append(batch, url, table, props)
      val fin = conn.prepareStatement(
        s"UPDATE ${table}_ledger SET status = 'done' " +
          "WHERE sink_table = ? AND batch_id = ?")
      fin.setString(1, table)
      fin.setLong(2, batchId)
      try fin.executeUpdate() finally fin.close()
    } finally conn.close()
  }
}

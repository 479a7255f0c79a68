package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{StructType, StringType, LongType, IntegerType, DoubleType, BooleanType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path — the sink half of the connector contract
  * ([[TransactionSource]] is the read half): an in-memory ledger table
  * whose visibility follows the V2 COMMIT PROTOCOL exactly.
  *
  * Why it exists: the engine's production sinks (FraudSink's JDBC ledger,
  * the native file sink) get atomicity from their stores; this sink
  * isolates what Spark ITSELF guarantees — each task buffers its rows into
  * a [[WriterCommitMessage]], nothing is visible until the DRIVER's
  * `BatchWrite.commit` applies all messages in one step, and a failed job
  * (`abort`) leaves the ledger untouched even though some tasks completed.
  * That is the exactly-once-per-job contract every real V2 connector
  * (Iceberg/Delta/JDBC-v2) builds on, pinned here with a test that fails a
  * mid-job task and asserts zero partial visibility.
  *
  * Scale shape: rows travel task→driver only at commit (fine for a
  * LEDGER — a real table sink would write files in tasks and send only
  * file manifests in the messages; the protocol is identical, which is
  * the point). `truncate` (overwrite mode) swaps the ledger atomically.
  *
  * Usage:
  * {{{
  * df.write.format("graft.sources.LedgerSink")
  *   .option("ledger", "my_run").mode("append").save()
  * LedgerSink.rows("my_run")   // Seq[Seq[Any]], committed jobs only
  * }}}
  */
object LedgerSink {
  private val ledgers = new ConcurrentHashMap[String, Vector[Seq[Any]]]()
  /** Epochs already applied per ledger — the streaming idempotence fence
    * (micro-batch recovery MAY re-commit an epoch; a second apply must be
    * a no-op, exactly like a file sink consulting its _spark_metadata
    * log before adding an epoch's files).
    */
  private val epochs = new ConcurrentHashMap[String, Set[Long]]()

  def rows(name: String): Vector[Seq[Any]] =
    ledgers.getOrDefault(name, Vector.empty)

  def clear(name: String): Unit = { ledgers.remove(name); epochs.remove(name) }

  private[sources] def append(name: String, rows: Seq[Seq[Any]]): Unit =
    ledgers.merge(name, rows.toVector, (a, b) => a ++ b)

  private[sources] def replace(name: String, rows: Seq[Seq[Any]]): Unit =
    ledgers.put(name, rows.toVector)

  /** Append an epoch's rows IF the epoch is new; atomic per ledger. The
    * rows land INSIDE the compute remapping, before the epoch joins the
    * fence set, so fence and data move together: a concurrent reader can
    * never observe an epoch fenced with its rows missing, and a failure
    * mid-apply leaves the epoch unfenced (replay retries — at-least-once
    * inside the critical section, exactly-once outside it), never fenced-
    * but-empty (permanent loss on recovery replay — round-6 advice
    * item 2). Touching `ledgers` from `epochs.compute` is safe: they are
    * different maps and no code path nests the locks in the other order.
    */
  private[sources] def appendEpoch(name: String, epoch: Long,
                                   rows: Seq[Seq[Any]]): Boolean = {
    var applied = false
    epochs.compute(name, (_, prev) => {
      val seen = Option(prev).getOrElse(Set.empty[Long])
      if (seen.contains(epoch)) seen
      else { append(name, rows); applied = true; seen + epoch }
    })
    applied
  }
}

class LedgerSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only: schema comes from the query
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new LedgerTable(schema, properties.getOrDefault("ledger", "default"))
}

class LedgerTable(writeSchema: StructType, ledger: String)
    extends Table with SupportsWrite {
  override def name(): String = s"ledger($ledger)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new LedgerWriteBuilder(info.schema(), ledger)
}

class LedgerWriteBuilder(schema: StructType, ledger: String)
    extends WriteBuilder with SupportsTruncate {
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }
  override def buildForBatch(): BatchWrite =
    new LedgerBatchWrite(schema, ledger, overwrite)
  override def buildForStreaming(): StreamingWrite =
    new LedgerStreamingWrite(schema, ledger)
}

/** Streaming (micro-batch) write: same task-buffer → driver-commit shape
  * as the batch path, but per EPOCH, with the idempotence fence — epoch
  * recovery re-commits must not double-append (exactly-once visibility
  * across restarts, the contract the native file sink gets from its
  * _spark_metadata log).
  */
class LedgerStreamingWrite(schema: StructType, ledger: String)
    extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    LedgerStreamingWriterFactory(schema)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    LedgerSink.appendEpoch(ledger, epochId,
      messages.toSeq.flatMap(_.asInstanceOf[LedgerRows].rows))
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

case class LedgerStreamingWriterFactory(schema: StructType)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new LedgerWriter(schema)
}

/** One task's buffered rows, shipped to the driver at task commit. */
case class LedgerRows(rows: Seq[Seq[Any]]) extends WriterCommitMessage

class LedgerBatchWrite(schema: StructType, ledger: String, overwrite: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    LedgerWriterFactory(schema)

  /** The ONLY place rows become visible — all tasks' messages land in one
    * driver-side step, so a job is all-or-nothing.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val all = messages.toSeq.flatMap(_.asInstanceOf[LedgerRows].rows)
    if (overwrite) LedgerSink.replace(ledger, all)
    else LedgerSink.append(ledger, all)
  }

  /** Failed job: completed tasks' messages are dropped — zero visibility. */
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class LedgerWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LedgerWriter(schema)
}

class LedgerWriter(schema: StructType) extends DataWriter[InternalRow] {
  private val buf = Vector.newBuilder[Seq[Any]]

  override def write(row: InternalRow): Unit = {
    // copy out of the reused InternalRow (JVM-local values, no UTF8String
    // escapes the task)
    val vals = schema.fields.zipWithIndex.map { case (f, i) =>
      if (row.isNullAt(i)) null
      else f.dataType match {
        case StringType  => row.getUTF8String(i).toString
        case LongType    => row.getLong(i)
        case IntegerType => row.getInt(i)
        case DoubleType  => row.getDouble(i)
        case BooleanType => row.getBoolean(i)
        case dt => throw new IllegalArgumentException(s"ledger: unsupported $dt")
      }
    }.toSeq
    buf += vals
  }

  override def commit(): WriterCommitMessage = LedgerRows(buf.result())
  override def abort(): Unit = ()
  override def close(): Unit = ()
}

package org.apache.spark.sql

import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.storage.TieredTable

/** DSv2 streaming sink for tiered tables — the spelling Spark users
  * expect, completing the read side's `spark.readStream.table`:
  *
  * {{{ df.writeStream.toTable("graft.db.t") }}}
  *
  * Executors write each epoch's rows as parquet into a per-query
  * STAGING area under the table (`log/_stream-<queryId>/epoch-N/`),
  * through Spark's own [[ParquetFileFormat]] writer — same encoder,
  * same codec, zero hand-rolled parquet. The driver's epoch commit
  * then publishes those exact files:
  *
  *  - flat log table → [[TieredTable.appendLogFiles]]: pure renames +
  *    a stats sidecar, the data is never read again (the zero-copy
  *    fast path — at scale the epoch's bytes move zero times);
  *  - partitioned log table → read back + [[TieredTable.appendLog]]
  *    (the rows must be laid out into `col=value` dirs);
  *  - PK table → read back + [[TieredTable.commitUpsert]] (upsert
  *    needs the key dedup pass anyway).
  *
  * EXACTLY-ONCE: the epoch tag `stream-<queryId>-<epochId>` rides
  * inside the committed unit (segment `_TAG` / snapshot tag), so a
  * replayed epoch after a crash/restart finds its tag and drops its
  * re-staged files instead of double-committing — the same WAL-replay
  * idempotence contract as every other streaming path in the engine.
  * A crashed epoch's staging debris is invisible to readers (the
  * `_stream-` prefix is not a segment) and swept by gcOrphans.
  */
class GraftStreamingWrite(spark: SparkSession, t: TieredTable,
                          pk: Seq[String], partitionBy: Seq[String],
                          dataSchema: StructType, queryId: String,
                          tableName: String)
    extends StreamingWrite {

  private val stagingRoot = s"${t.tablePath}/log/_stream-$queryId"
  private def epochDir(epochId: Long): String =
    s"$stagingRoot/epoch-${"%06d".format(epochId)}"
  private def tag(epochId: Long): String = s"stream-$queryId-$epochId"

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory = {
    // driver-side: Spark's parquet write setup (schema converters,
    // codec, output committer conf) — the factory it returns is
    // serializable and is the same one FileFormatWriter ships to tasks
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val owf = new ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty, dataSchema)
    GraftStreamWriterFactory(owf,
      new SerializableConfiguration(job.getConfiguration),
      stagingRoot, dataSchema)
  }

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect {
      case GraftStreamFileCommit(path, rows) if rows > 0 => path
    }.toSeq
    val epochTag = Some(tag(epochId))
    if (files.nonEmpty) {
      if (pk.nonEmpty)
        // within-batch LWW by arrival (file/row order of the staged
        // epoch): a micro-batch carrying two updates to one key keeps
        // the later row deterministically — without it a merge-on-read
        // delta stamps both with the same sequence
        t.commitUpsert(graft.plans.TieredSqlTable.lwwByArrival(
          readStaged(files), pk), epochTag)
      else if (partitionBy.nonEmpty)
        t.appendLog(readStaged(files), epochTag)
      else
        t.appendLogFiles(files, epochTag)
    }
    // the read-back paths leave the staged files behind; the fast path
    // moved them — either way the epoch dir is done (replayed epochs
    // land here too: their tag was found, their re-staged bytes drop)
    t.dropStagingDir(epochDir(epochId))
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit =
    t.dropStagingDir(epochDir(epochId))

  /** Staged epoch files as one DataFrame, schema pinned (no inference
    * job) — the input to the layout/dedup commit paths.
    */
  private def readStaged(files: Seq[String]) =
    spark.read.schema(dataSchema).parquet(files: _*)

  override def toString: String = s"$tableName (streaming sink)"
}

/** One staged parquet file per (partition, task attempt); rows counted
  * so empty tasks publish nothing.
  */
case class GraftStreamFileCommit(path: String, rows: Long)
    extends WriterCommitMessage

case class GraftStreamWriterFactory(owf: OutputWriterFactory,
                                    conf: SerializableConfiguration,
                                    stagingRoot: String,
                                    schema: StructType)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftStreamDataWriter(owf, conf, stagingRoot, schema,
      partitionId, taskId, epochId)
}

/** Executor-side writer: one parquet file in the epoch's staging dir.
  * The task attempt id makes the file name unique across speculative /
  * retried attempts; only attempts that reach commit() surface their
  * file to the driver (Spark's commit coordinator admits one winner).
  */
class GraftStreamDataWriter(owf: OutputWriterFactory,
                            conf: SerializableConfiguration,
                            stagingRoot: String, schema: StructType,
                            partitionId: Int, taskId: Long,
                            epochId: Long)
    extends DataWriter[InternalRow] {

  private val path =
    f"$stagingRoot/epoch-$epochId%06d/part-$partitionId%05d-$taskId.parquet"
  private val context = new TaskAttemptContextImpl(conf.value,
    new TaskAttemptID("graft-stream", 0, TaskType.MAP, partitionId,
      (taskId & 0x7fffffff).toInt))
  private var writer: org.apache.spark.sql.execution.datasources.OutputWriter = _
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    if (writer == null) writer = owf.newInstance(path, schema, context)
    writer.write(record)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    GraftStreamFileCommit(path, rows)
  }

  override def abort(): Unit = {
    if (writer != null) {
      try writer.close() catch { case _: Throwable => }
      // executor-side: delete through the Hadoop FS the writer used
      // (local paths and registered remote schemes both resolve)
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(conf.value).delete(hp, false)
    }
  }

  override def close(): Unit = ()
}

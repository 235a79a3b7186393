package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** Flink's `EXECUTE STATEMENT SET` shape (/root/reference/README.md:
  * 211-216): N INSERTs launched as one multi-sink job. Spark maps each
  * INSERT to its own [[StreamingQuery]]; this thin runner starts them
  * together and waits on any/all.
  */
class StatementSet {
  private val thunks = ArrayBuffer[() => StreamingQuery]()
  private var started: Seq[StreamingQuery] = Nil

  /** Queue a statement (lazily — nothing starts until [[run]]). */
  def add(start: => StreamingQuery): this.type = {
    thunks += (() => start); this
  }

  /** Start every queued statement concurrently. */
  def run(): Seq[StreamingQuery] = {
    started = thunks.map(_()).toSeq
    started
  }

  def queries: Seq[StreamingQuery] = started

  /** Block until every statement finishes (bounded sources) or
    * `timeoutMs` elapses; returns true if all terminated.
    */
  def awaitAll(timeoutMs: Long): Boolean =
    started.forall(_.awaitTermination(timeoutMs))

  def stopAll(): Unit = started.foreach(_.stop())
}

object StatementSet {
  def apply(): StatementSet = new StatementSet
}

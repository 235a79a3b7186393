package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SEQUENCE PACKING — the training-batch assembly step of an LLM data
  * pipeline (reference: the fluss-iceberg corpus tables feed exactly
  * this consumer). Complements
  * [[graft.operators.Sampling.packSequences]], the shard-local
  * streaming packer that keeps documents WHOLE and tolerates one-doc
  * overflow: the two ops here cover the shapes it deliberately
  * doesn't — exact global chunking that SPLITS documents across
  * fixed windows, and capacity-strict bin packing with lookahead.
  * Two industry shapes:
  *
  *  1. [[packChunks]] — concat-and-split: documents are laid end to
  *     end in a fixed global order and the token stream is cut into
  *     fixed-length windows (GPT-style pretraining packing; documents
  *     cross chunk boundaries). Fully relational and ORACLE-CHECKABLE:
  *     the only stateful piece is a global token prefix-sum, computed
  *     as the classic TWO-PASS distributed scan, never a
  *     single-partition window.
  *
  *  2. [[packBinsFFD]] — boundary-preserving bin packing: each
  *     document must land whole in exactly one bin of capacity L
  *     (SFT / instruction-tuning packing, where crossing examples is
  *     wrong). First-fit-decreasing inside hash shards — the
  *     per-partition imperative loop is the textbook mapPartitions
  *     use, and sharding keeps it embarrassingly parallel at 100 TB.
  */
object Packing {

  /** Global token start-offset per document, in `doc_id` order — the
    * distributed prefix sum:
    *
    * pass 1: range-partition by `doc_id`, sort within partitions, and
    * reduce each partition to ONE (partitionId, tokenTotal) row —
    * collected to the driver (B rows for B partitions, bounded by the
    * chosen parallelism, never by data size);
    * pass 2: re-scan with each partition's BASE offset (the exclusive
    * prefix sum of pass 1's totals) and emit running offsets locally.
    *
    * Output: (doc_id, toks, start). Deterministic regardless of how
    * the range sampler draws partition bounds: range partitioning +
    * within-partition sort = global `doc_id` order, and the offsets
    * are a function of that order alone. Empty documents (toks = 0)
    * pass through with width-0 spans and are dropped by the chunk
    * explode.
    */
  def tokenOffsets(docs: DataFrame, toks: Column, buckets: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // RDD-level persist, not DataFrame cache(): the pin between the
    // two passes must hold the PARTITIONING fixed (a recompute would
    // re-sample range bounds and misalign pass 2's bases), but an RDD
    // persist is released by the ContextCleaner when the result's
    // lineage is garbage-collected — a DataFrame cache lives in the
    // CacheManager until the session ends, pinning executor storage
    // for every packChunks call of a long-lived pipeline.
    val d = docs.select(col("doc_id").cast("long").as("doc_id"),
        toks.cast("long").as("toks"))
      .repartitionByRange(buckets, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Partition identity comes from mapPartitionsWithIndex — bound at
    // RDD DEFINITION, so it names this lineage's partition even when a
    // downstream coalesce() merges tasks (TaskContext.getPartitionId
    // would report the merged task's id and zero every base offset).
    // pass 1: one row per partition — (index, token total)
    val totals = d.mapPartitionsWithIndex { (pid, it) =>
      var sum = 0L
      it.foreach(r => sum += r.getLong(1))
      Iterator.single((pid, sum))
    }.collect().toMap
    val maxPid = if (totals.isEmpty) -1 else totals.keys.max
    val bases = new Array[Long](maxPid + 2)
    (0 to maxPid).foreach(p =>
      bases(p + 1) = bases(p) + totals.getOrElse(p, 0L))
    val basesBc = spark.sparkContext.broadcast(bases)
    // pass 2: local running sum + the partition's exclusive base
    val out = d.mapPartitionsWithIndex { (pid, it) =>
      var off = basesBc.value(pid)
      it.map { r =>
        val start = off
        off += r.getLong(1)
        (r.getLong(0), r.getLong(1), start)
      }
    }
    spark.createDataFrame(out).toDF("doc_id", "toks", "start")
  }

  /** Concat-and-split packing: cut the concatenated token stream (doc
    * order = `doc_id`) into windows of `chunkLen` tokens and emit one
    * row per (chunk, document) intersection — `chunk_id`, `doc_id`,
    * `off` (first token of the span, document-relative), `len` (span
    * width). A downstream batch builder joins back to the text and
    * slices. The explode is `sequence(firstChunk, lastChunk)` per
    * document — O(spans), map-side, no shuffle beyond the offset
    * computation's range partitioning.
    */
  def packChunks(docs: DataFrame, toks: Column, chunkLen: Long,
                 buckets: Int = 32): DataFrame = {
    require(chunkLen > 0, "chunkLen must be positive")
    val o = tokenOffsets(docs, toks, buckets).filter(col("toks") > 0L)
    val L = lit(chunkLen)
    // integral DIV, not floor(a / b): `/` on longs is DOUBLE division
    // in Spark, which loses integer precision past 2^53 cumulative
    // tokens — the oracle's `//` is exact, so the engine must be too
    o.withColumn("chunk_id",
        explode(sequence(expr(s"start DIV $chunkLen"),
          expr(s"(start + toks - 1) DIV $chunkLen"))))
      .select(
        col("chunk_id").cast("long").as("chunk_id"),
        col("doc_id"),
        greatest(col("chunk_id") * L - col("start"), lit(0L))
          .cast("long").as("off"),
        (least(col("start") + col("toks"), (col("chunk_id") + 1L) * L) -
          greatest(col("start"), col("chunk_id") * L))
          .cast("long").as("len"))
  }

  /** Boundary-preserving FIRST-FIT-DECREASING bin packing inside hash
    * shards: documents hash-partition into `shards` independent groups
    * (the shard IS the partition); within a shard, docs are taken
    * longest-first and dropped into the first bin with room
    * (capacity `binLen` tokens). Documents longer than the capacity
    * are REFUSED loudly — silently truncating a training example is
    * the bug this op exists to prevent.
    *
    * Output: (shard, bin, doc_id, toks). Scale: one shuffle to the
    * shard layout, then per-partition packing with O(bins-per-shard)
    * state; shards are independent, so parallelism is the shard
    * count and no global coordination exists. FFD's fill guarantee
    * (≥ 8/11 of optimal asymptotically) applies per shard.
    */
  def packBinsFFD(docs: DataFrame, toks: Column, binLen: Long,
                  shards: Int = 32): DataFrame = {
    require(binLen > 0, "binLen must be positive")
    val spark = docs.sparkSession
    // the SHARD IS THE PARTITION: hash-repartition the doc ids across
    // exactly `shards` partitions and take the partition index as the
    // shard id — every shard occupies its own task, so parallelism is
    // exactly the shard count (deriving a shard VALUE first and then
    // hash-partitioning it would land ~1/e of partitions empty and
    // stack shards on others)
    val d = docs.select(col("doc_id").cast("long").as("doc_id"),
        toks.cast("long").as("toks"))
      .repartition(shards, col("doc_id"))
      .sortWithinPartitions(col("toks").desc, col("doc_id"))
    val out = d.rdd.mapPartitionsWithIndex { (shard, it) =>
      // open bins of this shard: index = bin id, value = fill.
      // Decreasing order is guaranteed by the sort above.
      val open = scala.collection.mutable.ArrayBuffer.empty[Long]
      it.map { r =>
        val (docId, t) = (r.getLong(0), r.getLong(1))
        if (t > binLen) throw new IllegalArgumentException(
          s"doc $docId has $t tokens > bin capacity $binLen — split it " +
            "upstream (packChunks) or raise the capacity; refusing to " +
            "truncate a training example silently")
        // same contract downward: the op promises every document in
        // exactly one bin — silently dropping a zero-count doc is the
        // lost-example bug; filter empties upstream EXPLICITLY
        if (t <= 0) throw new IllegalArgumentException(
          s"doc $docId has a non-positive token count ($t) — filter " +
            "empty documents upstream explicitly; refusing to drop a " +
            "training example silently")
        var i = 0
        while (i < open.length && open(i) + t > binLen) i += 1
        if (i == open.length) open += 0L
        open(i) += t
        (shard, i.toLong, docId, t)
      }
    }
    spark.createDataFrame(out).toDF("shard", "bin", "doc_id", "toks")
  }
}

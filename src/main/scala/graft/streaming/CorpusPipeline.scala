package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.TextAnalysis._
import graft.functions.TextFunctions.tokens
import graft.operators.Dedup
import graft.storage.TieredTable

/** A document record on the streaming ingest path. */
case class CorpusDoc(doc_id: Long, text: String, lang: String, source: String)

/** The training-corpus ingest pipeline as ONE Structured Streaming job:
  * exact dedup → quality gate → text profiling → tiered sink, with a
  * quarantine side-channel for rejects — the streaming face of the
  * batch d/t/c query families.
  *
  * Stages:
  *  - exact dedup via [[StreamDedup.firstOccurrence]] keyed by the md5
  *    content fingerprint: state is one boolean per 32-char digest
  *    (never the text), exact across the whole stream history.
  *  - quality gate: map-side token floor; rejects land in a quarantine
  *    table with the same exactly-once tags, so nothing is silently
  *    dropped (the audit/repair contract of
  *    [[graft.sources.TextIngest.quarantine]]).
  *  - profiling: language-ID and token counts stamped as columns —
  *    pure codegen'd projections.
  *  - sink: batch-tagged [[TieredTable.appendLog]] + tier() per trigger
  *    (same freshness contract as the reference pipeline) → crash
  *    replays are no-ops and the table is immediately batch-queryable
  *    (hot ∪ cold) by every batch operator in the library.
  */
class CorpusPipeline(spark: SparkSession, baseDir: String) {

  val corpus  = TieredTable(spark, s"$baseDir/corpus_clean")
  val rejects = TieredTable(spark, s"$baseDir/corpus_rejects")
  /** Standing shingle-vector index of every accepted doc (id, shs,
    * n_sh) — what near-dup candidates are VERIFIED against.
    */
  val vectors = TieredTable(spark, s"$baseDir/corpus_vectors")
  /** Standing LSH band-signature index (id, sig) — what each
    * micro-batch's broadcast probe scans, so the corpus is never
    * re-hashed ([[graft.operators.Dedup.lshBands]]).
    */
  val bandsIdx = TieredTable(spark, s"$baseDir/corpus_bands")
  /** Near-dup pairs, appended incrementally: batch N contributes
    * exactly the pairs touching batch N's docs
    * ([[Dedup.incrementalLshPairs]]), so the table's union over batches
    * IS the full corpus pair set — no job ever recomputes it.
    */
  val nearDups = TieredTable(spark, s"$baseDir/corpus_neardups")

  /** Start the pipeline over a streaming source with columns
    * (doc_id, text, lang, source). Non-null text is required upstream
    * (null text cannot be fingerprinted — route it to quarantine before
    * this operator if the source may produce it).
    */
  def start(source: DataFrame, checkpoint: String, minTokens: Long = 5,
            trigger: Trigger = Trigger.ProcessingTime(0),
            nearDup: Boolean = false): StreamingQuery = {
    import spark.implicits._
    // key function lives on the companion so the task closure ships a
    // static reference, not this pipeline (whose session/table handles
    // are not serializable)
    val deduped = StreamDedup.firstOccurrence[CorpusDoc](
      source.as[CorpusDoc], CorpusPipeline.contentKey)
    deduped.toDF().writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val t = tokens(col("text"))
        val profiled = batch.withColumn("n_tokens", size(t).cast("long"))
        val keep = profiled.filter(col("n_tokens") >= minTokens)
        val drop = profiled.filter(col("n_tokens") < minTokens)
        val Seq(en, es, fr, de) = langHits(t).map(_._2)
        corpus.appendLog(
          keep.withColumn("lang_pred", langPred(en, es, fr, de))
            .withColumn("approx_bpe", approxBpeCount(t)),
          tag = Some(s"corpus-$batchId"))
        rejects.appendLog(drop, tag = Some(s"rejects-$batchId"))
        if (nearDup) probeNearDups(keep, batchId)
        corpus.tier()
        (): Unit
      }
      .trigger(trigger)
      .option("checkpointLocation", s"$checkpoint/corpus")
      .start()
  }

  /** The incremental near-dup stage of one micro-batch: shingle the
    * accepted docs ONCE, LSH-probe them against the standing vector
    * index (delta×delta ∪ delta×index — [[Dedup.incrementalLshPairs]]),
    * append the found pairs, then append the delta's vectors so the
    * NEXT batch probes against them too. Per batch the cost is O(Δ)
    * vector math + bucket probes; the corpus text is never re-read —
    * this is the streaming face of the d10 batch query, and the reason
    * dedup stays a per-commit delta job at 100 TB instead of a
    * quadratic refresh. Batch-tagged appends keep crash replays
    * idempotent for BOTH tables (the pair batch and the vector batch
    * carry the same tag, so a replayed micro-batch is a no-op on each).
    */
  private def probeNearDups(keep: DataFrame, batchId: Long): Unit = {
    // two downstream consumers (pair probe + index append): materialize
    // the delta's vectors once
    val dv = Dedup.shingleVectors(keep, "doc_id", "text", n = 3)
      .localCheckpoint(true)
    val pairs =
      if (vectors.unionPaths.isEmpty)
        // first batch: no standing index yet — delta×delta only
        Dedup.minhashLshPairsFrom(dv)
      else Dedup.incrementalLshPairs(vectors.readUnion(), dv,
        corpusBands = Some(bandsIdx.readUnion()))
    // pairs FIRST: a crash mid-sequence then replays into tag no-ops on
    // the already-appended tables and fresh appends on the rest — the
    // probe must never see this batch's own rows in the index, which
    // holds because the index appends come after
    nearDups.appendLog(pairs, tag = Some(s"neardups-$batchId"))
    vectors.appendLog(dv, tag = Some(s"vectors-$batchId"))
    bandsIdx.appendLog(Dedup.lshBands(dv), tag = Some(s"bands-$batchId"))
  }
}

object CorpusPipeline {
  /** Dedup state key: md5 hex of the document text — 32 chars of state
    * per distinct document, never the text itself.
    */
  private[streaming] def contentKey(d: CorpusDoc): String =
    MessageDigest.getInstance("MD5")
      .digest(d.text.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's enrichment pipeline: a processing-time temporal
  * (lookup) join of the order stream against the latest snapshot of the
  * customer and nation PK tables (/root/reference/README.md:222-239).
  *
  * Semantics (README.md:236-238): LEFT joins — unmatched orders keep
  * NULL dim columns; the dim side is the PK table's *current* state
  * (last-write-wins per key); emitted rows are never retracted when the
  * dim later changes.
  *
  * Spark mapping: per micro-batch (or in batch mode, once), join against
  * the deduped dim snapshot with an explicit `broadcast` hint — the dim
  * tables are small (200/100 rows in the reference; dimension-sized at
  * 100 TB fact scale), so the fact side never shuffles. The join key of
  * the second hop comes from the first hop's output (snowflake lookup).
  */
object Enrich {

  /** Two-hop LEFT lookup join: facts ⟕ dim1 ⟕ dim2, dims broadcast.
    * `dim1` and `dim2` must already be PK-deduped snapshots
    * (see [[Upsert.latestByKey]]).
    */
  def lookupJoin2(facts: DataFrame,
                  dim1: DataFrame, key1: String,
                  dim2: DataFrame, key2: String): DataFrame =
    facts
      .join(broadcast(dim1), Seq(key1), "left")
      .join(broadcast(dim2), Seq(key2), "left")
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Primary-key (upsert) table semantics: last-write-wins dedup.
  *
  * The reference's PK tables (`PRIMARY KEY ... NOT ENFORCED`,
  * /root/reference/README.md:160,168,199) never reject duplicate keys —
  * the latest row for a key silently replaces earlier ones. At rest we
  * implement this as dedup-on-read: `row_number() OVER (PARTITION BY pk
  * ORDER BY version DESC) = 1`.
  *
  * Scale notes: the window is a single hash-shuffle on the key columns —
  * the minimum any engine needs for a keyed dedup. No driver-side state;
  * AQE handles skewed keys. For 100 TB the shuffle is on the PK only
  * (project-before-shuffle happens automatically via column pruning).
  */
object Upsert {

  /** One row per key; among duplicates the row ranked first by
    * `versionOrder` (descending-significant first) wins. `versionOrder`
    * MUST be a total order within each key group for deterministic output
    * — append a unique tiebreaker column if the natural version isn't.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], versionOrder: Seq[Column]): DataFrame = {
    require(!df.columns.contains("__rn"),
      "input column __rn collides with latestByKey's working column")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(versionOrder: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Batch MERGE: apply a batch of upserts onto a base table (both keyed).
    * Rows in `updates` replace same-key rows in `base`; new keys append.
    * Equivalent to Iceberg MERGE INTO at the DataFrame level.
    */
  def merge(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val keep = base.join(updates.select(keys.map(col): _*).distinct(), keys, "left_anti")
    // allowMissingColumns: an evolved updates batch (column added
    // mid-stream) merges; pre-evolution base rows surface null there.
    keep.unionByName(updates, allowMissingColumns = true)
  }
}

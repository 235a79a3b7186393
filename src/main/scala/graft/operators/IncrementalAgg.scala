package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance — the batch analog of
  * the reference's continuously-maintained `nation_revenue` PK table
  * (/root/reference/README.md:196-200,247-250), driven by the
  * TieredTable changelog instead of a running stream.
  *
  * A grouped (SUM, COUNT) state is carried forward by APPLYING a
  * changelog delta: `+I`/`+U` rows add their value, `-U`/`-D` rows
  * retract theirs — exactly why the changelog carries the update_before
  * image: the old value is retracted without re-reading the prior
  * snapshot. Pairing with [[graft.storage.TieredTable.changelogSince]]
  * gives an exactly-once maintenance loop: poll the cursor, apply the
  * delta, persist state + cursor together.
  *
  * Scale: the delta aggregates map-side to (group, Δsum, Δcount) —
  * changelog-sized, usually tiny against the state — then ONE
  * full-outer key join merges it into the state. The base table is
  * never touched; maintenance cost is O(|delta| + |state|), the whole
  * point of incremental view maintenance. SUM/COUNT are the
  * self-maintainable aggregates (AVG derives as sum/cnt); MIN/MAX are
  * NOT maintainable under retraction without per-group history — use a
  * rebuild for those, by design.
  */
object IncrementalAgg {

  /** Merge a changelog `delta` (op column + group + value columns) into
    * a `(groupCols, sumCol, cntCol)` state frame. Groups whose count
    * reaches zero drop out of the state (the last row of a group was
    * retracted). Value arithmetic should be exact (integer cents /
    * fixed-point) — retraction must cancel bit-for-bit.
    */
  def applyDelta(state: DataFrame, delta: DataFrame, groupCols: Seq[String],
                 valCol: String, sumCol: String, cntCol: String,
                 opCol: String = "op"): DataFrame =
    applyDeltaMulti(state, delta, groupCols, Seq(valCol -> sumCol), cntCol,
      opCol)

  /** [[applyDelta]] generalized to ANY number of maintained SUM
    * columns: `sums` maps each delta value column to its state alias.
    * One map-side delta aggregation and one full-outer merge join
    * regardless of how many sums ride along — the per-column cost is a
    * projection, not a pass.
    */
  def applyDeltaMulti(state: DataFrame, delta: DataFrame,
                      groupCols: Seq[String], sums: Seq[(String, String)],
                      cntCol: String, opCol: String = "op"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(sums.nonEmpty, "need at least one maintained sum")
    require(sums.map(_._2).distinct.size == sums.size,
      "maintained sum aliases must be distinct")
    // Unknown op: FAIL LOUDLY. A null sign would not poison the sums —
    // Spark's sum() skips NULL inputs, so a malformed or future-op row
    // would silently vanish from both __dsum and __dcnt, corrupting the
    // maintained aggregate (the opposite of the exactly-once contract).
    // raise_error sits in the otherwise-branch, so the known-op hot
    // path never evaluates it.
    val sign = when(col(opCol).isin("+I", "+U"), 1L)
      .when(col(opCol).isin("-U", "-D"), -1L)
      .otherwise(raise_error(concat(
        lit(s"IncrementalAgg: unknown changelog op in '$opCol': "),
        coalesce(col(opCol), lit("NULL")))).cast("long"))
    val aggs = sums.zipWithIndex.map { case ((v, _), i) =>
      sum(sign * col(v)).as(s"__dsum$i")
    } :+ sum(sign).as("__dcnt")
    val d = delta
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    state.join(d, groupCols, "full_outer")
      .select(groupCols.map(col) ++
        sums.zipWithIndex.map { case ((_, alias), i) =>
          (coalesce(col(alias), lit(0L)) +
            coalesce(col(s"__dsum$i"), lit(0L))).as(alias)
        } ++ Seq(
        (coalesce(col(cntCol), lit(0L)) + coalesce(col("__dcnt"), lit(0L)))
          .as(cntCol)): _*)
      .filter(col(cntCol) > 0L)
  }

  /** The state a fresh rebuild would produce — the bootstrap for the
    * maintenance loop and the invariant the spec checks `applyDelta`
    * against: state(snapshot N) maintained from state(snapshot M) +
    * changelog(M→N) must equal `rebuild` at N exactly.
    */
  def rebuild(df: DataFrame, groupCols: Seq[String], valCol: String,
              sumCol: String, cntCol: String): DataFrame =
    rebuildMulti(df, groupCols, Seq(valCol -> sumCol), cntCol)

  /** Multi-sum rebuild — the invariant partner of [[applyDeltaMulti]]. */
  def rebuildMulti(df: DataFrame, groupCols: Seq[String],
                   sums: Seq[(String, String)], cntCol: String): DataFrame = {
    val aggs = sums.map { case (v, alias) => sum(col(v)).as(alias) } :+
      count(lit(1)).as(cntCol)
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}

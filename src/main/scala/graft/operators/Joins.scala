package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks as built-ins, composed from existing ops
  * (preference (a) of the custom-operator ladder — no custom strategy
  * needed, Catalyst keeps optimizing the pieces).
  */
object Joins {

  /** As-of (temporal) LEFT join: for each left row, the single right row
    * with the greatest `rightTime` ≤ the left row's `leftTime`, per key.
    *
    * Implementation: union both sides tagged, then one windowed
    * `last(..., ignoreNulls)` sweep per key in time order — O(n log n)
    * via one hash-shuffle on the key + in-partition sort, never a
    * pairwise join. Right rows sort before left rows at equal
    * timestamps (inclusive ≤). This is the scalable shape for "match
    * each event to the latest state before it" at any corpus size.
    *
    * `rightVals` are the right columns to carry; they appear as
    * `asof_<name>` (null when no right row precedes the left row).
    *
    * Preconditions: NULL left keys never match (LEFT-join semantics —
    * enforced below, since a window partition would otherwise group
    * null with null); right rows must be unique per (key, rightTime) —
    * with ties the surviving value is a nondeterministic sort-tie
    * winner, which breaks reproducibility (pre-dedup with
    * [[Upsert.latestByKey]], as [[graft.queries.Relational.a1Asof]]
    * does).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: Column, rightTime: Column,
               rightVals: Seq[String]): DataFrame = {
    val reserved = Seq("__t", "__side", "__rv", "__match")
    require(!left.columns.exists(reserved.contains),
      s"left columns collide with asofJoin internals: ${reserved.mkString(", ")}")
    val lCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__t", leftTime)
      .withColumn("__side", lit(1))
    val rTagged = right
      .select(col(key) +: (rightVals.map(col) :+ rightTime.as("__t")): _*)
      .withColumn("__side", lit(0))
      .withColumn("__rv", struct(rightVals.map(col): _*))
      .select(col(key), col("__t"), col("__side"), col("__rv"))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("__match",
        // NULL keys take no match: SQL LEFT-join semantics, where NULL
        // never equals NULL (the window partition WOULD group them)
        when(col(key).isNull, lit(null))
          .otherwise(last(col("__rv"), ignoreNulls = true).over(w)))
      .filter(col("__side") === 1)
      .select(lCols.map(col) ++
        rightVals.map(c => col(s"__match.$c").as(s"asof_$c")): _*)
  }

  /** Range (band) self-join: pairs of rows whose `valCol` differ by at
    * most `eps`, optionally within `partCols` groups. Output:
    * a_id < b_id (+ partition columns).
    *
    * Implementation: ε-bucket the value axis; each row joins its own
    * bucket, and the right side is replicated to the two adjacent
    * buckets — every qualifying pair meets in exactly the left row's
    * bucket; an exact |Δ| ≤ ε check follows. The shuffle is on
    * (partition, bucket), never a cross join: at 100 TB the candidate
    * count is Σ_bucket n_b·m_b, proportional to the true output size
    * for uniform-ish data.
    *
    * Each qualifying pair is emitted exactly once WITHOUT a dedup pass:
    * the right side's three replicas sit at distinct buckets, so a pair
    * meets on at most one of them, and `a_id < b_id` kills the mirrored
    * orientation — no distinct() exchange over the output. Precondition:
    * `idCol` is unique within each partition group (duplicate id rows
    * would yield duplicate pairs).
    */
  def rangeSelfJoin(df: DataFrame, idCol: String, valCol: String,
                    eps: Double, partCols: Seq[String] = Nil): DataFrame = {
    require(eps > 0 && !eps.isInfinite && !eps.isNaN,
      s"eps must be a positive finite band width, got $eps")
    require(!df.columns.filterNot(c => c == idCol || c == valCol)
        .exists(Set("__b", "a_id", "b_id", "a_val", "b_val")),
      "input columns collide with rangeSelfJoin internals")
    val a = df.select((partCols :+ idCol :+ valCol).map(col): _*)
      .withColumn("__b", floor(col(valCol) / eps).cast("long"))
    val b = a.select(
      (partCols.map(col) :+ col(idCol).as("b_id") :+
        col(valCol).as("b_val") :+
        explode(array(col("__b") - 1, col("__b"), col("__b") + 1)).as("__b")): _*)
    a.withColumnRenamed(idCol, "a_id").withColumnRenamed(valCol, "a_val")
      .join(b, partCols :+ "__b")
      .filter(col("a_id") < col("b_id") &&
        abs(col("a_val") - col("b_val")) <= eps)
      .select((partCols.map(col) :+ col("a_id") :+ col("b_id")): _*)
  }
}

package org.apache.spark.sql

import org.apache.spark.sql.connector.expressions.{FieldReference, LiteralValue}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.types.DataType

/** Test-only bridge: builds the V2 `IN` predicate shape Spark's
  * dynamic partition pruning hands a [[connector.read.SupportsRuntimeV2Filtering]]
  * scan at execution time (column ref + internal-value literals).
  * Lives in `org.apache.spark.sql` because the literal/field factories
  * are `private[sql]`.
  */
object GraftTestV2 {
  def inPredicate(col: String, values: Seq[(Any, DataType)]): Predicate =
    new Predicate("IN",
      (FieldReference.column(col) +:
        values.map { case (v, dt) => LiteralValue(v, dt) }).toArray)
}

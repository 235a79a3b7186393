package graft.operators

import org.apache.spark.sql.DataFrame

/** NOT NULL enforcement policy at the sink, mirroring Flink's
  * `table.exec.sink.not-null-enforcer` (/root/reference/flink/sql/
  * sql-client.sql:50): the reference demo sets DROP — rows violating a
  * NOT NULL sink column are silently dropped, never an error.
  */
object SinkPolicy {
  sealed trait NotNullPolicy
  case object Drop  extends NotNullPolicy
  case object Error extends NotNullPolicy

  /** Apply the policy for the given NOT NULL columns. DROP compiles to a
    * plain `IsNotNull` filter — pushed down to the scan by Catalyst.
    */
  def enforceNotNull(df: DataFrame, notNullCols: Seq[String],
                     policy: NotNullPolicy = Drop): DataFrame = policy match {
    case Drop  => if (notNullCols.isEmpty) df else df.na.drop("any", notNullCols)
    case Error =>
      val bad = df.na.drop("any", notNullCols)
      // count comparison is a cheap aggregate; only used in Error mode
      if (df.count() != bad.count())
        throw new IllegalStateException(
          s"NOT NULL violation in columns ${notNullCols.mkString(",")}")
      df
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism hygiene for compute-heavy per-row operators. */
object Scale {

  /** Ensure at least `defaultParallelism` partitions before a
    * compute-dense stage (explode + hashing, vector math). A small input
    * (one parquet file, a dimension table) otherwise pins the whole
    * stage to one task. Never *reduces* partitioning: a 100 TB scan with
    * thousands of splits passes through untouched, so this is free at
    * scale and only rescues the small-input case.
    */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}

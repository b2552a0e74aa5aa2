package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared partitioning helpers for the pipeline operators. */
object Partitioning {
  /** Small single-file inputs arrive as one partition; heavy per-row
    * stages (shingling, hashing, vector math) must first spread rows
    * across cores — a tiny shuffle that buys full parallelism. At real
    * scale inputs are already many-partitioned and this is a no-op
    * cost. */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}

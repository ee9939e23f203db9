package graft.operators

import org.apache.spark.sql.DataFrame

/** Storage hygiene for iterative operators that truncate lineage with
  * `localCheckpoint()` each round (PageRank, dupClusters).
  *
  * `Dataset.unpersist` only clears cache-manager entries; the RDD a
  * checkpoint pinned sits inside the plan's `LogicalRDD` leaf and stays
  * in executor storage for the life of the session unless freed
  * explicitly. Iterative operators MUST free each superseded round's
  * blocks or executor storage grows linearly with iterations — and in a
  * long-lived session (a 130-query bench, a streaming job) the pinned
  * blocks tax every later query.
  */
private[graft] object Checkpoints {

  /** Drop the storage blocks behind a `localCheckpoint()`ed DataFrame.
    * Safe on non-checkpointed plans (no-op). Non-blocking.
    */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}

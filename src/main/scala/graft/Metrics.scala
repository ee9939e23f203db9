package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Per-query physical-metrics profiling: execute a plan and roll its
  * SQLMetrics up by metric key (rows produced, shuffle records/bytes,
  * spill, files read) — the numbers an operator of a 100 TB cluster
  * reads BEFORE asking "why is this query slow" (is it scanning too much?
  * shuffling too much? spilling?). Complements
  * [[graft.operators.Profiling.keySkewProfile]] (which diagnoses a key
  * BEFORE the shuffle; this measures the executed shuffle).
  *
  * The walk covers the adaptive plan's FINAL form: AQE hides the real
  * operators behind `AdaptiveSparkPlanExec`/`QueryStageExec` wrappers, so
  * a naive `children` traversal sees only stubs and reports near-empty
  * metrics — each wrapper is unwrapped to its executed subtree.
  */
object Metrics {

  /** Execute `df`'s OWN QueryExecution (a `write`/`count` action would
    * plan and instrument a different one, leaving these metrics at zero)
    * with a do-nothing executor-side action — every column materializes,
    * nothing is collected — and return total metric values keyed by
    * SQLMetric name (e.g. "numOutputRows", "shuffleRecordsWritten",
    * "spillSize", "numFiles"). Values are summed across all operators, so
    * "numOutputRows" is a plan-wide row-flow total, not the result size.
    */
  def profile(df: DataFrame): Map[String, Long] = {
    // a FRESH QueryExecution per call: SQLMetric accumulators are
    // cumulative per plan instance, so executing the caller's own qe
    // (which a prior count()/collect()/profile() may already have run)
    // would report inflated totals. The trivial projection re-plans from
    // the same logical plan with zeroed metrics and adds no operator with
    // metrics of its own.
    val qe = df.select(col("*")).queryExecution
    qe.toRdd.foreach(_ => ())
    val acc = mutable.Map.empty[String, Long].withDefaultValue(0L)
    val seen = mutable.Set.empty[Int]
    def walk(p: SparkPlan): Unit =
      // ReusedExchange shares the metric objects of the reused subtree —
      // identity-dedup so a diamond plan doesn't double-count
      if (seen.add(System.identityHashCode(p))) {
        p.metrics.foreach { case (k, m) => acc(k) += m.value }
        p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec        => walk(q.plan)
          case _                        => ()
        }
        p.children.foreach(walk)
      }
    walk(qe.executedPlan)
    acc.toMap
  }
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored neighbor in a top-k result list. */
case class Neighbor(neighbor_id: Long, cosine: Double)

/** Bounded top-k-by-score typed aggregate — the shuffle-shrinking half of
  * exact nearest-neighbor search (SURVEY.md §2.11; VERDICT r6 item 4).
  *
  * A `Window.partitionBy(query_id)` top-k forces the ENTIRE corpus score
  * stream for each query into one task. As a typed `Aggregator`, partial
  * aggregation runs map-side instead: every input partition reduces its
  * local scores to ≤ k candidates per query BEFORE the exchange, so the
  * shuffle carries O(k × partitions × queries) rows instead of
  * O(|corpus| × queries) — the per-partition-top-k + merge decomposition
  * (REPOSE-style local pruning, PAPERS.md), expressed as an aggregate so
  * Catalyst plans the merge instead of hand-rolled RDD code.
  *
  * Buffer is a flat Vector pruned at 2k: insertion stays O(1) amortized,
  * memory is bounded at 2k entries regardless of partition size, and the
  * final sort is over ≤ 2k elements. Ordering matches the window it
  * replaces exactly: cosine descending, neighbor_id ascending on ties.
  */
case class TopKNeighbors(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[Neighbor]] {
  require(k >= 1, s"k must be >= 1, got $k")

  private def best(b: Seq[(Double, Long)], n: Int): Seq[(Double, Long)] =
    b.sortBy { case (c, id) => (-c, id) }.take(n)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(b: Seq[(Double, Long)], in: (Long, Double)): Seq[(Double, Long)] = {
    val appended = b :+ ((in._2, in._1))
    if (appended.length > 2 * k) best(appended, k) else appended
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val all = a ++ b
    if (all.length > 2 * k) best(all, k) else all
  }

  override def finish(r: Seq[(Double, Long)]): Seq[Neighbor] =
    best(r, k).map { case (c, id) => Neighbor(id, c) }

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Neighbor]] = ExpressionEncoder()
}

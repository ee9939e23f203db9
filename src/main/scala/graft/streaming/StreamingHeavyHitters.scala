package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters — the streaming twin of the batch SpaceSaving
  * pipeline ([[graft.operators.HeavyHitters]]): maintain a bounded
  * top-items sketch over an unbounded item stream, across micro-batches
  * and restarts.
  *
  * Sharding argument (same as the batch operator's partition summaries,
  * transposed to time): each item hashes to exactly ONE shard, so a
  * shard's SpaceSaving summary sees its items' COMPLETE substream and the
  * classic guarantees hold per shard — estimates overestimate by at most
  * the recorded `err`, and any item with true count > nShard/capacity is
  * present in the summary. The global top-k over the union of shard
  * summaries therefore misses nothing above that threshold. Sharding
  * exists for parallelism and state locality, not approximation.
  *
  * Plan shape:
  *   1. one narrow projection: (shard = hash(item) mod nShards, item) —
  *      nothing else crosses the shuffle;
  *   2. ONE stateful stage: `flatMapGroupsWithState` keyed by shard. The
  *      trigger's occurrences are pre-counted inside the group function
  *      (a per-batch map-side combine in spirit; Structured Streaming
  *      allows only one stateful operator, so the combine lives here) and
  *      applied in sorted item order — deterministic across replays. Each
  *      shard emits its WHOLE summary as one row per trigger;
  *   3. downstream keeps the LATEST row per shard (last-value merge — the
  *      [[StreamingPipeline.currentValueSink]] contract) and takes the
  *      global top-k with [[topKFromSummaries]].
  *
  * State is O(nShards × capacity) strings+longs regardless of stream
  * length. Checkpointed: restarts resume the sketch exactly-once.
  */
object StreamingHeavyHitters {

  /** One occurrence, pre-sharded. */
  final case class ItemOcc(shard: Int, item: String)

  /** A shard's full SpaceSaving summary after a trigger: parallel arrays
    * (candidate, estimated count, max overestimate), plus the shard's
    * total item count `nSeen` (the denominator of the frequency
    * guarantee).
    */
  final case class ShardSummary(
      shard: Int,
      items: Array[String],
      counts: Array[Long],
      errs: Array[Long],
      nSeen: Long)

  /** Internal state: the summary in parallel-list form (encoder-friendly,
    * same style as [[StreamingDedup.BucketState]]).
    */
  final case class ShardState(
      items: List[String],
      counts: List[Long],
      errs: List[Long],
      nSeen: Long)

  /** Stages 1+2: shard the stream and fold each trigger's occurrences
    * into the per-shard sketch. Emits one [[ShardSummary]] per shard per
    * trigger (only shards that received data emit).
    */
  def summaries(
      items: DataFrame,
      itemCol: String,
      nShards: Int = 32,
      capacity: Int = 256): Dataset[ShardSummary] = {
    require(nShards > 0 && capacity > 0, "nShards and capacity must be positive")
    val spark = items.sparkSession
    import spark.implicits._
    items
      .select(
        pmod(xxhash64(col(itemCol).cast("string")), lit(nShards)).cast("int")
          .as("shard"),
        col(itemCol).cast("string").as("item"))
      .as[ItemOcc]
      .groupByKey(_.shard)
      .flatMapGroupsWithState[ShardState, ShardSummary](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (shard, rows, state: GroupState[ShardState]) =>
          val st = state.getOption.getOrElse(ShardState(Nil, Nil, Nil, 0L))
          // (count, err) per candidate, insertion-order-free
          val sketch = mutable.HashMap.empty[String, (Long, Long)]
          st.items.lazyZip(st.counts).lazyZip(st.errs).foreach {
            (i, c, e) => sketch(i) = (c, e)
          }
          // per-trigger combine, then weighted SpaceSaving inserts in
          // sorted item order: replays and shuffle nondeterminism cannot
          // change who gets evicted
          val batchCounts = mutable.HashMap.empty[String, Long]
          var n = 0L
          rows.foreach { r =>
            batchCounts.update(r.item, batchCounts.getOrElse(r.item, 0L) + 1L)
            n += 1L
          }
          // null items count under the null key like the batch twin (and
          // SQL group-by); every ordering below must therefore be
          // null-safe — Ordering.String NPEs on a null key
          val itemOrd: Ordering[String] =
            Ordering.comparatorToOrdering(
              java.util.Comparator.nullsFirst(java.util.Comparator.naturalOrder[String]()))
          batchCounts.toSeq.sortBy(_._1)(itemOrd).foreach { case (item, w) =>
            sketch.get(item) match {
              case Some((c, e)) => sketch(item) = (c + w, e)
              case None if sketch.size < capacity => sketch(item) = (w, 0L)
              case None =>
                // evict the min-count candidate (item tiebreak — again
                // deterministic); the newcomer inherits its count as the
                // overestimate bound
                val (mi, (mc, _)) =
                  sketch.minBy { case (i, (c, _)) => (c, i) }(
                    Ordering.Tuple2(Ordering.Long, itemOrd))
                sketch.remove(mi)
                sketch(item) = (mc + w, mc)
            }
          }
          val ordered = sketch.toSeq
            .sortBy { case (i, (c, _)) => (-c, i) }(Ordering.Tuple2(Ordering.Long, itemOrd))
          val newState = ShardState(
            ordered.map(_._1).toList,
            ordered.map(_._2._1).toList,
            ordered.map(_._2._2).toList,
            st.nSeen + n)
          state.update(newState)
          Iterator.single(ShardSummary(
            shard,
            newState.items.toArray,
            newState.counts.toArray,
            newState.errs.toArray,
            newState.nSeen))
      }
  }

  /** Stage 3 (batch side, over the LATEST summary per shard): global
    * top-k across shards. Counts are per-shard-complete, so this is the
    * same merge the batch operator does over partition summaries.
    */
  def topKFromSummaries(latest: DataFrame, k: Int): DataFrame =
    latest
      .select(explode(arrays_zip(col("items"), col("counts"), col("errs"))).as("e"))
      .select(col("e.items").as("item"), col("e.counts").as("n"),
        col("e.errs").as("err"))
      .orderBy(col("n").desc, col("item"))
      .limit(k)
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** STREAMING near-dup probe against a batch-built corpus index — the
  * streaming twin of [[graft.operators.Dedup.incrementalNearDups]]'s
  * cross arm: every micro-batch document is banded PER ROW (the
  * stateless [[Dedup.rowBandKeys]] reformulation — the batch path's
  * explode+groupBy signature build would be a stateful streaming
  * aggregation) and probes the static index by a plain stream-static
  * equi-join on (band, bkey); candidates verify by exact hash-level
  * Jaccard via the codegen sorted-intersect expression over per-row
  * shingle-hash sets. No watermark, no state: the operators are
  * projections and stream-static joins, so the query runs in append mode
  * at any rate and restarts replay identically.
  *
  * Semantics: emits (new_id, matched_id, jaccard ≥ threshold) — one row
  * per MATCHING BAND (a pair sharing m bands emits m identical rows);
  * exactly-once per (pair, band). Deduplicating across bands would need
  * per-pair state; the engine's idempotent merge sinks absorb the
  * duplicates, which is the same at-least-once contract the upsert
  * sinks already own. Within-stream (new-vs-new) duplicates are
  * [[StreamingDedup]]'s job — this operator answers "is it already in
  * the corpus", which needs no state at all.
  */
object StreamingIndexProbe {

  /** Probe `docs` (streaming: idCol, textCol) against `index`. The index
    * side is prepared ONCE (per-doc sorted shingle-hash sets from the
    * index's shingle table — a static aggregation) and reused every
    * trigger.
    */
  def nearDupAgainstIndex(
      docs: DataFrame,
      index: Dedup.LshIndex,
      idCol: String,
      textCol: String,
      threshold: Double = 0.5): DataFrame = {
    // the codegen sorted-intersect function rides the session registry —
    // registration is idempotent, so self-register rather than demand it
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // static side: (matched_id, band, bkey, sorted hash set, set size)
    val idxSets = index.shingles
      .groupBy(col(index.shingles.columns.head).as("matched_id"))
      .agg(sort_array(collect_set(Dedup.hash40(col("shingle")))).as("__mset"))
    val idxBands = index.bands
      .select(col(index.bands.columns.head).as("matched_id"),
        col("band"), col("bkey"))
      .join(idxSets, "matched_id")
    val probes = docs.select(
        col(idCol).as("new_id"),
        Dedup.rowShingleHashSet(col(textCol), index.shingleK).as("__nset"),
        explode(Dedup.rowBandKeys(col(textCol), index.shingleK,
          index.numHashes, index.rowsPerBand)).as("__b"))
      .select(col("new_id"), col("__nset"),
        col("__b.band").as("band"), col("__b.bkey").as("bkey"))
    probes.join(idxBands, Seq("band", "bkey"))
      .withColumn("__i",
        graft.functions.GraftFunctions.sortedIntersectCount(
          col("__nset"), col("__mset")))
      .withColumn("jaccard",
        col("__i").cast("double") /
          (size(col("__nset")) + size(col("__mset")) - col("__i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("matched_id"), col("jaccard"))
  }
}

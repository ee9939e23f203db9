package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch rollups — THE 100 TB cardinality idiom: build a small
  * fixed-size sketch per (group, bucket) partition of the data, then MERGE
  * sketches upward instead of re-scanning rows. A count-distinct rollup
  * re-shuffles the raw value stream at every tier; the sketch rollup
  * shuffles kilobyte register arrays. Spark 4 ships Apache DataSketches
  * HLL natively (`hll_sketch_agg` / `hll_union_agg` — codegen'd
  * aggregates), so this composes entirely from built-ins.
  *
  * Determinism contract (measured, not assumed): a DataSketches HLL
  * estimate is a function of the value set AND the merge topology — the
  * sparse-coupon→dense-register conversion happens at different points
  * depending on how partial sketches were unioned, so re-bucketing or
  * re-partitioning the input can move an estimate by ~±1 count. Every
  * comparison against these estimates must therefore be envelope-bounded
  * (SketchesSpec pins the envelope vs exact counts and across both merge
  * topologies); nothing downstream may hash or equality-compare them.
  */
object Sketches {

  /** Two-level distinct-cardinality rollup: per-(group, bucket) HLL
    * sketches of `valueCol`, merged per group. Returns one row per group:
    * (groupCol, n_buckets, approx_distinct, exact_distinct, rel_err[4dp])
    * — the exact side rides along so the estimate is self-auditing (and
    * the spec/driver check needs no external oracle for the sketch
    * internals). At 100 TB the exact column is the one you'd drop; the
    * sketch tier is the part that scales.
    */
  def hllRollup(
      df: DataFrame,
      groupCol: String,
      bucket: Column,
      valueCol: String,
      lgK: Int = 12): DataFrame = {
    val sketches = df
      .groupBy(col(groupCol), bucket.as("__bucket"))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("__sk"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_buckets"),
        hll_sketch_estimate(hll_union_agg(col("__sk"), lit(false)))
          .as("approx_distinct"))
    val exact = df.groupBy(groupCol)
      .agg(countDistinct(col(valueCol)).as("exact_distinct"))
    sketches.join(exact, groupCol)
      .select(col(groupCol), col("n_buckets"), col("approx_distinct"),
        col("exact_distinct"),
        round(abs(col("approx_distinct") - col("exact_distinct"))
          .cast("double") / col("exact_distinct"), 4).as("rel_err"))
  }

  /** COUNT-MIN sketch (Cormode & Muthukrishnan 2005) — the mergeable
    * fixed-memory frequency summary: `depth` hash rows × `width`
    * buckets of plain counters, so two corpora's sketches union by
    * adding cells and the whole structure is depth·width longs no
    * matter the corpus (the property stream/shard merges need at
    * 100 TB). Estimates overcount, never undercount (est ≥ exact —
    * one-sided by construction; the spec pins both bounds).
    *
    * Everything is DETERMINISTIC integers over the shared md5-prefix
    * hash salted with the row index, so construction AND estimation
    * replay exactly in SQL (q269) — unlike the HLL family, no
    * merge-topology sensitivity exists to dodge.
    *
    * Build: one explode (×depth) + one hash aggregate → (r, bucket,
    * cnt). Estimate: keys × depth → equi-join against the sketch →
    * min per key; a key whose (r, bucket) cell is absent from the
    * sketch was never inserted — estimate 0.
    */
  def countMinSketch(items: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    items
      .select(col(keyCol).cast("string").as("__k"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("r"),
        (Dedup.hash60(concat(col("r").cast("string"), lit(":"), col("__k")))
          % width).as("bucket"))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates from a [[countMinSketch]]: (key, est) =
    * min over rows of the key's cell; absent cells count 0.
    */
  def countMinEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    keys
      .select(col(keyCol), col(keyCol).cast("string").as("__k"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col(keyCol), col("r"),
        (Dedup.hash60(concat(col("r").cast("string"), lit(":"), col("__k")))
          % width).as("bucket"))
      .join(sketch, Seq("r", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}

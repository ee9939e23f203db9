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
      depth: Int, width: Int, weightCol: Option[String] = None): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    items
      // NULL keys would hash to a NULL bucket on the build side while the
      // estimate side's equi-join never matches NULL — breaking the
      // one-sided est>=exact guarantee (estimate 0 for a present key).
      // Coalesce to a sentinel on BOTH sides so NULL is an ordinary key.
      .select(coalesce(col(keyCol).cast("string"), lit(" __cms_null__"))
        .as("__k"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"),
        // weighted form (r19): a PRE-COUNTED (key, weight) table builds
        // the identical sketch — cell = Σ weights = the raw row count —
        // so a caller that already aggregated exact counts feeds them
        // here instead of re-scanning the raw stream (q269 used to
        // tokenize the corpus once for the sketch, once for the keys,
        // once for the exact counts). Integer sum of integer counts:
        // provably the same cells.
        weightCol.fold(lit(1L))(w => col(w).cast("long")).as("__w"))
      .select(col("r"),
        (Dedup.hash60(concat(col("r").cast("string"), lit(":"), col("__k")))
          % width).as("bucket"), col("__w"))
      .groupBy("r", "bucket").agg(sum(col("__w")).as("cnt"))
  }

  /** KMV (k-minimum-values / bottom-k) distinct sketch (Bar-Yossef et
    * al. 2002; Beyer et al. 2007) — the DETERMINISTIC alternative to
    * HLL: the signature is the k smallest DISTINCT 60-bit hashes of the
    * group's values, a pure function of the value SET (order- and
    * topology-free — k smallest is k smallest however the data is
    * partitioned or merged), so unlike the HLL family every number here
    * hash-compares cross-engine and the oracle replays construction AND
    * estimation exactly (q281/q282).
    *
    * Estimator: with the signature full (n ≥ k), D̂ = (k−1)·2⁶⁰ /
    * kth_min — the classic unbiased KMV estimate over the md5Prefix60
    * hash space; below k the signature IS the value set and the count
    * is exact. Signatures MERGE by "k smallest of the union"
    * (associative, commutative, idempotent — shard/stream merges
    * compose), and a merged signature estimates set operations:
    * Jaccard ≈ |sig∩| / k over the merged signature's members present
    * in both sides, intersection ≈ Jaccard · union estimate.
    *
    * Scale shape: one hash aggregate per group (collect_set of hashes
    * is bounded by the spec contract that per-group distinct values
    * fit an executor — for unbounded groups pre-shard and [[kmvMerge]]
    * the shards; the SIGNATURE is k longs regardless).
    */
  def kmvSignature(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    require(k >= 2 && k <= 65536, s"k must be in [2,65536], got $k")
    df
      .select(col(groupCol),
        Dedup.hash60(col(valueCol).cast("string")).as("__h"))
      .where(col("__h").isNotNull)
      .groupBy(groupCol)
      .agg(slice(array_sort(collect_set(col("__h"))), 1, k).as("kmv"))
  }

  /** Distinct-count estimate from a [[kmvSignature]]: exact below k,
    * the (k−1)·2⁶⁰/kth_min estimator at k. Output: (group, n_sig,
    * est) with est rounded to 2dp (one IEEE division on exact
    * integers — replayable, rounded only to absorb formatting).
    */
  def kmvDistinctEstimate(sigs: DataFrame, groupCol: String,
      k: Int): DataFrame = {
    require(k >= 2 && k <= 65536, s"k must be in [2,65536], got $k")
    val n = size(col("kmv"))
    sigs.select(col(groupCol), n.cast("long").as("n_sig"),
      round(when(n < k, n.cast("double"))
        .otherwise(lit((k - 1).toDouble * (1L << 60).toDouble) /
          element_at(col("kmv"), k).cast("double")), 2).as("est"))
  }

  /** Merge two signature columns: k smallest of the union (the KMV
    * merge rule). Null-safe: a missing side passes the other through.
    */
  def kmvMerge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(
      coalesce(a, array().cast("array<bigint>")),
      coalesce(b, array().cast("array<bigint>")))), 1, k)

  /** Set-operation estimates for every pair of groups (a < b): the
    * merged signature's Jaccard (members present in BOTH sides / its
    * size), union estimate from the merged signature, intersection =
    * Jaccard · union. All integer work except the two final divisions.
    */
  def kmvSetOps(sigs: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k >= 2 && k <= 65536, s"k must be in [2,65536], got $k")
    val a = sigs.select(col(groupCol).as("ga"), col("kmv").as("__ka"))
    val b = sigs.select(col(groupCol).as("gb"), col("kmv").as("__kb"))
    val merged = kmvMerge(col("__ka"), col("__kb"), k)
    val mSize = size(col("__m"))
    val inBoth = size(array_intersect(
      array_intersect(col("__m"), col("__ka")), col("__kb")))
    a.join(b, col("ga") < col("gb"))
      .withColumn("__m", merged)
      .select(col("ga"), col("gb"),
        mSize.cast("long").as("m_size"),
        inBoth.cast("long").as("in_both"),
        round((inBoth.cast("double") / mSize.cast("double")), 6).as("jaccard_est"),
        round(when(mSize < k, mSize.cast("double"))
          .otherwise(lit((k - 1).toDouble * (1L << 60).toDouble) /
            element_at(col("__m"), k).cast("double")), 2).as("union_est"))
  }

  /** Point-frequency estimates from a [[countMinSketch]]: (key, est) =
    * min over rows of the key's cell; absent cells count 0.
    */
  def countMinEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    keys
      .select(col(keyCol),
        coalesce(col(keyCol).cast("string"), lit(" __cms_null__")).as("__k"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col(keyCol), col("r"),
        (Dedup.hash60(concat(col("r").cast("string"), lit(":"), col("__k")))
          % width).as("bucket"))
      .join(sketch, Seq("r", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}

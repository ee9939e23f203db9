package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Equi-depth (quantile) histograms at scale (SURVEY.md §2 profiling
  * extras — no reference analog; the reference has no analytics surface).
  *
  * The textbook formulation — `ntile(b) OVER (ORDER BY v)` — is an
  * UNPARTITIONED window: Spark moves the entire input into one task and
  * sorts it there, a driver-adjacent serial bottleneck that dies long
  * before 100 TB. Both operators here produce equi-depth buckets without
  * any global single-task stage:
  *
  *  - [[ntileExact]]: bit-identical to the ntile window (the exact
  *    semantics an oracle can pin), built from a range repartition + local
  *    sorts + a per-partition offset fix-up — the classic two-phase
  *    distributed ranking. Every stage is parallel.
  *  - [[equiDepthApprox]]: approx_percentile boundaries + a codegen'd
  *    CASE-chain bucket assignment — zero extra shuffles beyond the final
  *    tiny aggregation. The 100 TB default when "each bucket within ε of
  *    n/b" is good enough (profiling, skew detection, bucketing joins).
  */
object Histogram {

  /** Append an exact 0-based global rank in `orderCols` order, without an
    * unpartitioned window. Phase 1: range-repartition + sort within
    * partitions (parallel; range boundaries come from Spark's sampling
    * sketch, so partitions are balanced under skew). Phase 2: zipWithIndex
    * converts per-partition positions to global ranks with one O(partitions)
    * count job — the standard distributed ranking shape.
    *
    * The RDD hop is deliberate: this is genuine per-partition imperative
    * logic (emit position offsets), the one place mapPartitions-style code
    * beats any DataFrame formulation. Ties in `orderCols` must be broken
    * by the caller (include a unique key) for a deterministic rank.
    */
  def withGlobalRank(
      df: DataFrame,
      orderCols: Seq[Column],
      rankCol: String = "rank"): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(nPart, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      schema)
  }

  /** Exact ntile(nBuckets) over a global (orderCols) order — the same
    * bucket every engine's ntile window assigns (first `n mod b` buckets
    * one row larger) — with no unpartitioned window anywhere in the plan.
    * Adds a long `bucket` column in 1..nBuckets. One extra pass over the
    * input (the total-row count) plus the two ranking phases; all
    * parallel.
    */
  def ntileExact(
      df: DataFrame,
      orderCols: Seq[Column],
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val n = df.count()
    val q = n / nBuckets
    val rem = n % nBuckets
    val threshold = rem * (q + 1)
    val r = col("__rank")
    // SQL DIV: exact integer division (a double round-trip loses exactness
    // past 2^53). greatest(q, 1) keeps the dead branch well-defined under
    // ANSI when n < nBuckets (q = 0: every row is below threshold).
    val bucket = when(r < threshold, expr(s"__rank DIV ${q + 1}"))
      .otherwise(lit(rem) + expr(s"(__rank - $threshold) DIV ${math.max(q, 1L)}"))
    withGlobalRank(df, orderCols, "__rank")
      .withColumn("bucket", (bucket + 1).cast("long"))
      .drop("__rank")
  }

  /** Approximate equi-depth histogram: (bucket, n, mn, mx) with bucket in
    * 1..nBuckets. Boundaries are approx_percentile quantiles (collected to
    * the driver: nBuckets-1 doubles, O(1) in data size); assignment is a
    * codegen'd CASE chain (no lambda, no join, no shuffle); the only
    * exchange is the final nBuckets-row aggregation. Bucket populations are
    * within the sketch's rank error of n/nBuckets — tolerance asserted in
    * HistogramSpec. `valueCol` must be numeric.
    */
  /** Per-group winsorized statistics: clip `valCol` at the exact
    * [`loP`, `hiP`] percentiles of its group, then aggregate — the robust
    * alternative to dropping outlier rows (feature normalization for
    * training pipelines keeps every row but bounds leverage). Exact
    * interpolated percentiles (`percentile`, the sort-based exact
    * aggregate, linear interpolation at rank (n-1)·p — the same
    * definition as ANSI `percentile_cont`); for the 100 TB path swap in
    * `approx_percentile` with an ε budget — same plan shape, one
    * aggregation pass instead of a per-group sort.
    *
    * One shuffle on the group key computes both percentiles; the clip +
    * re-aggregate joins the tiny per-group bounds table back by the same
    * key (broadcast — there are as many bound rows as groups).
    */
  def winsorizedStats(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      loP: Double = 0.05,
      hiP: Double = 0.95): DataFrame = {
    val bounds = df.groupBy(groupCol).agg(
      percentile(col(valCol), lit(loP)).as("__lo"),
      percentile(col(valCol), lit(hiP)).as("__hi"))
    // NULL values must STAY null: least/greatest skip nulls, so an
    // unguarded clip would coerce NULL to __lo — winsorized_mean would
    // then count null rows while raw_mean (avg) excludes them.
    df.join(broadcast(bounds), groupCol)
      .withColumn("__w",
        when(col(valCol).isNotNull,
          least(greatest(col(valCol), col("__lo")), col("__hi"))))
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n"),
        round(first(col("__lo")), 4).as("p_lo"),
        round(first(col("__hi")), 4).as("p_hi"),
        round(avg("__w"), 4).as("winsorized_mean"),
        round(avg(valCol), 4).as("raw_mean"))
  }

  def equiDepthApprox(
      df: DataFrame,
      valueCol: String,
      nBuckets: Int,
      accuracy: Int = 10000): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    // NULL values carry no rank information: drop them up front — a CASE
    // chain would silently dump every NULL into the last bucket, inflating
    // its count while mn/mx describe only the real values
    val nonNull = df.filter(col(valueCol).isNotNull)
    val probs = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val boundariesRaw = nonNull
      .agg(expr(s"approx_percentile(CAST($valueCol AS DOUBLE), " +
        s"array(${probs.mkString(", ")}), $accuracy)").as("__b"))
      .head().getSeq[Double](0)
    // empty (or fully-null) input: approx_percentile returns NULL —
    // return an empty histogram with the right schema, like the sibling
    // operators' empty-input contract
    if (boundariesRaw == null) {
      val spark = df.sparkSession
      return spark.createDataFrame(
        new java.util.ArrayList[Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("bucket",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("mn",
            org.apache.spark.sql.types.DoubleType, nullable = true),
          org.apache.spark.sql.types.StructField("mx",
            org.apache.spark.sql.types.DoubleType, nullable = true))))
    }
    val boundaries = boundariesRaw
    val v = col(valueCol).cast("double")
    val first = when(v <= boundaries.head, 1)
    val chain = boundaries.tail.zipWithIndex.foldLeft(first) {
      case (acc, (b, i)) => acc.when(v <= b, i + 2)
    }
    nonNull.withColumn("bucket", chain.otherwise(nBuckets).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(v).as("mn"), max(v).as("mx"))
      .orderBy("bucket")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact distributed order statistics with O(1) executor memory — the
  * 100 TB path for medians/percentiles on groups too large to buffer
  * (SURVEY.md §2.11 scale extension; no reference analog).
  *
  * Spark's `percentile(...)` (q45) materializes every group value in
  * one task's sort buffer — exact, but O(group size) memory: a 10^10-row
  * group OOMs the executor. This finds the EXACT k-th smallest by
  * multiway search over the VALUE DOMAIN instead: each round counts
  * rows ≤ p for 15 equi-spaced pivots per group in ONE
  * map-side-combined aggregate pass, so ⌈log16(range)⌉ rounds pin the
  * answer — ≤ 16 passes for any long domain, each with O(1) per-task
  * state. The classic selection-by-counting algorithm, shaped for
  * Spark: the input persists once, every round is a broadcast join
  * against the O(#groups × 15) active-pivot table plus one aggregate,
  * and the driver holds only (group, k, lo, hi) — the same
  * bounded-collect contract as the budget/bucket walks
  * ([[Curation.budgetSelect]]).
  *
  * Exactness: counting is integer, the domain is integral, ties are
  * irrelevant (the k-th VALUE is unique even when tie ORDER is not) —
  * so results are bit-identical to any engine's order statistic with
  * the same k.
  */
object Selection {

  /** The exact k-th smallest `valCol` (LongType; 1-based k) per group.
    *
    * @param kOf k for a group of n rows — e.g. lower median
    *            `n => (n + 1) / 2` (the default), upper quartile
    *            `n => (3 * n + 3) / 4`; must be in [1, n].
    * @return (groupCol, n, kth LongType)
    *
    * Driver state and per-round collect are O(#groups) — callers with
    * unbounded group cardinality should aggregate upstream first (the
    * operator recomputes nothing per group; rounds are shared, bounded
    * by log2 of the WIDEST group's value range).
    *
    * @param cache persist the (group, value) projection across rounds
    *              (the default — right when the input is a table worth
    *              one materialization). Pass false when the input is a
    *              DERIVED relation bigger than its sources (e.g. the
    *              O(n²) implicit pair set of [[graft.operators
    *              .TimeSeries.theilSenSelection]]): every round then
    *              recomputes it — pure compute, zero storage footprint.
    */
  def kthSmallestByGroup(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      kOf: Long => Long = n => (n + 1) / 2,
      cache: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val projected = df
      .filter(col(valCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        col(valCol).cast("long").as("v"))
    val vals = if (cache) projected.persist() else projected
    try {
      val stats = vals.groupBy("g")
        .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("mx"))
        .collect() // one row per group — the documented bounded collect
      // state: group -> (k, lo, hi) with the invariant
      //   count(v <= lo - 1) < k  and  count(v <= hi) >= k
      val nOf: Map[String, Long] =
        stats.map(r => r.getString(0) -> r.getLong(1)).toMap
      var state: Map[String, (Long, Long, Long)] = stats.map { r =>
        val n = r.getLong(1)
        val k = kOf(n)
        require(k >= 1 && k <= n,
          s"kOf($n) = $k out of [1, $n] for group '${r.getString(0)}'")
        r.getString(0) -> (k, r.getLong(2), r.getLong(3))
      }.toMap
      // 16-way search via the JOIN-FANOUT counting pass: each row joins
      // its group's ≤ 15 broadcast pivots, the codegen'd (v <= p) filter
      // + PARTIAL aggregation collapse the fanout map-side — only
      // O(groups × pivots) rows ever cross the exchange. TWO measured
      // anti-lessons pin this shape (interleaved A/B on q285's pair
      // stream, r15):
      //  - a "no-fanout" rewrite (per-row pivot index via an array HOF,
      //    then count per index) was ~2× SLOWER: higher-order functions
      //    evaluate interpreted per element (the q76 lesson, again) —
      //    63 interpreted comparisons per row lose to codegen'd
      //    duplicate rows that never leave the map side;
      //  - widening to 64 pivots to cut rounds (log64 vs log16) was
      //    also ~2× slower: per-round cost here is fanout × rows of
      //    codegen work, so 4.2× per-round work bought only a 1.6×
      //    round reduction. Round count only dominates when the input
      //    is small enough that scheduling outweighs row work — and
      //    then wall-clock is already seconds.
      val nSplit = 16
      var active = state.filter { case (_, (_, lo, hi)) => lo < hi }
      while (active.nonEmpty) {
        // overflow-proof equi-spaced interior pivots in [lo, hi), floor
        // arithmetic via BigInt (survives lo ~ Long.Min, hi ~ Long.Max);
        // when the range is narrower than the fanout this degenerates to
        // every interior value — exact in one round
        val pivotsOf: Map[String, Seq[Long]] = active.map { case (g, (_, lo, hi)) =>
          val (blo, bhi) = (BigInt(lo), BigInt(hi))
          val span = bhi - blo
          val ps = (1 until nSplit).map { i =>
            (blo + span * i / nSplit).toLong
          }.distinct.filter(p => p >= lo && p < hi)
          g -> (if (ps.isEmpty) Seq(lo) else ps)
        }
        val pivotDf = pivotsOf.toSeq
          .flatMap { case (g, ps) => ps.map(g -> _) }.toDF("g", "p")
        val cnts = vals
          .join(broadcast(pivotDf), "g")
          .filter(col("v") <= col("p"))
          .groupBy("g", "p").agg(count(lit(1)).as("c"))
          .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
          .toMap
        state = state.map { case (g, s @ (k, lo, hi)) =>
          if (lo >= hi) g -> s
          else {
            // tightest bracket: hi' = smallest pivot with count ≥ k,
            // lo' = largest pivot with count < k, plus one
            val ps = pivotsOf(g)
            val cOf = (p: Long) => cnts.getOrElse((g, p), 0L)
            val newHi = ps.filter(cOf(_) >= k)
              .reduceOption(_ min _).getOrElse(hi)
            val newLo = ps.filter(cOf(_) < k)
              .reduceOption(_ max _).map(_ + 1).getOrElse(lo)
            g -> (k, newLo, newHi)
          }
        }
        active = state.filter { case (_, (_, lo, hi)) => lo < hi }
      }
      state.toSeq.map { case (g, (_, lo, _)) => (g, nOf(g), lo) }
        .toDF(groupCol, "n", "kth")
    } finally if (cache) { vals.unpersist(blocking = false); () }
  }

  /** Known lever, deliberately not landed yet (needs its own invariant
    * battery): SEEDING the bracket from a sampled per-group quantile —
    * one sample pass + one exact certify round would replace most of
    * the log16(range) bisection when values concentrate (slopes near
    * 0, prices near a mode). Each saved round is one full input pass,
    * which matters most exactly where this operator is chosen: derived
    * O(n²) streams regenerated per round ([[graft.operators.TimeSeries
    * .theilSenSelection]]).
    */

  /** Global exact k-th smallest — the single-group fast path. */
  def kthSmallest(df: DataFrame, valCol: String, k: Long): Long = {
    val one = kthSmallestByGroup(
      df.select(lit("_").as("__g"), col(valCol)), "__g", valCol, _ => k)
    one.collect().head.getAs[Long]("kth")
  }
}

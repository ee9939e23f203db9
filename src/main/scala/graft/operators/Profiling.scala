package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shuffle-key diagnostics — the profiling pass run BEFORE a big join or
  * aggregation to decide whether it needs [[SkewJoin]] salting, AQE skew
  * handling, or a broadcast instead. SURVEY.md §2.11 operational scope; no
  * reference analog.
  */
object Profiling {

  /** One-row skew profile of a prospective shuffle key: row/key counts,
    * the heaviest key's frequency and identity, the p50/p99 key
    * frequencies, and skew = max_freq / mean_freq (1.0 = perfectly
    * uniform; a straggler task is roughly `skew`× the average task).
    *
    * Plan shape: one partial-aggregated count per key, then one aggregate
    * over the (small) frequency table — the profile never touches the
    * driver and costs one shuffle of pre-combined key counts, which is
    * why it is cheap enough to run as a pre-flight check. The heaviest
    * key is picked by a (freq, key)-struct max — on frequency ties the
    * LARGEST key string wins, a deterministic tiebreak that is stable
    * across partitionings.
    *
    * Returns (n_rows, n_keys, max_freq, max_key, p50_freq, p99_freq,
    * skew[4dp]). Null keys count as a key (they all land in one task —
    * exactly the skew this profile exists to catch); key is cast to
    * string for the report.
    */
  def keySkewProfile(df: DataFrame, keyCol: String): DataFrame =
    // NULL is its own groupBy key — no sentinel, so a literal "<null>"
    // string in the data stays a distinct key; the sentinel appears only
    // in the max_key REPORT column (struct-max treats a null field as
    // smallest, so a null key loses frequency ties — still deterministic)
    df.select(col(keyCol).cast("string").as("__k"))
      .groupBy("__k").agg(count(lit(1)).as("__f"))
      .agg(
        sum("__f").as("n_rows"),
        count(lit(1)).as("n_keys"),
        max("__f").as("max_freq"),
        // struct max = (freq desc, key desc) winner — a deterministic,
        // partitioning-independent tiebreak where max_by(__k, __f) would
        // tie arbitrarily
        coalesce(max(struct(col("__f"), col("__k"))).getField("__k"),
          lit("<null>")).as("max_key"),
        percentile(col("__f"), lit(0.5)).as("p50_freq"),
        percentile(col("__f"), lit(0.99)).as("p99_freq"),
        round(max("__f") * count(lit(1)).cast("double") / sum("__f"), 4)
          .as("skew"))

  /** Per-dimension embedding-distribution drift between two snapshots of
    * a corpus, as the Population Stability Index — the standard "did the
    * feature distribution move?" monitor, applied to each embedding
    * coordinate:
    *
    *   PSI(dim) = Σ_bins (p_b − q_b) · ln(p_b / q_b)
    *
    * with `numBins` equal-width bins over [lo, hi] (values outside clamp
    * into the edge bins), p = reference (`refPred` rows) and q = current
    * proportions, both add-0.5 smoothed so a bin empty on ONE side stays
    * finite. Bins empty in BOTH snapshots are excluded: their smoothed
    * term is an artifact of the smoothing constant, not evidence of
    * drift. The conventional alert threshold is ~0.2 (`drifted` flag);
    * equal distributions give PSI ≈ 0.
    *
    * Shape at scale: ONE pass over the exploded (vector, dim) stream
    * into a (dim × bin) count grid — bounded by dims·numBins rows
    * regardless of corpus size — then all arithmetic happens on the
    * grid; per-dim totals ride a broadcast self-join of the grid, and
    * the per-dim sum folds in bin order from a first-element seed (the
    * cross-engine bit-exact recipe), ROUNDED to 6 dp.
    *
    * Returns (dim, n_ref, n_cur, psi, drifted) ordered by dim.
    */
  def psiDrift(
      df: DataFrame,
      vecCol: String,
      refPred: org.apache.spark.sql.Column,
      numBins: Int = 8,
      lo: Double = -1.0,
      hi: Double = 1.0,
      threshold: Double = 0.2): DataFrame = {
    require(numBins > 1 && hi > lo)
    val w = (hi - lo) / numBins
    val px = df.select(refPred.as("__ref"),
      posexplode(col(vecCol)).as(Seq("__dim", "__v")))
    val binned = px.select(col("__ref"), col("__dim"),
      least(greatest(floor((col("__v").cast("double") - lo) / w), lit(0.0)),
        lit((numBins - 1).toDouble)).cast("int").as("__bin"))
    val grid = binned.groupBy("__dim", "__bin").agg(
      sum(when(col("__ref"), 1L).otherwise(0L)).as("__cr"),
      sum(when(!col("__ref"), 1L).otherwise(0L)).as("__cc"))
    val totals = grid.groupBy("__dim").agg(
      sum("__cr").as("__nr"), sum("__cc").as("__nc"))
    val sm = 0.5 * numBins
    val scored = grid.join(broadcast(totals), "__dim").select(
      col("__dim"), col("__cr"), col("__cc"), col("__nr"), col("__nc"),
      col("__bin"),
      (((col("__cr") + 0.5) / (col("__nr") + sm) -
        (col("__cc") + 0.5) / (col("__nc") + sm)) *
        log(((col("__cr") + 0.5) / (col("__nr") + sm)) /
          ((col("__cc") + 0.5) / (col("__nc") + sm)))).as("__t"))
    val terms = transform(
      array_sort(collect_list(struct(col("__bin"), col("__t").as("t")))),
      x => x.getField("t"))
    scored.groupBy(col("__dim").cast("long").as("dim"))
      .agg(max("__nr").cast("long").as("n_ref"),
        max("__nc").cast("long").as("n_cur"),
        round(aggregate(slice(terms, 2, 10000), element_at(terms, 1),
          (a, x) => a + x), 6).as("psi"))
      .withColumn("drifted", col("psi") > threshold)
      .orderBy("dim")
  }
}

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
    df.select(coalesce(col(keyCol).cast("string"), lit("<null>")).as("__k"))
      .groupBy("__k").agg(count(lit(1)).as("__f"))
      .agg(
        sum("__f").as("n_rows"),
        count(lit(1)).as("n_keys"),
        max("__f").as("max_freq"),
        // struct max = (freq desc, key desc) winner — a deterministic,
        // partitioning-independent tiebreak where max_by(__k, __f) would
        // tie arbitrarily
        max(struct(col("__f"), col("__k"))).getField("__k").as("max_key"),
        percentile(col("__f"), lit(0.5)).as("p50_freq"),
        percentile(col("__f"), lit(0.99)).as("p99_freq"),
        round(max("__f") * count(lit(1)).cast("double") / sum("__f"), 4)
          .as("skew"))
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed equi-joins: append a salt in [0, n) to
  * the fact side and replicate the build side n times, so one hot key's
  * rows spread over n shuffle partitions instead of landing on a single
  * straggler task. The result is EXACTLY the plain equi-join — salting
  * only changes the partitioning.
  *
  * When to reach for this instead of AQE's OptimizeSkewedJoin: AQE splits
  * oversized SHUFFLE PARTITIONS after materializing the map side, which
  * rescues sort-merge joins but (a) only triggers past its size
  * thresholds, (b) cannot help aggregations keyed on the hot key
  * downstream, and (c) re-plans at runtime — salting is declarative,
  * composes with bucketing, and works on any join strategy. Cost: the
  * build side shuffles n× its size — keep n small (8–32) and size it to
  * the observed hot-key multiplicity, or pre-split only the hot keys
  * (two-pass variant) when the build side is large.
  *
  * The fact-side salt is a deterministic hash of the whole row rather
  * than `rand()`: re-evaluation under speculative retries or plan
  * re-optimization then cannot change row routing mid-query (a classic
  * correctness trap with nondeterministic salts feeding a shuffle).
  * Identical duplicate rows share a salt — acceptable: skew comes from
  * many DISTINCT rows sharing a join key, not from byte-identical rows.
  */
object SkewJoin {

  def saltedEquiJoin(
      fact: DataFrame,
      factKey: String,
      build: DataFrame,
      buildKey: String,
      numSalts: Int = 16): DataFrame = {
    require(numSalts >= 1, s"numSalts must be >= 1, got $numSalts")
    val fs = fact.withColumn("__salt",
      pmod(hash(fact.columns.toIndexedSeq.map(col): _*), lit(numSalts)))
    val bs = build.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    fs.join(bs,
        fs(factKey) === bs(buildKey) && fs("__salt") === bs("__salt"))
      .drop(fs("__salt")).drop(bs("__salt"))
  }
}

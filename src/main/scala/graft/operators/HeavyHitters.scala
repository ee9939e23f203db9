package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Heavy hitters via the SpaceSaving sketch (SURVEY.md §2.11 — no
  * reference analog): one-pass, bounded-memory frequent-item detection.
  * The exact `groupBy(item).count` top-k (q47) shuffles one row per
  * DISTINCT item — fine until the item domain itself is huge (URLs,
  * n-grams, user agents at 100 TB). The sketch path keeps `capacity`
  * counters per partition, shuffles at most partitions × capacity
  * candidate rows, and an exact verify pass touches only the candidates:
  *
  *   scan (SpaceSaving per partition) → candidate union →
  *   semi-join + exact count of candidates only → top-k.
  *
  * Guarantee: a partition's summary contains every item whose true count
  * in that partition exceeds rows/capacity (the SpaceSaving bound), so
  * any GLOBAL top-k item — which by pigeonhole is heavy in at least one
  * partition — survives into the candidate set when
  * capacity ≫ k · skew⁻¹; with capacity at or above the per-partition
  * distinct-item count the summaries, and hence the result, are exact.
  * The verify pass makes the output deterministic (exact counts, ordered
  * by count desc then item) whenever the candidate set covers the true
  * top-k.
  */
object HeavyHitters {

  private val summarySchema = StructType(Seq(
    StructField("item", StringType, nullable = true),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false)))

  /** Per-partition SpaceSaving summaries: (item, est, err) where
    * true-count ∈ [est − err, est]. At most `capacity` rows per
    * partition. Null items are counted under the null key like SQL
    * GROUP BY would.
    */
  def partitionSummaries(df: DataFrame, itemCol: String, capacity: Int): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    // SQL cast, not Java toString: [[topK]]'s verify pass semi-joins the
    // candidates against cast(itemCol AS STRING), and for types whose Java
    // rendering differs from the SQL cast (Timestamp '…00:00.0' vs
    // '…00:00') a toString here would make every candidate miss the join
    // and silently drop heavy items
    val items = df.select(col(itemCol).cast("string").as("item"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(summarySchema)
    items.mapPartitions { it =>
      // (count, err) per tracked item; eviction replaces the current
      // minimum (linear min scan — a production impl keeps a heap, the
      // bound and the emitted summary are identical)
      val m = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
      it.foreach { r =>
        val item = if (r.isNullAt(0)) null else r.getString(0)
        m.get(item) match {
          case Some((c, e)) => m.update(item, (c + 1, e))
          case None if m.size < capacity => m.update(item, (1L, 0L))
          case None =>
            val (minItem, (minC, _)) = m.minBy(_._2._1)
            m.remove(minItem)
            m.update(item, (minC + 1, minC))
        }
      }
      m.iterator.map { case (item, (c, e)) => Row(item, c, e) }
    }(enc)
  }

  /** Exact top-k through the sketch: candidates from the per-partition
    * summaries, then an exact count of ONLY the candidate items, ordered
    * (count desc, item). Result equals the full groupBy top-k whenever
    * the candidate set covers the true top-k (see object scaladoc);
    * output: (item, n).
    */
  def topK(df: DataFrame, itemCol: String, k: Int, capacity: Int = 4096): DataFrame = {
    val candidates = partitionSummaries(df, itemCol, capacity)
      .select(col("item").as("__cand")).distinct()
    // null-SAFE semi join: the sketch tracks the null group, and a plain
    // equi-join would silently drop it here
    df.select(col(itemCol).cast("string").as("item"))
      .join(candidates, col("item") <=> col("__cand"), "left_semi")
      .groupBy("item")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("item"))
      .limit(k)
  }
}

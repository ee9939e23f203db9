package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range / interval join: match left rows whose point value falls inside a
  * right-side [start, end] interval (SURVEY.md §2.3 — absent in the
  * reference; its only key matching is the tag-equality upsert,
  * /root/reference/OPC2MongoDB/Program.cs:1180).
  *
  * Spark plans a raw `l.pt BETWEEN r.start AND r.end` as a broadcast
  * nested loop — O(n·m) and unusable at 100 TB. This operator rewrites it
  * as a *bucketed equi-join*: quantize the point and the interval to
  * fixed-width buckets, explode the interval over its covered buckets,
  * equi-join on the bucket id, then re-apply the exact range predicate.
  * Cost: shuffle is O(rows × avg buckets per interval) on a uniformly
  * partitionable key, and the exact predicate only runs on bucket-local
  * candidates. Pick `bucketWidth` ≈ typical interval length so intervals
  * explode to O(1) buckets.
  */
object RangeJoin {

  /** @param left        rows with a point column
    * @param right       rows with interval columns
    * @param ptCol       left point column name (numeric — epoch seconds etc.)
    * @param startCol    right interval start (inclusive)
    * @param endCol      right interval end (inclusive)
    * @param bucketWidth bucket width in the point's units
    * @param extraKeys   optional additional equi-join key names (both sides)
    */
  def pointInInterval(
      left: DataFrame,
      right: DataFrame,
      ptCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      extraKeys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val l = left.withColumn("__bucket", floor(col(ptCol) / bucketWidth))
    val r = right.withColumn("__bucket",
      explode(sequence(floor(col(startCol) / bucketWidth), floor(col(endCol) / bucketWidth))))
    val keys = "__bucket" +: extraKeys
    l.join(r, keys)
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }
}

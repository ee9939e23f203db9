package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for co-located joins (SURVEY.md §2.3 scale
  * notes — no reference analog).
  *
  * At 100 TB the dominant cost of a repeated fact⋈fact equi-join is the
  * shuffle of both sides. Writing the tables bucketed by the join key
  * moves that shuffle to write time, once: every later join on the bucket
  * key plans with no Exchange on either side (verified in BucketingSpec by
  * asserting the physical plan is exchange-free). The same trick feeds
  * repeated aggregations on the bucket key.
  *
  * Bucketed writes require a catalog table (`saveAsTable`) — bucket
  * metadata lives in the metastore, not the parquet footer.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted catalog table. */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(tableName)
  }

  /** Join two same-bucketed catalog tables on the bucket key — plans as a
    * zero-exchange sort-merge join when both tables share bucket count and
    * key.
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String],
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
}

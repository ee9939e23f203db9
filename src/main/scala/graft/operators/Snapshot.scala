package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

/** Snapshot diffing (CDC between two table versions) — the reconciliation
  * pass run between pipeline runs: which rows appeared, disappeared, or
  * changed since the last snapshot. Pairs with [[graft.streaming.TxTable]]
  * versions (diff two reads) but is version-store agnostic.
  *
  * Plan shape: ONE full outer equi-join on the key, with each side's
  * non-key payload pre-collapsed to a 128-bit content hash — so the
  * shuffle carries (key, hash) pairs, never the wide rows, and the
  * compare is a codegen'd hash equality. At 100 TB both sides shuffle
  * once on the key (or co-locate for free if both snapshots are bucketed
  * by it — [[Bucketing]]); there is no row-by-row driver loop and no
  * window. Keys must be unique per snapshot (enforce upstream or the
  * diff is per-(key, hash) multiset).
  */
object Snapshot {

  /** Diff `newDf` against `oldDf` on `keyCol`: returns
    * (keyCol, change_type ∈ {added, removed, changed}) — unchanged rows
    * are dropped (at scale they are ~the whole table; emitting them would
    * make the diff output the size of the input). `compareCols` defaults
    * to every non-key column present in BOTH snapshots, so schema
    * evolution on one side doesn't poison the hash.
    */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCol: String,
      compareCols: Seq[String] = Nil): DataFrame = {
    val cols =
      if (compareCols.nonEmpty) compareCols
      else oldDf.columns.filter(c => c != keyCol && newDf.columns.contains(c)).toSeq
    require(cols.nonEmpty, "no common non-key columns to compare")
    // Per-column md5 blocks, then one md5 over the fixed-width
    // concatenation: every column contributes exactly 33 chars (null
    // marker + 32-hex digest), so no value can shift bytes across a
    // column boundary (a bare marker+value concat collides on e.g.
    // ("a","b1c") vs ("a1b","c")) and null vs "" stay distinct. The
    // outer hash still narrows the shuffle to 16 bytes per row.
    def hashed(df: DataFrame, hc: String) = df.select(col(keyCol),
      md5(concat_ws("\u0001", cols.map(c =>
        concat(when(col(c).isNull, "0").otherwise("1"),
          md5(coalesce(col(c).cast("string"), lit(""))))): _*)).as(hc))
    hashed(oldDf, "__oh").join(hashed(newDf, "__nh"), Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("__oh").isNull, "added")
          .when(col("__nh").isNull, "removed")
          .when(col("__oh") =!= col("__nh"), "changed").as("change_type"))
      .filter(col("change_type").isNotNull)
  }

  /** Change data feed between two snapshots — [[diff]] with payloads, in
    * the standard CDF row shape (the format Delta Lake's change feed
    * popularized): one row per change carrying the affected values,
    * `change_type` ∈ {insert, delete, update_preimage, update_postimage}
    * (an updated key emits BOTH rows: the pre-image with old values and
    * the post-image with new). Unchanged keys emit nothing — at scale
    * they are ~the whole table.
    *
    * This is the feed incremental consumers need ([[IncrementalAgg]]):
    * the pre/post pair is exactly a −old/+new contribution, so signed
    * aggregation over the feed maintains downstream state without
    * rescanning either snapshot. Change detection reuses [[diff]]'s
    * column-block hash (null-safe, boundary-collision-proof); the
    * payload rides the same single full-outer key join, projected to
    * `keyCol` + `compareCols` only — never the full row width.
    * Keys must be unique per snapshot, as in [[diff]].
    */
  def changeDataFeed(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCol: String,
      compareCols: Seq[String] = Nil): DataFrame = {
    val cols =
      if (compareCols.nonEmpty) compareCols
      else oldDf.columns.filter(c => c != keyCol && newDf.columns.contains(c)).toSeq
    require(cols.nonEmpty, "no common non-key columns to compare")
    require(!cols.contains(keyCol),
      s"compareCols must not repeat the key column $keyCol")
    require(!cols.contains("change_type"),
      "a compared column named change_type would collide with the CDF type column")
    def side(df: DataFrame, payload: String, hc: String) = df.select(col(keyCol),
      struct(cols.map(col): _*).as(payload),
      md5(concat_ws("", cols.map(c =>
        concat(when(col(c).isNull, "0").otherwise("1"),
          md5(coalesce(col(c).cast("string"), lit(""))))): _*)).as(hc))
    val joined = side(oldDf, "__old", "__oh")
      .join(side(newDf, "__new", "__nh"), Seq(keyCol), "full_outer")
    val emptyPair = array().cast(ArrayType(StructType(Seq(
      StructField("p", joined.schema("__old").dataType),
      StructField("t", StringType)))))
    joined.select(col(keyCol), explode(
        when(col("__oh").isNull,
          array(struct(col("__new").as("p"), lit("insert").as("t"))))
        .when(col("__nh").isNull,
          array(struct(col("__old").as("p"), lit("delete").as("t"))))
        .when(col("__oh") =!= col("__nh"),
          array(struct(col("__old").as("p"), lit("update_preimage").as("t")),
            struct(col("__new").as("p"), lit("update_postimage").as("t"))))
        .otherwise(emptyPair)).as("__c"))
      .select(col(keyCol) +: cols.map(c => col(s"__c.p.$c")) :+
        col("__c.t").as("change_type"): _*)
  }
}

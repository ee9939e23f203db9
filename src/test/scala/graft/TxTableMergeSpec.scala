package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.TxTable

/** Conditional MERGE INTO semantics on the ACID table: matched
  * update/delete, not-matched insert, bootstrap on an empty table,
  * cardinality/partition/assignment guards, time travel across the merge
  * commit, and untouched-partition isolation.
  */
class TxTableMergeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val K = Seq("part", "id")

  private def target(rows: (String, Long, Double)*) =
    rows.toDF("part", "id", "value")

  private def readAll(path: String): Set[(String, Long, Double)] =
    TxTable.read(spark, path).get
      .select("part", "id", "value").as[(String, Long, Double)]
      .collect().toSet

  test("mergeInto bootstraps an empty table from the source") {
    val path = tmp("txm-boot") + "/t"
    val v = TxTable.mergeInto(spark, target(("a", 1L, 1.0), ("b", 2L, 2.0)),
      path, partitionCol = "part", keys = K)
    assert(v == 0L)
    assert(readAll(path) == Set(("a", 1L, 1.0), ("b", 2L, 2.0)))
  }

  test("matched update + matched delete + not-matched insert in one commit") {
    val path = tmp("txm-full") + "/t"
    TxTable.mergeInto(spark,
      target(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0)),
      path, partitionCol = "part", keys = K)
    // source: id 1 updated to s.value+t.value, id 2 deleted, id 9 inserted;
    // id 3 has no source row and must ride through the rewrite unchanged
    val src = target(("a", 1L, 5.0), ("a", 2L, 0.0), ("a", 9L, 99.0))
    val v = TxTable.mergeInto(spark, src, path,
      partitionCol = "part", keys = K,
      updateExprs = Map("value" -> (col("t.value") + col("s.value"))),
      deleteCondition = Some(col("s.id") === 2L))
    assert(v == 1L)
    assert(readAll(path) ==
      Set(("a", 1L, 15.0), ("a", 3L, 30.0), ("a", 9L, 99.0)))
    // time travel: the pre-merge version still reads the original rows
    assert(TxTable.readAt(spark, path, 0L).get
      .select("part", "id", "value").as[(String, Long, Double)]
      .collect().toSet ==
      Set(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0)))
  }

  test("partitions absent from the source are not rewritten") {
    val path = tmp("txm-iso") + "/t"
    TxTable.mergeInto(spark, target(("a", 1L, 1.0), ("b", 2L, 2.0)),
      path, partitionCol = "part", keys = K)
    val filesB = TxTable.snapshot(path).filesByPartition("b")
    TxTable.mergeInto(spark, target(("a", 1L, 7.0)), path,
      partitionCol = "part", keys = K,
      updateExprs = Map("value" -> col("s.value")))
    // b's data directory is untouched byte-for-byte (same file list)
    assert(TxTable.snapshot(path).filesByPartition("b") == filesB)
    assert(readAll(path) == Set(("a", 1L, 7.0), ("b", 2L, 2.0)))
  }

  test("absolute-assignment merge is idempotent on re-issue") {
    val path = tmp("txm-idem") + "/t"
    TxTable.mergeInto(spark, target(("a", 1L, 1.0)), path,
      partitionCol = "part", keys = K)
    val src = target(("a", 1L, 42.0), ("a", 2L, 2.0))
    def merge() = TxTable.mergeInto(spark, src, path,
      partitionCol = "part", keys = K,
      updateExprs = Map("value" -> col("s.value")))
    merge(); merge()
    assert(readAll(path) == Set(("a", 1L, 42.0), ("a", 2L, 2.0)))
  }

  test("insertNotMatched=false restricts the merge to matched rows") {
    val path = tmp("txm-upd") + "/t"
    TxTable.mergeInto(spark, target(("a", 1L, 1.0)), path,
      partitionCol = "part", keys = K)
    TxTable.mergeInto(spark, target(("a", 1L, 5.0), ("a", 8L, 8.0)), path,
      partitionCol = "part", keys = K,
      updateExprs = Map("value" -> col("s.value")),
      insertNotMatched = false)
    assert(readAll(path) == Set(("a", 1L, 5.0)))
  }

  test("guards: duplicate source keys, null partition, key assignment, empty source") {
    val path = tmp("txm-guard") + "/t"
    TxTable.mergeInto(spark, target(("a", 1L, 1.0)), path,
      partitionCol = "part", keys = K)
    val dup = intercept[IllegalArgumentException] {
      TxTable.mergeInto(spark, target(("a", 1L, 1.0), ("a", 1L, 2.0)), path,
        partitionCol = "part", keys = K)
    }
    assert(dup.getMessage.contains("cardinality"))
    val nullPart = intercept[IllegalArgumentException] {
      TxTable.mergeInto(spark,
        Seq((Option.empty[String], 5L, 5.0)).toDF("part", "id", "value"),
        path, partitionCol = "part", keys = K)
    }
    assert(nullPart.getMessage.contains("null part"))
    val keyAssign = intercept[IllegalArgumentException] {
      TxTable.mergeInto(spark, target(("a", 1L, 1.0)), path,
        partitionCol = "part", keys = K,
        updateExprs = Map("id" -> lit(9L)))
    }
    assert(keyAssign.getMessage.contains("re-keying"))
    // empty source: no commit, version unchanged
    val before = TxTable.snapshot(path).version
    assert(TxTable.mergeInto(spark, target(), path,
      partitionCol = "part", keys = K) == before)
  }

  test("changeDataFeed across a merge commit reports update, delete and insert") {
    val path = tmp("txm-cdf") + "/t"
    TxTable.mergeInto(spark, target(("a", 1L, 10.0), ("a", 2L, 20.0)),
      path, partitionCol = "part", keys = K)
    val v = TxTable.mergeInto(spark,
      target(("a", 1L, 11.0), ("a", 2L, 0.0), ("a", 3L, 30.0)), path,
      partitionCol = "part", keys = K,
      updateExprs = Map("value" -> col("s.value")),
      deleteCondition = Some(col("s.id") === 2L))
    val cdf = TxTable.changeDataFeed(spark, path, v - 1, v,
        keyCol = "id", compareCols = Seq("value"),
        keys = K, order = Seq("value"))
      .select("id", "change_type", "value")
      .as[(Long, String, Double)].collect().toSet
    // update carries pre+post images; delete the pre image; insert the post
    assert(cdf == Set(
      (1L, "update_preimage", 10.0), (1L, "update_postimage", 11.0),
      (2L, "delete", 20.0), (3L, "insert", 30.0)))
  }

  test("mergeSchema widens the table; untouched partitions read nulls via the declared schema") {
    val path = tmp("txm-evo") + "/t"
    TxTable.mergeInto(spark, target(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 3L, 3.0)),
      path, partitionCol = "part", keys = K)
    // evolving merge touches ONLY partition a with a new score column
    val src = Seq(("a", 1L, 1.0, 0.9), ("a", 9L, 9.0, 0.5))
      .toDF("part", "id", "value", "score")
    TxTable.mergeInto(spark, src, path, partitionCol = "part", keys = K,
      mergeSchema = true)
    val out = TxTable.read(spark, path).get
    assert(out.columns.toSeq == Seq("part", "id", "value", "score"))
    val got = out.select("part", "id", "value", "score")
      .as[(String, Long, Double, Option[Double])].collect().toSet
    assert(got == Set(
      ("a", 1L, 1.0, Some(0.9)),   // matched: new col fills from source
      ("a", 2L, 2.0, None),        // pre-evolution row in a rewritten partition
      ("a", 9L, 9.0, Some(0.5)),   // insert carries the new col
      ("b", 3L, 3.0, None)))       // partition b's FILE was never rewritten
    // partition b's file is really the original (declared-schema read,
    // not a rewrite)
    assert(TxTable.snapshot(path).filesByPartition("b").nonEmpty)
    // a later NON-evolving merge sees the widened target schema
    TxTable.mergeInto(spark,
      Seq(("b", 3L, 30.0, 0.1)).toDF("part", "id", "value", "score"),
      path, partitionCol = "part", keys = K,
      updateExprs = Map("value" -> col("s.value"), "score" -> col("s.score")))
    assert(TxTable.read(spark, path).get.filter(col("id") === 3L)
      .select("value", "score").as[(Double, Option[Double])].collect().head ==
      ((30.0, Some(0.1))))
  }

  test("mergeSchema evolution composes with delta dirs and readMerged") {
    val path = tmp("txm-evo2") + "/t"
    TxTable.mergeInto(spark, target(("a", 1L, 1.0)), path,
      partitionCol = "part", keys = K)
    TxTable.mergeInto(spark,
      Seq(("a", 1L, 1.0, 7.0)).toDF("part", "id", "value", "score"),
      path, partitionCol = "part", keys = K, mergeSchema = true)
    // an LSM delta append AFTER evolution: new dir has the new schema;
    // the merged view folds both uniformly under the declared schema
    TxTable.upsertDelta(spark,
      Seq(("a", 2L, 2.0, 8.0)).toDF("part", "id", "value", "score"),
      path, partitionCol = "part", keys = K, order = Seq("value"))
    val merged = TxTable.readMerged(spark, path, keys = K, order = Seq("value")).get
      .select("id", "value", "score").as[(Long, Double, Option[Double])]
      .collect().toSet
    assert(merged == Set((1L, 1.0, Some(7.0)), (2L, 2.0, Some(8.0))))
  }

  test("unknown updateExprs targets are refused without mergeSchema") {
    val path = tmp("txm-evo3") + "/t"
    TxTable.mergeInto(spark, target(("a", 1L, 1.0)), path,
      partitionCol = "part", keys = K)
    val e = intercept[IllegalArgumentException] {
      TxTable.mergeInto(spark, target(("a", 1L, 2.0)), path,
        partitionCol = "part", keys = K,
        updateExprs = Map("nope" -> lit(1)))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("extra source-only columns feed expressions without entering the schema") {
    val path = tmp("txm-extra") + "/t"
    TxTable.mergeInto(spark, target(("a", 1L, 10.0)), path,
      partitionCol = "part", keys = K)
    val src = Seq(("a", 1L, 0.0, 3.5), ("a", 2L, 7.0, 0.0))
      .toDF("part", "id", "value", "delta")
    TxTable.mergeInto(spark, src, path, partitionCol = "part", keys = K,
      updateExprs = Map("value" -> (col("t.value") * col("s.delta"))))
    val out = TxTable.read(spark, path).get
    assert(out.columns.toSeq == Seq("part", "id", "value"))
    assert(readAll(path) == Set(("a", 1L, 35.0), ("a", 2L, 7.0)))
  }

  test("NULL delete condition keeps the row (MERGE deletes only on TRUE)") {
    val path = tmp("txm-nulldel") + "/t"
    TxTable.mergeInto(spark, target(("a", 1L, 1.0), ("a", 2L, 2.0)),
      path, partitionCol = "part", keys = K)
    // flag is NULL for id=1's source row, TRUE for id=2's: SQL MERGE
    // semantics delete id=2 only — a NULL predicate must not delete
    val src = Seq(("a", 1L, 10.0, null.asInstanceOf[java.lang.Boolean]),
        ("a", 2L, 20.0, java.lang.Boolean.TRUE))
      .toDF("part", "id", "value", "flag")
    TxTable.mergeInto(spark, src, path, partitionCol = "part", keys = K,
      updateExprs = Map("value" -> col("s.value")),
      deleteCondition = Some(col("s.flag")))
    assert(readAll(path) == Set(("a", 1L, 10.0)))
  }

  test("mergeLatest on an evolved table keeps wider columns; narrower upsert unsets only its own rows") {
    val path = tmp("txm-evolat") + "/t"
    TxTable.mergeInto(spark, target(("a", 1L, 1.0), ("a", 2L, 2.0)),
      path, partitionCol = "part", keys = K)
    TxTable.mergeInto(spark,
      Seq(("a", 1L, 1.0, 0.9), ("a", 2L, 2.0, 0.8))
        .toDF("part", "id", "value", "score"),
      path, partitionCol = "part", keys = K, mergeSchema = true,
      updateExprs = Map("value" -> col("s.value")))
    // a narrower last-value batch updates id=1 and inserts id=3: id=2's
    // score must SURVIVE the partition rewrite; id=1's becomes unset
    // (the upserted row replaces the old one entirely)
    TxTable.mergeLatest(spark,
      Seq(("a", 1L, 100.0), ("a", 3L, 3.0)).toDF("part", "id", "value"),
      path, partitionCol = "part", keys = K, order = Seq("value"))
    val got = TxTable.read(spark, path).get
      .select("part", "id", "value", "score")
      .as[(String, Long, Double, Option[Double])].collect().toSet
    assert(got == Set(
      ("a", 1L, 100.0, None),
      ("a", 2L, 2.0, Some(0.8)),
      ("a", 3L, 3.0, None)))
    // a batch column the table does not declare is refused loudly
    val e = intercept[IllegalArgumentException] {
      TxTable.mergeLatest(spark,
        Seq(("a", 4L, 4.0, "x")).toDF("part", "id", "value", "mystery"),
        path, partitionCol = "part", keys = K, order = Seq("value"))
    }
    assert(e.getMessage.contains("mystery"))
  }
}

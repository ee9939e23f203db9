package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.TxTable

/** RESTORE on the ACID table: rollback-as-commit semantics, time travel
  * across and onto the restore, vacuum interplay in both directions,
  * LSM-delta states, and the dangling-ref refusal.
  */
class TxTableRestoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private val K = Seq("part", "id")

  private def merge(path: String, rows: (String, Long, Double)*): Long =
    TxTable.mergeLatest(spark, rows.toDF("part", "id", "value"), path,
      partitionCol = "part", keys = K, order = Seq("value"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Double)] =
    df.select("part", "id", "value").as[(String, Long, Double)].collect().toSet

  test("restore rolls back as a new commit; history on both sides survives") {
    val path = tmp("txr-basic")
    merge(path, ("a", 1L, 1.0))                    // v0
    merge(path, ("a", 1L, 2.0), ("a", 2L, 5.0))    // v1
    merge(path, ("b", 3L, 7.0))                    // v2
    val v = TxTable.restore(path, 0L)
    assert(v == 3L)
    assert(rows(TxTable.read(spark, path).get) == Set(("a", 1L, 1.0)))
    // the pre-restore state is still one hop of time travel away
    assert(rows(TxTable.readAt(spark, path, 2L).get) ==
      Set(("a", 1L, 2.0), ("a", 2L, 5.0), ("b", 3L, 7.0)))
    // and the restore itself is a time-travelable version
    assert(rows(TxTable.readAt(spark, path, 3L).get) == Set(("a", 1L, 1.0)))
    // writes continue on top of the restored state
    merge(path, ("a", 9L, 9.0))
    assert(rows(TxTable.read(spark, path).get) ==
      Set(("a", 1L, 1.0), ("a", 9L, 9.0)))
  }

  test("restored refs are live again: vacuum reclaims only the rolled-back state") {
    val path = tmp("txr-vac")
    merge(path, ("a", 1L, 1.0))                    // v0 — file F0
    merge(path, ("a", 1L, 2.0))                    // v1 — file F1 (F0 orphaned)
    TxTable.restore(path, 0L)                      // v2 — F0 live again
    val deleted = TxTable.vacuum(path, minAgeMs = 0L)
    assert(deleted.nonEmpty, "v1's rewrite must be reclaimable")
    assert(rows(TxTable.read(spark, path).get) == Set(("a", 1L, 1.0)),
      "vacuum after restore must not touch the restored files")
  }

  test("restore to a vacuumed version is refused loudly") {
    val path = tmp("txr-gone")
    merge(path, ("a", 1L, 1.0))                    // v0
    merge(path, ("a", 1L, 2.0))                    // v1 rewrites partition a
    val gone = TxTable.vacuum(path, minAgeMs = 0L) // reclaims v0's file
    assert(gone.nonEmpty)
    val e = intercept[IllegalArgumentException] {
      TxTable.restore(path, 0L)
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("restore reproduces an LSM delta state exactly") {
    val path = tmp("txr-lsm")
    def delta(rows: (String, Long, Double)*): Long =
      TxTable.upsertDelta(spark, rows.toDF("part", "id", "value"), path,
        partitionCol = "part", keys = K, order = Seq("value"))
    delta(("a", 1L, 1.0))                          // v0
    delta(("a", 1L, 3.0), ("a", 2L, 4.0))          // v1 (overlapping delta)
    delta(("a", 2L, 9.0))                          // v2
    val mid = rows(TxTable.readMergedAt(spark, path, 1L,
      keys = K, order = Seq("value")).get)
    TxTable.restore(path, 1L)
    assert(rows(TxTable.readMerged(spark, path,
      keys = K, order = Seq("value")).get) == mid)
  }

  test("restore to the current version is a no-op") {
    val path = tmp("txr-noop")
    merge(path, ("a", 1L, 1.0))
    assert(TxTable.restore(path, 0L) == 0L)
    assert(TxTable.snapshot(path).version == 0L)
  }

  test("TIMESTAMP AS OF: boundary resolution, pre-history refusal, readAsOf content") {
    val path = tmp("txr-asof")
    merge(path, ("a", 1L, 1.0))                    // v0
    merge(path, ("a", 1L, 2.0))                    // v1
    merge(path, ("a", 2L, 5.0))                    // v2
    TxTable.stampCommitTime(path, 0L, 1000L)
    TxTable.stampCommitTime(path, 1L, 2000L)
    TxTable.stampCommitTime(path, 2L, 3000L)
    assert(TxTable.versionAsOf(path, 1000L) == 0L) // at-boundary: inclusive
    assert(TxTable.versionAsOf(path, 1999L) == 0L)
    assert(TxTable.versionAsOf(path, 2000L) == 1L)
    assert(TxTable.versionAsOf(path, Long.MaxValue) == 2L)
    assert(rows(TxTable.readAsOf(spark, path, 2500L).get) == Set(("a", 1L, 2.0)))
    val e = intercept[IllegalStateException](TxTable.versionAsOf(path, 999L))
    assert(e.getMessage.contains("predates"), e.getMessage)
    intercept[IllegalStateException](TxTable.stampCommitTime(path, 9L, 0L))
  }

  test("TIMESTAMP AS OF: regressed mtimes are monotonically adjusted (Delta's rule)") {
    val path = tmp("txr-asof-mono")
    merge(path, ("a", 1L, 1.0))                    // v0
    merge(path, ("a", 1L, 2.0))                    // v1
    merge(path, ("a", 1L, 3.0))                    // v2
    TxTable.stampCommitTime(path, 0L, 5000L)
    TxTable.stampCommitTime(path, 1L, 500L)  // clock went BACKWARD
    TxTable.stampCommitTime(path, 2L, 500L)  // and stayed there
    // adjusted: v0=5000, v1=5001, v2=5002 — order preserved, no overlap
    assert(TxTable.commitTimestamps(path) ==
      Seq(0L -> 5000L, 1L -> 5001L, 2L -> 5002L))
    assert(TxTable.versionAsOf(path, 5000L) == 0L)
    assert(TxTable.versionAsOf(path, 5001L) == 1L)
    assert(TxTable.versionAsOf(path, 6000L) == 2L)
  }
}

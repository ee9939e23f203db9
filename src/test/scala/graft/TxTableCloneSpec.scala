package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.TxTable

/** Zero-copy shallow clone: reads equal the source, divergence is
  * copy-on-write at partition granularity, stats carry over, and vacuum
  * on the clone never touches source files.
  */
class TxTableCloneSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val K = Seq("part", "id")

  private def mkSource(): String = {
    val path = tmp("txc-src") + "/t"
    TxTable.mergeInto(spark,
      Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 3L, 3.0))
        .toDF("part", "id", "value"),
      path, partitionCol = "part", keys = K)
    path
  }

  private def rows(path: String): Set[(String, Long, Double)] =
    TxTable.read(spark, path).get
      .select("part", "id", "value").as[(String, Long, Double)]
      .collect().toSet

  test("clone reads the source's rows without copying any data") {
    val src = mkSource()
    val dst = tmp("txc-dst") + "/t"
    assert(TxTable.shallowClone(src, dst) == 0L)
    assert(rows(dst) == rows(src))
    // zero copy: the clone has NO local data directory
    assert(!new java.io.File(dst, "data").exists())
    // and its references point into the source
    assert(TxTable.snapshot(dst).allFiles.forall(_.startsWith("/")))
  }

  test("writes to the clone are copy-on-write per partition; source untouched") {
    val src = mkSource()
    val dst = tmp("txc-cow") + "/t"
    TxTable.shallowClone(src, dst)
    val before = rows(src)
    TxTable.mergeInto(spark, Seq(("a", 1L, 99.0)).toDF("part", "id", "value"),
      dst, partitionCol = "part", keys = K,
      updateExprs = Map("value" -> col("s.value")))
    assert(rows(dst) == Set(("a", 1L, 99.0), ("a", 2L, 2.0), ("b", 3L, 3.0)))
    assert(rows(src) == before, "source rows changed through the clone")
    // the rewritten partition is now clone-local; the untouched one still
    // borrows the source file
    val snap = TxTable.snapshot(dst)
    assert(snap.filesByPartition("a").forall(_.startsWith("data/")))
    assert(snap.filesByPartition("b").forall(_.startsWith("/")))
  }

  test("vacuum on the clone deletes no source files") {
    val src = mkSource()
    val dst = tmp("txc-vac") + "/t"
    TxTable.shallowClone(src, dst)
    // rewrite partition a so the clone has one local dir + one borrowed ref
    TxTable.mergeInto(spark, Seq(("a", 9L, 9.0)).toDF("part", "id", "value"),
      dst, partitionCol = "part", keys = K)
    val gone = TxTable.vacuum(dst, minAgeMs = 0L)
    assert(gone.forall(!_.startsWith("/")), s"vacuum crossed into source: $gone")
    assert(rows(src).size == 3, "source lost rows to a clone vacuum")
  }

  test("per-file stats carry into the clone (pruned read still skips)") {
    val src = mkSource()
    val dst = tmp("txc-stats") + "/t"
    TxTable.shallowClone(src, dst)
    val snap = TxTable.snapshot(dst)
    // both partitions' borrowed files carry decodable id-range stats
    assert(snap.allFiles.forall(f => snap.statsOf(f).contains("id")))
    val pruned = TxTable.read(spark, dst,
      pruneBy = Seq(TxTable.ColRange("id", Some(3L), Some(3L)))).get
    assert(pruned.select("id").as[Long].collect().toSet == Set(3L))
  }

  test("clone refuses an existing destination and an empty source") {
    val src = mkSource()
    val dst = tmp("txc-guard") + "/t"
    TxTable.shallowClone(src, dst)
    val dup = intercept[IllegalArgumentException] {
      TxTable.shallowClone(src, dst)
    }
    assert(dup.getMessage.contains("already has a table log"))
  }

  test("clone of a clone still resolves to the original files") {
    val src = mkSource()
    val mid = tmp("txc-mid") + "/t"
    val dst = tmp("txc-deep") + "/t"
    TxTable.shallowClone(src, mid)
    // mid's refs are already absolute — cloning it must NOT re-prefix
    // them (a "<mid>//<src>/..." path would break every read of dst)
    TxTable.shallowClone(mid, dst)
    assert(rows(dst) == rows(src))
    assert(TxTable.snapshot(dst).allFiles ==
      TxTable.snapshot(mid).allFiles)
  }
}

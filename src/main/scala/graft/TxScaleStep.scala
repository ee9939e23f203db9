package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.TxTable

/** TxTable-family scale-step (VERDICT r16 task #6): the q283-shape
  * audit and the CDF-stream drain, measured at 10× the commit volume
  * the spec battery pins (1,200 upserts vs TxTableKeyHistorySpec's
  * 120), on a table maintained like a real one (compact every 10
  * upserts — the interleaved-compaction arm's shape). Records, per
  * phase: wall clock, per-version rates, and the METADATA files-opened
  * audit (active-file count of every boundary state the full-span
  * audit materializes — the quantity that would expose a quadratic).
  * Emits one JSON line on stdout and appends it to
  * SCALESTEP_TXTABLE.json; run it alone (never beside a bench).
  *
  * Usage: runMain graft.TxScaleStep [nCommits] [compactEvery]
  */
object TxScaleStep {
  def main(args: Array[String]): Unit = {
    val nCommits = args.lift(0).map(_.toInt).getOrElse(1200)
    val compactEvery = args.lift(1).map(_.toInt).getOrElse(10)
    // optional 3rd arg: an EXISTING table from a prior run — skips the
    // ingest phase so keyHistory/CDF re-measure without rebuilding
    val reuse = args.lift(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val K = Seq("serverName", "tag")
    val O = Seq("seq")
    val path = reuse.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-txscale-").toString)

    def now() = System.nanoTime()
    def secs(t0: Long) = (now() - t0) / 1e9

    // Phase A — ingest: nCommits single-key upserts, compaction every
    // compactEvery (the real-table maintenance shape; the uncompacted
    // shape's O(v) dirs per state is the spec-pinned anti-arm)
    val tIngest = now()
    if (reuse.isEmpty) (0L until nCommits.toLong).foreach { v =>
      TxTable.upsertDelta(spark,
        Seq(("srv-0", "tag-0", v.toDouble, v))
          .toDF("serverName", "tag", "doubleValue", "seq"),
        path, "serverName", K, O)
      if ((v + 1) % compactEvery == 0) { TxTable.compact(spark, path, keys = K, order = O); () }
    }
    val ingestSec = secs(tIngest)
    val head = TxTable.snapshot(path).version

    // Phase B — files-opened audit, metadata-only: active files of every
    // boundary state. A quadratic here is the scale-killer keyHistory
    // would pay; compaction must cap every state at
    // 1 compacted + <= compactEvery delta dirs.
    val tAudit = now()
    val perState = (0L to head).map(v =>
      TxTable.snapshotAt(path, v).filesByPartition.values.map(_.size).sum)
    val auditSec = secs(tAudit)

    // Phase C — the q283 shape: full-span keyHistory over every version
    val tKh = now()
    val kh = TxTable.keyHistory(spark, path, "tag", col("tag") === "tag-0",
      compareCols = Seq("doubleValue"), keys = K, order = O,
      maxVersions = (head + 1).toInt)
    val khBuildSec = secs(tKh)
    val tKhExec = now()
    val khRows = kh.count()
    val khExecSec = secs(tKhExec)
    require(khRows == 1L + (nCommits - 1).toLong * 2L,
      s"keyHistory trajectory wrong: $khRows rows for $nCommits commits")

    // Phase D — CDF-stream drain of the full history, admission-controlled
    val tCdf = now()
    val rows = spark.sparkContext.longAccumulator("cdfRows")
    val q = spark.readStream.format("txtable-cdf")
      .option("path", path)
      .option("keyCol", "tag")
      .option("keys", K.mkString(",")).option("order", O.mkString(","))
      .option("compareCols", "doubleValue")
      .option("startingVersion", 0)
      .option("maxVersionsPerTrigger", 100)
      .load()
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        rows.add(b.count()); ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-txscale-ckpt").toString)
      .start()
    q.awaitTermination()
    val cdfSec = secs(tCdf)
    val triggers = q.recentProgress.length

    val json =
      s"""{"n_commits":$nCommits,"compact_every":$compactEvery,"head":$head,""" +
      s""""ingest_sec":${f"$ingestSec%.1f"},"commits_per_sec":${f"${nCommits / ingestSec}%.1f"},""" +
      s""""state_files_worst":${perState.max},"state_files_sum":${perState.sum},""" +
      s""""state_audit_sec":${f"$auditSec%.1f"},""" +
      s""""keyhistory_build_sec":${f"$khBuildSec%.1f"},"keyhistory_exec_sec":${f"$khExecSec%.1f"},""" +
      s""""keyhistory_rows":$khRows,""" +
      s""""cdf_drain_sec":${f"$cdfSec%.1f"},"cdf_rows":${rows.value},"cdf_triggers":$triggers,""" +
      s""""cdf_versions_per_sec":${f"${(head + 1) / cdfSec}%.1f"}}"""
    println(json)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("SCALESTEP_TXTABLE.json"), json + "\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    catch { case t: Throwable => System.err.println(s"txscale: $t") }
    spark.stop()
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}
import org.apache.spark.sql.Row

import graft.functions.Normalize
import graft.model.{OpcServer, OpcValue}
import graft.operators.LastValue

/** Structured-Streaming port of the reference's runtime topology
  * (/root/reference/OPC2MongoDB/Program.cs):
  *
  *   - one OS thread per OPC server (Program.cs:1300-1312)
  *       → one streaming query per server, each with its own
  *         `Trigger.ProcessingTime(read_period)` (Program.cs:724's sleep);
  *   - ConcurrentQueue handoff + single Mongo writer (Program.cs:44,1146)
  *       → checkpointed micro-batches + an idempotent `foreachBatch`
  *         last-value merge (the ReplaceOneAsync upsert of
  *         Program.cs:1179-1182);
  *   - arrival-order "latest" → event-order latest by
  *         (serverTimestamp, sourceTimestamp): deterministic and
  *         out-of-order safe (documented deviation, SURVEY.md §2.9).
  *
  * 100 TB posture: the merge keys on `tag`, so each micro-batch shuffles
  * at most one row per (tag × input partition) thanks to partial
  * aggregation; state (current-value table) is O(distinct tags), not
  * O(events). The stateful variant keeps the same bound via
  * `flatMapGroupsWithState`.
  */
object StreamingPipeline extends Serializable {

  /** Normalize a stream of raw readings (FIXTURES.md A1) into OpcValue
    * rows. Pure projection — works identically on batch and streaming
    * DataFrames.
    */
  def normalizeStream(raw: DataFrame): DataFrame = Normalize.normalize(raw)

  /** Current-value table merge: upsert the batch's latest row per tag into
    * the parquet current-value table at `tablePath`. Idempotent (re-running
    * a batch converges to the same table), which is what makes micro-batch
    * retries exactly-once end-to-end.
    *
    * The table is partitioned by `serverName` (the reference's
    * collection-per-server, Program.cs:1159), and a batch only ever
    * rewrites the partitions of servers it contains: the read side is
    * partition-pruned to those servers, and the swap moves only their
    * partition directories — untouched servers' files are never read nor
    * written. With S servers and one active, a merge costs O(tags of the
    * active server), not O(all tags): the whole-table rewrite this
    * replaces would not survive 1000 servers × millions of tags. (A table
    * format with ACID row-level merge — Delta/Iceberg — replaces the
    * directory swap on a real deployment; the partition-pruned shape is
    * the same.)
    */
  def mergeLatest(spark: SparkSession, batch: DataFrame, tablePath: String): Unit = {
    val keys = Seq("serverName", "tag")
    val order = Seq("serverTimestamp", "sourceTimestamp")
    val batchLatest = LastValue.latestPerKey(batch, keys, order)
    val root = new java.io.File(tablePath)
    if (!root.exists()) {
      batchLatest.write.mode("overwrite").partitionBy("serverName").parquet(tablePath)
    } else {
      val affected = batchLatest.select("serverName").distinct()
        .collect().map(_.getString(0)).toSeq
      // partition-pruned: only the affected servers' files are read
      val current = spark.read.parquet(tablePath)
        // partition-col type inference could widen a numeric-looking name
        .withColumn("serverName", col("serverName").cast("string"))
        .filter(col("serverName").isin(affected: _*))
        .select(batchLatest.columns.toIndexedSeq.map(col): _*)
      val merged = LastValue.latestPerKey(
        current.unionByName(batchLatest), keys, order)
      // two-phase write: parquet can't overwrite the path it is reading;
      // stage the affected partitions, then swap their directories only
      val staged = tablePath + ".staged"
      deleteRec(new java.io.File(staged))
      merged.write.mode("overwrite").partitionBy("serverName").parquet(staged)
      val stagedParts = Option(new java.io.File(staged).listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.startsWith("serverName="))
      stagedParts.foreach { src =>
        val dst = new java.io.File(root, src.getName)
        val old = new java.io.File(root, src.getName + ".old")
        deleteRec(old)
        if (dst.exists()) moveDir(dst, old)
        moveDir(src, dst)
        deleteRec(old)
      }
      deleteRec(new java.io.File(staged))
    }
  }

  /** Directory swap step that THROWS on failure (unlike File.renameTo's
    * silent boolean): a failed rename must fail the micro-batch so Spark
    * retries it — the merge is idempotent — instead of silently dropping
    * or duplicating a server partition.
    */
  private def moveDir(src: java.io.File, dst: java.io.File): Unit =
    java.nio.file.Files.move(src.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    if (f.exists()) f.delete()
  }

  /** Wire a normalized stream into the current-value sink, optionally also
    * appending every reading to a history table — the reference's
    * commented-out InsertOneAsync path (Program.cs:1174-1176), enabled here
    * because at scale the history table IS the analytics input. History is
    * partitioned by serverName (the reference's collection-per-server,
    * Program.cs:1159): queries for one server prune to its partition.
    */
  def currentValueSink(
      normalized: DataFrame,
      tablePath: String,
      checkpointDir: String,
      trigger: Trigger,
      historyPath: Option[String] = None): DataStreamWriter[Row] =
    normalized.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // batch reused twice (history append + merge): cache to avoid
        // recomputing the source read + normalization
        if (historyPath.isDefined) batch.persist()
        historyPath.foreach { h =>
          batch.write.mode("append").partitionBy("serverName").parquet(h)
        }
        mergeLatest(batch.sparkSession, batch, tablePath)
        if (historyPath.isDefined) batch.unpersist()
        ()
      }

  /** Compact the history table's small files, per server partition. Every
    * micro-batch appends at least one file per touched partition — at a
    * 10 s cadence that is 8,640 files/server/day, and file-count, not
    * data volume, is what kills scans and listings at scale (the classic
    * streaming-sink small-files problem). Partitions with more than
    * `maxFiles` parquet files are rewritten into
    * ceil(rows / recordsPerFile) files and swapped in with the same
    * stage-then-rename used by [[mergeLatest]]; partitions at or under
    * the threshold are untouched (never read, never written). Run it as a
    * maintenance job between batches; on a table format (Delta/Iceberg)
    * OPTIMIZE/rewrite-data-files replaces this.
    *
    * @return (partition, filesBefore, filesAfter) for each rewritten one
    */
  def compactHistory(
      spark: SparkSession,
      historyPath: String,
      maxFiles: Int = 8,
      recordsPerFile: Long = 4L * 1024 * 1024): Seq[(String, Int, Int)] = {
    val root = new java.io.File(historyPath)
    val parts = Option(root.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("serverName="))
    parts.flatMap { dir =>
      def parquetFiles = Option(dir.listFiles()).toSeq.flatten
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      val before = parquetFiles.size
      if (before <= maxFiles) None
      else {
        val df = spark.read.parquet(dir.getPath)
        val n = df.count()
        val target = math.max(1, math.ceil(n.toDouble / recordsPerFile).toInt)
        // "." prefix: FileIndex ignores dot-dirs, so the staging dir is
        // invisible to concurrent readers of the table root
        val staged = new java.io.File(root, "." + dir.getName + ".compact")
        deleteRec(staged)
        df.repartition(target).write.mode("overwrite").parquet(staged.getPath)
        val old = new java.io.File(root, "." + dir.getName + ".old")
        deleteRec(old)
        moveDir(dir, old)
        moveDir(staged, dir)
        deleteRec(old)
        Some((dir.getName, before, parquetFiles.size))
      }
    }
  }

  /** Per-server query fan-out: one `currentValueSink` query per configured
    * server, each at its own poll cadence — the Spark analog of the
    * reference's thread-per-server Main (Program.cs:1300-1312). The caller
    * provides a source stream per server (real OPC connector or test
    * MemoryStream).
    */
  def startServerQueries(
      servers: Seq[OpcServer],
      sourceFor: OpcServer => DataFrame,
      outDir: String,
      checkpointRoot: String): Seq[org.apache.spark.sql.streaming.StreamingQuery] =
    servers.map { srv =>
      currentValueSink(
        normalizeStream(sourceFor(srv)),
        s"$outDir/${srv.serverName}",
        s"$checkpointRoot/${srv.serverName}",
        Trigger.ProcessingTime(srv.readPeriodSec * 1000L))
        .queryName(s"graft-${srv.serverName}")
        .start()
    }

  /** Stateful last-value keeper: emits, for every micro-batch, the keys
    * whose current value changed. State per key is exactly one OpcValue —
    * the `flatMapGroupsWithState` twin of the foreachBatch merge, for
    * consumers that want a changelog stream instead of a table.
    */
  /** Event-order "newer" for OpcValue rows: (serverTimestamp,
    * sourceTimestamp) lexicographic — shared by both stateful variants.
    */
  private[streaming] def newerValue(a: OpcValue, b: OpcValue): Boolean = {
    // full-precision comparison (getNanos carries the sub-millisecond
    // fraction getTime drops), matching the batch twin's column order
    def cmpTs(x: java.sql.Timestamp, y: java.sql.Timestamp): Int = {
      val byMs = java.lang.Long.compare(x.getTime, y.getTime)
      if (byMs != 0) byMs else java.lang.Integer.compare(x.getNanos, y.getNanos)
    }
    val bySrv = cmpTs(a.serverTimestamp, b.serverTimestamp)
    if (bySrv != 0) bySrv > 0
    else cmpTs(a.sourceTimestamp, b.sourceTimestamp) > 0
  }

  def latestPerTagStateful(normalized: DataFrame): DataFrame = {
    import normalized.sparkSession.implicits._
    def newer(a: OpcValue, b: OpcValue): Boolean = newerValue(a, b)

    normalized.as[OpcValue]
      .groupByKey(v => (v.serverName, v.tag))
      .flatMapGroupsWithState[OpcValue, OpcValue](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (_, values, state: GroupState[OpcValue]) =>
          val incoming = values.reduceOption((a, b) => if (newer(a, b)) a else b)
          (incoming, state.getOption) match {
            case (Some(in), Some(cur)) if newer(in, cur) =>
              state.update(in); Iterator.single(in)
            case (Some(in), None) =>
              state.update(in); Iterator.single(in)
            case _ => Iterator.empty
          }
      }.toDF()
  }

  /** [[latestPerTagStateful]] re-expressed on `transformWithState` — the
    * Spark 4 arbitrary-state API that supersedes flatMapGroupsWithState:
    * typed named state cells, explicit time modes, per-cell TTL, state
    * schema evolution. Same changelog semantics as the fMGWS twin; state
    * remains one OpcValue per key. Requires the RocksDB state store
    * provider (`spark.sql.streaming.stateStore.providerClass`), which is
    * also the provider you'd run at scale — changelog checkpointing and
    * out-of-heap state.
    */
  def latestPerTagTws(normalized: DataFrame): DataFrame = {
    import normalized.sparkSession.implicits._
    normalized.as[OpcValue]
      .groupByKey(v => (v.serverName, v.tag))
      .transformWithState(new LatestValueProcessor, TimeMode.None(), OutputMode.Update())
      .toDF()
  }

  /** Stream–static enrichment: attach tag-catalog metadata to every
    * in-flight reading — the Spark-native form of the reference holding an
    * `OPC_entry` inside each value (Program.cs:149,466). The catalog is a
    * broadcast-joined static DataFrame: no stream state, no shuffle of the
    * stream side.
    */
  def enrichWithCatalog(
      normalized: DataFrame,
      catalog: DataFrame,
      keys: Seq[String] = Seq("serverName", "tag")): DataFrame =
    normalized.join(broadcast(catalog), keys, "left_outer")

  /** Watermarked tumbling-window stats per tag over event time — the
    * windowed-aggregation surface (SURVEY.md §2.9) the reference lacks
    * entirely (its only time bucket is the poll cadence, Program.cs:724).
    */
  def windowedStats(normalized: DataFrame, watermark: String, windowLen: String): DataFrame =
    normalized
      .withWatermark("sourceTimestamp", watermark)
      .groupBy(window(col("sourceTimestamp"), windowLen),
        col("serverName"), col("tag"))
      .agg(
        count(lit(1)).as("n"),
        avg("doubleValue").as("avg_value"),
        min("doubleValue").as("min_value"),
        max("doubleValue").as("max_value"),
        max_by(col("doubleValue"), col("sourceTimestamp")).as("last_value"))

  /** Streaming dedup of the reference's poll/subscribe double-read (a tag
    * polled while also subscribed is read twice, Program.cs:448) within the
    * watermark horizon.
    */
  def dedupReadings(normalized: DataFrame, watermark: String): DataFrame =
    normalized
      .withWatermark("sourceTimestamp", watermark)
      .dropDuplicatesWithinWatermark("serverName", "tag", "sourceTimestamp")

  /** Streaming z-score anomaly detector: per (serverName, tag), keep
    * running count/mean/variance via Welford's online update — O(1) state
    * per key, the streaming twin of the batch detector (q74) — and emit
    * every reading whose z-score against the PRIOR state exceeds
    * `zThreshold` (prior, so a spike cannot inflate its own baseline away).
    * Nothing is emitted until a key has `minSamples` history. Within a
    * micro-batch, readings apply in event order, so results do not depend
    * on partition arrival order.
    */
  def anomalyStream(
      normalized: DataFrame,
      zThreshold: Double = 3.0,
      minSamples: Int = 10): DataFrame = {
    import normalized.sparkSession.implicits._
    normalized.as[OpcValue]
      .groupByKey(v => (v.serverName, v.tag))
      .flatMapGroupsWithState[RunningStats, AnomalousReading](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, values, state: GroupState[RunningStats]) =>
          var st = state.getOption.getOrElse(RunningStats(0L, 0.0, 0.0))
          val out = Seq.newBuilder[AnomalousReading]
          values.toSeq.sortBy(v =>
            (v.serverTimestamp.getTime, v.serverTimestamp.getNanos,
              v.sourceTimestamp.getTime, v.sourceTimestamp.getNanos)).foreach { v =>
            val x = v.doubleValue
            if (st.n >= minSamples) {
              val sd = math.sqrt(st.m2 / (st.n - 1))
              if (sd > 0) {
                val z = (x - st.mean) / sd
                if (math.abs(z) > zThreshold)
                  out += AnomalousReading(v.serverName, v.tag, x,
                    v.sourceTimestamp, z, st.n)
              }
            }
            val n1 = st.n + 1
            val d = x - st.mean
            val mean1 = st.mean + d / n1
            st = RunningStats(n1, mean1, st.m2 + d * (x - mean1))
          }
          state.update(st)
          out.result().iterator
      }.toDF()
  }

  /** STREAMING Holt double exponential smoothing — the stateful twin of
    * [[graft.operators.TimeSeries.holtSmooth]]: per key, O(1) state
    * (n, level, trend), one updated estimate emitted per key per
    * micro-batch. Within a batch samples apply in event-time order;
    * ACROSS batches samples must arrive trigger-ordered per key (a
    * recurrence cannot rewind — late data needs an upstream watermark
    * sort, same contract as every recurrence-stateful operator here).
    *
    * Parity is EXACT, not approximate: the per-sample update is the
    * identical IEEE tree the batch fold runs (α·y + (1−α)·(l+b);
    * β·(l′−l) + (1−β)·b with dyadic constants and pre-computed
    * complements), so feeding the same series through any trigger
    * slicing reproduces the batch (level, trend) bit for bit —
    * StreamingSpec pins it.
    */
  def holtStream(points: DataFrame, alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0 && alpha < 1 && (alpha * 4096.0) == math.rint(alpha * 4096.0) &&
      beta > 0 && beta < 1 && (beta * 4096.0) == math.rint(beta * 4096.0),
      s"alpha/beta must be dyadic in (0,1) (got $alpha, $beta) — " +
        "the batch-parity contract")
    val oneMinusA = 1.0 - alpha
    val oneMinusB = 1.0 - beta
    import points.sparkSession.implicits._
    points.as[HoltPoint]
      .groupByKey(_.k)
      .flatMapGroupsWithState[HoltState, HoltEstimate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (key, values, state: GroupState[HoltState]) =>
          var st = state.getOption.getOrElse(HoltState(0L, 0.0, 0.0))
          // (t, y) — NOT t alone: the batch twin sorts struct(t, y), so
          // timestamp ties must break by y here too or the advertised
          // bit-exact parity dies nondeterministically on tied samples.
          // getNanos carries the sub-millisecond fraction getTime drops:
          // without it two samples differing only below the millisecond
          // would fold in a different order than the batch twin's full-
          // precision struct(t, y) sort.
          values.toSeq.sortBy(p => (p.t.getTime, p.t.getNanos, p.y)).foreach { p =>
            st =
              if (st.n == 0L) HoltState(1L, p.y, 0.0)
              else {
                val lNew = alpha * p.y + oneMinusA * (st.l + st.b)
                HoltState(st.n + 1, lNew,
                  beta * (lNew - st.l) + oneMinusB * st.b)
              }
          }
          state.update(st)
          Iterator.single(HoltEstimate(key, st.n, st.l, st.b))
      }.toDF()
  }

  /** Streaming twin of [[graft.operators.TimeSeries.cusum]] — per-key
    * tabular CUSUM as flatMapGroupsWithState, O(1) state per key
    * (sp, sn, alarm count, first-alarm index, sample count), BIT-EXACT
    * batch parity: the per-sample update is the identical IEEE tree
    * (add, subtract, max(0, ·), compare, reset), so any trigger slicing
    * of the same series reproduces the batch fold exactly —
    * StreamingSpec pins it. Same ordering contract as [[holtStream]]:
    * within a batch samples apply in (t, y) order; across batches
    * arrival must be trigger-ordered per key.
    */
  def cusumStream(points: DataFrame, target: Double, slack: Double,
      threshold: Double): DataFrame = {
    require(slack >= 0, s"slack must be >= 0, got $slack")
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    import points.sparkSession.implicits._
    points.as[HoltPoint]
      .groupByKey(_.k)
      .flatMapGroupsWithState[CusumState, CusumReport](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (key, values, state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(0.0, 0.0, 0L, 0L, 0L))
          // full-precision ordering: getNanos breaks sub-millisecond ties
          // getTime cannot see (same contract as holtStream above)
          values.toSeq.sortBy(p => (p.t.getTime, p.t.getNanos, p.y)).foreach { p =>
            val spRaw = math.max(0.0, st.sp + (p.y - target - slack))
            val snRaw = math.max(0.0, st.sn + (target - p.y - slack))
            val alarm = spRaw > threshold || snRaw > threshold
            st = CusumState(
              if (alarm) 0.0 else spRaw,
              if (alarm) 0.0 else snRaw,
              st.na + (if (alarm) 1L else 0L),
              if (st.fa > 0) st.fa else if (alarm) st.i + 1 else 0L,
              st.i + 1)
          }
          state.update(st)
          Iterator.single(CusumReport(key, st.i, st.na, st.fa, st.sp, st.sn))
      }.toDF()
  }
}

/** Welford accumulator for [[StreamingPipeline.anomalyStream]]:
  * m2 = Σ(x - mean)², so variance = m2 / (n - 1).
  */
final case class RunningStats(n: Long, mean: Double, m2: Double)

/** One input sample for [[StreamingPipeline.holtStream]]. */
final case class HoltPoint(k: String, t: Timestamp, y: Double)

/** Per-key Holt state: sample count + (level, trend). */
final case class HoltState(n: Long, l: Double, b: Double)

/** Per-key CUSUM state for [[StreamingPipeline.cusumStream]]. */
final case class CusumState(sp: Double, sn: Double, na: Long, fa: Long, i: Long)

/** One running CUSUM report — schema-aligned with
  * [[graft.operators.TimeSeries.cusum]] for column-for-column parity.
  */
final case class CusumReport(k: String, n_points: Long, n_alarms: Long,
    first_alarm_i: Long, sp_final: Double, sn_final: Double)

/** One running estimate from [[StreamingPipeline.holtStream]] —
  * schema-aligned with [[graft.operators.TimeSeries.holtSmooth]]'s
  * output so batch/stream parity is a column-for-column compare.
  */
final case class HoltEstimate(k: String, n_points: Long, level: Double, trend: Double)

/** One flagged reading from [[StreamingPipeline.anomalyStream]]: `z` is
  * the score against the baseline of `baselineN` PRIOR samples.
  */
final case class AnomalousReading(
    serverName: String,
    tag: String,
    doubleValue: Double,
    sourceTimestamp: Timestamp,
    z: Double,
    baselineN: Long)

/** transformWithState processor for [[StreamingPipeline.latestPerTagTws]]:
  * one named ValueState cell ("latest") holding the current OpcValue per
  * (serverName, tag); emits only genuine updates (the changelog contract).
  */
class LatestValueProcessor
    extends StatefulProcessor[(String, String), OpcValue, OpcValue] {

  @transient private var latest: ValueState[OpcValue] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    latest = getHandle.getValueState[OpcValue](
      "latest", org.apache.spark.sql.Encoders.product[OpcValue], TTLConfig.NONE)

  override def handleInputRows(
      key: (String, String),
      rows: Iterator[OpcValue],
      timerValues: TimerValues): Iterator[OpcValue] = {
    val incoming = rows.reduceOption((a, b) =>
      if (StreamingPipeline.newerValue(a, b)) a else b)
    incoming match {
      case Some(in) if !latest.exists() || StreamingPipeline.newerValue(in, latest.get()) =>
        latest.update(in)
        Iterator.single(in)
      case _ => Iterator.empty
    }
  }
}

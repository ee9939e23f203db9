package graft.streaming

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{Offset => ConnOffset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftshim.StreamingShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The ACID table as a STREAMING SOURCE — `spark.readStream
  * .format("txtable-cdf")` turns a [[TxTable]]'s commit log into a
  * change-data-feed stream, the missing upstream half of the CDC story:
  * [[TxTable.changeDataFeed]] gives batch deltas between two pinned
  * versions, this source delivers every commit's delta exactly once as
  * the commits land (the Delta-Lake `readChangeFeed` streaming shape,
  * re-derived for this log format).
  *
  * Offset model: the table's commit VERSION — a total order the log
  * already provides, so offsets need no extra bookkeeping and restart
  * recovery is just "resume after the checkpointed version". Batch
  * (a, b] emits, for each version v in a+1..b, the standard CDF rows
  * (insert / delete / update_preimage / update_postimage) of commit v
  * tagged `_commit_version = v`.
  *
  * Scale posture: each commit's diff is restricted to
  * [[TxTable.touchedPartitions]] — rows can only change where files
  * changed, so a micro-batch plans O(touched partitions) of merged-view
  * reads, not two full-table scans per version; a content-neutral
  * commit (compact / checkpoint) diffs to an empty batch rather than a
  * rescan. `maxVersionsPerTrigger` bounds how many commits one
  * micro-batch folds together (admission control for a stream catching
  * up on a long history).
  *
  * Options:
  *   - `path` (required): table directory
  *   - `keyCol` (required): row-identity column within a partition —
  *     same contract as [[TxTable.changeDataFeed]]
  *   - `keys` / `order` (csv, default `serverName,tag` /
  *     `serverTimestamp,sourceTimestamp`): the table's merge identity
  *   - `compareCols` (csv, default: every non-key column of the
  *     table's CURRENT schema): payload columns diffed + emitted; fixed
  *     at stream start so the stream's schema is stable across
  *     in-stream schema evolution of the table
  *   - `partitions` (csv, optional): scope the feed to these partitions
  *   - `startingVersion` (default 0): first commit to emit; the
  *     feed of that commit diffs against version-1 (so `0` streams the
  *     table from its origin — first commit arrives as pure inserts)
  *   - `maxVersionsPerTrigger` (optional): admission control, see above
  *
  * Usage (the incremental-pipeline shape — downstream aggregates
  * maintained from the feed via [[graft.operators.IncrementalAgg]],
  * never a table rescan):
  * {{{
  *   spark.readStream.format("txtable-cdf")
  *     .option("path", tableDir)
  *     .option("keyCol", "tag")
  *     .load()
  *     .writeStream.foreachBatch { (cdf, id) => refresh(cdf) } ...
  * }}}
  */
class TxTableCdfSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "txtable-cdf"

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val opts = TxTableCdfSource.Options(parameters)
    (shortName(), TxTableCdfSource.cdfSchema(sqlContext.sparkSession, opts))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new TxTableCdfSource(sqlContext.sparkSession, TxTableCdfSource.Options(parameters))
}

object TxTableCdfSource {

  /** Parsed, validated source options (see class doc for semantics). */
  final case class Options(
      path: String,
      keyCol: String,
      keys: Seq[String],
      order: Seq[String],
      compareCols: Option[Seq[String]],
      partitions: Option[Seq[String]],
      startingVersion: Long,
      maxVersionsPerTrigger: Option[Long])

  object Options {
    private def csv(s: String): Seq[String] =
      s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

    def apply(parameters: Map[String, String]): Options = {
      val p = scala.collection.immutable.TreeMap[String, String]()(
        Ordering.comparatorToOrdering(String.CASE_INSENSITIVE_ORDER)) ++ parameters
      val path = p.getOrElse("path",
        throw new IllegalArgumentException("txtable-cdf requires .option(\"path\", <table dir>)"))
      val keyCol = p.getOrElse("keyCol",
        throw new IllegalArgumentException("txtable-cdf requires .option(\"keyCol\", <identity column>)"))
      val starting = p.get("startingVersion").map(_.toLong).getOrElse(0L)
      require(starting >= 0, s"startingVersion must be >= 0, got $starting")
      val maxPer = p.get("maxVersionsPerTrigger").map(_.toLong)
      maxPer.foreach(m => require(m >= 1, s"maxVersionsPerTrigger must be >= 1, got $m"))
      Options(
        path = path,
        keyCol = keyCol,
        keys = p.get("keys").map(csv).getOrElse(Seq("serverName", "tag")),
        order = p.get("order").map(csv).getOrElse(Seq("serverTimestamp", "sourceTimestamp")),
        compareCols = p.get("compareCols").map(csv),
        partitions = p.get("partitions").map(csv),
        startingVersion = starting,
        maxVersionsPerTrigger = maxPer)
    }
  }

  /** Payload columns actually diffed: the explicit `compareCols`, else
    * every non-key column of the table's current schema in table order
    * (the [[graft.operators.Snapshot.changeDataFeed]] default, resolved
    * ONCE here so the stream's schema cannot drift mid-stream).
    */
  private[streaming] def resolveCompareCols(
      spark: SparkSession, opts: Options): Seq[String] = {
    val base = tableSchema(spark, opts)
    opts.compareCols.getOrElse(
      base.fields.iterator.map(_.name).filter(_ != opts.keyCol).toSeq)
  }

  private[streaming] def tableSchema(spark: SparkSession, opts: Options): StructType =
    TxTable.read(spark, opts.path, opts.partitions).getOrElse(
      throw new IllegalArgumentException(
        s"txtable-cdf: table ${opts.path} is empty or absent — commit at " +
          "least once before streaming its change feed")).schema

  /** keyCol, compareCols..., change_type, _commit_version — the exact
    * column order [[TxTable.changeDataFeed]] emits, plus the version tag.
    */
  def cdfSchema(spark: SparkSession, opts: Options): StructType = {
    val base = tableSchema(spark, opts)
    val cmp = resolveCompareCols(spark, opts)
    val missing = (opts.keyCol +: cmp).filterNot(base.fieldNames.contains)
    require(missing.isEmpty,
      s"txtable-cdf: columns ${missing.mkString(", ")} not in table schema ${base.simpleString}")
    StructType(
      base(opts.keyCol) +: cmp.map(base(_)) :+
        StructField("change_type", StringType, nullable = false) :+
        StructField("_commit_version", LongType, nullable = false))
  }
}

class TxTableCdfSource(spark: SparkSession, opts: TxTableCdfSource.Options)
    extends Source with SupportsTriggerAvailableNow with Logging {

  private val cdfSchema = TxTableCdfSource.cdfSchema(spark, opts)
  private val cmpCols = TxTableCdfSource.resolveCompareCols(spark, opts)
  // the full table schema, resolved ONCE at stream start: every
  // per-version read in getBatch passes it as the schema hint, so a
  // trigger folding N commits costs zero footer-inference jobs instead
  // of 2N (the keyHistory lesson, applied to the streaming twin)
  private val tableSchemaHint =
    Some(TxTableCdfSource.tableSchema(spark, opts))

  /** Under Trigger.AvailableNow the engine would otherwise pin a plain
    * v1 source to one up-front offset — with pacing on, that would stop
    * the run `maxVersionsPerTrigger` commits in. Implementing the
    * capability ourselves (the FileStreamSource pattern) freezes the
    * TARGET version here while latestOffset keeps advancing toward it
    * batch by batch.
    */
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowTarget = Some(TxTable.snapshot(opts.path).version)
  }

  override def schema: StructType = cdfSchema

  private def ver(o: ConnOffset): Long = o match {
    case l: LongOffset       => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other               => other.json.trim.toLong
  }

  /** Pacing is STATELESS: the engine hands back the last planned offset
    * (from its checkpoint on restart), so `maxVersionsPerTrigger` never
    * regresses or re-plans across failures. `null` = nothing new.
    */
  override def latestOffset(startOffset: ConnOffset, limit: ReadLimit): ConnOffset = {
    val base = Option(startOffset).map(ver)
      .getOrElse(opts.startingVersion - 1L)
      .max(opts.startingVersion - 1L)
    val head = TxTable.snapshot(opts.path).version
    val cap = availableNowTarget.fold(head)(math.min(head, _))
    val next = opts.maxVersionsPerTrigger.fold(cap)(m => math.min(cap, base + m))
    if (next <= base || next < opts.startingVersion) null else LongOffset(next)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Legacy entry point — the engine prefers [[latestOffset]] for a
    * source with admission control; kept equivalent (un-paced) for any
    * caller that still goes through it.
    */
  override def getOffset: Option[V1Offset] = {
    val cur = TxTable.snapshot(opts.path).version
    if (cur < opts.startingVersion) None else Some(LongOffset(cur))
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val fromV = start.map(o => ver(o)).getOrElse(opts.startingVersion - 1L)
    val endV = ver(end)
    // a vacuum/retention pass can erase part of the commit range the
    // stream still owes, two ways: the LOG itself pruned past the commit
    // (touchedPartitions throws), or the log survives but a version's
    // DATA dirs were vacuumed (the parquet resolution throws
    // PATH_NOT_FOUND). Both mean the same thing — surface the REMEDY,
    // not just the replay failure (the classic Delta "history pruned"
    // failure mode).
    def historyGone(v: Long, cause: Throwable): Nothing =
      throw new IllegalStateException(
        s"txtable-cdf: commit $v of ${opts.path} is no longer " +
          "reconstructible (vacuumed past or checkpoint-anchored " +
          "after it). The table's retention window lapsed while the " +
          "stream was behind — restart with a fresh checkpoint and " +
          ".option(\"startingVersion\", <first retained version>), " +
          "accepting a gap in the feed.", cause)
    val perVersion = ((fromV + 1L) to endV).flatMap { v =>
      val touched =
        try TxTable.touchedPartitions(opts.path, v)
        catch { case e: IllegalArgumentException => historyGone(v, e) }
      val parts = opts.partitions.fold(touched)(scope => touched.filter(scope.contains))
      if (parts.isEmpty) None // content-neutral or out-of-scope commit
      else
        try Some(
          TxTable.changeDataFeed(spark, opts.path, v - 1, v, opts.keyCol,
              cmpCols, opts.keys, opts.order, Some(parts), tableSchemaHint)
            .withColumn("_commit_version", lit(v)))
        catch {
          case e: org.apache.spark.sql.AnalysisException
              if e.getMessage.contains("PATH_NOT_FOUND") =>
            historyGone(v, e)
        }
    }
    val batch = perVersion.reduceOption(_.unionByName(_)).getOrElse(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(cdfSchema.map(f => f.copy(nullable = true)))))
    logInfo(s"txtable-cdf batch ($fromV, $endV] over ${perVersion.size} version diffs")
    StreamingShim.asStreamingDataFrame(
      batch.select(cdfSchema.fieldNames.toIndexedSeq.map(col): _*))
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"TxTableCdfSource[${opts.path}, key=${opts.keyCol}]"
}

package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.config.OpcConfigParser
import graft.model.{OpcEntry, OpcServer, Schemas}

/** Custom Structured-Streaming source simulating one OPC server's poll
  * cycle — the Spark-native port of the reference's ingest threads
  * (/root/reference/OPC2MongoDB/Program.cs: UA poll :446-726, DA poll
  * :953-1133; one OS thread per server :1300-1312 → one streaming query
  * per server here).
  *
  * Semantics ported:
  *   - every cycle reads ALL configured tags (the reference's poll loop
  *     has no subscribe filter — Program.cs:448 — so subscribed tags are
  *     read twice there; we document and keep the read-all behavior);
  *   - each reading carries (sourceTimestamp, serverTimestamp, quality)
  *     and the declared type token, pre-normalization (FIXTURES.md A1).
  *
  * The client is pluggable behind the [[TagReader]] interface
  * (connect/subscribe/read/close): the default provider is the
  * deterministic [[SimTagReaderProvider]] simulator; a real OPC UA/DA
  * client binds by implementing [[TagReaderProvider]] and naming the
  * class in `.option("tagReader", "com.example.UaProvider")` — offsets,
  * partition planning, and the row contract stay as-is.
  *
  * Offset model: the poll-cycle counter. Batch (a, b] replays cycles
  * a+1..b; `cyclesPerTrigger` advance per micro-batch up to `maxCycles`
  * (exactly-once on restart: cycle data is a pure function of the cycle
  * index). Partitioning: tags are split into `numPartitions` slices, so
  * a server with many tags fans out across executors — the scale axis the
  * reference's serial per-tag RPC loop lacks (Program.cs:463-464).
  *
  * Usage:
  * {{{
  *   spark.readStream.format("opcsim")
  *     .option("config", configText)   // reference grammar (S1)
  *     .option("server", "Server1")    // which server section to simulate
  *     .option("cyclesPerTrigger", 1)
  *     .option("maxCycles", 10)
  *     .load()
  * }}}
  */
class OpcSimSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "opcsim"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Schemas.rawReading

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new OpcSimTable(new CaseInsensitiveStringMap(properties))
}

object OpcSimSource {
  /** Deterministic simulated reading for (tag, declared type, cycle). */
  def rawValue(dataType: String, tagIdx: Int, cycle: Long): String =
    dataType.toLowerCase match {
      case t if t.contains("bool") => if ((cycle + tagIdx) % 2 == 0) "true" else "false"
      case t if Seq("float", "single", "double", "vt_r4", "vt_r8", "decimal").exists(t.contains) =>
        ((cycle * 37 + tagIdx * 11) % 1000 / 8.0).toString
      case t if Seq("date", "time").exists(t.contains) =>
        f"2024-01-01 ${(cycle / 3600) % 24}%02d:${(cycle / 60) % 60}%02d:${cycle % 60}%02d"
      case t if Seq("int", "byte", "state", "statuscode", "vt_i", "vt_ui").exists(t.contains) =>
        ((cycle * 13 + tagIdx * 7) % 10000).toString
      case _ => s"str-$tagIdx-$cycle"
    }

  def selectServer(configText: String, serverName: String): OpcServer = {
    val parsed = OpcConfigParser.parse(configText).config
    parsed.servers.find(_.serverName == serverName).getOrElse(
      throw new IllegalArgumentException(
        s"server '$serverName' not found; have ${parsed.servers.map(_.serverName)}"))
  }

  /** Certificate material for the UA session open — the reference hands
    * (certFile, certPassword) from the config line straight to its session
    * factory (/root/reference/OPC2MongoDB/Program.cs:1247-1251). Source
    * options override the config; a configured-but-missing cert file fails
    * the query at START (fail-fast at plan time beats failing inside a
    * reconnect loop after deployment). A real OPC UA connector consumes
    * exactly this value next to the [[rawValue]] seam; the simulator
    * validates it so the config round-trip is total.
    */
  final case class SessionAuth(certFile: Option[String], certPassword: Option[String])

  /** Instantiate a [[TagReaderProvider]] by class name — used at query
    * start for fail-fast validation and per-partition on executors.
    */
  def resolveProvider(className: String): TagReaderProvider =
    graft.Reflection.resolveInstance[TagReaderProvider]("tagReader", className)

  def sessionAuth(server: OpcServer, options: CaseInsensitiveStringMap): SessionAuth = {
    def nonEmpty(s: String) = Option(s).map(_.trim).filter(_.nonEmpty)
    val file = nonEmpty(options.get("certFile")).orElse(nonEmpty(server.certificateFile))
    val pass = nonEmpty(options.get("certPassword")).orElse(nonEmpty(server.certificatePassword))
    file.foreach { f =>
      if (!new java.io.File(f).isFile)
        throw new IllegalArgumentException(
          s"certFile '$f' for server '${server.serverName}' does not exist")
    }
    SessionAuth(file, pass)
  }
}

private[sources] class OpcSimTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"opcsim(${options.get("server")})"
  override def schema(): StructType = Schemas.rawReading
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = Schemas.rawReading
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new OpcSimMicroBatchStream(opts)
      }
    }
}

private[sources] case class CycleOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] class OpcSimMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val server: OpcServer = OpcSimSource.selectServer(
    Option(options.get("config")).getOrElse(
      throw new IllegalArgumentException("opcsim requires option 'config'")),
    Option(options.get("server")).getOrElse(
      throw new IllegalArgumentException("opcsim requires option 'server'")))
  // validated at stream construction = query start (fail-fast seam where a
  // real UA connector would open its certificate-authenticated session)
  private val auth: OpcSimSource.SessionAuth = OpcSimSource.sessionAuth(server, options)
  // the client seam: provider class resolved AND instantiated here so a
  // bad class name fails the query at START, not inside executor tasks
  private val readerProviderClass: String =
    Option(options.get("tagReader")).getOrElse(classOf[SimTagReaderProvider].getName)
  OpcSimSource.resolveProvider(readerProviderClass)
  private val cyclesPerTrigger = options.getLong("cyclesPerTrigger", 1L)
  private val maxCycles = options.getLong("maxCycles", Long.MaxValue)
  private val baseEpochMs = options.getLong("baseEpochMs", 1704067200000L) // 2024-01-01
  private val numPartitions = options.getInt("numPartitions", 4)

  // Highest end offset handed out on either latestOffset path. Updated in
  // BOTH paths so that prepareForTriggerAvailableNow computes its drain
  // target from where the stream actually is — including a restart from a
  // checkpoint offset — never below an already-committed start (which
  // would be an offset regression replaying cycles).
  @volatile private var advanced = 0L
  // when Trigger.AvailableNow prepares, the run drains up to this target
  // in cyclesPerTrigger-sized micro-batches
  @volatile private var availableNowTarget: Option[Long] = None

  override def initialOffset(): Offset = CycleOffset(0L)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(
      if (maxCycles != Long.MaxValue) maxCycles else advanced + cyclesPerTrigger)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def reportLatestOffset(): Offset =
    CycleOffset(availableNowTarget.getOrElse(advanced))

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val start = startOffset.asInstanceOf[CycleOffset].n
    val cap = availableNowTarget.getOrElse(maxCycles)
    // clamp to >= start: after a restart the checkpoint start may already
    // be beyond a stale AvailableNow target — never move backwards
    val end = math.max(start, math.min(start + cyclesPerTrigger, cap))
    advanced = math.max(advanced, end)
    CycleOffset(end)
  }

  override def latestOffset(): Offset = {
    // non-admission-control path (not used once SupportsAdmissionControl is
    // implemented, kept for interface completeness)
    advanced = math.min(advanced + cyclesPerTrigger, maxCycles)
    CycleOffset(advanced)
  }

  override def deserializeOffset(json: String): Offset = CycleOffset(json.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val a = start.asInstanceOf[CycleOffset].n
    val b = end.asInstanceOf[CycleOffset].n
    val session = TagSession(server.serverName, server.opcUrl, server.isUa,
      server.readPeriodSec, baseEpochMs, auth.certFile, auth.certPassword)
    val indexed = server.entries.zipWithIndex
    val slices = indexed.grouped(math.max(1, (indexed.size + numPartitions - 1) / numPartitions))
    slices.map(s => OpcSimPartition(
      session, readerProviderClass, a, b, s.toArray): InputPartition
    ).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => new OpcSimReader(partition.asInstanceOf[OpcSimPartition])
}

private[sources] case class OpcSimPartition(
    session: TagSession,
    providerClass: String,
    startCycle: Long,     // exclusive
    endCycle: Long,       // inclusive
    tags: Array[(OpcEntry, Int)]) extends InputPartition

private[sources] class OpcSimReader(p: OpcSimPartition)
    extends PartitionReader[InternalRow] {
  // one client session per partition (the per-partition codec/connection
  // shape): connect once, declare the monitored items once, poll per row
  private val reader: TagReader = {
    val r = OpcSimSource.resolveProvider(p.providerClass).open(p.session)
    r.connect()
    r.subscribe(p.tags.collect { case (e, _) if e.subscribe => e }.toSeq)
    r
  }
  // rows for cycles (start, end], every tag slice member per cycle
  private val it: Iterator[(Long, (OpcEntry, Int))] =
    (p.startCycle + 1 to p.endCycle).iterator.flatMap(c => p.tags.iterator.map(t => (c, t)))
  private var cur: (Long, (OpcEntry, Int)) = _

  override def next(): Boolean = {
    if (!it.hasNext) return false
    cur = it.next()
    true
  }

  override def get(): InternalRow = {
    val (cycle, (entry, tagIdx)) = cur
    val r = reader.read(entry, tagIdx, cycle)
    InternalRow(
      UTF8String.fromString(p.session.serverName),
      UTF8String.fromString(entry.tag),
      UTF8String.fromString(entry.opcPath),
      UTF8String.fromString(entry.dataType),
      UTF8String.fromString(r.rawValue),
      r.sourceTsMicros,
      r.serverTsMicros,
      r.quality)
  }

  override def close(): Unit = reader.close()
}

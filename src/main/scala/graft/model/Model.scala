package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Canonical data model of the engine.
  *
  * Mirrors the reference's value/config structs (behavioral spec only):
  *   - `OPC_Value`  — /root/reference/OPC2MongoDB/Program.cs:73-82
  *   - `OPC_entry`  — /root/reference/OPC2MongoDB/Program.cs:53-60
  *   - `OPC_server` — /root/reference/OPC2MongoDB/Program.cs:62-71
  *
  * The reference normalizes every ingested tag value into a fixed wide row
  * of (double, bool, string) + two timestamps + quality, and materializes
  * one "current value" document per tag (Program.cs:1162-1182). We keep the
  * same canonical schema so every downstream operator sees one stable shape,
  * which at 100 TB means: stable parquet column layout, no schema merging,
  * and full predicate/column pushdown on every scan.
  */
final case class OpcValue(
    serverName: String,
    tag: String,
    dataType: String,
    doubleValue: Double,
    boolValue: Boolean,
    stringValue: String,
    sourceTimestamp: Timestamp,
    serverTimestamp: Timestamp,
    quality: Int)

/** A pre-normalization reading as produced by a source connector; `rawValue`
  * carries the value as text (the test encoding — see FIXTURES.md A1).
  */
final case class RawReading(
    serverName: String,
    tag: String,
    opcPath: String,
    dataType: String,
    rawValue: String,
    sourceTimestamp: Timestamp,
    serverTimestamp: Timestamp,
    quality: Int)

/** One configured tag (reference: OPC_entry, Program.cs:53-60). */
final case class OpcEntry(
    opcPath: String,
    dataType: String,
    subscribe: Boolean,
    tag: String)

/** One configured OPC server (reference: OPC_server, Program.cs:62-71). */
final case class OpcServer(
    serverName: String,
    opcUrl: String,
    readPeriodSec: Int,
    isUa: Boolean,
    certificateFile: String,
    certificatePassword: String,
    entries: Seq[OpcEntry])

/** Parsed configuration (reference: Main's connstr + List<OPC_server>,
  * Program.cs:1205-1209).
  */
final case class OpcConfig(mongoConnStr: Option[String], servers: Seq[OpcServer])

object Schemas {
  /** Canonical normalized-value schema (Program.cs:1162-1172's BSON doc,
    * plus `serverName` as the table/partition key per Program.cs:1159).
    */
  val opcValue: StructType = StructType(Seq(
    StructField("serverName", StringType, nullable = false),
    StructField("tag", StringType, nullable = false),
    StructField("dataType", StringType, nullable = false),
    StructField("doubleValue", DoubleType, nullable = false),
    StructField("boolValue", BooleanType, nullable = false),
    StructField("stringValue", StringType, nullable = true),
    StructField("sourceTimestamp", TimestampType, nullable = true),
    StructField("serverTimestamp", TimestampType, nullable = true),
    StructField("quality", IntegerType, nullable = false)))

  val rawReading: StructType = StructType(Seq(
    StructField("serverName", StringType, nullable = false),
    StructField("tag", StringType, nullable = false),
    StructField("opcPath", StringType, nullable = false),
    StructField("dataType", StringType, nullable = false),
    StructField("rawValue", StringType, nullable = true),
    StructField("sourceTimestamp", TimestampType, nullable = true),
    StructField("serverTimestamp", TimestampType, nullable = true),
    StructField("quality", IntegerType, nullable = false)))
}

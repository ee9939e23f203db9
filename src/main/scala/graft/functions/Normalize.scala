package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's type-normalization matrix as a single declarative
  * projection.
  *
  * Behavioral spec: the per-type `switch` repeated four times in the
  * reference (UA subscribe /root/reference/OPC2MongoDB/Program.cs:137-443,
  * UA poll :457-721, DA subscribe :765-950, DA poll :968-1127). Every value
  * becomes the union-typed wide row (doubleValue, boolValue, stringValue):
  *
  *   - bool        -> (1.0/0.0, identity, "true"/"false" lowercase)  [:146-150]
  *   - float/double/decimal -> (widen, != 0, "G" en-US format)       [:172-173]
  *   - integer types (i8..u64, "state", "statuscode") -> (widen — lossy
  *     above 2^53 for 64-bit, != 0, decimal string)                  [:346-385]
  *   - string-likes (string, guid, nodeid, qualifiedname, localizedtext,
  *     expandednodeid, xmlelement) -> (parse-or-0.0, parsed != 0,
  *     identity)                                                     [:397-410]
  *   - date/time   -> (.NET Ticks as double, always false, text)     [:431-432]
  *   - anything else is dropped with the reference's "type not supported"
  *     behavior                                                      [:718-720]
  *
  * Implementation notes (100 TB posture): the whole matrix is one `select`
  * of `when` cascades over built-in expressions — fully codegen'd, no UDF in
  * the per-row hot path except the tiny "G" formatter, and even that only on
  * the float/double/decimal branch. Catalyst constant-folds the cascade when
  * `dataType` is a literal (e.g. after a broadcast join against the tag
  * catalog), so per-tag normalization costs one branch, not eleven.
  */
object Normalize {

  // type-token sets, lowercase; includes the DA OLE aliases
  // (Program.cs:765-950: vt_bool, vt_r4, vt_r8, vt_i1, vt_ui1, vt_i2,
  //  vt_ui2, vt_i4, vt_ui4, vt_i8, vt_ui8, vt_bstr, vt_date, state)
  val BoolTypes: Seq[String] = Seq("bool", "boolean", "system.boolean", "vt_bool")
  val SingleTypes: Seq[String] = Seq("float", "single", "vt_r4")
  val DoubleTypes: Seq[String] = Seq("double", "vt_r8", "decimal", "vt_decimal")
  val IntTypes: Seq[String] = Seq(
    "byte", "sbyte", "vt_i1", "vt_ui1",
    "int16", "uint16", "vt_i2", "vt_ui2",
    "int32", "integer", "uint32", "statuscode", "vt_i4", "vt_ui4", "state",
    "int64", "uint64", "vt_i8", "vt_ui8")
  val StringTypes: Seq[String] = Seq(
    "string", "expandednodeid", "guid", "nodeid", "qualifiedname",
    "localizedtext", "xmlelement", "vt_bstr")
  val DateTypes: Seq[String] = Seq("time", "date", "datetime", "vt_date")

  val SupportedTypes: Seq[String] =
    BoolTypes ++ SingleTypes ++ DoubleTypes ++ IntTypes ++ DateTypes ++ StringTypes

  private val gDoubleUdf = udf((d: Double) => GFormat.gDouble(d))
  private val gSingleUdf = udf((f: Double) => GFormat.gSingle(f.toFloat))

  /** String→double parse that returns null instead of failing under ANSI
    * mode — the reference's try/catch-to-0.0 parse (Program.cs:397-405).
    */
  private def tryDouble(c: Column): Column = c.try_cast("double")

  /** doubleValue for a raw text value of declared type `dt`.
    *
    * Every parse-may-fail branch uses try_cast so a malformed reading
    * yields a null instead of an ANSI-mode exception that would kill the
    * whole batch/streaming query — mirroring the reference's per-value
    * try/catch tolerance (Program.cs:397-405 and the per-cycle retry
    * loops), which never lets one bad value take down a poll cycle.
    */
  private def doubleValueCol(dt: Column, raw: Column): Column = {
    val asDouble = raw.try_cast("double")
    when(dt.isin(BoolTypes: _*), when(lower(raw) === "true" || raw === "1", 1.0d).otherwise(0.0d))
      .when(dt.isin(DateTypes: _*),
        (unix_millis(raw.try_cast("timestamp")) * lit(10000L) + lit(GFormat.TicksAtEpoch))
          .cast("double"))
      .when(dt.isin(StringTypes: _*), coalesce(tryDouble(raw), lit(0.0d)))
      .when(dt.isin(SingleTypes: _*), raw.try_cast("float").cast("double"))
      .otherwise(asDouble) // double/decimal/integer families: widen
  }

  private def boolValueCol(dt: Column, raw: Column): Column = {
    val parsedNonZero = coalesce(tryDouble(raw), lit(0.0d)) =!= 0.0d
    when(dt.isin(BoolTypes: _*), lower(raw) === "true" || raw === "1")
      .when(dt.isin(DateTypes: _*), lit(false)) // Program.cs:432 — dates are never truthy
      .otherwise(parsedNonZero)
  }

  private def stringValueCol(dt: Column, raw: Column): Column = {
    when(dt.isin(BoolTypes: _*),
        when(lower(raw) === "true" || raw === "1", "true").otherwise("false"))
      .when(dt.isin(SingleTypes: _*), gSingleUdf(raw.try_cast("double")))
      .when(dt.isin(DoubleTypes: _*), gDoubleUdf(raw.try_cast("double")))
      .when(dt.isin(IntTypes: _*), raw.try_cast("decimal(20,0)").cast("string"))
      .otherwise(raw) // string-likes and dates keep their text form
  }

  /** Normalize a DataFrame of raw readings (FIXTURES.md A1 schema) into the
    * canonical OpcValue shape. Unsupported types are dropped (the
    * reference's logged default branch, Program.cs:718-720).
    */
  def normalize(raw: DataFrame): DataFrame = {
    val dt = lower(trim(col("dataType")))
    raw
      .filter(dt.isin(SupportedTypes: _*))
      .select(
        col("serverName"),
        col("tag"),
        col("dataType"),
        doubleValueCol(dt, col("rawValue")).as("doubleValue"),
        boolValueCol(dt, col("rawValue")).as("boolValue"),
        stringValueCol(dt, col("rawValue")).as("stringValue"),
        col("sourceTimestamp"),
        col("serverTimestamp"),
        col("quality"))
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.Q

/** S8 (SURVEY.md §2.1): CSV/JSON/Parquet sources round-trip the canonical
  * shapes with explicit schemas (schema-on-read, no inference in the
  * engine path).
  */
class FileFormatsSpec extends SparkSpec {
  import spark.implicits._

  test("csv and json round-trip the customer table losslessly") {
    val src = Q.t(spark, "/root/testdata/sf0.001", "customer")
    val base = Files.createTempDirectory("graft-fmt").toString

    src.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    src.write.mode("overwrite").json(s"$base/json")

    val viaCsv = spark.read.schema(src.schema).option("header", "true").csv(s"$base/csv")
    val viaJson = spark.read.schema(src.schema).json(s"$base/json")

    assert(viaCsv.count() == src.count())
    assert(viaJson.count() == src.count())
    // exact content equality via anti-joins both ways
    assert(viaCsv.exceptAll(src).isEmpty && src.exceptAll(viaCsv).isEmpty)
    assert(viaJson.exceptAll(src).isEmpty && src.exceptAll(viaJson).isEmpty)
  }

  test("orc round-trips with predicate pushdown to the scan") {
    val base = java.nio.file.Files.createTempDirectory("graft-fmt-orc").toString
    val src = Q.t(spark, "/root/testdata/sf0.001", "customer")
    src.write.mode("overwrite").orc(s"$base/orc")
    val back = spark.read.orc(s"$base/orc")
    assert(back.count() === src.count())
    val plan = back.filter(col("c_custkey") < 10)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(c_custkey"),
      s"filter must reach the orc scan:\n$plan")
  }

  test("events reader adapts to every ts encoding the driver has shipped") {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    // 1) whatever encoding the CURRENT testdata uses must come back as a
    //    plain session-tz timestamp with live values
    val live = Q.t(spark, "/root/testdata/sf0.001", "events")
    assert(live.schema("ts").dataType === TimestampType)
    assert(live.filter(col("ts").isNotNull).limit(1).count() === 1)

    // 2) encoding parity: the same instants routed through each historical
    //    physical encoding normalize to identical timestamps
    val microsSinceEpoch = Seq(1700000000000000L, 1700000123456789L, 0L)
    val asNanosLong = microsSinceEpoch.map(_ * 1000L).toDF("ts") // TIMESTAMP(NANOS) read under nanosAsLong
    val asNtz = microsSinceEpoch.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")) // TIMESTAMP(µs), isAdjustedToUTC=false
    val asTz = microsSinceEpoch.toDF("us")
      .select(timestamp_micros(col("us")).as("ts")) // already session-tz

    val results = Seq(asNanosLong, asNtz, asTz).map(Q.normalizeEventsTs)
    results.foreach(df => assert(df.schema("ts").dataType === TimestampType))
    val expected = microsSinceEpoch.map { us =>
      val t = new java.sql.Timestamp(us / 1000000L * 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }.toSet
    results.foreach { df =>
      assert(df.collect().map(_.getTimestamp(0)).toSet === expected)
    }

    // 3) an unsupported encoding fails loudly, not with a mid-query
    //    AnalysisException seventeen operators deep
    val bad = Seq("x").toDF("ts")
    assertThrows[IllegalStateException](Q.normalizeEventsTs(bad))
  }

  test("csv scan pushes projection (ReadSchema pruned)") {
    val base = Files.createTempDirectory("graft-fmt2").toString
    Q.t(spark, "/root/testdata/sf0.001", "customer")
      .write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    val df = spark.read.option("header", "true").option("inferSchema", "false")
      .csv(s"$base/csv").select("c_custkey")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<c_custkey:string>"),
      s"projection must reach the csv scan:\n$scan")
  }
}

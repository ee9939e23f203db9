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

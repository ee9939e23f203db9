package graft

import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("profile surfaces scan, shuffle, and output metrics through AQE wrappers") {
    val df = (1L to 10000L).map(i => (i % 50, i)).toDF("k", "v")
      .groupBy("k").agg(sum("v").as("s"))
    val m = Metrics.profile(df)
    // the aggregate shuffled: records written must be visible (AQE hides
    // them behind QueryStageExec unless the walk unwraps it)
    assert(m.getOrElse("shuffleRecordsWritten", 0L) > 0L,
      s"shuffle metrics missing: $m")
    assert(m.getOrElse("numOutputRows", 0L) >= 10000L,
      s"row-flow total must include the scanned input: $m")
  }

  test("profile of a parquet scan reports file-level metrics") {
    val m = Metrics.profile(
      graft.queries.Q.t(spark, "/root/testdata/sf0.001", "region").select("r_name"))
    assert(m.getOrElse("numFiles", 0L) >= 1L, s"expected numFiles: $m")
    // row-FLOW total: every operator that passes the 5 regions counts
    // them, so the total is a multiple of 5, never less than 5
    val flow = m.getOrElse("numOutputRows", 0L)
    assert(flow >= 5L && flow % 5 == 0, s"5 regions per operator: $m")
  }

  test("a narrow filter-only plan reports zero shuffle") {
    val m = Metrics.profile(
      (1L to 1000L).toDF("v").filter($"v" % 2 === 0))
    assert(m.getOrElse("shuffleRecordsWritten", 0L) == 0L, s"no shuffle: $m")
  }

  test("repeated profiling (and prior actions) do not inflate the metrics") {
    val df = (1L to 5000L).map(i => (i % 20, i)).toDF("k", "v")
      .groupBy("k").agg(sum("v"))
    df.count() // a prior action on the caller's Dataset must not leak in
    val a = Metrics.profile(df)
    val b = Metrics.profile(df)
    // SQLMetric accumulators are cumulative per plan instance — a fresh
    // QueryExecution per call keeps each report single-run exact
    assert(a.getOrElse("shuffleRecordsWritten", -1L) ==
      b.getOrElse("shuffleRecordsWritten", -2L), s"$a vs $b")
    assert(a.getOrElse("numOutputRows", -1L) == b.getOrElse("numOutputRows", -2L))
  }
}

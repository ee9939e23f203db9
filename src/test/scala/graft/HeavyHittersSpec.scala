package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish: item i appears ~1000/i times — clear heavy hitters
  private lazy val skewed = (1 to 50).flatMap { i =>
    (0 until 1000 / i).map(j => s"item$i")
  }.toDF("w").repartition(8)

  test("topK equals the exact groupBy top-k on skewed data") {
    val got = HeavyHitters.topK(skewed, "w", 10, capacity = 64)
      .as[(String, Long)].collect().toSeq
    val want = skewed.groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(10)
      .as[(String, Long)].collect().toSeq
    assert(got == want)
  }

  test("partition summaries respect the capacity bound and the error invariant") {
    val summaries = HeavyHitters.partitionSummaries(skewed, "w", 16)
    val perPartMax = summaries.groupBy(spark_partition_id().as("p")).count()
      .agg(max("count")).as[Long].head()
    assert(perPartMax <= 16)
    // est - err <= true count <= est for the globally heaviest item
    val merged = summaries.groupBy("item")
      .agg(sum("est").as("est"), sum("err").as("err"))
      .filter(col("item") === "item1")
      .select("est", "err").as[(Long, Long)].head()
    val truth = skewed.filter(col("w") === "item1").count()
    assert(merged._1 >= truth && merged._1 - merged._2 <= truth)
  }

  test("capacity-starved sketch still surfaces items above the guarantee threshold") {
    // item1 is ~22% of rows; SpaceSaving guarantees presence for items
    // above rows/capacity per partition, so capacity 8 (threshold 12.5%)
    // must keep it even though 50 distinct items fight for 8 counters.
    // (capacity 2 ⇒ threshold 50% would NOT guarantee it — that is the
    // bound working, not failing.)
    val cands = HeavyHitters.partitionSummaries(skewed, "w", 8)
      .select("item").distinct().as[String].collect().toSet
    assert(cands.contains("item1"))
  }

  test("non-string item columns use SQL cast formatting end to end") {
    // Timestamp is the canary: Java toString renders '…10:00:00.0' while
    // the SQL cast renders '…10:00:00' — if the sketch keyed by toString,
    // every candidate would miss the verify semi-join and topK would be
    // empty (the round-3 ADVICE finding)
    val ts = Seq.tabulate(100)(i => java.sql.Timestamp.valueOf(
      s"2026-01-0${i % 3 + 1} 10:00:00")).toDF("t").repartition(4)
    val got = HeavyHitters.topK(ts, "t", 3, capacity = 8)
      .as[(String, Long)].collect().toSeq
    val want = ts.groupBy(col("t").cast("string").as("item"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("item")).limit(3)
      .as[(String, Long)].collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("null items are tracked like a SQL group") {
    val df = Seq(Some("a"), Some("a"), None, None, None, Some("b"))
      .toDF("w").repartition(2)
    val got = HeavyHitters.topK(df, "w", 2, capacity = 8)
      .as[(Option[String], Long)].collect().toSeq
    assert(got == Seq((None, 3L), (Some("a"), 2L)))
  }
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Histogram

class HistogramSpec extends SparkSpec {
  import spark.implicits._

  // values with duplicates + a unique tiebreak id, deliberately NOT a
  // multiple of the bucket count (exercises the uneven-bucket formula)
  private val df = (1L to 997L).map(i => (i, (i * 7919 % 100).toDouble))
    .toDF("id", "v")

  test("ntileExact matches the ntile window bit-for-bit") {
    for (b <- Seq(1, 3, 10, 1000)) { // 1000 > n exercises q = 0
      val want = df
        .withColumn("bucket",
          ntile(b).over(Window.orderBy(col("v"), col("id"))).cast("long"))
        .select("id", "bucket").as[(Long, Long)].collect().toMap
      val got = Histogram.ntileExact(df, Seq(col("v"), col("id")), b)
        .select("id", "bucket").as[(Long, Long)].collect().toMap
      assert(got == want, s"nBuckets=$b")
    }
  }

  test("ntileExact plans no window and no single-partition sort") {
    val p = Histogram.ntileExact(df, Seq(col("v"), col("id")), 10)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Window"), s"no window operator allowed:\n$p")
    assert(!p.contains("SinglePartition"), s"no global single-partition stage:\n$p")
  }

  test("ntileExact is deterministic across runs") {
    def run() = Histogram.ntileExact(df, Seq(col("v"), col("id")), 7)
      .select("id", "bucket").as[(Long, Long)].collect().toSet
    assert(run() == run())
  }

  test("equiDepthApprox bucket populations are within tolerance of n/b") {
    // continuous-ish values (few ties): each of the 10 buckets should hold
    // n/10 ± the sketch rank error; 20% is far above the error at this
    // accuracy, so a miss means the boundaries are wrong, not noisy
    val data = (1L to 5000L).map(i => (i, (i * 2654435761L % 100000).toDouble))
      .toDF("id", "v")
    val buckets = Histogram.equiDepthApprox(data, "v", 10)
      .select("bucket", "n").as[(Long, Long)].collect().toMap
    assert(buckets.keySet == (1L to 10L).toSet)
    val target = 5000.0 / 10
    buckets.foreach { case (b, n) =>
      assert(math.abs(n - target) / target <= 0.2,
        s"bucket $b holds $n rows, target $target")
    }
    assert(buckets.values.sum == 5000L)
  }

  test("ntileExact and withGlobalRank are empty-input safe") {
    val empty = df.filter(col("id") < 0)
    assert(Histogram.ntileExact(empty, Seq(col("v"), col("id")), 10).count() == 0)
    assert(Histogram.withGlobalRank(empty, Seq(col("id"))).count() == 0)
  }

  test("equiDepthApprox: empty and all-null inputs yield an empty histogram; nulls excluded") {
    val empty = df.filter(col("id") < 0)
    assert(Histogram.equiDepthApprox(empty, "v", 10).count() == 0)
    val allNull = df.withColumn("v", lit(null).cast("double"))
    assert(Histogram.equiDepthApprox(allNull, "v", 10).count() == 0)
    // nulls must not inflate the last bucket
    val half = df.withColumn("v",
      when(col("id") % 2 === 0, col("v")).otherwise(lit(null)))
    val buckets = Histogram.equiDepthApprox(half, "v", 4)
      .select("bucket", "n").as[(Long, Long)].collect().toMap
    assert(buckets.values.sum == df.filter(col("id") % 2 === 0).count())
  }

  test("equiDepthApprox bucket ranges are ordered and cover the data") {
    val data = (1L to 2000L).map(i => (i, (i % 500).toDouble)).toDF("id", "v")
    val rows = Histogram.equiDepthApprox(data, "v", 8)
      .select("bucket", "mn", "mx").as[(Long, Double, Double)].collect()
      .sortBy(_._1)
    rows.foreach { case (_, mn, mx) => assert(mn <= mx) }
    rows.sliding(2).foreach {
      case Array((_, _, mx1), (_, mn2, _)) => assert(mx1 <= mn2)
      case _ =>
    }
  }
}

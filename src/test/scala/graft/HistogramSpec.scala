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

  test("winsorizedStats clips to group percentiles; nulls stay null in both means") {
    // group "a": 1..100 plus two nulls; group "b": constant 5s
    val rows = (1 to 100).map(i => ("a", Option(i.toDouble))) ++
      Seq(("a", Option.empty[Double]), ("a", Option.empty[Double])) ++
      (1 to 10).map(_ => ("b", Option(5.0)))
    val got = Histogram.winsorizedStats(rows.toDF("g", "v"), "g", "v",
        loP = 0.05, hiP = 0.95)
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, nA, loA, hiA, wA, rawA) = got("a")
    assert(nA == 102) // n counts ALL rows, null-valued included
    // percentile over the 100 non-null values: rank (n-1)p interpolation
    assert(loA == 5.95 && hiA == 95.05)
    // winsorized mean over the 100 NON-NULL rows only — a null coerced to
    // the low bound would drag this down and break the raw-mean symmetry
    val want = (1 to 100).map(i => math.min(math.max(i.toDouble, 5.95), 95.05)).sum / 100
    assert(math.abs(wA - math.rint(want * 1e4) / 1e4) < 1e-9)
    assert(rawA == 50.5)
    val (_, nB, _, _, wB, rawB) = got("b")
    assert(nB == 10 && wB == 5.0 && rawB == 5.0)
  }

  test("winsorizedStats on an all-null group yields null stats, full n") {
    val rows = Seq(("a", Option.empty[Double]), ("a", Option.empty[Double]))
    val got = Histogram.winsorizedStats(rows.toDF("g", "v"), "g", "v")
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(1) == 2L)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
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

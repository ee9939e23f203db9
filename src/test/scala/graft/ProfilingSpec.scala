package graft

import graft.operators.Profiling

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("keySkewProfile: exact counts on a hand-built skewed distribution") {
    // key "hot" x 60, "warm" x 30, ten singletons, null x 5:
    // 13 keys (null counts), 105 rows, max 60, mean 105/13 → skew 7.4286
    val rows = Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++
      (1 to 10).map(i => s"k$i") ++ Seq.fill(5)(null.asInstanceOf[String])
    val got = Profiling.keySkewProfile(rows.toDF("k"), "k")
      .as[(Long, Long, Long, String, Double, Double, Double)].collect().head
    val (nRows, nKeys, maxF, maxKey, p50, p99, skew) = got
    assert((nRows, nKeys, maxF, maxKey) == ((105L, 13L, 60L, "hot")))
    // freqs sorted: 1x10, 5, 30, 60 → p50 = 1, p99 = interpolated near max
    assert(p50 == 1.0)
    assert(p99 > 30.0 && p99 <= 60.0)
    assert(skew == BigDecimal(60.0 * 13 / 105)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("keySkewProfile: null keys are one reported key (the straggler case)") {
    val rows = (Seq.fill(9)(null.asInstanceOf[String]) ++ Seq("a")).toDF("k")
    val got = Profiling.keySkewProfile(rows, "k")
      .as[(Long, Long, Long, String, Double, Double, Double)].collect().head
    assert((got._2, got._3, got._4) == ((2L, 9L, "<null>")))
  }

  test("keySkewProfile: uniform keys profile as skew 1.0, stable across partitionings") {
    val df = (1L to 64L).map(i => i % 8).toDF("k")
    val a = Profiling.keySkewProfile(df, "k").collect().head
    val b = Profiling.keySkewProfile(df.repartition(7), "k").collect().head
    assert(a == b, "profile must not depend on input partitioning")
    assert(a.getAs[Double]("skew") == 1.0 && a.getAs[Long]("max_freq") == 8L)
    // max-freq tie: every key has freq 8 — deterministic (freq, key)-struct
    // max picks the largest key string
    assert(a.getAs[String]("max_key") == "7")
  }
}

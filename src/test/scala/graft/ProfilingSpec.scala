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

  test("psiDrift: identical snapshots score 0; a shifted dim drifts") {
    import org.apache.spark.sql.functions.col
    // dim 0 identical across halves; dim 1 moves from ~-0.8 to ~+0.8
    val rows = (0L until 40L).map { i =>
      val d1 = if (i % 2 == 0) -0.8f else 0.8f
      (i, Array(0.1f, d1))
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Profiling.psiDrift(df, "embedding", col("vec_id") % 2 === 0)
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(got.map(_._1) == Seq(0L, 1L))
    val (d0, d1) = (got(0), got(1))
    assert(d0._4 == 0.0 && !d0._5, s"identical dim drifted: $d0")
    assert(d1._4 > 0.2 && d1._5, s"shifted dim not flagged: $d1")
    assert(d0._2 == 20L && d0._3 == 20L)
  }

  test("psiDrift clamps out-of-range values into the edge bins") {
    import org.apache.spark.sql.functions.col
    // every value far outside [lo,hi]; both snapshots identical → psi 0,
    // and the clamp keeps the bin grid well-defined (no null bins)
    val df = (0L until 10L).map(i => (i, Array(-5.0f, 9.0f)))
      .toDF("vec_id", "embedding")
    val got = Profiling.psiDrift(df, "embedding", col("vec_id") % 2 === 0)
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(got.size == 2 && got.forall(r => r._4 == 0.0 && !r._5))
  }

  test("psiDrift is partitioning-invariant") {
    import org.apache.spark.sql.functions.col
    val rows = (0L until 30L).map(i => (i, Array((i % 7).toFloat / 10f - 0.3f)))
    val df = rows.toDF("vec_id", "embedding")
    val a = Profiling.psiDrift(df, "embedding", col("vec_id") < 15).collect().toSeq
    val b = Profiling.psiDrift(df.repartition(7), "embedding", col("vec_id") < 15)
      .collect().toSeq
    assert(a == b)
  }
}
